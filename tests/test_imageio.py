"""Native image loader tests vs PIL on generated JPEG/PNG files."""

import numpy as np
import pytest

from vfa_tpu.native.imageio import (
    load_image_native,
    load_image_pil,
    native_available,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native imageio toolchain unavailable")


@pytest.fixture
def images(tmp_path, rng):
    from PIL import Image

    arr = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
    jpg = tmp_path / "a.jpg"
    png = tmp_path / "b.png"
    Image.fromarray(arr).save(jpg, quality=95)
    Image.fromarray(arr).save(png)
    return arr, str(jpg), str(png)


def test_png_identity_decode(images):
    arr, _, png = images
    out = load_image_native(png, (64, 96))
    np.testing.assert_allclose(out, arr.astype(np.float32) / 255.0, atol=1e-6)


def test_jpeg_decode_close_to_pil(images):
    arr, jpg, _ = images
    ours = load_image_native(jpg, (64, 96))
    ref = load_image_pil(jpg, (64, 96))
    # same JPEG, two decoders: allow small IDCT differences
    assert np.abs(ours - ref).mean() < 0.01


def test_resize_close_to_pil(images):
    _, _, png = images
    ours = load_image_native(png, (32, 48))
    ref = load_image_pil(png, (32, 48))
    # PIL downscale is antialiased; plain bilinear differs but must be close
    assert np.abs(ours - ref).mean() < 0.05
    assert ours.shape == (32, 48, 3)
    assert 0.0 <= ours.min() and ours.max() <= 1.0


def test_upscale(images):
    _, _, png = images
    out = load_image_native(png, (128, 192))
    assert out.shape == (128, 192, 3)


def test_missing_file_raises():
    with pytest.raises(RuntimeError):
        load_image_native("/nonexistent/x.jpg", (8, 8))
