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


def test_uint8_out_matches_float_path(images):
    """uint8 `out` (quantized staging: 4x fewer H2D bytes) must be the
    rounded float pipeline — identity decode, resize, and JPEG."""
    arr, jpg, png = images
    for path, size in ((png, (64, 96)), (png, (32, 48)), (jpg, (64, 96))):
        f32 = load_image_native(path, size)
        u8 = load_image_native(path, size,
                               out=np.empty((*size, 3), np.uint8))
        expect = np.clip(np.round(f32 * 255.0), 0, 255)
        assert np.abs(u8.astype(np.float32) - expect).max() <= 1.0
    # identity-size decode is the exact stored bytes
    u8 = load_image_native(png, (64, 96),
                           out=np.empty((64, 96, 3), np.uint8))
    np.testing.assert_array_equal(u8, arr)


def test_uint8_out_pil_backend(images):
    """PIL backend with a uint8 `out` copies the decoder's native uint8."""
    arr, _, png = images
    u8 = load_image_pil(png, (64, 96), out=np.empty((64, 96, 3), np.uint8))
    np.testing.assert_array_equal(u8, arr)
    d32 = load_image_pil(png, (32, 48))
    d8 = load_image_pil(png, (32, 48), out=np.empty((32, 48, 3), np.uint8))
    np.testing.assert_allclose(d8.astype(np.float32) / 255.0, d32, atol=1e-6)
