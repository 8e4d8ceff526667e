"""ColorJitter augmentation vs independent oracles.

The reference trains with ColorJitter(brightness=0.2, contrast=0.2, hue=0.2)
applied per camera image on PIL uint8 inputs (`/root/reference/train.py:209-214`,
`vfa/data/dataset.py:63`); vfa_tpu.data.augment reimplements torchvision's
float-tensor semantics in numpy. torchvision itself is not installed in this
environment, so the oracles are:

  * PIL.ImageEnhance — the backend torchvision's PIL path delegates to and
    the implementation the reference's transform actually executes
    (uint8, so compared at 1-2/255 tolerance);
  * colorsys (stdlib) — an independent per-pixel HSV round-trip for hue
    (exact float math, 1e-5 tolerance);
  * closed-form checks of the documented float semantics
    (brightness = clip(img*f); contrast = clip(f*img + (1-f)*mean(gray))).
"""

import colorsys

import numpy as np
import pytest

from vfa_tpu.data.augment import (
    ColorJitterAugment,
    adjust_brightness,
    adjust_contrast,
    adjust_hue,
    color_jitter,
)


@pytest.fixture(scope="module")
def img():
    r = np.random.default_rng(42)
    # quantized to uint8 levels so PIL comparisons only see rounding error
    return (r.integers(0, 256, size=(24, 32, 3)) / 255.0).astype(np.float32)


def _pil(img_f32):
    from PIL import Image

    return Image.fromarray((img_f32 * 255.0 + 0.5).astype(np.uint8))


@pytest.mark.parametrize("factor", [0.8, 1.0, 1.2, 0.0])
def test_brightness_matches_pil(img, factor):
    from PIL import ImageEnhance

    got = adjust_brightness(img, factor)
    want = np.asarray(ImageEnhance.Brightness(_pil(img)).enhance(factor))
    assert np.abs(got * 255 - want).max() <= 1.0
    # documented float semantics exactly
    np.testing.assert_allclose(got, np.clip(img * factor, 0, 1), atol=1e-7)


@pytest.mark.parametrize("factor", [0.8, 1.0, 1.2, 0.0])
def test_contrast_matches_pil(img, factor):
    from PIL import ImageEnhance

    got = adjust_contrast(img, factor)
    want = np.asarray(ImageEnhance.Contrast(_pil(img)).enhance(factor))
    # PIL rounds the grayscale mean to an integer; allow 2 levels
    assert np.abs(got * 255 - want).max() <= 2.0
    gray_mean = (img @ np.array([0.2989, 0.587, 0.114])).mean()
    np.testing.assert_allclose(
        got, np.clip(factor * img + (1 - factor) * gray_mean, 0, 1), atol=1e-6)


@pytest.mark.parametrize("factor", [-0.2, -0.05, 0.0, 0.1, 0.2, 0.5])
def test_hue_matches_colorsys(img, factor):
    got = adjust_hue(img, factor)
    want = np.empty_like(img)
    for i in range(img.shape[0]):
        for j in range(img.shape[1]):
            h, s, v = colorsys.rgb_to_hsv(*img[i, j])
            want[i, j] = colorsys.hsv_to_rgb((h + factor) % 1.0, s, v)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_hue_rejects_out_of_range(img):
    with pytest.raises(ValueError):
        adjust_hue(img, 0.6)


def test_hue_noop_and_full_cycle(img):
    np.testing.assert_allclose(adjust_hue(img, 0.0), img, atol=1e-6)
    # +0.5 then +(-0.5) mod 1 is the identity
    np.testing.assert_allclose(
        adjust_hue(adjust_hue(img, 0.5), -0.5), img, atol=1e-5)


def test_color_jitter_deterministic_given_rng(img):
    a = color_jitter(img, np.random.default_rng(7))
    b = color_jitter(img, np.random.default_rng(7))
    np.testing.assert_array_equal(a, b)
    c = color_jitter(img, np.random.default_rng(8))
    assert np.abs(a - c).max() > 1e-4


def test_scene_augment_per_camera_independent(img):
    scene = np.stack([img] * 3)
    out = ColorJitterAugment()(scene, np.random.default_rng(0))
    assert out.shape == scene.shape and out.dtype == scene.dtype
    # identical input frames must diverge (per-camera factors)
    assert np.abs(out[0] - out[1]).max() > 1e-4
    assert (out >= 0).all() and (out <= 1).all()


def test_loader_wiring_train_only():
    """SceneLoader applies augment when given; the synthetic loader mirrors
    it; val loaders built without augment return untouched images."""
    from vfa_tpu.config import mc_opts
    from vfa_tpu.data.synthetic import tiny_config
    from vfa_tpu.data.synthetic_loader import SyntheticSceneLoader

    cfg = tiny_config(mc_opts)
    plain = SyntheticSceneLoader(cfg, num_frames=2, seed=3)
    jittered = SyntheticSceneLoader(cfg, num_frames=2, seed=3,
                                    augment=ColorJitterAugment())
    b0 = next(iter(plain))
    b1 = next(iter(jittered))
    assert np.abs(b0["images"] - b1["images"]).max() > 1e-4
    np.testing.assert_array_equal(b0["heatmap"], b1["heatmap"])
    # determinism: same seed -> same jitter
    b2 = next(iter(SyntheticSceneLoader(cfg, num_frames=2, seed=3,
                                        augment=ColorJitterAugment())))
    np.testing.assert_array_equal(b1["images"], b2["images"])


def test_device_color_jitter_matches_host():
    """The on-device (jnp) ColorJitter must reproduce the host numpy path
    given the same factors and op order — all 6 permutations covered."""
    from vfa_tpu.data.augment import (_PERMS3, adjust_brightness,
                                      adjust_contrast, adjust_hue,
                                      device_color_jitter)

    rng = np.random.default_rng(7)
    n = 12  # 2 images per permutation
    images = rng.random((n, 17, 23, 3)).astype(np.float32)
    factors = np.stack([
        rng.uniform(0.8, 1.2, n), rng.uniform(0.8, 1.2, n),
        rng.uniform(-0.2, 0.2, n)], -1).astype(np.float32)
    order = np.arange(n, dtype=np.int32) % len(_PERMS3)

    host_ops = (adjust_brightness, adjust_contrast, adjust_hue)
    want = np.stack([
        _apply(images[i], factors[i], _PERMS3[order[i]], host_ops)
        for i in range(n)])

    import jax.numpy as jnp

    got = np.asarray(device_color_jitter(
        jnp.asarray(images), jnp.asarray(factors), jnp.asarray(order)))
    np.testing.assert_allclose(got, want, atol=2e-6)


def _apply(img, f, perm, host_ops):
    fac = (f[0], f[1], f[2])
    for j in perm:
        img = host_ops[j](img, fac[j])
    return img


def test_sample_jitter_params_ranges():
    from vfa_tpu.data.augment import sample_jitter_params

    rng = np.random.default_rng(0)
    f, o = sample_jitter_params(rng, 1000, 0.2, 0.2, 0.2)
    assert f.shape == (1000, 3) and o.shape == (1000,)
    assert f[:, 0].min() >= 0.8 and f[:, 0].max() <= 1.2
    assert f[:, 1].min() >= 0.8 and f[:, 1].max() <= 1.2
    assert np.abs(f[:, 2]).max() <= 0.2
    assert o.min() >= 0 and o.max() <= 5 and len(np.unique(o)) == 6
