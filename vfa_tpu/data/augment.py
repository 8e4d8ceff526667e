"""Train-time image augmentation: ColorJitter with torchvision semantics.

The reference trains with
``ColorJitter(brightness=0.2, contrast=0.2, hue=0.2)`` applied per camera
image on the train split only (`/root/reference/train.py:209-214`,
`vfa/data/dataset.py:63`). This module reproduces torchvision's float-tensor
functional semantics in numpy (host-side, inside the data loader threads):

  * brightness: ``clip(img * f)`` with f ~ U[1-b, 1+b]
  * contrast:   ``clip(f * img + (1-f) * mean(grayscale(img)))`` with the
    ITU-R 601 luma weights (0.2989, 0.587, 0.114), f ~ U[1-c, 1+c]
  * hue:        RGB->HSV, h := (h + f) mod 1, HSV->RGB, f ~ U[-h, h]
  * the enabled ops are applied in a random order per image, like
    ``ColorJitter.forward``'s ``randperm``.

Tested against PIL.ImageEnhance (what torchvision's PIL path — the one the
reference executes — delegates to) and stdlib colorsys for hue
(tests/test_augment.py; torchvision itself is not installed here).
Saturation is not jittered — the reference doesn't set it.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

_LUMA = np.array([0.2989, 0.587, 0.114], np.float32)


def adjust_brightness(img: np.ndarray, factor: float) -> np.ndarray:
    """img: (..., 3) float in [0,1]."""
    return np.clip(img * np.float32(factor), 0.0, 1.0)


def adjust_contrast(img: np.ndarray, factor: float) -> np.ndarray:
    mean = np.float32((img[..., :3] @ _LUMA).mean())
    return np.clip(np.float32(factor) * img + np.float32(1 - factor) * mean,
                   0.0, 1.0)


def _rgb_to_hsv(img: np.ndarray):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = np.max(img, axis=-1)
    minc = np.min(img, axis=-1)
    cr = maxc - minc
    eq = cr == 0
    s = np.where(eq, 0.0, cr / np.where(maxc == 0, 1.0, maxc))
    crd = np.where(eq, 1.0, cr)
    rc = (maxc - r) / crd
    gc = (maxc - g) / crd
    bc = (maxc - b) / crd
    h = np.where(maxc == r, bc - gc,
                 np.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = np.where(eq, 0.0, h)
    h = (h / 6.0) % 1.0
    return h, s, maxc


def _hsv_to_rgb(h: np.ndarray, s: np.ndarray, v: np.ndarray) -> np.ndarray:
    i = np.floor(h * 6.0)
    f = h * 6.0 - i
    i = i.astype(np.int32) % 6
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    # per-sector (r, g, b) selection
    choices = np.stack([
        np.stack([v, t, p], -1), np.stack([q, v, p], -1),
        np.stack([p, v, t], -1), np.stack([p, q, v], -1),
        np.stack([t, p, v], -1), np.stack([v, p, q], -1),
    ])
    return np.take_along_axis(
        choices, i[None, ..., None].repeat(3, -1), axis=0)[0]


def adjust_hue(img: np.ndarray, factor: float) -> np.ndarray:
    if not -0.5 <= factor <= 0.5:
        raise ValueError(f"hue factor {factor} not in [-0.5, 0.5]")
    h, s, v = _rgb_to_hsv(img.astype(np.float32))
    h = (h + np.float32(factor)) % 1.0
    return _hsv_to_rgb(h, s, v).astype(img.dtype)


def color_jitter(
    img: np.ndarray,
    rng: np.random.Generator,
    brightness: float = 0.2,
    contrast: float = 0.2,
    hue: float = 0.2,
) -> np.ndarray:
    """One image, factors sampled and ops applied in random order like
    ``ColorJitter.get_params`` + ``forward``."""
    ops = []
    if brightness:
        f = rng.uniform(max(0.0, 1 - brightness), 1 + brightness)
        ops.append(lambda x, f=f: adjust_brightness(x, f))
    if contrast:
        f = rng.uniform(max(0.0, 1 - contrast), 1 + contrast)
        ops.append(lambda x, f=f: adjust_contrast(x, f))
    if hue:
        f = rng.uniform(-hue, hue)
        ops.append(lambda x, f=f: adjust_hue(x, f))
    for k in rng.permutation(len(ops)):
        img = ops[k](img)
    return img


# ---------------------------------------------------------------- device --
# On-device ColorJitter: the same torchvision float-tensor semantics as the
# numpy ops above, written in jnp so the jitter runs INSIDE the jitted
# staging step (one fused elementwise pass over the uint8-staged batch on
# the TPU) instead of on host loader threads. Factors/op order are sampled
# on host per image (`sample_jitter_params`) and passed as arrays, so the
# device op is pure and shape-static. Parity with the host path is pinned
# by tests/test_augment.py::test_device_color_jitter_matches_host.

_PERMS3: Tuple[Tuple[int, int, int], ...] = (
    (0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0))


def sample_jitter_params(rng: np.random.Generator, n: int,
                         brightness: float = 0.2, contrast: float = 0.2,
                         hue: float = 0.2):
    """Host-side per-image jitter parameters for `device_color_jitter`.

    Returns (factors (n, 3) float32 [brightness, contrast, hue], order (n,)
    int32 index into `_PERMS3`) — the vectorized analog of
    ``ColorJitter.get_params``'s uniform draws + ``randperm``."""
    factors = np.stack([
        rng.uniform(max(0.0, 1 - brightness), 1 + brightness, n),
        rng.uniform(max(0.0, 1 - contrast), 1 + contrast, n),
        rng.uniform(-hue, hue, n),
    ], axis=-1).astype(np.float32)
    order = rng.integers(0, len(_PERMS3), size=n).astype(np.int32)
    return factors, order


def _dev_brightness(img, f):
    import jax.numpy as jnp

    return jnp.clip(img * f, 0.0, 1.0)


def _dev_contrast(img, f):
    import jax.numpy as jnp

    luma = jnp.asarray(_LUMA, img.dtype)
    mean = jnp.mean(img[..., :3] @ luma)
    return jnp.clip(f * img + (1 - f) * mean, 0.0, 1.0)


def _dev_hue(img, f):
    import jax.numpy as jnp

    # mirror _rgb_to_hsv / _hsv_to_rgb op for op (parity to ~1e-7)
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.max(img, axis=-1)
    minc = jnp.min(img, axis=-1)
    cr = maxc - minc
    eq = cr == 0
    s = jnp.where(eq, 0.0, cr / jnp.where(maxc == 0, 1.0, maxc))
    crd = jnp.where(eq, 1.0, cr)
    rc = (maxc - r) / crd
    gc = (maxc - g) / crd
    bc = (maxc - b) / crd
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(eq, 0.0, h)
    h = (h / 6.0) % 1.0

    h = (h + f) % 1.0
    i = jnp.floor(h * 6.0)
    fr = h * 6.0 - i
    i = i.astype(jnp.int32) % 6
    v = maxc
    p = v * (1.0 - s)
    q = v * (1.0 - s * fr)
    t = v * (1.0 - s * (1.0 - fr))
    # per-sector (r, g, b) via elementwise select cascades — a stacked
    # 6-way choices array + take_along_axis materializes 6x the image in
    # fp32 plus s32 index buffers (26 GB at a full 8x7-camera batch) and
    # OOMs the staging step; the selects fuse into one pass
    def sector(c0, c1, c2, c3, c4, c5):
        return jnp.where(i == 0, c0, jnp.where(i == 1, c1, jnp.where(
            i == 2, c2, jnp.where(i == 3, c3, jnp.where(i == 4, c4, c5)))))

    r = sector(v, q, p, p, t, v)
    g = sector(t, v, v, q, p, p)
    b = sector(p, p, t, v, v, q)
    return jnp.stack([r, g, b], -1)


def device_color_jitter(images, factors, order):
    """Vectorized on-device ColorJitter.

    images (n, H, W, 3) float in [0, 1]; factors (n, 3) [brightness,
    contrast, hue]; order (n,) int32 index into `_PERMS3`. Each image gets
    its ops applied in its permutation's order via `lax.switch` (6 static
    branches — no data-dependent Python control flow under jit)."""
    import jax
    import jax.numpy as jnp

    ops = (_dev_brightness, _dev_contrast, _dev_hue)

    def one(img, f, o):
        def branch(perm):
            def run(im):
                for j in perm:
                    im = ops[j](im, f[j])
                return im
            return run

        return jax.lax.switch(o, [branch(p) for p in _PERMS3], img)

    return jax.vmap(one)(images, factors,
                         jnp.asarray(order, jnp.int32))


class ColorJitterAugment:
    """Scene-level augment hook for the loaders: jitters each camera image
    independently (the reference's per-image transform)."""

    def __init__(self, brightness: float = 0.2, contrast: float = 0.2,
                 hue: float = 0.2):
        self.brightness = brightness
        self.contrast = contrast
        self.hue = hue

    def __call__(self, images: np.ndarray,
                 rng: np.random.Generator) -> np.ndarray:
        # images: (num_cam, H, W, 3) float32 [0,1]
        return np.stack([
            color_jitter(images[c], rng, self.brightness, self.contrast,
                         self.hue)
            for c in range(images.shape[0])
        ]).astype(images.dtype)
