"""GK/RGK heatmap precompute tests against loop-based oracles transcribing
the reference math (`vfa/data/GK.py`)."""

import numpy as np
import pytest

from vfa_tpu.data.heatmaps import (
    _bilinear_rotate,
    gaussian_map_kernel,
    rotated_gaussian_stamp,
    smooth_occupancy_maps,
)


def oracle_bi_rotate(arr, angle_deg):
    """Literal loop transcription of `GK.py:68-124` (clockwise mode)."""
    H, W = arr.shape
    a = angle_deg * np.pi / 180
    m1 = np.array([[1, 0, 0], [0, -1, 0], [-0.5 * H, 0.5 * W, 1]])
    m2 = np.array([[np.cos(a), -np.sin(a), 0],
                   [np.sin(a), np.cos(a), 0], [0, 0, 1]])
    m3 = np.array([[1, 0, 0], [0, -1, 0], [0.5 * H, 0.5 * W, 1]])
    out = np.zeros_like(arr)
    for i in range(H):
        for j in range(W):
            c = np.array([i, j, 1.0]) @ m1 @ m2 @ m3
            ni, nj = int(np.floor(c[0])), int(np.floor(c[1]))
            u, v = c[0] - ni, c[1] - nj
            if nj >= W or ni >= H or ni < 1 or nj < 1 or (i + 1) >= H or (j + 1) >= W:
                continue
            if (ni + 1) >= H or (nj + 1) >= W:
                out[i, j] = arr[ni, nj]
            else:
                out[i, j] = ((1 - u) * (1 - v) * arr[ni, nj]
                             + (1 - u) * v * arr[ni, nj + 1]
                             + u * (1 - v) * arr[ni + 1, nj]
                             + u * v * arr[ni + 1, nj + 1])
    return out


@pytest.mark.parametrize("angle", [0.0, 30.0, -45.0, 137.5, 90.0])
def test_bilinear_rotate_matches_reference_loop(angle, rng):
    arr = rng.random((17, 17)).astype(np.float64)
    got = _bilinear_rotate(arr, angle)
    want = oracle_bi_rotate(arr, angle)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_rotated_gaussian_stamp_center_pinned():
    hm = np.zeros((64, 64), np.float32)
    out = rotated_gaussian_stamp(hm, 30.2, 40.7, box_l=255.0, box_w=120.0,
                                 angle_deg=35.0)
    assert out[40, 30] == 1.0
    assert out.max() == 1.0
    assert (out >= 0).all()
    assert out.sum() > 1.0  # gaussian spread around the center


def test_smooth_occupancy_matches_torch_conv():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    occ = np.zeros((2, 24, 30), np.float32)
    occ[0, 5, 7] = 1.0
    occ[1, 12, 3] = 1.0
    occ[1, 20, 25] = 1.0
    got = smooth_occupancy_maps(occ, grid_reduce=4)

    k = gaussian_map_kernel(4)
    t = torch.from_numpy(occ)[:, None]
    want = F.conv2d(t, torch.from_numpy(k)[None, None],
                    padding=(k.shape[0] - 1) // 2)[:, 0].numpy()
    want[occ == 1.0] = 1.0
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
    assert got.max() == 1.0
