"""Full-scale rig structural invariants (numpy-only, no model forward).

Every other rig test runs at tiny_config scale (~1/16 world, 2 cameras),
which never exercises the tile/bucket arithmetic at the real grid sizes
(MultiviewC 156x156, MultiviewX 160x250, Wildtrack 120x360). This builds the
rigs at REAL grid scale — with the stride-32 feature shape so the bands stay
small enough for CI — and asserts the invariants the TPU kernels rely on:

  * every band width is a multiple of 8 and every band start is 8-aligned
    (Mosaic DMA slice constraint, ops/rig.py:376-399),
  * bucket edges tile the tile axis exactly (no tile lost or duplicated),
  * inv_perm is a bijection from BEV cells into padded sorted rows,
  * the total-A-bytes accounting matches the stored arrays,
  * mass is preserved: a voxel's prefix-folded A row sums to its
    (visible/area)-normalized box mass (<= ~1), and rebucketing the same
    geometry preserves the per-camera total exactly.
"""

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.slow


from vfa_tpu.config import mc_opts, mx_opts, wt_opts
from vfa_tpu.data.synthetic import make_calibrations
from vfa_tpu.geometry import make_grid
from vfa_tpu.ops.rig import build_rig, pyramid_feat_shapes

NUM_CAM = 2  # invariants are per-camera; 2 keeps full scale fast in CI


def _check_rig(sr, cfg, tile_v, feat_hw, buckets):
    L, W = cfg.grid_shape
    V2d = L * W
    n_tiles = -(-V2d // tile_v)
    P = feat_hw[0] * feat_hw[1]

    assert 1 <= len(sr.A) <= min(buckets, n_tiles)
    total_tiles = 0
    total_bytes = 0
    for bi, (A_b, s_b) in enumerate(zip(sr.A, sr.starts)):
        band = A_b.shape[-1]
        assert A_b.shape == (NUM_CAM, s_b.shape[1], sr.nl * tile_v, band)
        starts = np.asarray(s_b)
        assert starts.shape[0] == NUM_CAM
        assert (starts >= 0).all()
        if sr.window_hw:
            wh, ww = sr.window_hw[bi]
            assert band == wh * ww
            assert wh % 8 == 0 and ww % 16 == 0, \
                "window dims must align for the on-chip reshape"
            assert starts.shape[-1] == 2
            fh, fw = feat_hw
            assert (starts[..., 0] <= max(fh - 1, 0)).all()
            assert (starts[..., 1] % 8 == 0).all(), "col starts 8-aligned"
            assert (starts[..., 1] <= max(fw - 1, 0)).all()
        else:
            assert band % 8 == 0, "band width must be 8-aligned (Mosaic DMA)"
            assert (starts % 8 == 0).all(), "band starts must be 8-aligned"
            # apply-time padding is max_band rows; start <= P-1 slices safely
            assert (starts <= max(P - 1, 0)).all()
        total_tiles += A_b.shape[1]
        total_bytes += A_b.size * A_b.dtype.itemsize
    assert total_tiles == n_tiles, "bucket edges must tile the tile axis"

    # inv_perm: bijection BEV cell -> padded sorted row, per camera
    inv_perm = np.asarray(sr.inv_perm)
    assert inv_perm.shape == (NUM_CAM, V2d)
    for cam in range(NUM_CAM):
        p = inv_perm[cam]
        assert len(np.unique(p)) == V2d, "inv_perm rows must be distinct"
        assert p.min() >= 0 and p.max() < n_tiles * tile_v

    # accounting: the fp32 A total must match elementwise-size bookkeeping
    want_bytes = sum(
        NUM_CAM * a.shape[1] * sr.nl * tile_v * a.shape[-1] * 4 for a in sr.A)
    assert total_bytes == want_bytes

    # mass conservation: row sums <= ~1 (area normalization), every camera
    # sees some voxels
    row_mass = np.zeros((NUM_CAM,))
    row_max = 0.0
    for A_b in sr.A:
        sums = np.asarray(A_b, np.float64).sum(axis=-1)  # (cam, T_b, rows)
        row_max = max(row_max, float(sums.max()))
        row_mass += sums.sum(axis=(1, 2))
    assert row_max <= 1.0 + 1e-3
    assert (row_mass > 0).all(), "every camera must see some voxels"
    return row_mass


@pytest.mark.parametrize("cfg", [mc_opts, mx_opts, wt_opts],
                         ids=lambda c: c.name)
def test_fullscale_rig_invariants(cfg):
    grid = make_grid(cfg.world_size, cfg.cube_size[:2], cfg.name)
    L, W = cfg.grid_shape
    assert grid.shape[:2] == (L, W)
    calibs = make_calibrations(cfg, NUM_CAM)
    feat_hw = pyramid_feat_shapes(cfg.resize_size)[2]  # stride 32
    tile_v = 256

    masses = []
    for layout, buckets in (("flat", 1), ("flat", 4), ("window", 4)):
        rig = build_rig(calibs, cfg, grid, [feat_hw], tile_v=tile_v,
                        dtype=jnp.float32, band_buckets=buckets,
                        layout=layout)
        masses.append(_check_rig(rig.scales[0], cfg, tile_v, feat_hw, buckets))
    # relayout/rebucketing reorders tiles but must preserve per-camera mass
    np.testing.assert_allclose(masses[0], masses[1], rtol=1e-10)
    np.testing.assert_allclose(masses[0], masses[2], rtol=1e-10)


def test_grid2x_stretch_rig_invariants():
    """BASELINE config 5: the 2x-voxel-resolution MultiviewC stretch grid
    (cube 12x12 -> 325x325 BEV). Window rig must build, obey every kernel
    invariant, and preserve per-camera sampling mass across bucketings."""
    import dataclasses

    cfg = dataclasses.replace(mc_opts, cube_size=(12, 12, 32))
    assert cfg.grid_shape == (325, 325)
    grid = make_grid(cfg.world_size, cfg.cube_size[:2], cfg.name)
    calibs = make_calibrations(cfg, NUM_CAM)
    feat_hw = pyramid_feat_shapes(cfg.resize_size)[2]  # stride 32 for CI
    tile_v = 256

    masses = []
    for layout, buckets in (("flat", 1), ("window", 8)):
        rig = build_rig(calibs, cfg, grid, [feat_hw], tile_v=tile_v,
                        dtype=jnp.float32, band_buckets=buckets,
                        layout=layout)
        masses.append(_check_rig(rig.scales[0], cfg, tile_v, feat_hw,
                                 buckets))
    np.testing.assert_allclose(masses[0], masses[1], rtol=1e-10)
