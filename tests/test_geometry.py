"""Unit tests for vfa_tpu.geometry against independent oracles (torch for
grid_sample/meshgrid semantics, scipy for Rodrigues)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from vfa_tpu.config import mc_opts, mx_opts, wt_opts
from vfa_tpu.geometry import (
    grid_sample_bilinear,
    make_grid,
    project,
    rodrigues,
    worldgrid_to_worldcoord,
)


@pytest.mark.parametrize("cfg", [mc_opts, mx_opts, wt_opts], ids=lambda c: c.name)
def test_make_grid_shape_and_values(cfg):
    grid = make_grid(cfg.world_size, cfg.cube_size[:2], cfg.name)
    assert grid.shape == (*cfg.grid_shape, 3)
    # torch-meshgrid oracle, following the reference convention
    if cfg.name == "Wildtrack":
        length, width = cfg.world_size[::-1]
    else:
        length, width = cfg.world_size
    xc = torch.arange(0.0, width, float(cfg.cube_size[0]))
    yc = torch.arange(0.0, length, float(cfg.cube_size[1]))
    if cfg.name == "Wildtrack":
        xx, yy = torch.meshgrid(xc, yc, indexing="ij")
    else:
        yy, xx = torch.meshgrid(yc, xc, indexing="ij")
    ref = torch.stack([xx, yy, torch.zeros_like(xx)], dim=-1).numpy()
    np.testing.assert_allclose(grid, ref, rtol=0, atol=0)


def test_known_grid_values():
    g = make_grid(mc_opts.world_size, (25, 25), "MultiviewC")
    assert g.shape == (156, 156, 3)
    np.testing.assert_allclose(g[3, 7], [7 * 25, 3 * 25, 0])
    g = make_grid(wt_opts.world_size, (4, 4), "Wildtrack")
    assert g.shape == (120, 360, 3)
    np.testing.assert_allclose(g[3, 7], [3 * 4, 7 * 4, 0])


def test_worldgrid_to_worldcoord():
    pts = jnp.array([[40.0, 80.0, 10.0]])
    np.testing.assert_allclose(worldgrid_to_worldcoord(pts, "MultiviewC"), pts)
    np.testing.assert_allclose(worldgrid_to_worldcoord(pts, "MultiviewX"), pts / 40.0)
    np.testing.assert_allclose(
        worldgrid_to_worldcoord(pts, "Wildtrack"),
        [[40 * 2.5 - 300, 80 * 2.5 - 900, 25.0]],
    )


def test_project_matches_manual(rng):
    from vfa_tpu.data.synthetic import make_calibrations

    calib = make_calibrations(mc_opts, 1)[0]  # realistic pinhole camera
    pts = rng.uniform(0, 3900, size=(5, 4, 3)).astype(np.float32)
    pts[..., 2] = rng.uniform(0, 160, size=(5, 4))
    out = np.asarray(project(jnp.asarray(pts), jnp.asarray(calib)))
    c64 = calib.astype(np.float64)
    for i in range(5):
        for j in range(4):
            h = c64[:, :3] @ pts[i, j].astype(np.float64) + c64[:, 3]
            np.testing.assert_allclose(out[i, j], h[:2] / h[2], rtol=1e-4, atol=1e-2)


def test_grid_sample_matches_torch(rng):
    C, H, W = 3, 9, 13
    img = rng.normal(size=(C, H, W)).astype(np.float32)
    # coords spanning in-bounds, boundary, and out-of-bounds
    coords = rng.uniform(-1.3, 1.3, size=(4, 7, 2)).astype(np.float32)
    coords[0, 0] = [-1.0, -1.0]
    coords[0, 1] = [0.95, 0.95]
    coords[0, 2] = [1.0, 1.0]

    ours = np.asarray(grid_sample_bilinear(jnp.asarray(img), jnp.asarray(coords)))

    t_img = torch.from_numpy(img)[None]
    t_grid = torch.from_numpy(coords)[None]
    ref = F.grid_sample(t_img, t_grid, mode="bilinear", padding_mode="zeros",
                        align_corners=False)
    ref = ref[0].permute(1, 2, 0).numpy()  # (4, 7, C)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_rodrigues_matches_scipy(rng):
    from scipy.spatial.transform import Rotation

    for _ in range(5):
        rvec = rng.normal(size=3)
        R = rodrigues(rvec)
        R_ref = Rotation.from_rotvec(rvec).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-10)
    np.testing.assert_allclose(rodrigues(np.zeros(3)), np.eye(3))
