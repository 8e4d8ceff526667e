"""Pure-function geometry: BEV grid construction, world-grid <-> world-coord
conversion, pinhole projection, and a torch-`grid_sample`-compatible bilinear
sampler.

Reference semantics being reproduced (all paths under /root/reference):
  - `vfa/utils.py:16-37`  make_grid (Wildtrack axis swap)
  - `vfa/utils.py:50-59`  project (3x4 calib, homogeneous divide)
  - `vfa/model/vfa_op.py:23-44` worldgrid->worldcoord converters
  - torch ``F.grid_sample(mode='bilinear', padding_mode='zeros',
    align_corners=False)`` as used at `vfa/model/vfa_op.py:112-115`.

Everything here is jnp-traceable and shape-static: safe under jit/vmap/pjit.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def make_grid(world_size, cube_LW, dataset: str, grid_offset=(0.0, 0.0, 0.0)) -> np.ndarray:
    """Ground-plane grid of world-grid coordinates, shape (L, W, 3).

    grid[i, j] = (x, y, z_offset) in *world-grid* units. For Wildtrack the
    world axes are swapped and the meshgrid order differs (`vfa/utils.py:24-36`).
    Host-side (numpy): the grid is a constant per dataset.
    """
    if dataset == "Wildtrack":
        length, width = world_size[::-1]
    else:
        length, width = world_size
    xoff, yoff, zoff = grid_offset
    xcoords = np.arange(0.0, width, cube_LW[0], dtype=np.float32) + xoff
    ycoords = np.arange(0.0, length, cube_LW[1], dtype=np.float32) + yoff
    if dataset == "Wildtrack":
        xx, yy = np.meshgrid(xcoords, ycoords, indexing="ij")
    else:
        yy, xx = np.meshgrid(ycoords, xcoords, indexing="ij")
    zz = np.full_like(xx, zoff)
    return np.stack([xx, yy, zz], axis=-1)


# ---------------------------------------------------------------------------
# worldgrid -> worldcoord converters (`vfa/model/vfa_op.py:23-44`)
# ---------------------------------------------------------------------------

def worldgrid_to_worldcoord(grid, dataset: str):
    """Convert world-grid coords (..., 3) to world coords for projection.

    MultiviewC: identity (units already cm). MultiviewX: /40 (grid cells ->
    meters). Wildtrack: affine x*2.5-300, y*2.5-900, z*2.5 (cm origin shift).
    """
    if dataset == "MultiviewC":
        return grid
    if dataset == "MultiviewX":
        return grid / 40.0
    if dataset == "Wildtrack":
        scale = jnp.asarray([2.5, 2.5, 2.5], dtype=grid.dtype)
        shift = jnp.asarray([-300.0, -900.0, 0.0], dtype=grid.dtype)
        return grid * scale + shift
    raise ValueError(f"unknown dataset {dataset}")


def project(points, calib):
    """Pinhole projection of 3D points to the image plane.

    points: (..., 3) world coordinates; calib: (..., 3, 4) = K @ [R|t]
    (broadcastable against points' batch dims). Returns (..., 2) pixel coords.
    Matches `vfa/utils.py:50-59`: h = calib[:, :3] @ p + calib[:, 3]; xy = h[:2]/h[2].
    """
    # elementwise mul+sum instead of einsum: a length-3 contraction would be
    # lowered to a bf16 MXU matmul on TPU (several-pixel error); this stays
    # on the VPU in full fp32.
    h = jnp.sum(calib[..., :3] * points[..., None, :], axis=-1) + calib[..., 3]
    return h[..., :2] / h[..., 2:3]


# ---------------------------------------------------------------------------
# torch-compatible bilinear sampling (align_corners=False, zeros padding)
# ---------------------------------------------------------------------------

def _unnormalize(coord, size):
    """Map normalized coord in [-1, 1] to pixel index, align_corners=False:
    ix = ((x + 1) * size - 1) / 2."""
    return ((coord + 1.0) * size - 1.0) * 0.5


def grid_sample_bilinear(image, coords):
    """Bilinear sample `image` (C, H, W) at normalized `coords` (..., 2) in
    (x, y) order, exactly matching torch ``F.grid_sample`` defaults
    (bilinear, zeros padding, align_corners=False).

    Returns (..., C). Out-of-bounds taps contribute zero (each of the four
    taps is masked independently, like torch's zeros padding) — this matters
    at the crange=(-1, 0.95) clamp boundary (`vfa/model/vfa_op.py:76`).
    """
    C, H, W = image.shape
    x = _unnormalize(coords[..., 0], W)
    y = _unnormalize(coords[..., 1], H)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0  # weight for x1
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def tap(xi, yi):
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        # gather (..., C): index flat HW for one fused gather
        flat = image.reshape(C, H * W)
        vals = jnp.take(flat, yc * W + xc, axis=1)  # (C, ...)
        vals = jnp.moveaxis(vals, 0, -1)            # (..., C)
        return vals * inb[..., None].astype(image.dtype)

    out = (
        tap(x0, y0) * (wx0 * wy0)[..., None]
        + tap(x1, y0) * (wx1 * wy0)[..., None]
        + tap(x0, y1) * (wx0 * wy1)[..., None]
        + tap(x1, y1) * (wx1 * wy1)[..., None]
    )
    return out


def rodrigues(rvec: np.ndarray) -> np.ndarray:
    """Rodrigues rotation-vector -> 3x3 rotation matrix (numpy, host-side).

    Replaces cv2.Rodrigues in calibration parsing
    (`vfa/data/multiviewC.py:106`, `multiviewX.py:114`, `wildtrack.py:125`).
    """
    rvec = np.asarray(rvec, dtype=np.float64).reshape(3)
    theta = np.linalg.norm(rvec)
    if theta < 1e-12:
        return np.eye(3)
    k = rvec / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) * np.cos(theta) + (1 - np.cos(theta)) * np.outer(k, k) + np.sin(theta) * K
