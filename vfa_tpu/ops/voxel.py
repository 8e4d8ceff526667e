"""Voxelized feature aggregation (VFA) — the hot op.

Semantics reproduced from `vfa/model/vfa_op.py:46-173` (reference):
per (camera, scale): lift the ground grid to `nl` z-layers, add the 8 cube
corner offsets, convert world-grid -> world coords, project through the 3x4
calibration, normalize to [-1, crange_hi], take the per-voxel axis-aligned
bbox over the 8 projected corners, mask by visible area, and mean-pool the
feature map inside each bbox via 4 bilinear reads of its integral image.

TPU-first structure (not a translation):
  * geometry (`voxel_boxes`) is feature-independent — computed once per
    (camera, scale) and shared by all channels;
  * sampling (`sample_voxels`) is one fused gather expression XLA lowers to
    TPU gathers — no Python loop over cameras (callers vmap/scan/shard_map
    the camera axis);
  * `voxel_taps` precomputes integer tap indices + merged bilinear weights
    (16 taps per voxel with the +/- integral-image sign and 1/area folded
    in), the form consumed by the fused Pallas kernel.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vfa_tpu.geometry import grid_sample_bilinear, project, worldgrid_to_worldcoord

EPSILON = 1e-6
MAXIMUM_AREA_RATIO = 0.3


def cube_corner_offsets(cube_size) -> np.ndarray:
    """8 corner offsets of one voxel cube, shape (8, 3).

    x: +/- L/2, y: +/- W/2, z in {0, H} (`vfa/model/vfa_op.py:127-133`).
    """
    l, w, h = cube_size
    x = np.array([-l / 2, l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2, -l / 2])
    y = np.array([-w / 2, -w / 2, w / 2, w / 2, -w / 2, -w / 2, w / 2, w / 2])
    z = np.array([0, 0, 0, 0, h, h, h, h])
    return np.stack([x, y, z], axis=-1).astype(np.float32)


def z_layer_offsets(grid_height: int, cube_h: int) -> np.ndarray:
    """(nl, 3) z offsets of the voxel layers (`vfa/model/vfa_op.py:50-52`)."""
    z = np.arange(0, grid_height, cube_h, dtype=np.float32)
    out = np.zeros((len(z), 3), dtype=np.float32)
    out[:, 2] = z
    return out


def voxel_boxes(
    calib,
    grid,
    *,
    dataset: str,
    grid_height: int,
    cube_size,
    image_size,
    crange=(-1.0, 0.95),
):
    """Per-voxel projected AABBs + visibility for ONE camera.

    Args:
      calib: (3, 4) camera matrix K @ [R|t].
      grid: (L, W, 3) world-grid ground plane from `make_grid`.
      image_size: (H, W) the projection is normalized by
        (`vfa/model/vfa_op.py:75-76` uses args.image_size reversed).

    Returns:
      boxes: (nl, L, W, 4) normalized [-1, crange_hi] AABB (l, t, r, b).
    """
    z_off = jnp.asarray(z_layer_offsets(grid_height, cube_size[2]))      # (nl, 3)
    c_off = jnp.asarray(cube_corner_offsets(cube_size))                  # (8, 3)
    # corners3d: (nl, L, W, 8, 3)
    corners = grid[None, :, :, None, :] + z_off[:, None, None, None, :] + c_off
    corners = worldgrid_to_worldcoord(corners, dataset)
    img_xy = project(corners, calib)                                     # (nl, L, W, 8, 2)
    ih, iw = image_size
    img_wh = jnp.asarray([iw, ih], dtype=img_xy.dtype)
    norm = jnp.clip(2.0 * img_xy / img_wh - 1.0, crange[0], crange[1])
    boxes = jnp.concatenate(
        [
            jnp.min(norm[..., 0], axis=-1, keepdims=True),
            jnp.min(norm[..., 1], axis=-1, keepdims=True),
            jnp.max(norm[..., 0], axis=-1, keepdims=True),
            jnp.max(norm[..., 1], axis=-1, keepdims=True),
        ],
        axis=-1,
    )
    return boxes


def box_area_visibility(boxes, feat_hw) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Area (in the reference's normalized-units * fH*fW convention) and the
    visibility mask `EPS < area < 0.3*fH*fW` (`vfa/model/vfa_op.py:104-106`)."""
    fh, fw = feat_hw
    area = (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])
    area = area * (fh * fw) + EPSILON
    visible = (area > EPSILON) & (area < fh * fw * MAXIMUM_AREA_RATIO)
    return area, visible


def integral_image(feature):
    """Double cumsum over (W, H) of (C, fH, fW) (`vfa/model/vfa_op.py:172-173`)."""
    return jnp.cumsum(jnp.cumsum(feature, axis=-1), axis=-2)


def sample_voxels(feature, boxes):
    """Mean-pooled voxel features for ONE camera at ONE scale.

    Args:
      feature: (C, fH, fW) lateral feature map.
      boxes: (nl, L, W, 4) from `voxel_boxes`.

    Returns:
      (L, W, C * nl) voxel features, channel-major then layer — matching the
      reference flatten order `(L*W, C, nl) -> (L*W, C*nl)`
      (`vfa/model/vfa_op.py:120`) so the collapse Dense weights map 1:1 from
      the torch checkpoint.
    """
    C = feature.shape[0]
    nl, L, W, _ = boxes.shape
    area, visible = box_area_visibility(boxes, feature.shape[1:])

    ii = integral_image(feature)
    lt = grid_sample_bilinear(ii, boxes[..., jnp.array([0, 1])])
    rb = grid_sample_bilinear(ii, boxes[..., jnp.array([2, 3])])
    rt = grid_sample_bilinear(ii, boxes[..., jnp.array([2, 1])])
    lb = grid_sample_bilinear(ii, boxes[..., jnp.array([0, 3])])

    vox = (lt + rb - rt - lb) / area[..., None]          # (nl, L, W, C)
    vox = vox * visible[..., None].astype(vox.dtype)
    # (nl, L, W, C) -> (L, W, C, nl) -> (L, W, C*nl)
    vox = jnp.transpose(vox, (1, 2, 3, 0)).reshape(L, W, C * nl)
    return vox


def voxel_taps(boxes, feat_hw):
    """Precompute gather taps for the fused kernel path.

    For each voxel, the 4 integral-image corner reads x 4 bilinear taps
    collapse into 16 flat pixel indices and merged weights
    (sign * bilinear_w / area * visible). Out-of-bounds taps get weight 0
    (torch zeros padding).

    Returns:
      idx: (nl*L*W, 16) int32 flat indices into fH*fW.
      w:   (nl*L*W, 16) float32 merged weights.
    """
    fh, fw = feat_hw
    area, visible = box_area_visibility(boxes, feat_hw)
    nl, L, W, _ = boxes.shape
    V = nl * L * W
    boxes = boxes.reshape(V, 4)

    # corner sample points: (V, 4, 2) in (x, y), signs (+ - - +) for lt rb rt lb
    pts = jnp.stack(
        [
            boxes[:, jnp.array([0, 1])],
            boxes[:, jnp.array([2, 3])],
            boxes[:, jnp.array([2, 1])],
            boxes[:, jnp.array([0, 3])],
        ],
        axis=1,
    )
    signs = jnp.asarray([1.0, 1.0, -1.0, -1.0])

    x = ((pts[..., 0] + 1.0) * fw - 1.0) * 0.5          # (V, 4)
    y = ((pts[..., 1] + 1.0) * fh - 1.0) * 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0

    # 4 bilinear taps per corner point: (dx, dy) in {0,1}^2
    tap_idx = []
    tap_w = []
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        xi = x0 + dx
        yi = y0 + dy
        wxt = jnp.where(dx == 1, wx1, 1.0 - wx1)
        wyt = jnp.where(dy == 1, wy1, 1.0 - wy1)
        inb = (xi >= 0) & (xi <= fw - 1) & (yi >= 0) & (yi <= fh - 1)
        xi_c = jnp.clip(xi, 0, fw - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, fh - 1).astype(jnp.int32)
        tap_idx.append(yi_c * fw + xi_c)                 # (V, 4)
        tap_w.append(wxt * wyt * inb * signs)            # (V, 4)
    idx = jnp.concatenate(tap_idx, axis=-1)              # (V, 16)
    w = jnp.concatenate(tap_w, axis=-1)                  # (V, 16)

    scale = (visible.astype(w.dtype) / area).reshape(V, 1)
    return idx, w * scale


def sample_voxels_taps(feature, idx, w, nl: int, L: int, W: int):
    """Tap-based equivalent of `sample_voxels` (shared math with the Pallas
    kernel): vox[v, c] = sum_t w[v, t] * II[c, idx[v, t]]."""
    C = feature.shape[0]
    ii = integral_image(feature).reshape(C, -1)
    taps = jnp.take(ii, idx.reshape(-1), axis=1)         # (C, V*16)
    taps = taps.reshape(C, -1, 16)
    vox = jnp.einsum("cvt,vt->vc", taps, w)              # (V, C)
    vox = vox.reshape(nl, L * W, C)
    # (nl, LW, C) -> (LW, C, nl) -> (L, W, C*nl)
    vox = jnp.transpose(vox, (1, 2, 0)).reshape(L, W, C * nl)
    return vox
