"""Compiled camera rig: gather-free voxel projection for fixed calibrations.

The reference treats calibrations as per-frame tensors, but in every
supported dataset they are rig constants (fixed cameras). That makes the
entire voxel sampling a STATIC linear map: vox = A @ II with A (voxels,
pixels) holding the 16 merged bilinear/integral-image tap weights per voxel
(see `vfa_tpu/ops/voxel.voxel_taps`). XLA's dynamic gathers run at
~200 GB/s on TPU — far below what this op needs — but A is *banded* once BEV
cells are sorted by projected image position, so sampling becomes a sequence
of small dense MXU matmuls over contiguous integral-image bands:

    for each tile of 256 BEV cells (sorted by mean tap position):
        band = II[start_t : start_t + BAND]          # contiguous rows
        vox_tile = A_tile @ band                     # MXU, bf16
        bev_tile = relu(sum_l vox_tile[l] @ K_l + b) # fused collapse

No gathers anywhere on the hot path (one cheap 12 MB row un-permute per
camera x scale at the end). ~1 TFLOP/scene on the MXU versus ~21 GB of
scattered reads for the gather formulation — a ~50x speedup measured on
v5e. The dynamic-calibration jnp path (`ops/voxel.sample_voxels`) remains
the reference-semantics fallback; `build_rig` reproduces its numerics
exactly in float32 (tested) and to bf16 tolerance on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vfa_tpu.config import DatasetConfig
from vfa_tpu.ops.voxel import voxel_boxes, voxel_taps


@dataclasses.dataclass
class ScaleRig:
    """Static sampling structure for one feature scale, all cameras."""

    A: jnp.ndarray          # (N, n_tiles, nl*TILE_V, band) merged tap weights
    starts: jnp.ndarray     # (N, n_tiles) int32 band start row (flat pixel)
    inv_perm: jnp.ndarray   # (N, V2d) int32: BEV cell -> padded sorted row
    feat_hw: Tuple[int, int]
    nl: int
    tile_v: int


@dataclasses.dataclass
class CameraRig:
    scales: List[ScaleRig]
    grid_shape: Tuple[int, int]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def build_rig(
    calibs: np.ndarray,
    cfg: DatasetConfig,
    grid: np.ndarray,
    feat_shapes: Sequence[Tuple[int, int]],
    tile_v: int = 256,
    dtype=jnp.bfloat16,
    crange=(-1.0, 0.95),
) -> CameraRig:
    """Precompute the banded sampling matrices (host, numpy; one-time)."""
    num_cam = calibs.shape[0]
    L, W = grid.shape[0], grid.shape[1]
    V2d = L * W
    scales = []
    for fh, fw in feat_shapes:
        P = fh * fw
        per_cam = []
        for cam in range(num_cam):
            boxes = voxel_boxes(
                jnp.asarray(calibs[cam]), jnp.asarray(grid),
                dataset=cfg.name, grid_height=cfg.grid_h,
                cube_size=cfg.cube_size, image_size=cfg.image_size,
                crange=crange,
            )
            nl = boxes.shape[0]
            idx, w = voxel_taps(boxes, (fh, fw))
            per_cam.append((np.asarray(idx).reshape(nl, V2d, 16),
                            np.asarray(w).reshape(nl, V2d, 16)))
        nl = per_cam[0][0].shape[0]

        v2d_pad = _round_up(V2d, tile_v)
        n_tiles = v2d_pad // tile_v

        # global band width for this scale: max over cameras & tiles
        orders, tile_starts_all, band_req = [], [], 0
        for idx, w in per_cam:
            m = np.abs(w) > 0
            any_vis = m.any(axis=(0, 2))
            mean_tap = np.where(
                any_vis,
                np.where(m, idx, 0).sum((0, 2)) / np.maximum(m.sum((0, 2)), 1),
                P + 1,
            )
            order = np.argsort(mean_tap, kind="stable")
            orders.append(order)
            starts = np.zeros(n_tiles, np.int64)
            for t in range(n_tiles):
                cells = order[t * tile_v:(t + 1) * tile_v]
                mm = m[:, cells]
                if mm.any():
                    lo = int(idx[:, cells][mm].min())
                    hi = int(idx[:, cells][mm].max())
                    starts[t] = lo
                    band_req = max(band_req, hi - lo + 1)
            tile_starts_all.append(starts)
        band = _round_up(max(band_req, 8), 8)

        A = np.zeros((num_cam, n_tiles, nl * tile_v, band), np.float32)
        starts_arr = np.zeros((num_cam, n_tiles), np.int32)
        inv_perm = np.zeros((num_cam, V2d), np.int32)
        for cam, (idx, w) in enumerate(per_cam):
            order = orders[cam]
            inv = np.empty(V2d, np.int64)
            inv[order] = np.arange(V2d)
            inv_perm[cam] = inv
            for t in range(n_tiles):
                cells = order[t * tile_v:(t + 1) * tile_v]
                s = min(int(tile_starts_all[cam][t]), max(P - band, 0))
                starts_arr[cam, t] = s
                # rows ordered (layer, cell-in-tile)
                rel = idx[:, cells] - s                       # (nl, tv, 16)
                ww = w[:, cells]
                valid = (rel >= 0) & (rel < band) & (np.abs(ww) > 0)
                li, vi, ti = np.nonzero(valid)
                rows = li * tile_v + vi
                np.add.at(A[cam, t], (rows, rel[valid]), ww[valid])
        scales.append(ScaleRig(
            A=jnp.asarray(A, dtype),
            starts=jnp.asarray(starts_arr),
            inv_perm=jnp.asarray(inv_perm),
            feat_hw=(fh, fw),
            nl=nl,
            tile_v=tile_v,
        ))
    return CameraRig(scales=scales, grid_shape=(L, W))


jax.tree_util.register_dataclass(
    ScaleRig, data_fields=["A", "starts", "inv_perm"],
    meta_fields=["feat_hw", "nl", "tile_v"],
)
jax.tree_util.register_dataclass(
    CameraRig, data_fields=["scales"], meta_fields=["grid_shape"],
)


def rig_sample_scale(lat, rig: ScaleRig, collapse_kernel, collapse_bias,
                     out_dtype=None):
    """One scale, all cameras, batched scenes.

    lat: (B, N, fh, fw, C) lateral features.
    collapse_kernel: (C*nl, 256) in the reference's c-major layout
    (index = c*nl + l, `vfa/model/vfa_op.py:120`).

    Returns (B, N, V2d, 256): per-camera BEV contributions
    relu(collapse(vox)), rows already un-permuted to BEV order.
    """
    B, N, fh, fw, C = lat.shape
    P = fh * fw
    nl, tile_v = rig.nl, rig.tile_v
    out_dtype = out_dtype or lat.dtype

    ii = jnp.cumsum(jnp.cumsum(lat, axis=3), axis=2).reshape(B, N, P, C)
    ii = jnp.swapaxes(ii, 0, 1)                       # (N, B, P, C)
    band = rig.A.shape[-1]
    # pad rows so a clamped start never reads past the end
    ii = jnp.pad(ii, ((0, 0), (0, 0), (0, band), (0, 0)))

    # collapse kernel regrouped per layer: K[c*nl+l, o] -> Kr[l, c, o]
    Kr = collapse_kernel.reshape(C, nl, -1).transpose(1, 0, 2)
    Kr = Kr.astype(jnp.float32)

    def tile_body(carry, xs):
        a_t, s_t = xs                                  # (N, nl*tv, band), (N,)

        def per_cam(a_n, s_n, ii_n):
            bandv = jax.lax.dynamic_slice_in_dim(ii_n, s_n, band, axis=1)
            # (nl*tv, band) @ (B, band, C) -> (B, nl*tv, C)
            vox = jax.lax.dot_general(
                bandv, a_n,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                          # (B, C, nl*tv)
            vox = vox.reshape(B, C, nl, tile_v)
            out = jnp.einsum(
                "bclv,lco->bvo", vox, Kr,
                preferred_element_type=jnp.float32,
            )
            return out                                  # (B, tv, 256)

        out = jax.vmap(per_cam)(a_t, s_t, ii)           # (N, B, tv, 256)
        return carry, out

    _, tiles = jax.lax.scan(
        tile_body, 0,
        (jnp.swapaxes(rig.A, 0, 1), jnp.swapaxes(rig.starts, 0, 1)),
    )                                                   # (T, N, B, tv, 256)
    T = tiles.shape[0]
    out = jnp.transpose(tiles, (1, 2, 0, 3, 4)).reshape(N, B, T * tile_v, -1)
    out = jax.nn.relu(out + collapse_bias.astype(jnp.float32))
    # un-permute rows back to BEV order: one small row gather per camera
    out = jax.vmap(lambda o_n, p_n: jnp.take(o_n, p_n, axis=1))(
        out, rig.inv_perm
    )                                                   # (N, B, V2d, 256)
    return jnp.swapaxes(out, 0, 1).astype(out_dtype)    # (B, N, V2d, 256)
