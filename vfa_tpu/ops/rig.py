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


@dataclasses.dataclass
class ScaleRig:
    """Static sampling structure for one feature scale, all cameras.

    on_raw=True (default): A has the 2D prefix-sum operator folded in
    (A' = A_taps @ S), so it applies directly to RAW feature bands — each
    row is the voxel's soft box indicator (fractional bilinear edges). This
    is numerically essential in bf16: integral-image values reach ~1e4 and
    bf16 box *differences* of them are ~400% wrong, while raw features are
    O(1) and MXU-accumulated in fp32 (measured ~1e-2 relative).
    on_raw=False keeps the 16-tap integral-image form (applies to cumsum'd
    features)."""

    A: tuple                # per band bucket: (N, T_b, nl*TILE_V, band_b)
    starts: tuple           # per bucket: (N, T_b) int32 band start (flat px)
    inv_perm: jnp.ndarray   # (N, V2d) int32: BEV cell -> padded sorted row
    feat_hw: Tuple[int, int]
    nl: int
    tile_v: int
    on_raw: bool = True


@dataclasses.dataclass
class CameraRig:
    scales: List[ScaleRig]
    grid_shape: Tuple[int, int]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pyramid_feat_shapes(resize_size) -> List[Tuple[int, int]]:
    """Feature-map (h, w) at strides 8/16/32 for the ResNet-GN backbone.

    Each downsampling stage (conv7/s2/p3, maxpool3/s2/p1, two conv3/s2/p1)
    computes ceil(x/2), so odd inputs do NOT equal x // stride."""
    def c(x):
        return (x + 1) // 2

    h, w = resize_size
    h8, w8 = c(c(c(h))), c(c(c(w)))
    h16, w16 = c(h8), c(w8)
    h32, w32 = c(h16), c(w16)
    return [(h8, w8), (h16, w16), (h32, w32)]


def _np_taps(calib, cfg: DatasetConfig, grid, feat_hw, crange):
    """Numpy port of voxel_boxes + voxel_taps (host-side, no device round
    trips): returns idx (nl, V2d, 16) int64 and w (nl, V2d, 16) float64.

    Same math as `ops/voxel.py` (which carries the reference citations); kept
    in float64 here — the weights are folded into the bf16/f32 A matrices.
    """
    from vfa_tpu.ops.voxel import (
        EPSILON, MAXIMUM_AREA_RATIO, cube_corner_offsets, z_layer_offsets,
    )

    fh, fw = feat_hw
    z_off = z_layer_offsets(cfg.grid_h, cfg.cube_size[2]).astype(np.float64)
    c_off = cube_corner_offsets(cfg.cube_size).astype(np.float64)
    corners = (grid.astype(np.float64)[None, :, :, None, :]
               + z_off[:, None, None, None, :] + c_off)
    if cfg.name == "MultiviewX":
        corners = corners / 40.0
    elif cfg.name == "Wildtrack":
        corners = corners * np.array([2.5, 2.5, 2.5]) + np.array([-300.0, -900.0, 0.0])
    calib = np.asarray(calib, np.float64)
    h = corners @ calib[:, :3].T + calib[:, 3]
    img = h[..., :2] / h[..., 2:3]
    ih, iw = cfg.image_size
    norm = np.clip(2.0 * img / np.array([iw, ih]) - 1.0, crange[0], crange[1])
    boxes = np.stack([
        norm[..., 0].min(-1), norm[..., 1].min(-1),
        norm[..., 0].max(-1), norm[..., 1].max(-1),
    ], axis=-1)                                        # (nl, L, W, 4)
    nl = boxes.shape[0]
    V2d = boxes.shape[1] * boxes.shape[2]
    boxes = boxes.reshape(nl, V2d, 4)

    area = (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])
    area = area * (fh * fw) + EPSILON
    visible = (area > EPSILON) & (area < fh * fw * MAXIMUM_AREA_RATIO)

    pts = np.stack([
        boxes[..., [0, 1]], boxes[..., [2, 3]],
        boxes[..., [2, 1]], boxes[..., [0, 3]],
    ], axis=2)                                          # (nl, V2d, 4, 2)
    signs = np.array([1.0, 1.0, -1.0, -1.0])
    x = ((pts[..., 0] + 1.0) * fw - 1.0) * 0.5
    y = ((pts[..., 1] + 1.0) * fh - 1.0) * 0.5
    x0, y0 = np.floor(x), np.floor(y)
    wx1, wy1 = x - x0, y - y0
    tap_idx, tap_w = [], []
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        xi, yi = x0 + dx, y0 + dy
        wxt = wx1 if dx else 1.0 - wx1
        wyt = wy1 if dy else 1.0 - wy1
        inb = (xi >= 0) & (xi <= fw - 1) & (yi >= 0) & (yi <= fh - 1)
        xi_c = np.clip(xi, 0, fw - 1).astype(np.int64)
        yi_c = np.clip(yi, 0, fh - 1).astype(np.int64)
        tap_idx.append(yi_c * fw + xi_c)
        tap_w.append(wxt * wyt * inb * signs)
    idx = np.concatenate(tap_idx, axis=-1)
    w = np.concatenate(tap_w, axis=-1)
    w = w * (visible / area)[..., None]
    return idx, w


def _np_box_profiles(calib, cfg: DatasetConfig, grid, feat_hw, crange):
    """Per-voxel fractional box bounds in pixel coords + 1/area scale.

    Returns (xl, xr, yt, yb) each (nl, V2d) float64 (unnormalized, the
    grid_sample align_corners=False convention) and scale (nl, V2d) =
    visible/area — the same quantities the 16-tap form encodes.
    """
    from vfa_tpu.ops.voxel import (
        EPSILON, MAXIMUM_AREA_RATIO, cube_corner_offsets, z_layer_offsets,
    )

    fh, fw = feat_hw
    z_off = z_layer_offsets(cfg.grid_h, cfg.cube_size[2]).astype(np.float64)
    c_off = cube_corner_offsets(cfg.cube_size).astype(np.float64)
    corners = (grid.astype(np.float64)[None, :, :, None, :]
               + z_off[:, None, None, None, :] + c_off)
    if cfg.name == "MultiviewX":
        corners = corners / 40.0
    elif cfg.name == "Wildtrack":
        corners = corners * np.array([2.5, 2.5, 2.5]) + np.array([-300.0, -900.0, 0.0])
    calib = np.asarray(calib, np.float64)
    h = corners @ calib[:, :3].T + calib[:, 3]
    img = h[..., :2] / h[..., 2:3]
    ih, iw = cfg.image_size
    norm = np.clip(2.0 * img / np.array([iw, ih]) - 1.0, crange[0], crange[1])
    nl = norm.shape[0]
    V2d = norm.shape[1] * norm.shape[2]
    norm = norm.reshape(nl, V2d, 8, 2)
    l, t = norm[..., 0].min(-1), norm[..., 1].min(-1)
    r, b = norm[..., 0].max(-1), norm[..., 1].max(-1)
    area = (r - l) * (b - t) * (fh * fw) + EPSILON
    visible = (area > EPSILON) & (area < fh * fw * MAXIMUM_AREA_RATIO)
    scale = visible / area
    unx = lambda v: ((v + 1.0) * fw - 1.0) * 0.5
    uny = lambda v: ((v + 1.0) * fh - 1.0) * 0.5
    return unx(l), unx(r), uny(t), uny(b), scale


def _axis_params(lo, hi, size):
    """Step-function params of the prefix-sample difference along one axis.

    c(i) = (1-f)*in0*[i <= t0] + f*in1*[i <= t0+1]; d(i) = c_hi(i) - c_lo(i).
    Returns (t0_lo, f_lo, in0_lo, in1_lo, t0_hi, f_hi, in0_hi, in1_hi,
    span_start, span_len).
    """
    t0l = np.floor(lo)
    fl = lo - t0l
    t0h = np.floor(hi)
    fh_ = hi - t0h
    in0l = (t0l >= 0) & (t0l <= size - 1)
    in1l = (t0l + 1 >= 0) & (t0l + 1 <= size - 1)
    in0h = (t0h >= 0) & (t0h <= size - 1)
    in1h = (t0h + 1 >= 0) & (t0h + 1 <= size - 1)
    i0 = np.maximum(0, t0l).astype(np.int64)
    # zeros-padding deficit: when an upper tap falls outside the image, the
    # prefix coefficients don't cancel below the box and the support extends
    # to pixel 0 (exactly matching the reference's grid_sample zeros
    # padding). Only reachable when size < 20 given the 0.95 crange clamp.
    deficit = (~in1h & in0h) | (~in1l & in0l)
    i0 = np.where(deficit, 0, i0)
    i1 = np.minimum(size - 1, t0h + 1).astype(np.int64)
    n = np.maximum(i1 - i0 + 1, 0)
    return (t0l, fl, in0l, in1l, t0h, fh_, in0h, in1h, i0, n)


def _axis_value(i, t0l, fl, in0l, in1l, t0h, fh_, in0h, in1h):
    """d(i) = c_hi(i) - c_lo(i) evaluated elementwise."""
    c_lo = (1.0 - fl) * in0l * (i <= t0l) + fl * in1l * (i <= t0l + 1)
    c_hi = (1.0 - fh_) * in0h * (i <= t0h) + fh_ * in1h * (i <= t0h + 1)
    return c_hi - c_lo


def _raster_fill(A_cam, cfg, calib, grid, feat_hw, crange, starts,
                 t_of_cell, vi_of_cell, tile_v, band, tile_lo=0,
                 tile_hi=None):
    """Fill one camera's A with prefix-folded soft box indicators.

    Each visible (layer, cell) row gets dy (x) dx rasterized over its box
    extent: exactly equal to the 16-tap integral-image sample folded through
    the 2D prefix-sum operator (A' = A_taps @ S), but applied to RAW
    features. Fully vectorized triplet generation (~20 M entries total for
    MultiviewC), no device round trips.
    """
    fh, fw = feat_hw
    xl, xr, yt, yb, scale = _np_box_profiles(calib, cfg, grid, feat_hw, crange)
    nl, V2d = scale.shape

    px = _axis_params(xl.ravel(), xr.ravel(), fw)
    py = _axis_params(yt.ravel(), yb.ravel(), fh)
    nx, ny = px[9], py[9]
    vis = scale.ravel() > 0
    sel = np.nonzero(vis & (nx > 0) & (ny > 0))[0]

    nx_s, ny_s = nx[sel], ny[sel]
    total = nx_s * ny_s
    n_entries = int(total.sum())
    # entry -> voxel mapping and within-voxel (a, b) coordinates
    vox = np.repeat(np.arange(len(sel)), total)
    offs = np.concatenate([[0], np.cumsum(total)[:-1]])
    k = np.arange(n_entries) - np.repeat(offs, total)
    a = k // nx_s[vox]
    b = k % nx_s[vox]

    gsel = sel[vox]                 # flat (layer, cell) index per entry
    iy = py[8][gsel] + a
    ix = px[8][gsel] + b
    dyv = _axis_value(iy, *[p[gsel] for p in py[:8]])
    dxv = _axis_value(ix, *[p[gsel] for p in px[:8]])
    val = dyv * dxv * scale.ravel()[gsel]

    layer = gsel // V2d
    cell = gsel % V2d
    t = t_of_cell[cell]
    if tile_hi is None:
        tile_hi = t.max(initial=0) + 1
    row = layer * tile_v + vi_of_cell[cell]
    col = iy * fw + ix - starts[t]
    in_bucket = (t >= tile_lo) & (t < tile_hi)
    ok = (col >= 0) & (col < band) & in_bucket
    # bands are computed from these same raster spans — any out-of-band
    # entry with weight would mean silently dropped signal
    dropped = in_bucket & ((col < 0) | (col >= band))
    assert np.abs(val[dropped]).max(initial=0.0) == 0.0, "entry outside band"
    np.add.at(A_cam, (t[ok] - tile_lo, row[ok], col[ok]), val[ok])


def build_rig(
    calibs: np.ndarray,
    cfg: DatasetConfig,
    grid: np.ndarray,
    feat_shapes: Sequence[Tuple[int, int]],
    tile_v: int = 256,
    dtype=jnp.bfloat16,
    crange=(-1.0, 0.95),
    cache_dir: str | None = None,
    fold_prefix: bool = True,
    band_buckets: int = 1,
) -> CameraRig:
    """Precompute the banded sampling matrices (host, numpy; one-time).

    With `cache_dir`, the built structures are cached to disk keyed by a
    hash of (calibs, grid, config, shapes) — rebuilds are instant."""
    import hashlib
    import os

    num_cam = calibs.shape[0]
    L, W = grid.shape[0], grid.shape[1]
    V2d = L * W

    cache_path = None
    if cache_dir is not None and dtype == jnp.bfloat16:
        key = hashlib.sha1(
            np.ascontiguousarray(calibs, np.float64).tobytes()
            + np.ascontiguousarray(grid, np.float32).tobytes()
            + repr((cfg.name, cfg.grid_h, tuple(cfg.cube_size),
                    tuple(cfg.image_size), tuple(feat_shapes), tile_v,
                    str(dtype), crange, 'align8', fold_prefix,
                    band_buckets)).encode()
        ).hexdigest()[:16]
        os.makedirs(cache_dir, exist_ok=True)
        cache_path = os.path.join(cache_dir, f"rig_{key}.npz")
        if os.path.exists(cache_path):
            import ml_dtypes

            z = np.load(cache_path)
            scales = []
            for i, (fh, fw) in enumerate(feat_shapes):
                nb = int(z[f"nb{i}"])
                # A stored as the uint16 bit pattern of its bf16 values
                a = tuple(jnp.asarray(z[f"A{i}_{b}"].view(ml_dtypes.bfloat16))
                          for b in range(nb))
                st = tuple(jnp.asarray(z[f"s{i}_{b}"]) for b in range(nb))
                scales.append(ScaleRig(
                    A=a, starts=st,
                    inv_perm=jnp.asarray(z[f"p{i}"]),
                    feat_hw=(fh, fw), nl=int(z[f"nl{i}"]), tile_v=tile_v,
                    on_raw=fold_prefix,
                ))
            return CameraRig(scales=scales, grid_shape=(L, W))

    scales = []
    saved = {}
    total_a_bytes = 0
    for si, (fh, fw) in enumerate(feat_shapes):
        P = fh * fw
        per_cam = [
            _np_taps(calibs[cam], cfg, np.asarray(grid), (fh, fw), crange)
            for cam in range(num_cam)
        ]
        nl = per_cam[0][0].shape[0]

        v2d_pad = _round_up(V2d, tile_v)
        n_tiles = v2d_pad // tile_v

        # sort cells by mean visible tap position; band = global max span
        orders, tile_starts_all, band_req = [], [], 0
        for cam_i, (idx, w) in enumerate(per_cam):
            m = np.abs(w) > 0
            any_vis = m.any(axis=(0, 2))
            mean_tap = np.where(
                any_vis,
                np.where(m, idx, 0).sum((0, 2)) / np.maximum(m.sum((0, 2)), 1),
                P + 1,
            )
            order = np.argsort(mean_tap, kind="stable")
            orders.append(order)
            pos = np.empty(V2d, np.int64)
            pos[order] = np.arange(V2d)
            t_of_cell = pos // tile_v                      # (V2d,)
            # per-tile min/max support, vectorized
            lo = np.full(n_tiles, np.iinfo(np.int64).max)
            hi = np.full(n_tiles, -1)
            if fold_prefix:
                # support = rasterized box extents (includes the rare
                # zeros-padding deficit spans, see _axis_params)
                xl, xr, yt, yb, scl = _np_box_profiles(
                    calibs[cam_i], cfg, np.asarray(grid), (fh, fw), crange)
                px = _axis_params(xl.ravel(), xr.ravel(), fw)
                py = _axis_params(yt.ravel(), yb.ravel(), fh)
                vis = (scl.ravel() > 0) & (px[9] > 0) & (py[9] > 0)
                flat_lo = py[8] * fw + px[8]
                flat_hi = (py[8] + py[9] - 1) * fw + (px[8] + px[9] - 1)
                cell_f = np.tile(np.arange(V2d), nl)
                t_flat = t_of_cell[cell_f][vis]
                np.minimum.at(lo, t_flat, flat_lo[vis])
                np.maximum.at(hi, t_flat, flat_hi[vis])
            else:
                t_flat = np.broadcast_to(t_of_cell[None, :, None], idx.shape)[m]
                np.minimum.at(lo, t_flat, idx[m])
                np.maximum.at(hi, t_flat, idx[m])
            # starts aligned down to 8: Mosaic DMA slices require the start
            # index to be a multiple of the (8, 128) tiling
            starts = np.where(hi >= 0, (lo // 8) * 8, 0)
            spans = np.where(hi >= 0, hi - starts + 1, 1)
            tile_starts_all.append((starts, spans))

        # band buckets: per camera, reorder tiles ascending by span; bucket
        # b covers the same tile-count range in every camera, padded to the
        # max span within the bucket (instead of the global max)
        nb = max(1, min(band_buckets, n_tiles))
        edges = [0] + [n_tiles * (k + 1) // nb for k in range(nb)]
        tperms = []
        bucket_bands = [8] * nb
        for cam_i in range(num_cam):
            starts, spans = tile_starts_all[cam_i]
            tperm = np.argsort(spans, kind="stable")
            tperms.append(tperm)
            for b in range(nb):
                seg = tperm[edges[b]:edges[b + 1]]
                if len(seg):
                    bucket_bands[b] = max(bucket_bands[b],
                                          int(spans[seg].max()))
        bucket_bands = [_round_up(bb, 8) for bb in bucket_bands]
        band = max(bucket_bands)

        A_buckets = [
            np.zeros((num_cam, edges[b + 1] - edges[b], nl * tile_v,
                      bucket_bands[b]), np.float32)
            for b in range(nb)
        ]
        starts_buckets = [
            np.zeros((num_cam, edges[b + 1] - edges[b]), np.int32)
            for b in range(nb)
        ]
        inv_perm = np.zeros((num_cam, V2d), np.int32)
        for cam, (idx, w) in enumerate(per_cam):
            tperm = tperms[cam]
            # cell order after tile reordering (tiles ascending by span);
            # pad slots are kept so tile boundaries stay aligned
            padded = np.full(n_tiles * tile_v, -1, np.int64)
            padded[:V2d] = orders[cam]
            padded2 = np.concatenate([
                padded[t * tile_v:(t + 1) * tile_v] for t in tperm])
            pos = np.empty(V2d, np.int64)
            valid_slots = padded2 >= 0
            pos[padded2[valid_slots]] = np.nonzero(valid_slots)[0]
            inv_perm[cam] = pos
            # no clamping needed: features are padded by `band` rows at
            # apply time, so any start <= P-1 slices safely
            s_old, _ = tile_starts_all[cam]
            s2 = s_old[tperm]                      # starts in new tile order
            t_of_cell = pos // tile_v
            vi_of_cell = pos % tile_v
            for b in range(nb):
                starts_buckets[b][cam] = s2[edges[b]:edges[b + 1]]
            if fold_prefix:
                for b in range(nb):
                    _raster_fill(A_buckets[b][cam], cfg, calibs[cam],
                                 np.asarray(grid), (fh, fw), crange, s2,
                                 t_of_cell, vi_of_cell, tile_v,
                                 bucket_bands[b], tile_lo=edges[b],
                                 tile_hi=edges[b + 1])
                continue
            # 16-tap integral-image form (single bucket only)
            assert nb == 1, "band_buckets requires fold_prefix"
            li = np.broadcast_to(
                np.arange(nl)[:, None, None], idx.shape)
            cell = np.broadcast_to(
                np.arange(V2d)[None, :, None], idx.shape)
            rel = idx - s2[t_of_cell][None, :, None]
            valid = (np.abs(w) > 0) & (rel >= 0) & (rel < band)
            rows = li * tile_v + vi_of_cell[cell]
            np.add.at(
                A_buckets[0][cam],
                (t_of_cell[cell][valid], rows[valid], rel[valid]),
                w[valid],
            )
        scales.append(ScaleRig(
            A=tuple(jnp.asarray(a, dtype) for a in A_buckets),
            starts=tuple(jnp.asarray(s) for s in starts_buckets),
            inv_perm=jnp.asarray(inv_perm),
            feat_hw=(fh, fw),
            nl=nl,
            tile_v=tile_v,
            on_raw=fold_prefix,
        ))
        total_a_bytes += sum(
            a.size * (2 if dtype == jnp.bfloat16 else 4) for a in A_buckets)
        if cache_path:
            import ml_dtypes

            # store the bf16 bit pattern (npz has no native bf16)
            saved[f"nb{si}"] = nb
            for b in range(nb):
                saved[f"A{si}_{b}"] = A_buckets[b].astype(
                    ml_dtypes.bfloat16).view(np.uint16)
                saved[f"s{si}_{b}"] = starts_buckets[b]
            saved[f"p{si}"] = inv_perm
            saved[f"nl{si}"] = nl
    if total_a_bytes > 8e9:
        import sys

        print(
            f"build_rig: A matrices total {total_a_bytes/1e9:.1f} GB — likely "
            "exceeds one chip's HBM with activations (Wildtrack/MultiviewX "
            "scale: nl=8 x large grids). Use the dynamic path or wait for "
            "bucketed bands.", file=sys.stderr,
        )
    if cache_path:
        np.savez(cache_path, **saved)  # uncompressed: A is ~4 GB, zlib is slow
    return CameraRig(scales=scales, grid_shape=(L, W))


jax.tree_util.register_dataclass(
    ScaleRig, data_fields=["A", "starts", "inv_perm"],
    meta_fields=["feat_hw", "nl", "tile_v", "on_raw"],
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

    if rig.on_raw:
        ii = lat.reshape(B, N, P, C)      # prefix-folded A: raw features
    else:
        ii = jnp.cumsum(jnp.cumsum(lat, axis=3), axis=2).reshape(B, N, P, C)
    ii = jnp.swapaxes(ii, 0, 1)                       # (N, B, P, C)
    max_band = max(a.shape[-1] for a in rig.A)
    # pad rows so a start near the end never reads past the buffer
    ii = jnp.pad(ii, ((0, 0), (0, 0), (0, max_band), (0, 0)))

    # collapse kernel regrouped per layer: K[c*nl+l, o] -> Kr[l, c, o]
    Kr = collapse_kernel.reshape(C, nl, -1).transpose(1, 0, 2)
    Kr = Kr.astype(jnp.float32)

    outs = []
    for A_b, s_b in zip(rig.A, rig.starts):
        band = A_b.shape[-1]

        def tile_body(carry, xs, band=band):
            a_t, s_t = xs                              # (N, nl*tv, band), (N,)

            # remat: recompute the band slice + dots in the backward pass
            # instead of saving per-tile residuals (17 MB per tile otherwise)
            @jax.checkpoint
            def per_cam(a_n, s_n, ii_n):
                bandv = jax.lax.dynamic_slice_in_dim(ii_n, s_n, band, axis=1)
                # (nl*tv, band) @ (B, band, C) -> (B, nl*tv, C)
                vox = jax.lax.dot_general(
                    bandv, a_n,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                      # (B, C, nl*tv)
                vox = vox.reshape(B, C, nl, tile_v)
                out = jnp.einsum(
                    "bclv,lco->bvo", vox, Kr,
                    preferred_element_type=jnp.float32,
                )
                return out                              # (B, tv, 256)

            out = jax.vmap(per_cam)(a_t, s_t, ii)       # (N, B, tv, 256)
            return carry, out

        _, tiles = jax.lax.scan(
            tile_body, 0,
            (jnp.swapaxes(A_b, 0, 1), jnp.swapaxes(s_b, 0, 1)),
        )                                               # (T_b, N, B, tv, 256)
        T_b = tiles.shape[0]
        outs.append(jnp.transpose(tiles, (1, 2, 0, 3, 4))
                    .reshape(N, B, T_b * tile_v, -1))
    out = jnp.concatenate(outs, axis=2) if len(outs) > 1 else outs[0]
    out = jax.nn.relu(out + collapse_bias.astype(jnp.float32))
    # un-permute rows back to BEV order: one small row gather per camera
    out = jax.vmap(lambda o_n, p_n: jnp.take(o_n, p_n, axis=1))(
        out, rig.inv_perm
    )                                                   # (N, B, V2d, 256)
    return jnp.swapaxes(out, 0, 1).astype(out_dtype)    # (B, N, V2d, 256)
