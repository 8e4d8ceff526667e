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
    features).

    Two band layouts:
      * flat (window_hw == ()): a band is `band_b` contiguous flat pixels;
        `starts[b]` is (N, T_b) int32 flat-pixel band starts. A flat band
        must span dy rows x full feature width, so most of it is padding.
      * window (window_hw[b] == (wh_b, ww_b)): a band is a 2D image window,
        flattened row-major to wh_b*ww_b columns; `starts[b]` is
        (N, T_b, 2) int32 (row, col) window origins, cells are ordered by
        a Hilbert curve of their projected box centers so each tile's
        support is a compact rectangle. ~3x fewer A bytes / FLOPs than
        flat on the supported datasets."""

    A: tuple                # per bucket: (N, T_b, nl*TILE_V, band_b)
    starts: tuple           # per bucket: (N, T_b) or (N, T_b, 2) int32
    inv_perm: jnp.ndarray   # (N, V2d) int32: BEV cell -> padded sorted row
    feat_hw: Tuple[int, int]
    nl: int
    tile_v: int
    on_raw: bool = True
    window_hw: tuple = ()   # per bucket (wh_b, ww_b); () = flat layout


@dataclasses.dataclass
class CameraRig:
    scales: List[ScaleRig]
    grid_shape: Tuple[int, int]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def default_tile_v(nl: int, rig_impl: str = "pallas",
                   layout: str = "window", dtype=None) -> int:
    """BEV-cells-per-tile that fits each kernel's VMEM budget.

    The window-layout builder enforces the Pallas VMEM band cap regardless
    of backend (so one rig serves both paths), which bounds tile_v; nl=8
    datasets (MultiviewX/Wildtrack) need the smallest tiles. The flat XLA
    scan path has no VMEM constraint (256 = best MXU shape). fp32 features
    double the per-tile window scratch (the band cap is dtype-aware,
    _build_scale_window band_cap), so fp32 rigs halve the tile."""
    fp32 = dtype is not None and np.dtype(dtype).itemsize >= 4
    if layout == "window":
        if nl > 5:
            # nl=8 pedestrian grids: (nl*tile_v, band) A tiles only fit the
            # VMEM band cap with small tiles (measured: 128/96 infeasible;
            # fp32 MultiviewX additionally rules out 32 — 24 builds for
            # both MX and WT)
            return 24 if fp32 else 64
        # fp32 MC: 80 is infeasible (a single tile's window exceeds the
        # halved cap — window area shrinks slower than tile_v); 64 builds
        return 64 if fp32 else 160
    return 256 if rig_impl != "pallas" else 160


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


def _raster_triplets(calib, cfg, grid, feat_hw, crange):
    """Vectorized rasterization of every visible voxel box: returns
    (iy, ix, val, layer, cell) int64/float64 entry arrays — the prefix-folded
    A values at pixel (iy, ix) for voxel (layer, cell). Shared by the flat
    and window fill paths."""
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
    vox = np.repeat(np.arange(len(sel)), total)
    offs = np.concatenate([[0], np.cumsum(total)[:-1]])
    k = np.arange(n_entries) - np.repeat(offs, total)
    a = k // nx_s[vox]
    b = k % nx_s[vox]

    gsel = sel[vox]
    iy = py[8][gsel] + a
    ix = px[8][gsel] + b
    dyv = _axis_value(iy, *[p[gsel] for p in py[:8]])
    dxv = _axis_value(ix, *[p[gsel] for p in px[:8]])
    val = dyv * dxv * scale.ravel()[gsel]
    return iy, ix, val, gsel // V2d, gsel % V2d


def _dp_bucket_edges(wh, ww, nb, pad_h, pad_w, band_cap=None):
    """Optimal bucket split points minimizing total padded A bytes.

    wh/ww: (num_cam, T) per-tile dims AFTER each camera's own area-ascending
    tile sort. Buckets are ranges over the sorted tile index shared by all
    cameras, and the A arrays are allocated at the CROSS-camera max dims
    (one shape per bucket), so the cost is count * num_cam * pad(max_all wh)
    * pad(max_all ww). Equal tile-count buckets waste hugely when a few
    tiles are pathologically large (cells close to a camera); the DP puts
    those in a tiny bucket. O(nb * T^2), T ~ a few hundred."""
    num_cam, T = wh.shape
    ru = lambda v, m: (v + m - 1) // m * m

    # cross-camera dims: what actually gets allocated for the shared bucket
    wh_all = wh.max(axis=0)
    ww_all = ww.max(axis=0)

    cost = np.zeros((T + 1, T + 1))
    for i in range(T):
        mh = int(wh_all[i])
        mw = int(ww_all[i])
        for j in range(i + 1, T + 1):
            if j > i + 1:
                mh = max(mh, int(wh_all[j - 1]))
                mw = max(mw, int(ww_all[j - 1]))
            band = ru(mh, pad_h) * ru(mw, pad_w)
            if band_cap is not None and band > band_cap:
                # padded band would blow the kernel's VMEM budget: forbid
                cost[i, j] = np.inf
            else:
                cost[i, j] = (j - i) * num_cam * band

    INF = float("inf")
    dp = np.full((nb + 1, T + 1), INF)
    back = np.zeros((nb + 1, T + 1), np.int64)
    dp[0, 0] = 0.0
    for b in range(1, nb + 1):
        for j in range(b, T + 1):
            ks = np.arange(b - 1, j)
            vals = dp[b - 1, ks] + cost[ks, j]
            k = int(ks[np.argmin(vals)])
            dp[b, j] = vals.min()
            back[b, j] = k
    if not np.isfinite(dp[1:, T]).any():
        raise ValueError(
            f"no bucketing fits the VMEM band cap {band_cap}: a single tile's "
            "window exceeds it — reduce tile_v (smaller A tiles) or use the "
            "flat layout / XLA path for this configuration")
    b_best = int(np.argmin(dp[1:, T])) + 1
    edges = [T]
    b, j = b_best, T
    while b > 0:
        j = int(back[b, j])
        edges.append(j)
        b -= 1
    return sorted(set(edges))


def _hilbert(y: np.ndarray, x: np.ndarray, bits: int = 11) -> np.ndarray:
    """Hilbert-curve index of (y, x) on a 2^bits grid (vectorized xy2d).

    Unlike Morton order, consecutive Hilbert indices are spatially adjacent
    — no quadrant-boundary jumps — so every run of `tile_v` cells stays a
    compact blob and tile bounding windows stay small (a Morton-ordered
    build produced seam tiles spanning 56 image rows where the geometry
    needs ~16)."""
    x = x.astype(np.int64).copy()
    y = y.astype(np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << (bits - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        flip = (ry == 0) & (rx == 1)
        x2 = np.where(flip, s - 1 - x, x)
        y2 = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, y2, x2), np.where(swap, x2, y2)
        s >>= 1
    return d


def _build_scale_window(calibs, cfg, grid, feat_hw, crange, tile_v,
                        band_buckets, dtype=jnp.bfloat16):
    """Window-layout build for one feature scale: cells Hilbert-ordered by
    projected box center, each tile of `tile_v` cells sampled from one
    compact 2D image window instead of a full-width flat band.

    Returns (A_buckets fp32 list, starts list of (N, T_b, 2) int32,
    window_hw list of (wh_b, ww_b), inv_perm (N, V2d) int32, nl)."""
    fh, fw = feat_hw
    num_cam = calibs.shape[0]
    V2d = grid.shape[0] * grid.shape[1]
    v2d_pad = _round_up(V2d, tile_v)
    n_tiles = v2d_pad // tile_v
    nb = max(1, min(band_buckets, n_tiles))

    per_cam = []
    nl = None
    for cam in range(num_cam):
        xl, xr, yt, yb, scale = _np_box_profiles(
            calibs[cam], cfg, grid, feat_hw, crange)
        nl = scale.shape[0]
        px = _axis_params(xl.ravel(), xr.ravel(), fw)
        py = _axis_params(yt.ravel(), yb.ravel(), fh)
        vis = (scale.ravel() > 0) & (px[9] > 0) & (py[9] > 0)
        y0, ny = py[8], py[9]
        x0, nx = px[8], px[9]

        # Hilbert order of the mean visible box center (pixel coords)
        v2 = vis.reshape(nl, V2d)
        cnt = v2.sum(0)
        cx = np.clip((xl + xr) * 0.5, 0, fw - 1)
        cy = np.clip((yt + yb) * 0.5, 0, fh - 1)
        mx = (cx * v2).sum(0) / np.maximum(cnt, 1)
        my = (cy * v2).sum(0) / np.maximum(cnt, 1)
        qx = np.clip(mx / fw * 2048, 0, 2047).astype(np.int64)
        qy = np.clip(my / fh * 2048, 0, 2047).astype(np.int64)
        key = np.where(cnt > 0, _hilbert(qy, qx), np.int64(1) << 60)
        order = np.argsort(key, kind="stable")
        pos = np.empty(V2d, np.int64)
        pos[order] = np.arange(V2d)
        t_of_cell = pos // tile_v

        # per-tile bounding window over the rasterized spans
        big = np.iinfo(np.int64).max
        ry = np.full(n_tiles, big)
        y1t = np.full(n_tiles, -1)
        rx = np.full(n_tiles, big)
        x1t = np.full(n_tiles, -1)
        cell_f = np.tile(np.arange(V2d), nl)
        t_flat = t_of_cell[cell_f][vis]
        np.minimum.at(ry, t_flat, y0[vis])
        np.maximum.at(y1t, t_flat, (y0 + ny - 1)[vis])
        np.minimum.at(rx, t_flat, x0[vis])
        np.maximum.at(x1t, t_flat, (x0 + nx - 1)[vis])
        empty = y1t < 0
        ry = np.where(empty, 0, ry)
        rx = np.where(empty, 0, (rx // 8) * 8)  # 8-aligned DMA col start
        wh = np.where(empty, 1, y1t - ry + 1)
        ww = np.where(empty, 8, x1t - rx + 1)
        per_cam.append((order, ry, rx, wh, ww))

    # bucket tiles by window area with DP-optimal edges; bucket dims pad to
    # the in-bucket max
    tperms = []
    whs = np.zeros((num_cam, n_tiles), np.int64)
    wws = np.zeros((num_cam, n_tiles), np.int64)
    for cam in range(num_cam):
        _, ry, rx, wh, ww = per_cam[cam]
        tperm = np.argsort(wh * ww, kind="stable")
        tperms.append(tperm)
        whs[cam] = wh[tperm]
        wws[cam] = ww[tperm]
    # VMEM budget for the Pallas kernels (16 MB/core). Per band element the
    # serial bwd kernel holds: the A tile (manual single buffer,
    # rows*itemsize B), the feature window (C*f_iz), the fp32
    # gradient-window scratch (C*4) and the fp32 dband dot output (C*4).
    # ~4.5 MB is reserved for the dKr/out blocks, Kr, the g tile, small
    # temps and slack. Dtype-aware per the repo rule ("size from
    # .dtype.itemsize, never assume bf16"): both the A and feature terms use
    # the requested rig dtype (matched precision — the supported configs
    # couple them). Mixed-precision runs (fp32 features through a cached
    # bf16 rig) are guarded at the kernel call site instead, where the
    # actual feature dtype is known (rig_pallas._check_window_vmem).
    rows = nl * tile_v
    C = 256  # lateral channel count (model/vfanet.py laterals)
    a_iz = np.dtype(dtype).itemsize
    f_iz = a_iz
    band_cap = int(11.5e6) // (rows * a_iz + C * (f_iz + 4 + 4))
    edges = _dp_bucket_edges(whs, wws, nb, 8, 16, band_cap=band_cap)
    nb = len(edges) - 1
    # wh*ww multiple of 128 (lane tiling) and ww 16-aligned: the in-kernel
    # (wh, ww, C) -> (wh*ww, C) reshape is layout-free when ww is a multiple
    # of the sublane tile (16 covers bf16 and fp32)
    wh_b = [_round_up(int(whs[:, edges[b]:edges[b + 1]].max()), 8)
            for b in range(nb)]
    ww_b = [_round_up(int(wws[:, edges[b]:edges[b + 1]].max()), 16)
            for b in range(nb)]

    A_buckets = [
        np.zeros((num_cam, edges[b + 1] - edges[b], nl * tile_v,
                  wh_b[b] * ww_b[b]), np.float32)
        for b in range(nb)
    ]
    starts_buckets = [
        np.zeros((num_cam, edges[b + 1] - edges[b], 2), np.int32)
        for b in range(nb)
    ]
    inv_perm = np.zeros((num_cam, V2d), np.int32)
    # windows sit entirely inside the (8-aligned) feature image: origins are
    # clamped up/left so origin + bucket dims never overruns — coverage is
    # preserved (the content edge stays inside the shifted window), and the
    # apply-time pad shrinks from (+max_wh, +max_ww) to at most 7 px
    fh_pad = _round_up(fh, 8)
    fw_pad = _round_up(fw, 16)  # >= every ww_b (which rounds up to 16)
    for cam in range(num_cam):
        order, ry, rx, wh, ww = per_cam[cam]
        tperm = tperms[cam]
        padded = np.full(n_tiles * tile_v, -1, np.int64)
        padded[:V2d] = order
        padded2 = np.concatenate([
            padded[t * tile_v:(t + 1) * tile_v] for t in tperm])
        pos = np.empty(V2d, np.int64)
        valid_slots = padded2 >= 0
        pos[padded2[valid_slots]] = np.nonzero(valid_slots)[0]
        inv_perm[cam] = pos
        t_of_cell = pos // tile_v
        vi_of_cell = pos % tile_v
        ry2, rx2 = ry[tperm].copy(), rx[tperm].copy()
        for b in range(nb):
            seg = slice(edges[b], edges[b + 1])
            # fh_pad - wh_b may be 0-aligned-any; fw_pad - ww_b stays
            # 8-aligned (both terms are), so clamped rx keeps DMA alignment
            ry2[seg] = np.minimum(ry2[seg], max(fh_pad - wh_b[b], 0))
            rx2[seg] = np.minimum(rx2[seg], max(fw_pad - ww_b[b], 0))
            starts_buckets[b][cam, :, 0] = ry2[seg]
            starts_buckets[b][cam, :, 1] = rx2[seg]

        iy, ix, val, layer, cell = _raster_triplets(
            calibs[cam], cfg, np.asarray(grid), feat_hw, crange)
        t = t_of_cell[cell]
        row = layer * tile_v + vi_of_cell[cell]
        oy = iy - ry2[t]
        ox = ix - rx2[t]
        for b in range(nb):
            in_bucket = (t >= edges[b]) & (t < edges[b + 1])
            ok = (oy >= 0) & (oy < wh_b[b]) & (ox >= 0) & (ox < ww_b[b])
            dropped = in_bucket & ~ok
            assert np.abs(val[dropped]).max(initial=0.0) == 0.0, \
                "entry outside window"
            m = in_bucket & ok
            col = oy[m] * ww_b[b] + ox[m]
            np.add.at(A_buckets[b][cam], (t[m] - edges[b], row[m], col),
                      val[m])
    return A_buckets, starts_buckets, list(zip(wh_b, ww_b)), inv_perm, nl


def _cache_a_repr(a_fp32: np.ndarray, dtype) -> np.ndarray:
    """npz-storable form of an A bucket: bf16 as its uint16 bit pattern
    (npz has no native bf16), fp32 stored directly."""
    if dtype == jnp.bfloat16:
        import ml_dtypes

        return a_fp32.astype(ml_dtypes.bfloat16).view(np.uint16)
    return np.asarray(a_fp32, np.float32)


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
    layout: str = "flat",
) -> CameraRig:
    """Precompute the banded sampling matrices (host, numpy; one-time).

    layout='window' uses the 2D windowed bands (Hilbert cell order; ~3x
    smaller A than 'flat'); requires fold_prefix.

    With `cache_dir`, the built structures are cached to disk keyed by a
    hash of (calibs, grid, config, shapes) — rebuilds are instant."""
    import hashlib
    import os

    assert layout in ("flat", "window"), layout
    if layout == "window":
        assert fold_prefix, "window layout requires fold_prefix"
    num_cam = calibs.shape[0]
    L, W = grid.shape[0], grid.shape[1]
    V2d = L * W

    cache_path = None
    if cache_dir is not None and dtype in (jnp.bfloat16, jnp.float32):
        key = hashlib.sha1(
            np.ascontiguousarray(calibs, np.float64).tobytes()
            + np.ascontiguousarray(grid, np.float32).tobytes()
            + repr((cfg.name, cfg.grid_h, tuple(cfg.cube_size),
                    tuple(cfg.image_size), tuple(feat_shapes), tile_v,
                    str(dtype), crange, 'align8.v5-dtype-cap', fold_prefix,
                    band_buckets, layout)).encode()
        ).hexdigest()[:16]
        os.makedirs(cache_dir, exist_ok=True)
        cache_path = os.path.join(cache_dir, f"rig_{key}.npz")
        if os.path.exists(cache_path):
            import ml_dtypes

            z = np.load(cache_path)
            scales = []
            for i, (fh, fw) in enumerate(feat_shapes):
                nb = int(z[f"nb{i}"])
                # bf16 A is stored as its uint16 bit pattern (npz has no
                # native bf16); fp32 A is stored directly
                a = tuple(jnp.asarray(
                    z[f"A{i}_{b}"].view(ml_dtypes.bfloat16)
                    if z[f"A{i}_{b}"].dtype == np.uint16
                    else z[f"A{i}_{b}"]) for b in range(nb))
                st = tuple(jnp.asarray(z[f"s{i}_{b}"]) for b in range(nb))
                win = (tuple(tuple(int(x) for x in z[f"w{i}_{b}"])
                             for b in range(nb))
                       if layout == "window" else ())
                scales.append(ScaleRig(
                    A=a, starts=st,
                    inv_perm=jnp.asarray(z[f"p{i}"]),
                    feat_hw=(fh, fw), nl=int(z[f"nl{i}"]), tile_v=tile_v,
                    on_raw=fold_prefix, window_hw=win,
                ))
            return CameraRig(scales=scales, grid_shape=(L, W))

    scales = []
    saved = {}
    total_a_bytes = 0
    for si, (fh, fw) in enumerate(feat_shapes):
        P = fh * fw
        if layout == "window":
            A_bk, s_bk, win_hw, inv_perm, nl = _build_scale_window(
                calibs, cfg, np.asarray(grid), (fh, fw), crange, tile_v,
                band_buckets, dtype=dtype)
            scales.append(ScaleRig(
                A=tuple(jnp.asarray(a, dtype) for a in A_bk),
                starts=tuple(jnp.asarray(s) for s in s_bk),
                inv_perm=jnp.asarray(inv_perm),
                feat_hw=(fh, fw), nl=nl, tile_v=tile_v,
                on_raw=True, window_hw=tuple(win_hw),
            ))
            total_a_bytes += sum(
                a.size * (2 if dtype == jnp.bfloat16 else 4) for a in A_bk)
            if cache_path:
                saved[f"nb{si}"] = len(A_bk)
                for b in range(len(A_bk)):
                    saved[f"A{si}_{b}"] = _cache_a_repr(A_bk[b], dtype)
                    saved[f"s{si}_{b}"] = s_bk[b]
                    saved[f"w{si}_{b}"] = np.asarray(win_hw[b], np.int64)
                saved[f"p{si}"] = inv_perm
                saved[f"nl{si}"] = nl
            continue
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
        # b covers the same sorted-tile range in every camera, padded to the
        # max span within the bucket; edges are DP-optimal (pathologically
        # wide tiles land in a small bucket instead of inflating T/nb tiles)
        nb = max(1, min(band_buckets, n_tiles))
        tperms = []
        spans_sorted = np.zeros((num_cam, n_tiles), np.int64)
        for cam_i in range(num_cam):
            starts, spans = tile_starts_all[cam_i]
            tperm = np.argsort(spans, kind="stable")
            tperms.append(tperm)
            spans_sorted[cam_i] = spans[tperm]
        # flat kernel keeps A in a double-buffered BlockSpec: cap its band
        # so the pipeline fits VMEM (only binding for exotic tile_v values)
        flat_cap = int(12e6) // (nl * tile_v * 4 + 1024)
        # stay feasible even when one tile alone exceeds the cap (the flat
        # path always compiled historically; the cap only discourages
        # grouping wide tiles with narrow ones)
        flat_cap = max(flat_cap, _round_up(int(spans_sorted.max()), 8))
        edges = _dp_bucket_edges(
            spans_sorted, np.ones_like(spans_sorted), nb, 8, 1,
            band_cap=flat_cap)
        nb = len(edges) - 1
        bucket_bands = [
            _round_up(max(8, int(spans_sorted[:, edges[b]:edges[b + 1]].max())), 8)
            for b in range(nb)
        ]
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
            saved[f"nb{si}"] = nb
            for b in range(nb):
                saved[f"A{si}_{b}"] = _cache_a_repr(A_buckets[b], dtype)
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


def rig_matmul_flops(rig: CameraRig, channels: int = 256, n_out: int = 256,
                     train: bool = False) -> int:
    """Executed MXU FLOPs per SCENE of the rig sampling + collapse.

    Counts the A-bucket matmuls at their allocated (padded) dims — i.e.
    work the chip actually performs — plus the per-camera nl-collapse.
    XLA's cost_analysis reports ~0 for Pallas custom calls, so bench.py
    adds this for the MFU line. train=True doubles the A matmuls (the VJP
    is one A^T @ dy per bucket; A itself is constant) and triples the
    collapse (dx and dW)."""
    a_mul = 4 if train else 2          # 2 FLOPs/MAC, x2 for the bwd matmul
    c_mul = 6 if train else 2
    total = 0
    for sr in rig.scales:
        cam_tiles = 0                  # (cameras x tiles) incl. shard dims
        for A in sr.A:
            rows, band = A.shape[-2:]
            lead = int(np.prod(A.shape[:-2]))
            total += a_mul * lead * rows * band * channels
            cam_tiles += lead
        total += c_mul * cam_tiles * sr.tile_v * (sr.nl * channels) * n_out
    return total


jax.tree_util.register_dataclass(
    ScaleRig, data_fields=["A", "starts", "inv_perm"],
    meta_fields=["feat_hw", "nl", "tile_v", "on_raw", "window_hw"],
)
jax.tree_util.register_dataclass(
    CameraRig, data_fields=["scales"], meta_fields=["grid_shape"],
)


def rig_sample_scale(lat, rig: ScaleRig, collapse_kernel, collapse_bias,
                     out_dtype=None, camera_sum=False):
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

    if rig.window_hw:
        # 2D window layout: features stay (N, B, fh, fw, C); each tile
        # slices its compact (wh, ww) window instead of a flat band. Window
        # origins are build-time clamped to fit the 8/16-aligned image, so
        # only alignment padding is needed (<= 7/15 px)
        assert rig.on_raw
        ii = jnp.swapaxes(lat, 0, 1)                  # (N, B, fh, fw, C)
        ii = jnp.pad(ii, ((0, 0), (0, 0), (0, _round_up(fh, 8) - fh),
                          (0, _round_up(fw, 16) - fw), (0, 0)))
    else:
        if rig.on_raw:
            ii = lat.reshape(B, N, P, C)  # prefix-folded A: raw features
        else:
            ii = jnp.cumsum(jnp.cumsum(lat, axis=3), axis=2).reshape(B, N, P, C)
        ii = jnp.swapaxes(ii, 0, 1)                   # (N, B, P, C)
        max_band = max(a.shape[-1] for a in rig.A)
        # pad rows so a start near the end never reads past the buffer
        ii = jnp.pad(ii, ((0, 0), (0, 0), (0, max_band), (0, 0)))

    # collapse kernel regrouped per layer: K[c*nl+l, o] -> Kr[l, c, o]
    Kr = collapse_kernel.reshape(C, nl, -1).transpose(1, 0, 2)
    Kr = Kr.astype(jnp.float32)

    outs = []
    for bi, (A_b, s_b) in enumerate(zip(rig.A, rig.starts)):
        band = A_b.shape[-1]
        win = rig.window_hw[bi] if rig.window_hw else None

        def tile_body(carry, xs, band=band, win=win):
            a_t, s_t = xs                   # (N, nl*tv, band), (N,) | (N, 2)

            # remat: recompute the band slice + dots in the backward pass
            # instead of saving per-tile residuals (17 MB per tile otherwise)
            @jax.checkpoint
            def per_cam(a_n, s_n, ii_n):
                if win is not None:
                    wh, ww = win
                    window = jax.lax.dynamic_slice(
                        ii_n, (0, s_n[0], s_n[1], 0), (B, wh, ww, C))
                    bandv = window.reshape(B, wh * ww, C)
                else:
                    bandv = jax.lax.dynamic_slice_in_dim(
                        ii_n, s_n, band, axis=1)
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
    # un-permute rows back to BEV order BEFORE the bias+relu (they commute:
    # bias is per-channel, the permutation per-cell) so relu(x + bias) can
    # fuse into the caller's camera-sum reduce instead of materializing a
    # second full (N, B, V2d, n_out) fp32 temp
    out = jax.vmap(lambda o_n, p_n: jnp.take(o_n, p_n, axis=1))(
        out, rig.inv_perm
    )                                                   # (N, B, V2d, 256)
    out = jax.nn.relu(out + collapse_bias.astype(jnp.float32))
    if camera_sum:
        # cross-camera sum folded into the epilogue (see the pallas
        # variant): avoids materializing the (B, N, V2d, 256) map
        return jnp.sum(out.astype(out_dtype), axis=0)   # (B, V2d, 256)
    return jnp.swapaxes(out, 0, 1).astype(out_dtype)    # (B, N, V2d, 256)
