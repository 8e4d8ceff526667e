"""Experiment: per-camera vs shared (BEV-Hilbert) cell ordering cost.

The window rig currently orders BEV cells per camera by the Hilbert index of
their projected image position, which makes the camera axes incompatible:
row i of camera 0's A tile and row i of camera 1's are different BEV cells,
so the camera sum must happen after the per-camera inverse permutations —
materializing (N, B, V2d, 256) tiles. A SHARED order (Hilbert on the BEV
grid itself) would let the kernel accumulate over cameras in VMEM (7x less
tile traffic + memory). This measures the price: total padded A bytes and
max band with both orderings, per dataset/scale.

Usage: python tools/exp_shared_order.py [MultiviewC|MultiviewX|Wildtrack]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from vfa_tpu.config import get_config
from vfa_tpu.data.synthetic import make_calibrations
from vfa_tpu.geometry import make_grid
from vfa_tpu.ops.rig import (_axis_params, _dp_bucket_edges, _hilbert,
                             _np_box_profiles, _round_up, default_tile_v,
                             pyramid_feat_shapes)


def window_cost(order_keys, calib_profiles, V2d, nl, tile_v, fh, fw, nb,
                band_cap, shared):
    """order_keys: (num_cam, V2d) sort keys (shared: same for every cam)."""
    num_cam = len(calib_profiles)
    v2d_pad = _round_up(V2d, tile_v)
    n_tiles = v2d_pad // tile_v
    whs = np.zeros((num_cam, n_tiles), np.int64)
    wws = np.zeros((num_cam, n_tiles), np.int64)

    per_cam_windows = []
    for cam in range(num_cam):
        vis, y0, ny, x0, nx = calib_profiles[cam]
        order = np.argsort(order_keys[cam], kind="stable")
        pos = np.empty(V2d, np.int64)
        pos[order] = np.arange(V2d)
        t_of_cell = pos // tile_v

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
        wh = np.where(empty, 1, y1t - np.where(empty, 0, ry) + 1)
        ww = np.where(empty, 8, x1t - np.where(empty, 0, (rx // 8) * 8) + 1)
        per_cam_windows.append((wh, ww))

    if shared:
        # one tile permutation for all cameras: sort by cross-camera max area
        areas = np.max(np.stack([wh * ww for wh, ww in per_cam_windows]), 0)
        tperm = np.argsort(areas, kind="stable")
        for cam in range(num_cam):
            wh, ww = per_cam_windows[cam]
            whs[cam] = wh[tperm]
            wws[cam] = ww[tperm]
    else:
        for cam in range(num_cam):
            wh, ww = per_cam_windows[cam]
            tperm = np.argsort(wh * ww, kind="stable")
            whs[cam] = wh[tperm]
            wws[cam] = ww[tperm]

    try:
        edges = _dp_bucket_edges(whs, wws, nb, 8, 16, band_cap=band_cap)
    except ValueError as e:
        return None, str(e)
    nbk = len(edges) - 1
    total = 0
    max_band = 0
    dims = []
    for b in range(nbk):
        wh_b = _round_up(int(whs[:, edges[b]:edges[b + 1]].max()), 8)
        ww_b = _round_up(int(wws[:, edges[b]:edges[b + 1]].max()), 16)
        cnt = edges[b + 1] - edges[b]
        total += cnt * num_cam * nl * tile_v * wh_b * ww_b
        max_band = max(max_band, wh_b * ww_b)
        dims.append((cnt, wh_b, ww_b))
    return {"elems": total, "max_band": max_band, "dims": dims}, None


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "MultiviewC"
    cfg = get_config(name)
    calibs = make_calibrations(cfg, cfg.num_cam)
    grid = np.asarray(make_grid(cfg.world_size, cfg.cube_size[:2], cfg.name))
    V2d = grid.shape[0] * grid.shape[1]
    L, W = grid.shape[0], grid.shape[1]
    tile_v = default_tile_v(cfg.num_layers, "pallas", "window")
    crange = (-1.0, 0.95)
    nb = 12

    for fh, fw in pyramid_feat_shapes(cfg.resize_size):
        profiles = []
        keys_percam = []
        nl = None
        for cam in range(cfg.num_cam):
            xl, xr, yt, yb, scale = _np_box_profiles(
                calibs[cam], cfg, grid, (fh, fw), crange)
            nl = scale.shape[0]
            px = _axis_params(xl.ravel(), xr.ravel(), fw)
            py = _axis_params(yt.ravel(), yb.ravel(), fh)
            vis = (scale.ravel() > 0) & (px[9] > 0) & (py[9] > 0)
            profiles.append((vis, py[8], py[9], px[8], px[9]))

            v2 = vis.reshape(nl, V2d)
            cnt = v2.sum(0)
            cx = np.clip((xl + xr) * 0.5, 0, fw - 1)
            cy = np.clip((yt + yb) * 0.5, 0, fh - 1)
            mx = (cx * v2).sum(0) / np.maximum(cnt, 1)
            my = (cy * v2).sum(0) / np.maximum(cnt, 1)
            qx = np.clip(mx / fw * 2048, 0, 2047).astype(np.int64)
            qy = np.clip(my / fh * 2048, 0, 2047).astype(np.int64)
            keys_percam.append(
                np.where(cnt > 0, _hilbert(qy, qx), np.int64(1) << 60))

        rows = nl * tile_v
        band_cap = int(11.5e6) // (rows * 2 + 256 * 10)

        # shared key: Hilbert on the BEV grid coordinates (camera-free)
        cell = np.arange(V2d)
        qy = (cell // W * 2048 // max(L, 1)).astype(np.int64)
        qx = (cell % W * 2048 // max(W, 1)).astype(np.int64)
        shared_key = _hilbert(np.clip(qy, 0, 2047), np.clip(qx, 0, 2047))
        # cells visible in NO camera go last (shared across cams)
        any_vis = np.zeros(V2d, bool)
        for vis, *_ in profiles:
            any_vis |= vis.reshape(nl, V2d).any(0)
        shared_key = np.where(any_vis, shared_key, np.int64(1) << 60)

        a, err_a = window_cost(keys_percam, profiles, V2d, nl, tile_v, fh, fw,
                               nb, band_cap, shared=False)
        b, err_b = window_cost([shared_key] * cfg.num_cam, profiles, V2d, nl,
                               tile_v, fh, fw, nb, band_cap, shared=True)
        print(f"scale ({fh},{fw}) nl={nl} tile_v={tile_v} cap={band_cap}")
        for tag, r, err in (("per-cam", a, err_a), ("shared ", b, err_b)):
            if r is None:
                print(f"  {tag}: INFEASIBLE: {err[:100]}")
            else:
                mb = r["elems"] * 2 / 1e6
                print(f"  {tag}: A={mb:8.1f} MB bf16  max_band={r['max_band']:5d}"
                      f"  buckets={r['dims']}")
        if a and b:
            print(f"  shared/percam A ratio: {b['elems'] / a['elems']:.3f}")


if __name__ == "__main__":
    main()
