"""BEV-grid spatial sharding: the sequence-parallel analog for VFA.

The voxel rig's A matrices scale with the BEV cell count — the 2x-voxel-
resolution MultiviewC stretch config (BASELINE config 5) builds a 5.4 GB
window rig, and its activations scale the same way. This module shards the
BEV PLANE over a mesh axis ('bev'): the grid is split into contiguous
row-slabs, each device builds/holds only its slab's rig (A bytes / D) and
samples only its slab's cells, and the fused BEV features come back as a
jax.Array sharded on the row axis. Downstream 3x3 fuse/head convs
(`vfa/model/vfanet.py:45-46` in the reference) then run spatially
partitioned by GSPMD, which inserts the halo exchanges for their
receptive fields automatically — the TPU-native form of SURVEY.md §2.9's
"spatial sharding with halo exchange".

Design notes:
- Each slab is built independently by `ops.rig.build_rig` (cells
  Hilbert-ordered within the slab, DP band buckets per slab), then the
  slabs are UNIFIED to one static bucket structure (same bucket count,
  (T, band, window) per bucket — cross-slab maxima, zero-padded) so they
  stack into single arrays with a leading shard axis that `shard_map`
  splits over 'bev'. Zero A tiles contribute nothing; padded output slots
  are never referenced by the slab's inv_perm.
- Inside shard_map every device runs the SAME fused Pallas kernels as the
  single-chip path (`ops/rig_pallas.py`) on its local slab rig. The
  backward is the same hand-written VJP; shard_map transposes the
  replicated feature input into the cross-slab psum of dII.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vfa_tpu.config import DatasetConfig
from vfa_tpu.ops.rig import ScaleRig, _round_up, build_rig


@dataclasses.dataclass
class BevShardedRig:
    """Slab-stacked rig: every ScaleRig array carries a leading shard axis
    (A: (D, N, T_b, rows, band_b), starts: (D, N, T_b, 2),
    inv_perm: (D, N, slab_rows*W))."""

    scales: List[ScaleRig]
    grid_shape: Tuple[int, int]   # true (L, W) — slabs cover rup(L, D) rows
    slab_rows: int
    num_shards: int


jax.tree_util.register_dataclass(
    BevShardedRig, data_fields=["scales"],
    meta_fields=["grid_shape", "slab_rows", "num_shards"],
)


def make_bev_mesh(data: int = 1, bev: int = -1, devices=None) -> Mesh:
    """Build a (data, bev) mesh; bev=-1 uses all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if bev == -1:
        assert n % data == 0, f"{n} devices not divisible by data={data}"
        bev = n // data
    assert data * bev == n, f"mesh {data}x{bev} != {n} devices"
    return Mesh(devices.reshape(data, bev), axis_names=("data", "bev"))


def _np(a):
    return np.asarray(a)


def _unify_scale(slabs: Sequence[ScaleRig], dtype) -> ScaleRig:
    """Pad per-slab bucket structures to common static shapes and stack.

    Window origins are re-clamped for the (possibly larger) common window
    dims and the A columns re-laid for the common row-major (wh, ww)
    flattening; content shifts inside the window by exactly the origin
    shift, so the sampled values are unchanged."""
    assert all(s.window_hw for s in slabs), "window layout only"
    fh, fw = slabs[0].feat_hw
    nl, tile_v = slabs[0].nl, slabs[0].tile_v
    rows = nl * tile_v
    fh_pad, fw_pad = _round_up(fh, 8), _round_up(fw, 16)
    nb = max(len(s.A) for s in slabs)

    # common bucket dims (cross-slab maxima; missing buckets -> minimal)
    wh_b, ww_b, T_b = [], [], []
    for b in range(nb):
        whs = [s.window_hw[b][0] for s in slabs if b < len(s.A)]
        wws = [s.window_hw[b][1] for s in slabs if b < len(s.A)]
        Ts = [s.A[b].shape[1] for s in slabs if b < len(s.A)]
        wh_b.append(_round_up(max(whs), 8))
        ww_b.append(_round_up(max(wws), 16))
        T_b.append(max(Ts))

    num_cam = slabs[0].A[0].shape[0]
    A_stk = [[] for _ in range(nb)]
    s_stk = [[] for _ in range(nb)]
    ip_stk = []
    np_dtype = _np(slabs[0].A[0]).dtype
    for sr in slabs:
        T_old = [sr.A[b].shape[1] if b < len(sr.A) else 0 for b in range(nb)]
        off_old = np.cumsum([0] + T_old[:-1]) * tile_v
        off_new = np.cumsum([0] + T_b[:-1]) * tile_v
        for b in range(nb):
            A_new = np.zeros((num_cam, T_b[b], rows, wh_b[b] * ww_b[b]),
                             np_dtype)
            st_new = np.zeros((num_cam, T_b[b], 2), np.int32)
            if b < len(sr.A):
                A_old = _np(sr.A[b])
                st_old = _np(sr.starts[b])
                who, wwo = sr.window_hw[b]
                # re-clamp origins for the common (larger) window dims;
                # fw_pad - ww_b stays 8-aligned (both 16-aligned)
                ry2 = np.minimum(st_old[..., 0], max(fh_pad - wh_b[b], 0))
                rx2 = np.minimum(st_old[..., 1], max(fw_pad - ww_b[b], 0))
                st_new[:, :T_old[b], 0] = ry2
                st_new[:, :T_old[b], 1] = rx2
                oy = st_old[..., 0] - ry2          # content shift >= 0
                ox = st_old[..., 1] - rx2
                A5 = A_old.reshape(num_cam, T_old[b], rows, who, wwo)
                for n in range(num_cam):
                    for t in range(T_old[b]):
                        y0, x0 = int(oy[n, t]), int(ox[n, t])
                        A_new.reshape(
                            num_cam, T_b[b], rows, wh_b[b], ww_b[b]
                        )[n, t, :, y0:y0 + who, x0:x0 + wwo] = A5[n, t]
            A_stk[b].append(A_new)
            s_stk[b].append(st_new)
        # remap inv_perm slots for the padded bucket layout
        ip = _np(sr.inv_perm).astype(np.int64)
        bounds = np.cumsum([t * tile_v for t in T_old])
        b_of = np.searchsorted(bounds, ip, side="right")
        ip_stk.append((ip - off_old[b_of] + off_new[b_of]).astype(np.int32))

    return ScaleRig(
        A=tuple(jnp.asarray(np.stack(A_stk[b]), dtype) for b in range(nb)),
        starts=tuple(jnp.asarray(np.stack(s_stk[b])) for b in range(nb)),
        inv_perm=jnp.asarray(np.stack(ip_stk)),
        feat_hw=(fh, fw), nl=nl, tile_v=tile_v, on_raw=True,
        window_hw=tuple(zip(wh_b, ww_b)),
    )


def build_bev_sharded_rig(
    calibs: np.ndarray,
    cfg: DatasetConfig,
    grid: np.ndarray,
    feat_shapes: Sequence[Tuple[int, int]],
    num_shards: int,
    tile_v: int = 160,
    dtype=jnp.bfloat16,
    crange=(-1.0, 0.95),
    cache_dir: str | None = None,
    band_buckets: int = 8,
) -> BevShardedRig:
    """Build one window rig per BEV row-slab and stack them for shard_map.

    The grid's row count is padded to a multiple of `num_shards` by
    repeating the last row (the padded cells compute but their outputs are
    cropped — see `sample_bev_sharded`)."""
    grid_np = np.asarray(grid)
    L, W = grid_np.shape[0], grid_np.shape[1]
    D = num_shards
    L_pad = _round_up(L, D)
    if L_pad > L:
        grid_np = np.concatenate(
            [grid_np, np.repeat(grid_np[-1:], L_pad - L, axis=0)], axis=0)
    slab = L_pad // D
    slabs = [
        build_rig(calibs, cfg, grid_np[d * slab:(d + 1) * slab], feat_shapes,
                  tile_v=tile_v, dtype=dtype, crange=crange,
                  cache_dir=cache_dir, band_buckets=band_buckets,
                  layout="window")
        for d in range(D)
    ]
    scales = [
        _unify_scale([s.scales[si] for s in slabs], dtype)
        for si in range(len(feat_shapes))
    ]
    return BevShardedRig(scales=scales, grid_shape=(L, W), slab_rows=slab,
                         num_shards=D)


def sample_bev_sharded(lats, srig: BevShardedRig, kernels, biases,
                       mesh: Mesh, axis: str = "bev", out_dtype=None,
                       interpret: bool = False):
    """Fused BEV features with the BEV plane sharded over `axis`.

    lats: per-scale (B, N, fh, fw, C) feature pyramids (replicated over
    `axis`); kernels/biases: per-scale collapse Linears. Returns
    (B, L, W, n_out) sharded P(None, axis) on the row axis — downstream
    convs partition spatially with GSPMD halo exchange.
    """
    from vfa_tpu.ops.rig_pallas import rig_sample_scale_pallas

    L, W = srig.grid_shape
    D = srig.num_shards
    B = lats[0].shape[0]
    n_out = kernels[0].shape[-1]
    out_dtype = out_dtype or lats[0].dtype

    def local(scales_local, *lats_local):
        ortho = jnp.zeros((B, srig.slab_rows * W, n_out), jnp.float32)
        for sr1, lat, k, b in zip(scales_local, lats_local, kernels, biases):
            sr = ScaleRig(
                A=tuple(a[0] for a in sr1.A),
                starts=tuple(s[0] for s in sr1.starts),
                inv_perm=sr1.inv_perm[0],
                feat_hw=sr1.feat_hw, nl=sr1.nl, tile_v=sr1.tile_v,
                on_raw=sr1.on_raw, window_hw=sr1.window_hw,
            )
            contrib = rig_sample_scale_pallas(lat, sr, k, b,
                                              out_dtype=jnp.float32,
                                              interpret=interpret,
                                              camera_sum=True)
            ortho = ortho + contrib
        return ortho                                    # (B, V2d_slab, C)

    spec_tree = jax.tree_util.tree_map(lambda _: P(axis), srig.scales)
    f = shard_map(
        local, mesh=mesh,
        in_specs=(spec_tree,) + tuple(P() for _ in lats),
        out_specs=P(None, axis, None),
        check_vma=False,
    )
    ortho = f(srig.scales, *lats)                       # (B, D*V2d_slab, C)
    ortho = ortho.reshape(B, D * srig.slab_rows, W, n_out)
    # constrain BEFORE cropping the row padding: the padded row count is
    # divisible by the axis size, the cropped one need not be
    ortho = jax.lax.with_sharding_constraint(
        ortho, NamedSharding(mesh, P(None, axis, None, None)))
    return ortho[:, :L].astype(out_dtype)
