"""Fused Pallas kernel for compiled-rig voxel sampling.

One kernel fuses, per (camera, BEV-cell tile, scene):
    DMA II[start : start+band] HBM -> VMEM        (async, double-buffered
                                                   across the scene axis)
    vox   = A_tile @ II_band                      (MXU, bf16 -> fp32)
    bev   = sum_l vox[l] @ K_l                    (MXU, the collapse
                                                   Linear(C*nl -> 256) of
                                                   `vfa/model/vfa_op.py:59`)
and writes the per-tile BEV block. Versus the XLA scan formulation
(ops/rig.py), the band slice is never materialized in HBM and the collapse
runs on the tile while it is still in VMEM.

The XLA path remains the default fallback; numerics match it exactly (the
same A / starts / collapse weights — tested in fp32 on CPU interpret mode
and on device).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vfa_tpu.ops.rig import ScaleRig


def _kernel(starts_ref, ii_hbm, a_ref, kr_ref, buf_ref, out_ref,
            band_buf, sem, *, nl, tile_v, band, C, n_out):
    del buf_ref  # aliased onto out_ref: carries the other buckets' tiles
    n = pl.program_id(0)
    t = pl.program_id(1)
    b = pl.program_id(2)
    n_b = pl.num_programs(2)

    start = pl.multiple_of(starts_ref[n * pl.num_programs(1) + t], 8)

    def dma(slot, b_idx):
        return pltpu.make_async_copy(
            ii_hbm.at[n, b_idx, pl.ds(start, band), :],
            band_buf.at[slot],
            sem.at[slot],
        )

    # double-buffer the band DMA across the scene axis (innermost grid dim)
    @pl.when(b == 0)
    def _():
        dma(0, b).start()

    @pl.when(b + 1 < n_b)
    def _():
        dma((b + 1) % 2, b + 1).start()

    dma(b % 2, b).wait()

    vox = jax.lax.dot_general(
        a_ref[0, 0], band_buf[b % 2],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # (nl*tv, C)
    vox = vox.astype(kr_ref.dtype).reshape(nl, tile_v, C)
    acc = jnp.zeros((tile_v, n_out), jnp.float32)
    for l in range(nl):
        acc = acc + jax.lax.dot_general(
            vox[l], kr_ref[l],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def _next_step(n, t, b, T, B):
    """Lexicographic successor of grid step (n, t, b) with b fastest.

    Returns (n2, t2, b2, new_tile): new_tile means (n2, t2) != (n, t)."""
    b2 = b + 1
    wrapb = b2 == B
    b2 = jnp.where(wrapb, 0, b2)
    t2 = jnp.where(wrapb, t + 1, t)
    wrapt = t2 == T
    t2 = jnp.where(wrapt, 0, t2)
    n2 = jnp.where(wrapt, n + 1, n)
    return n2, t2, b2, wrapb


def _kernel_win(starts_ref, ii_hbm, a_hbm, kr_ref, buf_ref, out_ref,
                a_buf, band_buf, sem_a, sem, *, nl, tile_v, wh, ww, C, n_out,
                a_slots=2, S=1):
    del buf_ref  # aliased onto out_ref: carries the other buckets' tiles
    """Window-layout forward: DMA a compact 2D (wh, ww) feature window and
    flatten it into the matmul's contraction axis. The (wh, ww, C) ->
    (wh*ww, C) reshape is layout-free because ww is 16-aligned (sublane
    tile), so no data movement happens on-chip.

    Fully pipelined across grid steps: the window for step k+1 (computed
    from the successor indices — the scalar-prefetched starts make them
    known) and the A tile for the next (camera, tile) are in flight while
    step k computes. The A tile is DMA'd manually into a 2-slot scratch:
    a pipelined BlockSpec double-buffer of A would blow the 16 MB VMEM
    budget on the widest bucket, but two slots of A + one band window fit
    under the build-time band cap. Safe at any B: all reads come from
    read-only inputs.

    S packs that many SCENES into one grid step (grid B axis = scenes/S):
    the per-step Mosaic/DMA-issue overhead (measured ~4.3 us/step vs
    ~0.8 us of MXU work at MultiviewC shapes) is amortized S-fold — the S
    window DMAs fly concurrently and the S dots run back to back on one
    resident A tile."""
    n = pl.program_id(0)
    t = pl.program_id(1)
    b = pl.program_id(2)
    N = pl.num_programs(0)
    T = pl.num_programs(1)
    B = pl.num_programs(2)          # scene GROUPS (scenes / S)
    k = b + B * (t + T * n)
    slot = k % 2
    first = k == 0
    last = (n == N - 1) & (t == T - 1) & (b == B - 1)

    base = 2 * (n * T + t)
    ry = starts_ref[base]
    rx = pl.multiple_of(starts_ref[base + 1], 8)

    def dma_a(n_, t_, sl):
        return pltpu.make_async_copy(a_hbm.at[n_, t_], a_buf.at[sl], sem_a.at[sl])

    def band_dmas(sl, n_, b_, ry_, rx_):
        return [pltpu.make_async_copy(
            ii_hbm.at[n_, b_ * S + s, pl.ds(ry_, wh), pl.ds(rx_, ww), :],
            band_buf.at[sl, s],
            sem.at[sl, s],
        ) for s in range(S)]

    tt = t + T * n
    a_sl = tt % 2 if a_slots == 2 else 0

    @pl.when(first)
    def _():
        dma_a(n, t, a_sl).start()
        for d in band_dmas(slot, n, b, ry, rx):
            d.start()

    # prefetch the next step's window (and next tile's A) into the free slot
    n2, t2, b2, new_tile = _next_step(n, t, b, T, B)
    n2c = jnp.minimum(n2, N - 1)
    base2 = 2 * (n2c * T + t2)
    ry2 = starts_ref[base2]
    rx2 = pl.multiple_of(starts_ref[base2 + 1], 8)

    @pl.when(jnp.logical_not(last))
    def _():
        for d in band_dmas(1 - slot, n2c, b2, ry2, rx2):
            d.start()

        if a_slots == 2:
            @pl.when(new_tile)
            def _():
                dma_a(n2c, t2, (t2 + T * n2c) % 2).start()

    if a_slots == 1:
        # single A slot: fetch at each tile's first scene step (small stall)
        @pl.when((b == 0) & jnp.logical_not(first))
        def _():
            dma_a(n, t, 0).start()

    for d in band_dmas(slot, n, b, ry, rx):
        d.wait()

    @pl.when(b == 0)
    def _():
        dma_a(n, t, a_sl).wait()

    for s in range(S):
        window = band_buf[slot, s].reshape(wh * ww, C)
        vox = jax.lax.dot_general(
            a_buf[a_sl], window,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                          # (nl*tv, C)
        vox = vox.astype(kr_ref.dtype).reshape(nl, tile_v, C)
        acc = jnp.zeros((tile_v, n_out), jnp.float32)
        for l in range(nl):
            acc = acc + jax.lax.dot_general(
                vox[l], kr_ref[l],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out_ref[0, s] = acc.astype(out_ref.dtype)


def _bwd_kernel_win_pipe(starts_ref, ii_hbm, a_hbm, kr_ref, g_ref, dii_in_hbm,
                         dii_hbm, dkr_ref, a_buf, band_buf, dband_buf,
                         dvox_buf, sem_a, sem_b, sem_d, sem_w,
                         *, nl, tile_v, wh, ww, C, n_out, a_slots, S=1):
    """Pipelined window VJP: the serial variant waits 4 DMAs per grid step
    and is pure latency (~6k steps/scene-batch); this one overlaps them.

    Correctness of the overlap: consecutive grid steps process DIFFERENT
    scene groups (b is the fastest axis), so their dII windows live in
    disjoint HBM slices — the reads for step k+1 may fly while step k's
    writes are in flight. Same-scene writes are B steps apart and the
    2-slot discipline (a write is waited before its slot is reused, one
    step later) has them complete before any same-scene read. Requires
    >= 2 scene groups; fewer use the serial kernel. DMA waits only need
    the byte count, so a descriptor rebuilt with the current step's
    indices waits a prior step's transfer.

    a_slots=2 additionally prefetches the next tile's A during the current
    tile's last scene step (static choice: only when 2 A tiles fit VMEM).

    S packs that many scenes per grid step (see `_kernel_win`): the S
    window reads / dII reads / dII writes fly concurrently and the per-step
    Mosaic overhead is amortized S-fold."""
    n = pl.program_id(0)
    t = pl.program_id(1)
    b = pl.program_id(2)
    N = pl.num_programs(0)
    T = pl.num_programs(1)
    B = pl.num_programs(2)          # scene GROUPS (scenes / S)
    k = b + B * (t + T * n)
    slot = k % 2
    first = k == 0
    last = (n == N - 1) & (t == T - 1) & (b == B - 1)

    base = 2 * (n * T + t)
    ry = starts_ref[base]
    rx = pl.multiple_of(starts_ref[base + 1], 8)

    a_sl = (t + T * n) % 2 if a_slots == 2 else 0

    def dma_a(n_, t_, sl):
        return pltpu.make_async_copy(a_hbm.at[n_, t_], a_buf.at[sl],
                                     sem_a.at[sl])

    def band_rds(sl, n_, b_, ry_, rx_):
        return [pltpu.make_async_copy(
            ii_hbm.at[n_, b_ * S + s, pl.ds(ry_, wh), pl.ds(rx_, ww), :],
            band_buf.at[sl, s], sem_b.at[sl, s]) for s in range(S)]

    def dii_rds(sl, n_, b_, ry_, rx_):
        return [pltpu.make_async_copy(
            dii_hbm.at[n_, b_ * S + s, pl.ds(ry_, wh), pl.ds(rx_, ww), :],
            dband_buf.at[sl, s], sem_d.at[sl, s]) for s in range(S)]

    def dii_wrs(sl, n_, b_, ry_, rx_):
        return [pltpu.make_async_copy(
            dband_buf.at[sl, s],
            dii_hbm.at[n_, b_ * S + s, pl.ds(ry_, wh), pl.ds(rx_, ww), :],
            sem_w.at[sl, s]) for s in range(S)]

    @pl.when(first)
    def _():
        dkr_ref[:] = jnp.zeros_like(dkr_ref)
        dma_a(n, t, a_sl).start()
        for d in band_rds(slot, n, b, ry, rx):
            d.start()
        for d in dii_rds(slot, n, b, ry, rx):
            d.start()

    n2, t2, b2, new_tile = _next_step(n, t, b, T, B)
    n2c = jnp.minimum(n2, N - 1)
    base2 = 2 * (n2c * T + t2)
    ry2 = starts_ref[base2]
    rx2 = pl.multiple_of(starts_ref[base2 + 1], 8)
    nslot = 1 - slot

    @pl.when(jnp.logical_not(last))
    def _():
        # the writes that used nslot (issued at step k-1) must land before
        # the slot is refilled
        @pl.when(jnp.logical_not(first))
        def _():
            for d in dii_wrs(nslot, n, b, ry, rx):
                d.wait()

        for d in band_rds(nslot, n2c, b2, ry2, rx2):
            d.start()
        for d in dii_rds(nslot, n2c, b2, ry2, rx2):
            d.start()
        if a_slots == 2:
            @pl.when(new_tile)
            def _():
                dma_a(n2c, t2, (t2 + T * n2c) % 2).start()

    if a_slots == 1:
        @pl.when((b == 0) & jnp.logical_not(first))
        def _():
            dma_a(n, t, 0).start()

    for d in band_rds(slot, n, b, ry, rx):
        d.wait()
    for d in dii_rds(slot, n, b, ry, rx):
        d.wait()

    @pl.when(b == 0)
    def _():
        dma_a(n, t, a_sl).wait()

    # per scene: ONE (rows, band) x (band, C) forward-recompute dot and ONE
    # (band, rows) x (rows, C) window-gradient dot (contraction = rows =
    # nl*tile_v, a full MXU pass) instead of nl tile_v-contraction dots —
    # the per-layer work that remains (dKr blocks, dvox staging) contracts
    # only tile_v x n_out
    a_t = a_buf[a_sl]                                    # (rows, wh*ww)
    for s in range(S):
        g = g_ref[0, s]                                  # (tile_v, n_out)
        window = band_buf[slot, s].reshape(wh * ww, C)
        vox = jax.lax.dot_general(
            a_t, window,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (rows, C)
        for l in range(nl):
            dkr_ref[l] += jax.lax.dot_general(
                vox[l * tile_v:(l + 1) * tile_v], g,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dvox_buf[l * tile_v:(l + 1) * tile_v] = jax.lax.dot_general(
                g, kr_ref[l],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                            # (tile_v, C)
        # the running dII window may be bf16 (bf16 training halves the RMW
        # traffic); the add itself runs in fp32 and rounds once on store
        dband_buf[slot, s] = (
            dband_buf[slot, s].astype(jnp.float32)
            + jax.lax.dot_general(
                a_t, dvox_buf[...],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(wh, ww, C)
        ).astype(dband_buf.dtype)

    for d in dii_wrs(slot, n, b, ry, rx):
        d.start()

    @pl.when(last)
    def _():
        # drain: the writes issued at step K-2 (other slot) are only waited
        # in the ~last prefetch block, which the final step skips — wait
        # them here along with this step's own writes
        @pl.when(jnp.logical_not(first))
        def _():
            for d in dii_wrs(nslot, n, b, ry, rx):
                d.wait()

        for d in dii_wrs(slot, n, b, ry, rx):
            d.wait()


def _bwd_kernel_win(starts_ref, ii_hbm, a_hbm, kr_ref, g_ref, dii_in_hbm,
                    dii_hbm, dkr_ref, a_buf, band_buf, dband_buf,
                    sem_a, sem, dsem, *, nl, tile_v, wh, ww, C, n_out):
    """Window-layout VJP: same transposed banded matmul as `_bwd_kernel`,
    with the 2D-window DMA and in-place accumulation into the (fh, fw)
    gradient image. The A tile is manually single-buffered (see
    `_kernel_win`)."""
    n = pl.program_id(0)
    t = pl.program_id(1)
    b = pl.program_id(2)

    base = 2 * (n * pl.num_programs(1) + t)
    ry = starts_ref[base]
    rx = pl.multiple_of(starts_ref[base + 1], 8)

    def dma_a():
        return pltpu.make_async_copy(a_hbm.at[n, t], a_buf, sem_a)

    @pl.when(b == 0)
    def _():
        dma_a().start()

    cp_in = pltpu.make_async_copy(
        ii_hbm.at[n, b, pl.ds(ry, wh), pl.ds(rx, ww), :], band_buf, sem)
    cp_in.start()

    @pl.when((n == 0) & (t == 0) & (b == 0))
    def _():
        dkr_ref[:] = jnp.zeros_like(dkr_ref)

    rd = pltpu.make_async_copy(
        dii_hbm.at[n, b, pl.ds(ry, wh), pl.ds(rx, ww), :], dband_buf, dsem)
    rd.start()

    g = g_ref[0, 0]                                      # (tile_v, n_out)
    cp_in.wait()

    @pl.when(b == 0)
    def _():
        dma_a().wait()

    window = band_buf[...].reshape(wh * ww, C)
    rd.wait()

    for l in range(nl):
        a_l = a_buf[l * tile_v:(l + 1) * tile_v]         # (tile_v, wh*ww)
        vox_l = jax.lax.dot_general(
            a_l, window,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (tile_v, C)
        dkr_ref[l] += jax.lax.dot_general(
            vox_l, g,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dv_l = jax.lax.dot_general(
            g, kr_ref[l],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (tile_v, C)
        # accumulate straight into the DMA scratch: a separate (wh*ww, C)
        # fp32 accumulator plus an fp32 copy of a_l blew the VMEM stack.
        # The scratch may be bf16 (bf16 training); add in fp32, round once.
        dband_buf[...] = (
            dband_buf[...].astype(jnp.float32)
            + jax.lax.dot_general(
                a_l, dv_l,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(wh, ww, C)
        ).astype(dband_buf.dtype)

    wr = pltpu.make_async_copy(
        dband_buf, dii_hbm.at[n, b, pl.ds(ry, wh), pl.ds(rx, ww), :], dsem)
    wr.start()
    wr.wait()  # the next grid step may touch an overlapping window


def _bwd_kernel(starts_ref, ii_hbm, a_ref, kr_ref, g_ref, dii_in_hbm,
                dii_hbm, dkr_ref, band_buf, dband_buf, sem, dsem,
                *, nl, tile_v, band, C, n_out):
    """Transposed banded matmul: the VJP of `_kernel`.

    Per (camera n, tile t, scene b), with g the cotangent of the fwd tile:
        band   = II[start : start+band]              (recomputed, DMA)
        vox_l  = A_l @ band                          (fwd recompute)
        dKr_l += vox_l^T @ g                         (VMEM-resident block)
        dv_l   = g @ Kr_l^T
        dband  = sum_l A_l^T @ dv_l
        dII[start : start+band] += dband             (HBM read-modify-write;
                                                      grid is sequential so
                                                      overlapping bands from
                                                      different tiles are safe)
    dII arrives as an aliased fp32 accumulator (zeros for the scale's first
    bucket, the running sum for later ones — see `_make_scale_op`), so
    untouched pixels keep their prior value without an explicit clear pass.
    """
    n = pl.program_id(0)
    t = pl.program_id(1)
    b = pl.program_id(2)

    start = pl.multiple_of(starts_ref[n * pl.num_programs(1) + t], 8)

    # recompute the feature band (same DMA as forward)
    cp_in = pltpu.make_async_copy(
        ii_hbm.at[n, b, pl.ds(start, band), :], band_buf, sem)
    cp_in.start()

    @pl.when((n == 0) & (t == 0) & (b == 0))
    def _():
        dkr_ref[:] = jnp.zeros_like(dkr_ref)

    # read the current dII band while the feature band is in flight
    rd = pltpu.make_async_copy(
        dii_hbm.at[n, b, pl.ds(start, band), :], dband_buf, dsem)
    rd.start()

    g = g_ref[0, 0]                                      # (tile_v, n_out)
    cp_in.wait()

    dband = jnp.zeros((band, C), jnp.float32)
    for l in range(nl):
        a_l = a_ref[0, 0, l * tile_v:(l + 1) * tile_v]   # (tile_v, band)
        vox_l = jax.lax.dot_general(                     # fwd recompute
            a_l, band_buf[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (tile_v, C)
        dkr_ref[l] += jax.lax.dot_general(               # vox_l^T @ g
            vox_l, g,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (C, n_out)
        dv_l = jax.lax.dot_general(                      # g @ Kr_l^T
            g, kr_ref[l],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (tile_v, C)
        dband += jax.lax.dot_general(                    # A_l^T @ dv_l
            a_l.astype(jnp.float32), dv_l,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (band, C)

    rd.wait()
    dband_buf[...] = (dband_buf[...].astype(jnp.float32)
                      + dband).astype(dband_buf.dtype)
    wr = pltpu.make_async_copy(
        dband_buf, dii_hbm.at[n, b, pl.ds(start, band), :], dsem)
    wr.start()
    wr.wait()  # the next grid step may read an overlapping band


def _check_window_vmem(kind, need_bytes, *, band, a_dtype, f_dtype):
    """Runtime guard for mixed-precision window kernels.

    The build-time band cap (ops/rig.py:_build_scale_window) models matched
    precision (features in the rig dtype). When fp32 features flow through a
    cached bf16 rig the scratch can exceed the 16 MB VMEM even though the
    bucketing passed the cap — fail with remediation instead of a Mosaic
    compile blowup."""
    limit = int(15.5e6)
    if need_bytes > limit:
        raise ValueError(
            f"window {kind} kernel needs ~{need_bytes / 1e6:.1f} MB VMEM "
            f"(band {band}, A {a_dtype}, features {f_dtype}) > "
            f"{limit / 1e6:.1f} MB: this mixed-precision combination "
            "exceeds what the rig's band bucketing guarantees. Use matched "
            "precision (build the rig with dtype matching the features, "
            "e.g. --dtype bfloat16 training), more rig buckets, or the "
            "flat/XLA layout.")


def _bucket_fwd_call(starts, ii, A_b, Kr, buf, *, N, T, B, nl, tile_v, band,
                     C, n_out, off_t, buf_shape, interpret, window=None):
    """Write this bucket's (N, B, T, tile_v, n_out) tiles into `buf` — the
    scale's full `buf_shape` = (N, B, T_total, tile_v, n_out) fp32 tiles
    buffer — at tile offset `off_t`, in place via input/output aliasing (the
    same pattern the backward uses for its dII accumulator). Bucket outputs
    land pre-concatenated, so the epilogue's full-size bucket concat copy (a
    5.6 GB HBM temp at the grid2x stretch config) disappears.

    `buf is None` means this is the FIRST bucket: it allocates the full
    buffer itself (un-aliased, uninitialized outside its own tile range —
    later buckets fill the rest). A zeros-init + alias would cost a full
    extra HBM write sweep of the buffer (~1.4 GB/scale at MultiviewC
    batch 16, measured -4.6% inference throughput).

    The buffer dtype matches the FEATURE dtype (the MXU accumulation stays
    fp32 in VMEM; only the HBM store rounds): fp32 features keep the exact
    fp32 tiles the parity tests pin, bf16 halves the dominant HBM temps —
    the tiles write + the inv_perm gather copy were the two 5.6 GB fp32
    allocations that capped the grid2x batch."""
    out_shape = jax.ShapeDtypeStruct(buf_shape, ii.dtype)
    if buf is None:
        buf_in_specs, aliases, buf_args = [], {}, ()
    else:
        buf_in_specs = [pl.BlockSpec(memory_space=pl.ANY)]  # buf (aliased)
        # input index 4 counting the scalar prefetch arg
        aliases, buf_args = {4: 0}, (buf,)

    def _with_buf(inner):
        if buf is None:
            return lambda s_, i_, a_, k_, o_, *sc: inner(s_, i_, a_, k_,
                                                         None, o_, *sc)
        return inner

    if window is None:
        kernel = _with_buf(functools.partial(
            _kernel, nl=nl, tile_v=tile_v, band=band, C=C, n_out=n_out))
        a_spec = pl.BlockSpec((1, 1, nl * tile_v, band),
                              lambda n, t, b, *_: (n, t, 0, 0),
                              memory_space=pltpu.VMEM)
        scratches = [
            pltpu.VMEM((2, band, C), ii.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        wh, ww = window
        rows = nl * tile_v
        # A stays in HBM, manually buffered; 2 slots (prefetching the next
        # tile's A) when VMEM allows — dtype-aware: fp32 feature windows
        # (parity eval) double the band scratch vs bf16
        budget = int(12.0e6) - rows * C * 4  # minus the vox fp32 temp
        per2 = 2 * rows * A_b.dtype.itemsize + 2 * C * ii.dtype.itemsize
        per1 = rows * A_b.dtype.itemsize + 2 * C * ii.dtype.itemsize
        a_slots = 2 if band * per2 <= budget else 1
        if band * per1 > budget:
            _check_window_vmem(
                "fwd", band * per1 + (int(16.0e6) - budget),
                band=band, a_dtype=A_b.dtype, f_dtype=ii.dtype)
        # scene packing: largest S with S | B whose extra window buffers
        # still fit the budget (per-step overhead is amortized S-fold)
        a_bytes = a_slots * rows * band * A_b.dtype.itemsize
        S = 1
        for cand in (8, 4, 2):
            if B % cand == 0 and (a_bytes + 2 * cand * band * C
                                  * ii.dtype.itemsize) <= budget:
                S = cand
                break
        kernel = _with_buf(functools.partial(
            _kernel_win, nl=nl, tile_v=tile_v, wh=wh, ww=ww, C=C, n_out=n_out,
            a_slots=a_slots, S=S))
        a_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratches = [
            pltpu.VMEM((a_slots, nl * tile_v, band), A_b.dtype),
            pltpu.VMEM((2, S, wh, ww, C), ii.dtype),
            pltpu.SemaphoreType.DMA((a_slots,)),
            pltpu.SemaphoreType.DMA((2, S)),
        ]
        # tiles are written DIRECTLY in scene-major (N, B, (off_t + t) *
        # tile_v, ...) position in the shared buffer via the index_map: the
        # old (N, T, B, ...) layout needed a full jnp.transpose copy of every
        # bucket's tiles (a 2.8 GB HBM round trip per scale at MultiviewC
        # batch 16) before a full-size bucket concat copy. The buffer's row
        # axis is pre-flattened to T_total*tile_v (block coord off_t + t on
        # block size tile_v): a separate 5-D buffer needed a (T, tile_v) ->
        # rows reshape in the epilogue that XLA materialized as a full copy
        # (11 ms/scene at the grid2x stretch config).
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N, T, B // S),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),          # ii (HBM)
                a_spec,                                     # A tile
                pl.BlockSpec(memory_space=pltpu.VMEM),      # Kr
            ] + buf_in_specs,
            out_specs=pl.BlockSpec(
                (1, S, tile_v, n_out),
                lambda n, t, b, *_: (n, b, off_t + t, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=scratches,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            # alias the running tiles buffer onto the output: this bucket
            # writes only its own tile range, earlier buckets' tiles ride
            # through
            input_output_aliases=aliases,
            interpret=interpret,
            # all-arbitrary: the window kernel pipelines DMA state across
            # EVERY grid dimension (lexicographic step order is
            # load-bearing), so no axis may be declared parallel
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",) * 3,
            ),
        )(starts, ii, A_b, Kr, *buf_args)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N, T, B),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),              # ii (HBM)
            a_spec,                                         # A tile
            pl.BlockSpec(memory_space=pltpu.VMEM),          # Kr
        ] + buf_in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, tile_v, n_out),
            lambda n, t, b, *_: (n, b, off_t + t, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=scratches,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
    )(starts, ii, A_b, Kr, *buf_args)


def _bucket_bwd_call(starts, ii, A_b, Kr, g, dii_init, *, N, T, B, nl, tile_v,
                     band, C, n_out, off_t, interpret, window=None):
    # the dII accumulator matches the feature dtype (see _make_scale_op);
    # all scratch sizing below must use its itemsize, never assume fp32
    acc_it = dii_init.dtype.itemsize
    if window is None:
        kernel = functools.partial(
            _bwd_kernel, nl=nl, tile_v=tile_v, band=band, C=C, n_out=n_out)
        dii_shape = (N, B, ii.shape[2], C)
        a_spec = pl.BlockSpec((1, 1, nl * tile_v, band),
                              lambda n, t, b, *_: (n, t, 0, 0),
                              memory_space=pltpu.VMEM)
        scratches = [
            pltpu.VMEM((band, C), ii.dtype),                # feature band
            pltpu.VMEM((band, C), dii_init.dtype),          # dII band
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ]
    else:
        wh, ww = window
        rows = nl * tile_v
        dii_shape = (N, B, ii.shape[2], ii.shape[3], C)
        a_spec = pl.BlockSpec(memory_space=pl.ANY)
        # static pipeline choice: the pipelined kernel needs B >= 2 (scene
        # disjointness is what makes overlapping the dII RMW safe) and
        # double-buffered windows in VMEM; A gets 2 slots when they fit
        # per band element: a_slots*rows (A) + 2*C (band windows)
        # + 2*C (dII windows) + C*4 (dband fp32 dot output)
        # dtype-aware: fp32 feature windows (parity eval/default training)
        # double both the band and dII scratch vs bf16
        budget = int(9.5e6)
        per = 2 * C * ii.dtype.itemsize + 2 * C * acc_it + C * 4
        fits2 = band * (2 * rows * A_b.dtype.itemsize + per) <= budget
        fits1 = band * (rows * A_b.dtype.itemsize + per) <= budget
        if B >= 2 and (fits1 or fits2):
            a_slots = 2 if fits2 else 1
            # scene packing (see _kernel_win): largest S with at least 2
            # scene groups (the pipelined write/read hazard argument needs
            # consecutive steps on different scenes) whose extra window +
            # dII buffers fit the budget
            a_bytes = a_slots * rows * band * A_b.dtype.itemsize
            per_s = 2 * band * C * (ii.dtype.itemsize + acc_it)
            S = 1
            for cand in (4, 2):
                if (B % cand == 0 and B // cand >= 2
                        and a_bytes + cand * per_s + band * C * 4 <= budget):
                    S = cand
                    break
            kernel = functools.partial(
                _bwd_kernel_win_pipe, nl=nl, tile_v=tile_v, wh=wh, ww=ww,
                C=C, n_out=n_out, a_slots=a_slots, S=S)
            scratches = [
                pltpu.VMEM((a_slots, rows, band), A_b.dtype),  # A tiles
                pltpu.VMEM((2, S, wh, ww, C), ii.dtype),    # feature windows
                pltpu.VMEM((2, S, wh, ww, C), dii_init.dtype),  # dII windows
                pltpu.VMEM((rows, C), jnp.float32),         # dvox staging
                pltpu.SemaphoreType.DMA((a_slots,)),
                pltpu.SemaphoreType.DMA((2, S)),
                pltpu.SemaphoreType.DMA((2, S)),
                pltpu.SemaphoreType.DMA((2, S)),
            ]
        else:
            # serial fallback: A single-buffered, one feature + one dII
            # window, plus the (band, C) fp32 dot output before the
            # accumulate; Kr/dKr fp32 + g tile + slack modeled at 3 MB
            per_serial = (rows * A_b.dtype.itemsize
                          + C * ii.dtype.itemsize + C * acc_it + C * 4)
            _check_window_vmem(
                "bwd", band * per_serial + int(3.0e6),
                band=band, a_dtype=A_b.dtype, f_dtype=ii.dtype)
            kernel = functools.partial(
                _bwd_kernel_win, nl=nl, tile_v=tile_v, wh=wh, ww=ww, C=C,
                n_out=n_out)
            scratches = [
                pltpu.VMEM((rows, band), A_b.dtype),        # A tile
                pltpu.VMEM((wh, ww, C), ii.dtype),          # feature window
                pltpu.VMEM((wh, ww, C), dii_init.dtype),    # dII window
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ]
    # g is the whole scale's (N, B, T_total*tile_v, n_out) cotangent in the
    # forward's scene-major layout; this bucket reads its tile range via the
    # off_t block offset (S-packed kernels take S scenes per block)
    S_pack = getattr(kernel, "keywords", {}).get("S")
    if S_pack:
        grid_b = B // S_pack
        g_spec = pl.BlockSpec((1, S_pack, tile_v, n_out),
                              lambda n, t, b, *_: (n, b, off_t + t, 0),
                              memory_space=pltpu.VMEM)
    else:
        grid_b = B
        g_spec = pl.BlockSpec((1, 1, tile_v, n_out),
                              lambda n, t, b, *_: (n, b, off_t + t, 0),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N, T, grid_b),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),              # ii (HBM)
            a_spec,                                         # A tile
            pl.BlockSpec(memory_space=pltpu.VMEM),          # Kr
            g_spec,                                         # g tile
            pl.BlockSpec(memory_space=pl.ANY),              # dII init (HBM)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),              # dII (aliased)
            pl.BlockSpec((nl, C, n_out), lambda n, t, b, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),          # dKr (resident)
        ),
        scratch_shapes=scratches,
    )
    assert dii_init.shape == dii_shape and dii_init.dtype == ii.dtype
    dii, dkr = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(dii_shape, dii_init.dtype),
            jax.ShapeDtypeStruct((nl, C, n_out), jnp.float32),
        ),
        # alias the zeros-filled dII init (input 5 counting the scalar
        # prefetch arg) onto output 0 so accumulation is in place
        input_output_aliases={5: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
    )(starts, ii, A_b, Kr, g, dii_init)
    return dii, dkr


def _make_scale_op(*, N, B, nl, tile_v, C, n_out, interpret, buckets):
    """custom-VJP'd per-SCALE sampling op:
    (starts_all, ii, A_all, Kr) -> ONE (N, B, T_total*tile_v, n_out) tiles
    buffer in the FEATURE dtype, all buckets pre-concatenated with the row
    axis already flat (ready for the inv_perm gather, no reshape copy).

    `buckets` is a static tuple of (T, band, window) per band bucket. The
    bwd is the hand-written transposed-banded-matmul kernel above. One VJP
    for the whole scale (rather than per bucket) so the dII accumulator is
    a SINGLE image-sized buffer threaded through the bucket kernels via
    their input/output aliasing — per-bucket VJPs each zero-filled their
    own full-size dII (1.1 GB at MultiviewC scale 0) and left XLA to sum
    all of them, which was pure HBM traffic. The forward threads its tiles
    buffer the same way (each bucket writes its own tile range in place),
    so no bucket-concat copy exists either. The dII accumulator matches
    the feature dtype: fp32 features accumulate exactly (the grad-parity
    tests), bf16 training halves the read-modify-write traffic — each
    window's contribution is still computed in fp32 and only the cross-
    window accumulation rounds (a few overlapping windows per pixel). A and
    starts are rig structure (never trained), so their cotangents are DCE'd
    zeros and float0s."""
    common = dict(N=N, B=B, nl=nl, tile_v=tile_v, C=C, n_out=n_out,
                  interpret=interpret)
    T_total = sum(T for T, _, _ in buckets)
    offs = []
    off = 0
    for T, _, _ in buckets:
        offs.append(off)
        off += T

    buf_shape = (N, B, T_total * tile_v, n_out)

    @jax.custom_vjp
    def op(starts_all, ii, A_all, Kr):
        buf = None  # bucket 0 allocates the full buffer (no zeros sweep)
        for s, A_b, off_t, (T, band, window) in zip(starts_all, A_all, offs,
                                                    buckets):
            buf = _bucket_fwd_call(s, ii, A_b, Kr, buf, T=T, band=band,
                                   window=window, off_t=off_t,
                                   buf_shape=buf_shape, **common)
        return buf

    def fwd(starts_all, ii, A_all, Kr):
        return op(starts_all, ii, A_all, Kr), (starts_all, ii, A_all, Kr)

    def bwd(res, g):
        starts_all, ii, A_all, Kr = res
        if buckets[0][2] is None:
            dii_shape = (N, B, ii.shape[2], C)
        else:
            dii_shape = (N, B, ii.shape[2], ii.shape[3], C)
        dii = jnp.zeros(dii_shape, ii.dtype)
        dkr = jnp.zeros((nl, C, n_out), jnp.float32)
        for s, A_b, off_t, (T, band, window) in zip(starts_all, A_all, offs,
                                                    buckets):
            dii, dkr_b = _bucket_bwd_call(
                s, ii, A_b, Kr, g, dii, T=T, band=band, window=window,
                off_t=off_t, **common)
            dkr = dkr + dkr_b
        import numpy as np

        return (tuple(np.zeros(s.shape, dtype=jax.dtypes.float0)
                      for s in starts_all),
                dii.astype(ii.dtype),
                tuple(jnp.zeros_like(a) for a in A_all),
                dkr.astype(Kr.dtype))

    op.defvjp(fwd, bwd)
    return op


@jax.custom_vjp
def _bev_unpermute(tiles, inv_perm):
    """Un-permute tile rows to BEV cell order.

    tiles (N, B, rows, C) gathered by inv_perm (N, V2d) -> (N, B, V2d, C).
    inv_perm is INJECTIVE (each BEV cell lives in exactly one tile row;
    padded rows are unused), so the VJP is itself a gather by the inverse
    map — XLA can't see the injectivity and emits zeros+scatter per scale
    for the autodiff transpose (measured 5.5 ms/scene of kCustom scatter
    fusions plus their 700 MB zero-init broadcasts at MultiviewC batch 8);
    the inverse-gather with OOB fill (pad rows take 0) replaces all of it.
    """
    return jax.vmap(lambda t_n, p_n: jnp.take(t_n, p_n, axis=1))(
        tiles, inv_perm)


def _bev_unpermute_fwd(tiles, inv_perm):
    return _bev_unpermute(tiles, inv_perm), (inv_perm, tiles.shape[2])


def _bev_unpermute_bwd(res, g):
    inv_perm, rows = res
    n_cam, v2d = inv_perm.shape
    # invert the permutation on the fly: tiny (N, rows) int32 scatter.
    # Unused (pad) rows keep index 0 — their cotangent is then a stale copy
    # of cell 0's, NOT zero, which is correct-by-construction: pad tile rows
    # correspond to A rows that are all-zero (no raster entries), so every
    # downstream product (dKr's vox rows, dII's A^T columns) vanishes
    # regardless of the pad cotangent value. An OOB fill-with-0 gather
    # (mode="fill") spent a full extra select_n sweep over the buffer
    # (7 ms/scene at the grid2x stretch config) buying nothing.
    fwd = jnp.zeros((n_cam, rows), jnp.int32)
    fwd = fwd.at[jnp.arange(n_cam)[:, None], inv_perm].set(
        jnp.broadcast_to(jnp.arange(v2d, dtype=jnp.int32), (n_cam, v2d)))
    dt = jax.vmap(lambda g_n, f_n: jnp.take(g_n, f_n, axis=1,
                                            mode="clip"))(g, fwd)
    import numpy as np

    return dt, np.zeros(inv_perm.shape, dtype=jax.dtypes.float0)


_bev_unpermute.defvjp(_bev_unpermute_fwd, _bev_unpermute_bwd)


def rig_sample_scale_pallas(lat, rig: ScaleRig, collapse_kernel, collapse_bias,
                            out_dtype=None, interpret=False,
                            camera_sum=False):
    """Drop-in replacement for `ops.rig.rig_sample_scale` running the fused
    Pallas kernel. Same contract: lat (B, N, fh, fw, C) ->
    (B, N, V2d, n_out) with relu(collapse(vox)) un-permuted to BEV order.

    Differentiable: each bucket's pallas_call carries a custom VJP whose
    backward is a second fused kernel (transposed banded matmul with in-place
    HBM accumulation), so training runs the fused path end to end. Best
    tile_v for VMEM/throughput: 160 (measured 18.4 ms/scene vs 21.7 XLA)."""
    B, N, fh, fw, C = lat.shape
    P = fh * fw
    nl, tile_v = rig.nl, rig.tile_v
    max_band = max(a.shape[-1] for a in rig.A)
    n_out = collapse_kernel.shape[-1]
    out_dtype = out_dtype or lat.dtype
    # pallas compiles only for TPU; on CPU (tests, smoke CLIs) fall back to
    # the interpreter so `--rig_impl pallas` works everywhere
    interpret = interpret or jax.default_backend() == "cpu"

    if rig.window_hw:
        # 2D window layout: features stay (N, B, fh, fw, C); origins are
        # build-time clamped into the aligned image, so only alignment
        # padding is needed
        assert rig.on_raw
        ii = jnp.swapaxes(lat, 0, 1)                   # (N, B, fh, fw, C)
        rup = lambda x, m: (x + m - 1) // m * m
        ii = jnp.pad(ii, ((0, 0), (0, 0), (0, rup(fh, 8) - fh),
                          (0, rup(fw, 16) - fw), (0, 0)))
    else:
        if rig.on_raw:
            ii = lat.reshape(B, N, P, C)  # prefix-folded A: raw features
        else:
            ii = jnp.cumsum(jnp.cumsum(lat, axis=3), axis=2).reshape(B, N, P, C)
        ii = jnp.swapaxes(ii, 0, 1)                    # (N, B, P, C)
        ii = jnp.pad(ii, ((0, 0), (0, 0), (0, max_band), (0, 0)))

    # collapse kernel regrouped per layer: K[c*nl+l, o] -> Kr[l, c, o]
    Kr = collapse_kernel.reshape(C, nl, n_out).transpose(1, 0, 2)
    Kr = Kr.astype(lat.dtype)

    buckets = tuple(
        (A_b.shape[1], A_b.shape[-1],
         tuple(rig.window_hw[bi]) if rig.window_hw else None)
        for bi, A_b in enumerate(rig.A))
    starts_all = tuple(s_b.reshape(-1).astype(jnp.int32)
                       for s_b in rig.starts)       # (N*T,) | (N*T*2,) each

    op = _make_scale_op(N=N, B=B, nl=nl, tile_v=tile_v, C=C, n_out=n_out,
                        interpret=interpret, buckets=buckets)
    tiles = op(starts_all, ii, tuple(rig.A), Kr)  # (N, B, rows, n_out)

    # tiles come out of the kernels already scene-major, bucket-concatenated
    # AND row-flat (each bucket writes its tile range of the shared buffer
    # in place — see _bucket_fwd_call), so no reshape copy exists. The
    # inv_perm gather runs BEFORE the bias+relu: they commute (bias is
    # per-channel, the permutation per-cell), and this order lets XLA fuse
    # relu(x + bias) into the caller's camera-sum reduce instead of
    # materializing a second full (N, B, V2d, n_out) temp. The bias add
    # stays in the tiles dtype — casting it to fp32 would promote the whole
    # gather output back to fp32 and undo the bf16 traffic halving.
    out = _bev_unpermute(tiles, rig.inv_perm)           # (N, B, V2d, n_out)
    out = jax.nn.relu(out + collapse_bias.astype(out.dtype))
    if camera_sum:
        # fold the cross-camera reduction into the epilogue: XLA fuses
        # gather+relu+reduce and never materializes the (B, N, V2d, n_out)
        # out_dtype map — at MultiviewC batch 8 that map was 4.2 GB of
        # fp32 per step (10.6 ms of near-roofline copy, the largest
        # forward-side temp in the whole train step)
        return jnp.sum(out.astype(out_dtype), axis=0)   # (B, V2d, n_out)
    return jnp.swapaxes(out, 0, 1).astype(out_dtype)
