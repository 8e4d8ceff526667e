"""Fused stem tail: GroupNorm(16) + ReLU + 3x3/stride-2 max-pool.

Reference chain: `vfa/model/resnet.py:100-102,139-140` — the stem's
norm + activation + pool right after conv1, running on the largest
activation in the whole network ((B*N, 360, 640, 64) at full scale,
1.65 GB bf16 at train batch 8).

The FORWARD here is the exact flax op sequence (fp32 fast-variance
stats, normalize, affine, cast, relu, reduce-window max with -inf edge
padding) — numerics unchanged, so the reference-parity tests are
untouched. The BACKWARD replaces what XLA schedules for the chain's VJP
— a SelectAndScatter for the pool plus multi-pass GroupNorm reductions,
each re-reading stored activations — with two fused Pallas kernels that
recompute z/a/pool-argmax from the conv1 activation in VMEM:

  B1: one pass over (x, dy) -> the GroupNorm reduction moments
      (sum dxhat, sum dxhat*xhat per image,group) and dscale/dbias
  B2: one pass over (x, dy, moments) -> dx

Total HBM traffic ~= 2 reads of x + 1 write of dx (+ tiny dy), and the
relu output stops being a stored residual (it was the largest one after
conv1's own output, which under HBM pressure XLA compressed and
uncompressed across the step).

Max-pool backward tie semantics match XLA's SelectAndScatter exactly —
the gradient goes to the FIRST max position in row-major window order
(ties are common: relu plateaus at 0). The pool decomposes as W-then-H
max with first-occurrence argmax in each direction, which composes to
the row-major-first 2D argmax (first row attaining the window max, then
first column within that row).

Layout: the (M, H, W, C=64) activation is viewed as (M, H, W/2, 2C=128)
— adjacent column PAIRS packed into full 128-lane vectors (C=64 alone
wastes half the lane tile). Pooling over W becomes lane-half selects
plus one sublane shift; pooling over H is static strided slicing on the
row axis. Row blocks need a 1-row top halo and a 2-row bottom halo,
passed as separate strided-slice "strip" inputs (BlockSpec blocks
cannot overlap); image edges are masked to -inf in-kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pool(a):
    """flax nn.max_pool(a, (3, 3), (2, 2), ((1, 1), (1, 1)))."""
    import flax.linen as nn

    return nn.max_pool(a, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


def _gn_stats(x, num_groups, eps):
    """flax _compute_stats fast-variance path: fp32 E[x^2]-E[x]^2 per
    (image, group), clipped at 0. Returns (mu, var, rstd) each (M, G)."""
    M, H, W, C = x.shape
    gs = C // num_groups
    xf = x.reshape(M, H, W, num_groups, gs).astype(
        jnp.promote_types(x.dtype, jnp.float32))
    mu = xf.mean((1, 2, 4))
    mu2 = (xf * xf).mean((1, 2, 4))
    var = jnp.maximum(0.0, mu2 - mu * mu)
    return mu, var, jax.lax.rsqrt(var + eps)


def _gn_relu(x, scale, bias, num_groups, eps):
    """The exact flax GroupNorm (+ relu) op sequence
    (flax/linen/normalization.py: _compute_stats fast-variance path +
    _normalize): stats in fp32, y = (x - mean) * (rsqrt(var+eps) * scale)
    + bias, cast to result_type(x, scale, bias). Returns (relu(z), mu,
    rstd) with mu/rstd (M, G) fp32."""
    M, H, W, C = x.shape
    gs = C // num_groups
    mu, var, rstd = _gn_stats(x, num_groups, eps)
    mean = jnp.repeat(mu, gs, axis=-1)
    varr = jnp.repeat(var, gs, axis=-1)
    y = x - mean[:, None, None, :]
    mul = jax.lax.rsqrt(varr + eps)[:, None, None, :] * scale[None, None, None, :]
    y = y * mul
    y = y + bias[None, None, None, :]
    z = y.astype(jnp.result_type(x, scale, bias))
    return jax.nn.relu(z), mu, rstd


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gn_relu_pool(x, scale, bias, num_groups=16, eps=1e-5):
    a, _, _ = _gn_relu(x, scale, bias, num_groups, eps)
    return _pool(a)


def _fwd(x, scale, bias, num_groups, eps):
    # residuals are ONLY (x, scale, bias): returning mu/rstd would force
    # the stats reduction to materialize as separate HLO outputs and break
    # the forward's single fused stats+normalize+relu+pool schedule
    # (measured +1.9 ms/scene of stray max/reduce ops); the backward
    # recomputes them in one cheap fused pass instead
    return gn_relu_pool(x, scale, bias, num_groups, eps), (x, scale, bias)


def _xla_bwd(x, scale, bias, g, num_groups, eps):
    """Reference backward: autodiff of the forward chain (used on CPU and
    for shapes the Pallas kernels don't cover)."""
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _pool(_gn_relu(x_, s_, b_, num_groups, eps)[0]),
        x, scale, bias)
    return vjp(g)


def _bwd(num_groups, eps, res, g):
    x, scale, bias = res
    mu, _, rstd = _gn_stats(x, num_groups, eps)
    M, H, W, C = x.shape
    pallas_ok = (
        H % 2 == 0 and W % 2 == 0 and (W // 2) % 8 == 0
        and C % num_groups == 0 and C % 8 == 0
        and g.shape == (M, H // 2, W // 2, C)
    )
    backend = jax.default_backend()
    if pallas_ok and backend in ("tpu", "cpu"):
        # cpu runs the kernels in interpret mode (tests); the XLA autodiff
        # fallback below stays for odd shapes
        return _pallas_bwd(x, scale, bias, mu, rstd, g, num_groups, eps,
                           interpret=backend == "cpu")
    return _xla_bwd(x, scale, bias, g, num_groups, eps)


gn_relu_pool.defvjp(_fwd, _bwd)


# ------------------------------------------------------------------ pallas --


def _recompute_dz(xv, topv, b0v, b1v, dyv, dynv, ml, rl, s2, b2,
                  first_blk, last_blk, *, OHb, C, dtype):
    """Shared B1/B2 recompute: from the paired conv1-activation block (+
    halo strips) and the pooled cotangent block, rebuild a = relu(z), the
    W-then-H pool argmax selections, and back-distribute dy to dz (the
    cotangent of z) over the block rows. Returns (dz, a>0 implied in dz).

    xv (Hb, OW, 2C); topv/b0v/b1v (1, OW, 2C); dyv (OHb, OW, C);
    dynv (1, OW, C). first_blk/last_blk are traced scalars masking absent
    halos at the image edges."""
    # `a` is carried in fp32 holding the EXACT dtype-rounded forward values
    # (the round trip through `dtype` is what makes tie comparisons match
    # the stored forward); Mosaic has no bf16 compare or rotate paths, so
    # every comparison below runs on the fp32 copies.
    neg = jnp.asarray(jnp.finfo(dtype).min, jnp.float32)

    def act(v):
        zf = (v.astype(jnp.float32) - ml) * rl * s2 + b2
        return jax.nn.relu(zf.astype(dtype)).astype(jnp.float32)

    a = act(xv)
    atop = jnp.where(first_blk, neg, act(topv))
    ab0 = jnp.where(last_blk, neg, act(b0v))
    ab1 = jnp.where(last_blk, neg, act(b1v))

    def pool_w(arr):
        # out col oc covers input cols 2oc-1 (odd half of pair oc-1),
        # 2oc (even half), 2oc+1 (odd half); first-occurrence col argmax.
        # The pair-down shift is pltpu.roll + an edge mask — a sublane-axis
        # concat of the shifted halves trips a Mosaic layout-offset bug —
        # and the roll runs in fp32 (tpu.dynamic_rotate has no 16-bit
        # path); bf16 -> fp32 is exact, so tie comparisons are unchanged.
        a0 = arr[:, :, :C]
        a1 = arr[:, :, C:]
        ridx = jax.lax.broadcasted_iota(jnp.int32, a1.shape, 1)
        a1m = jnp.where(ridx == 0, neg, pltpu.roll(a1, 1, 1))
        pw = jnp.maximum(jnp.maximum(a1m, a0), a1)
        is0 = a1m >= pw
        is1 = jnp.logical_and(a0 >= pw, jnp.logical_not(is0))
        return pw, is0, is1

    aa = jnp.concatenate([atop, a, ab0, ab1], axis=0)     # (Hb+3, OW, 2C)
    pwa, is0a, is1a = pool_w(aa)                          # (Hb+3, OW, C)

    # H windows: window l (l = 0..OHb, the last belonging to the next
    # block) covers pwa rows 2l, 2l+1, 2l+2; first-occurrence row argmax.
    # Row selection via a pair reshape on the major axis (free) — a strided
    # slice here lowers to an unsupported Mosaic gather.
    catA = pwa[:2 * OHb + 2].reshape(OHb + 1, 2, *pwa.shape[1:])
    w0 = catA[:, 0]                                       # rows 2l
    w1 = catA[:, 1]                                       # rows 2l+1
    w2 = jnp.concatenate([catA[1:, 0], pwa[2 * OHb + 2:]], axis=0)
    mx = jnp.maximum(jnp.maximum(w0, w1), w2)
    d0 = w0 >= mx
    d1 = jnp.logical_and(w1 >= mx, jnp.logical_not(d0))
    d2 = jnp.logical_not(jnp.logical_or(d0, d1))

    zero = jnp.zeros((), dyv.dtype)
    dyx = jnp.concatenate(
        [dyv, jnp.where(last_blk, zero, dynv)], axis=0)   # (OHb+1, OW, C)

    # distribute dy rows to pw rows: even block row 2l is dr=1 of window
    # l only; odd row 2l+1 is dr=2 of window l and dr=0 of window l+1
    E = jnp.where(d1, dyx, zero)
    F0 = jnp.where(d0, dyx, zero)
    F2 = jnp.where(d2, dyx, zero)
    dpw = jnp.stack([E[:OHb], F2[:OHb] + F0[1:OHb + 1]], axis=1)
    dpw = dpw.reshape(2 * OHb, *dpw.shape[2:])            # (Hb, OW, C)

    # distribute pw rows to columns: even col 2p is dc=1 of window p;
    # odd col 2p+1 is dc=2 of window p and dc=0 of window p+1
    is0 = is0a[1:1 + 2 * OHb]
    is1 = is1a[1:1 + 2 * OHb]
    g1 = jnp.where(is1, dpw, zero)
    g0 = jnp.where(is0, dpw, zero)
    g2 = jnp.where(jnp.logical_not(jnp.logical_or(is0, is1)), dpw, zero)
    cidx = jax.lax.broadcasted_iota(jnp.int32, g0.shape, 1)
    g0up = jnp.where(cidx == g0.shape[1] - 1, jnp.float32(0),
                     pltpu.roll(g0.astype(jnp.float32), g0.shape[1] - 1, 1))
    daO = g2.astype(jnp.float32) + g0up
    da = jnp.concatenate([g1.astype(jnp.float32), daO], axis=-1)
    da = da.astype(dyv.dtype)                             # (Hb, OW, 2C)
    return jnp.where(a > zero, da, zero)


def _b1_kernel(xp_ref, top_ref, b0_ref, b1_ref, dy_ref, dyn_ref, ml_ref,
               rl_ref, s2_ref, bb_ref, acc_ref, *, OHb, C, dtype):
    i = pl.program_id(1)
    ml = ml_ref[0, 0]
    rl = rl_ref[0, 0]
    s2 = s2_ref[0, 0].astype(jnp.float32)
    xv = xp_ref[0]
    dz = _recompute_dz(
        xv, top_ref[0], b0_ref[0], b1_ref[0], dy_ref[0], dyn_ref[0],
        ml, rl, s2, bb_ref[0, 0].astype(jnp.float32),
        i == 0, i == pl.num_programs(1) - 1, OHb=OHb, C=C, dtype=dtype)
    dzf = dz.astype(jnp.float32)
    xhat = (xv.astype(jnp.float32) - ml) * rl
    dxhat = dzf * s2
    acc = jnp.stack([
        jnp.sum(dxhat, axis=(0, 1)),
        jnp.sum(dxhat * xhat, axis=(0, 1)),
        jnp.sum(dzf * xhat, axis=(0, 1)),
        jnp.sum(dzf, axis=(0, 1)),
    ])                                                    # (4, 2C)

    @pl.when(i == 0)
    def _():
        acc_ref[0] = acc

    @pl.when(i != 0)
    def _():
        acc_ref[0] = acc_ref[0] + acc


def _b2_kernel(xp_ref, top_ref, b0_ref, b1_ref, dy_ref, dyn_ref, ml_ref,
               rl_ref, s2_ref, bb_ref, c1_ref, c2_ref, dx_ref, *, OHb, C,
               dtype):
    i = pl.program_id(1)
    ml = ml_ref[0, 0]
    rl = rl_ref[0, 0]
    s2 = s2_ref[0, 0].astype(jnp.float32)
    xv = xp_ref[0]
    dz = _recompute_dz(
        xv, top_ref[0], b0_ref[0], b1_ref[0], dy_ref[0], dyn_ref[0],
        ml, rl, s2, bb_ref[0, 0].astype(jnp.float32),
        i == 0, i == pl.num_programs(1) - 1, OHb=OHb, C=C, dtype=dtype)
    xhat = (xv.astype(jnp.float32) - ml) * rl
    dx = rl * (dz.astype(jnp.float32) * s2 - c1_ref[0, 0]
               - xhat * c2_ref[0, 0])
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _pick_ohb(OH, OW, C2, itemsize):
    """Largest divisor of OH whose estimated kernel live set fits VMEM.

    Model: pipeline buffers (x block + dx out at 2x lane padding — the
    native C=64 blocks fill half a lane tile — plus the dy block), all
    double-buffered, plus ~6 block-sized fp32/bf16 value temps."""
    budget = 11.0e6
    best = 1
    for d in range(1, OH + 1):
        if OH % d:
            continue
        hb = 2 * d
        row = OW * C2
        pipeline = 2 * (hb * row * itemsize * 2          # x in + dx out
                        + d * row * itemsize)            # dy (lane-padded)
        temps = hb * row * (3 * 4 + 2 * itemsize) + hb * row * 2
        if pipeline + temps <= budget:
            best = d
    return best


def _pallas_bwd(x, scale, bias, mu, rstd, g, num_groups, eps,
                interpret=False):
    M, H, W, C = x.shape
    OH, OW = H // 2, W // 2
    gs = C // num_groups
    C2 = 2 * C
    dtype = x.dtype

    OHb = _pick_ohb(OH, OW, C2, jnp.dtype(dtype).itemsize)
    nblk = OH // OHb
    Hb = 2 * OHb

    # halo strips (blocks cannot overlap): block i's top halo is row
    # 2*OHb*i - 1 (the previous block's last row); its bottom halo is the
    # next block's first two rows; its dy overhang is the next block's
    # first pooled row. Edge entries are zero-padded and masked in-kernel.
    xp = x.reshape(M, H, OW, C2)
    top = jnp.pad(xp[:, Hb - 1::Hb][:, :nblk - 1],
                  ((0, 0), (1, 0), (0, 0), (0, 0)))
    bot0 = jnp.pad(xp[:, Hb::Hb], ((0, 0), (0, 1), (0, 0), (0, 0)))
    bot1 = jnp.pad(xp[:, Hb + 1::Hb], ((0, 0), (0, 1), (0, 0), (0, 0)))
    dyn = jnp.pad(g[:, OHb::OHb], ((0, 0), (0, 1), (0, 0), (0, 0)))

    # per-lane (paired: lane = parity*C + channel) fp32 stats and params;
    # shaped (M, 1, 2C) / (1, 1, 2C) — Mosaic requires a block's last two
    # dims to divide (8, 128) or equal the array's, so the row dim must be
    # its own singleton axis
    meanl = jnp.tile(jnp.repeat(mu, gs, axis=-1), (1, 2))[:, None]
    rstdl = jnp.tile(jnp.repeat(rstd, gs, axis=-1), (1, 2))[:, None]
    sc2 = jnp.tile(scale.reshape(1, 1, C), (1, 1, 2))
    bb2 = jnp.tile(bias.reshape(1, 1, C), (1, 1, 2))

    def vspec(block, index_map):
        return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)

    common_specs = [
        vspec((1, Hb, OW, C2), lambda m, i: (m, i, 0, 0)),      # xp
        vspec((1, 1, OW, C2), lambda m, i: (m, i, 0, 0)),       # top
        vspec((1, 1, OW, C2), lambda m, i: (m, i, 0, 0)),       # bot0
        vspec((1, 1, OW, C2), lambda m, i: (m, i, 0, 0)),       # bot1
        vspec((1, OHb, OW, C), lambda m, i: (m, i, 0, 0)),      # dy
        vspec((1, 1, OW, C), lambda m, i: (m, i, 0, 0)),        # dyn
        vspec((1, 1, C2), lambda m, i: (m, 0, 0)),              # meanl
        vspec((1, 1, C2), lambda m, i: (m, 0, 0)),              # rstdl
        vspec((1, 1, C2), lambda m, i: (0, 0, 0)),              # scale
        vspec((1, 1, C2), lambda m, i: (0, 0, 0)),              # bias
    ]
    args = (xp, top, bot0, bot1, g, dyn, meanl, rstdl, sc2, bb2)

    acc = pl.pallas_call(
        functools.partial(_b1_kernel, OHb=OHb, C=C, dtype=dtype),
        grid=(M, nblk),
        in_specs=common_specs,
        out_specs=vspec((1, 4, C2), lambda m, i: (m, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, 4, C2), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(*args)

    n = H * W * gs
    s1 = acc[:, 0].reshape(M, 2, num_groups, gs).sum(axis=(1, 3)) / n
    s2m = acc[:, 1].reshape(M, 2, num_groups, gs).sum(axis=(1, 3)) / n
    c1 = jnp.tile(jnp.repeat(s1, gs, axis=-1), (1, 2))[:, None]  # (M,1,2C)
    c2 = jnp.tile(jnp.repeat(s2m, gs, axis=-1), (1, 2))[:, None]
    dscale = acc[:, 2].reshape(M, 2, C).sum(axis=(0, 1)).astype(scale.dtype)
    dbias = acc[:, 3].reshape(M, 2, C).sum(axis=(0, 1)).astype(bias.dtype)

    dxp = pl.pallas_call(
        functools.partial(_b2_kernel, OHb=OHb, C=C, dtype=dtype),
        grid=(M, nblk),
        in_specs=common_specs + [
            vspec((1, 1, C2), lambda m, i: (m, 0, 0)),          # c1
            vspec((1, 1, C2), lambda m, i: (m, 0, 0)),          # c2
        ],
        out_specs=vspec((1, Hb, OW, C2), lambda m, i: (m, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, H, OW, C2), dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(*args, c1, c2)

    return dxp.reshape(M, H, W, C), dscale, dbias


# ------------------------------------------------------------------ module --


def make_module(num_groups: int = 16, epsilon: float = 1e-5, name=None):
    """flax module wrapping gn_relu_pool with GroupNorm-compatible params
    (scale/bias under the module name, e.g. 'bn1' — checkpoint-convert
    keys unchanged, `vfa_tpu/convert.py`)."""
    import flax.linen as nn

    class _FusedGNReluPool(nn.Module):
        num_groups: int = 16
        epsilon: float = 1e-5

        @nn.compact
        def __call__(self, x):
            C = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (C,))
            bias = self.param("bias", nn.initializers.zeros, (C,))
            return gn_relu_pool(x, scale, bias, self.num_groups,
                                self.epsilon)

    return _FusedGNReluPool(num_groups=num_groups, epsilon=epsilon,
                            name=name)
