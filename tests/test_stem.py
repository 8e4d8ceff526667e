"""Fused stem tail (ops/stem.py): GN+relu+maxpool with hand-written VJP.

The forward must be bit-identical to the flax module chain the model used
before (parity tests depend on it); the backward must reproduce XLA's
autodiff gradients including SelectAndScatter's maxpool tie semantics
(first max position in row-major window order — relu plateaus at 0 make
ties the common case, not the corner case)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from vfa_tpu.ops.stem import _pallas_bwd, _gn_relu, _pool, gn_relu_pool


class RefChain(nn.Module):
    """The pre-fusion module chain from model/resnet.py's stem."""

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.GroupNorm(num_groups=16, epsilon=1e-5, name="bn")(x))
        return nn.max_pool(x, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)))


def _make(shape=(3, 24, 32, 64), dtype=jnp.float32, seed=0, plateau=False):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=shape).astype(np.float32)
    if plateau:
        # quantize hard so exact ties occur inside pool windows even away
        # from the relu zero-plateau
        x = np.round(x * 2) / 2
    scale = rng.uniform(0.5, 1.5, shape[-1]).astype(np.float32)
    bias = rng.uniform(-0.5, 0.5, shape[-1]).astype(np.float32)
    return (jnp.asarray(x, dtype), jnp.asarray(scale, dtype),
            jnp.asarray(bias, dtype))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_flax_chain(dtype):
    x, scale, bias = _make(dtype=dtype)
    ref = RefChain()
    want = ref.apply({"params": {"bn": {"scale": scale, "bias": bias}}}, x)
    got = gn_relu_pool(x, scale, bias)
    assert got.dtype == want.dtype
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("plateau", [False, True])
def test_backward_matches_autodiff_fp32(plateau):
    """gn_relu_pool's custom VJP (XLA fallback path on CPU shapes that the
    kernels don't cover) == autodiff of the reference chain."""
    x, scale, bias = _make(shape=(2, 10, 14, 64), plateau=plateau)
    ref = RefChain()

    def ref_loss(x, s, b):
        out = ref.apply({"params": {"bn": {"scale": s, "bias": b}}}, x)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    def fused_loss(x, s, b):
        out = gn_relu_pool(x, s, b)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    gw = jax.grad(ref_loss, argnums=(0, 1, 2))(x, scale, bias)
    gg = jax.grad(fused_loss, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(gg, gw):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(2, 12, 16, 64), (1, 20, 48, 64),
                                   (3, 24, 32, 64)])
def test_pallas_bwd_matches_autodiff(dtype, shape):
    """The Pallas B1/B2 kernels (interpret mode on CPU) == autodiff of the
    exact forward chain, including maxpool tie positions and the GN
    moment terms, in both precisions."""
    x, scale, bias = _make(shape=shape, dtype=dtype, plateau=True)
    g = jnp.asarray(
        np.random.default_rng(1).normal(
            size=(shape[0], shape[1] // 2, shape[2] // 2, shape[3])),
        dtype)

    def chain(x, s, b):
        return _pool(_gn_relu(x, s, b, 16, 1e-5)[0])

    _, vjp = jax.vjp(chain, x, scale, bias)
    want = vjp(g)

    _, mu, rstd = _gn_relu(x, scale, bias, 16, 1e-5)
    got = _pallas_bwd(x, scale, bias, mu, rstd, g, 16, 1e-5, interpret=True)

    for name, a, b in zip(("dx", "dscale", "dbias"), got, want):
        if dtype == jnp.float32:
            tol = dict(rtol=2e-5, atol=2e-5)
        elif name == "dx":
            tol = dict(rtol=2e-2, atol=2e-2)
        else:
            # bf16 param-grad sums: autodiff accumulates the reduction in
            # bf16, the kernel accumulates fp32 and rounds once — allow
            # the summation-order spread
            tol = dict(rtol=0.15, atol=0.15)
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            err_msg=name, **tol)


def test_pallas_bwd_tie_positions_exact_fp32():
    """In fp32 the kernels must route every pool cotangent to exactly the
    position autodiff picks — compare elementwise equality of the nonzero
    pattern on a heavily-tied input (many relu zeros + quantized values)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(np.round(rng.normal(size=(2, 16, 16, 64)) * 1) / 1,
                    jnp.float32)
    scale = jnp.ones(64)
    bias = jnp.zeros(64)
    g = jnp.asarray(rng.normal(size=(2, 8, 8, 64)), jnp.float32)

    def chain(x, s, b):
        return _pool(_gn_relu(x, s, b, 16, 1e-5)[0])

    _, vjp = jax.vjp(chain, x, scale, bias)
    want = vjp(g)[0]
    _, mu, rstd = _gn_relu(x, scale, bias, 16, 1e-5)
    got = _pallas_bwd(x, scale, bias, mu, rstd, g, 16, 1e-5,
                      interpret=True)[0]
    # tie routing is integral: identical sparsity pattern required
    np.testing.assert_array_equal(np.asarray(got) == 0, np.asarray(want) == 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_resnet_fused_vs_unfused():
    """ResNetGN(fused_stem=True) must share the param tree with the
    unfused backbone, produce the identical forward, and match its
    gradients (fp32)."""
    from vfa_tpu.model.resnet import ResNetGN

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 32, 48, 3)), jnp.float32)
    fused = ResNetGN((2, 2, 2, 2), fused_stem=True)
    plain = ResNetGN((2, 2, 2, 2), fused_stem=False)
    v = fused.init(jax.random.PRNGKey(0), x)
    vp = plain.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vp)

    def loss(model, params):
        f8, f16, f32 = model.apply(params, x)
        return (jnp.sum(f8 ** 2) + jnp.sum(f16 ** 2) + jnp.sum(f32 ** 2))

    lf, gf = jax.value_and_grad(lambda p: loss(fused, p))(v)
    lp, gp = jax.value_and_grad(lambda p: loss(plain, p))(v)
    np.testing.assert_allclose(float(lf), float(lp), rtol=1e-6)

    def check(path, a, b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=jax.tree_util.keystr(path))

    jax.tree_util.tree_map_with_path(check, gf, gp)


def test_module_param_tree_matches_groupnorm():
    """The fused module must create the same bn1/{scale,bias} params as
    nn.GroupNorm so checkpoints and the torch converter are unchanged."""
    from vfa_tpu.ops.stem import make_module

    x = jnp.zeros((1, 8, 8, 64))
    fused = make_module(name=None)
    v = fused.init(jax.random.PRNGKey(0), x)
    ref = nn.GroupNorm(num_groups=16, epsilon=1e-5)
    vr = ref.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vr)
    for a, b in zip(jax.tree_util.tree_leaves(v),
                    jax.tree_util.tree_leaves(vr)):
        assert a.shape == b.shape and a.dtype == b.dtype
