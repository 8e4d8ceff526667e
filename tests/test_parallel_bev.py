"""BEV-grid spatial sharding (vfa_tpu/parallel_bev.py) on the virtual CPU
mesh: slab-sharded sampling must reproduce the single-device window rig
exactly (fp32), including gradients, and the fuse convs must accept the
row-sharded output (GSPMD halo exchange)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vfa_tpu.config import mc_opts
from vfa_tpu.data.synthetic import make_scene, tiny_config
from vfa_tpu.geometry import make_grid
from vfa_tpu.ops.rig import build_rig, pyramid_feat_shapes
from vfa_tpu.ops.rig_pallas import rig_sample_scale_pallas
from vfa_tpu.parallel_bev import (
    build_bev_sharded_rig,
    make_bev_mesh,
    sample_bev_sharded,
)


@pytest.fixture(scope="module")
def setup():
    tc = tiny_config(mc_opts)
    scene = make_scene(tc, seed=0, num_objects=3)
    calibs = np.asarray(scene.calibs)
    grid = make_grid(tc.world_size, tc.cube_size[:2], tc.name)
    feat_shapes = pyramid_feat_shapes(tc.resize_size)
    kw = dict(tile_v=16, dtype=jnp.float32, band_buckets=2)
    full = build_rig(calibs, tc, grid, feat_shapes, layout="window", **kw)
    srig = build_bev_sharded_rig(calibs, tc, grid, feat_shapes,
                                 num_shards=4, **kw)

    rng = np.random.default_rng(0)
    B, N = 2, tc.num_cam
    lats, kernels, biases = [], [], []
    nl = full.scales[0].nl
    for (fh, fw) in feat_shapes:
        lats.append(jnp.asarray(
            rng.normal(size=(B, N, fh, fw, 256)).astype(np.float32)))
        kernels.append(jnp.asarray(
            rng.normal(size=(256 * nl, 256)).astype(np.float32) * 0.02))
        biases.append(jnp.asarray(
            rng.normal(size=(256,)).astype(np.float32) * 0.1))
    return tc, grid, full, srig, lats, kernels, biases


def _full_ortho(full, grid, lats, kernels, biases):
    L, W = grid.shape[0], grid.shape[1]
    B = lats[0].shape[0]
    ortho = jnp.zeros((B, L * W, 256), jnp.float32)
    for sr, lat, k, b in zip(full.scales, lats, kernels, biases):
        contrib = rig_sample_scale_pallas(lat, sr, k, b,
                                          out_dtype=jnp.float32)
        ortho = ortho + jnp.sum(contrib, axis=1)
    return ortho.reshape(B, L, W, 256)


def test_sharded_equals_full(setup):
    tc, grid, full, srig, lats, kernels, biases = setup
    mesh = make_bev_mesh(data=1, bev=4, devices=jax.devices()[:4])
    ref = _full_ortho(full, grid, lats, kernels, biases)
    out = sample_bev_sharded(lats, srig, kernels, biases, mesh,
                             out_dtype=jnp.float32)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sharded_grads_match(setup):
    tc, grid, full, srig, lats, kernels, biases = setup
    mesh = make_bev_mesh(data=1, bev=4, devices=jax.devices()[:4])
    w = jnp.asarray(np.random.default_rng(1).normal(
        size=_full_ortho(full, grid, lats, kernels, biases).shape
    ).astype(np.float32))

    def loss_full(kernels, lats):
        return jnp.sum(_full_ortho(full, grid, lats, kernels, biases) * w)

    def loss_shard(kernels, lats):
        return jnp.sum(sample_bev_sharded(
            lats, srig, kernels, biases, mesh, out_dtype=jnp.float32) * w)

    gk1, gl1 = jax.grad(loss_full, argnums=(0, 1))(kernels, lats)
    gk2, gl2 = jax.grad(loss_shard, argnums=(0, 1))(kernels, lats)
    for a, b in zip(gk1, gk2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
    for a, b in zip(gl1, gl2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fuse_convs_on_sharded_bev(setup):
    """3x3 convs over the row-sharded BEV map: GSPMD must partition them
    (halo exchange) and match the unsharded conv result."""
    import flax.linen as nn

    tc, grid, full, srig, lats, kernels, biases = setup
    mesh = make_bev_mesh(data=1, bev=4, devices=jax.devices()[:4])

    conv = nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)))
    dil = nn.Conv(64, (3, 3), padding=((2, 2), (2, 2)),
                  kernel_dilation=(2, 2))
    ref_in = _full_ortho(full, grid, lats, kernels, biases)
    v1 = conv.init(jax.random.PRNGKey(0), ref_in)
    v2 = dil.init(jax.random.PRNGKey(1), conv.apply(v1, ref_in))

    @jax.jit
    def head(x):
        return dil.apply(v2, nn.relu(conv.apply(v1, x)))

    ref = head(ref_in)
    shard_in = sample_bev_sharded(lats, srig, kernels, biases, mesh,
                                  out_dtype=jnp.float32)
    out = head(shard_in)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
