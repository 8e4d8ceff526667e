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


@pytest.mark.medium
def test_sharded_equals_full(setup):
    tc, grid, full, srig, lats, kernels, biases = setup
    mesh = make_bev_mesh(data=1, bev=4, devices=jax.devices()[:4])
    ref = _full_ortho(full, grid, lats, kernels, biases)
    out = sample_bev_sharded(lats, srig, kernels, biases, mesh,
                             out_dtype=jnp.float32)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.medium
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


@pytest.mark.medium
def test_bev_sharded_train_step_matches_unsharded():
    """Full-model integration: a train step (fwd + encode + loss + bwd +
    SGD) with the BEV plane slab-sharded over a 4-device `bev` mesh must
    reproduce the single-device window-rig step in fp32 — loss and updated
    params. Uses the 2x-resolution tiny config (factor=8 -> 19x19 grid,
    ~4x the cells of the standard factor=16 test grid), the shape the
    grid2x stretch config scales to."""
    import jax.random as jr

    from vfa_tpu.config import TrainConfig
    from vfa_tpu.data.synthetic import make_scene, tiny_config
    from vfa_tpu.parallel import replicate
    from vfa_tpu.train_lib import create_model, init_state, make_train_step
    from vfa_tpu.utils import pad_objects

    tc = tiny_config(mc_opts, factor=8)
    tcfg = TrainConfig(pretrained=False)
    calibs = None
    B = 2
    scenes = [make_scene(tc, seed=s, num_objects=3) for s in range(B)]
    calibs = np.asarray(scenes[0].calibs)
    grid = make_grid(tc.world_size, tc.cube_size[:2], tc.name)
    feat_shapes = pyramid_feat_shapes(tc.resize_size)
    kw = dict(tile_v=16, dtype=jnp.float32, band_buckets=2)
    full = build_rig(calibs, tc, grid, feat_shapes, layout="window", **kw)
    srig = build_bev_sharded_rig(calibs, tc, grid, feat_shapes,
                                 num_shards=4, **kw)
    mesh = make_bev_mesh(data=1, bev=4, devices=jax.devices()[:4])

    objs = [pad_objects(s.objects, 8, tc.mode) for s in scenes]
    batch = {
        "images": jnp.stack([s.images for s in scenes]),
        "calibs": jnp.stack([s.calibs for s in scenes]),
        "grid": jnp.asarray(grid),
        "heatmap": jnp.stack([s.heatmap for s in scenes]),
        "location": jnp.stack([o["location"] for o in objs]),
        "valid": jnp.stack([o["valid"] for o in objs]),
        "dimension": jnp.stack([o["dimension"] for o in objs]),
        "rotation": jnp.stack([o["rotation"] for o in objs]),
    }
    dim_mean = jnp.asarray([145.0, 120.0, 255.0])

    model_ref = create_model(tc, tcfg, rig_impl="pallas")
    model_bev = create_model(tc, tcfg, rig_impl="pallas", bev_mesh=mesh)

    state_ref, tx = init_state(model_ref, tc, tcfg, jr.PRNGKey(0), 4, batch)
    state_bev, _ = init_state(model_bev, tc, tcfg, jr.PRNGKey(0), 4, batch)

    step_ref = make_train_step(model_ref, tx, tc, tcfg, dim_mean=dim_mean)
    step_bev = make_train_step(model_bev, tx, tc, tcfg, dim_mean=dim_mean)

    new_ref, loss_ref = step_ref(state_ref, batch, full)
    new_bev, loss_bev = step_bev(replicate(state_bev, mesh),
                                 replicate(batch, mesh),
                                 replicate(srig, mesh))

    np.testing.assert_allclose(float(loss_bev["loss"]),
                               float(loss_ref["loss"]), rtol=1e-5)
    flat_r = jax.tree_util.tree_leaves_with_path(new_ref.params)
    flat_b = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(new_bev.params)}
    for k, v in flat_r:
        np.testing.assert_allclose(
            np.asarray(flat_b[jax.tree_util.keystr(k)]), np.asarray(v),
            rtol=1e-4, atol=1e-5, err_msg=jax.tree_util.keystr(k))


@pytest.mark.medium
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
