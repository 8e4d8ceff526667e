"""Mesh/sharding tests on 8 virtual CPU devices: sharded training step
compiles, executes, and matches the single-device result."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vfa_tpu.config import TrainConfig, mc_opts
from vfa_tpu.data.synthetic import make_scene, tiny_config
from vfa_tpu.parallel import batch_sharding, make_mesh, replicate, shard_batch
from vfa_tpu.train_lib import create_model, init_state, make_train_step
from vfa_tpu.utils import pad_objects

DIM_MEAN = np.array([145.0, 120.0, 255.0], np.float32)


def _batch(tc, n_scenes, num_cam=None):
    scenes = [make_scene(tc, seed=s, num_objects=3, num_cam=num_cam)
              for s in range(n_scenes)]
    objs = [pad_objects(s.objects, 16, tc.mode) for s in scenes]
    return {
        "images": jnp.stack([s.images for s in scenes]),
        "calibs": jnp.stack([s.calibs for s in scenes]),
        "grid": jnp.asarray(scenes[0].grid),
        "heatmap": jnp.stack([s.heatmap for s in scenes]),
        "location": jnp.stack([o["location"] for o in objs]),
        "valid": jnp.stack([o["valid"] for o in objs]),
        "dimension": jnp.stack([o["dimension"] for o in objs]),
        "rotation": jnp.stack([o["rotation"] for o in objs]),
    }


def test_mesh_construction():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(data=4, cam=2)
    assert mesh.shape == {"data": 4, "cam": 2}
    mesh = make_mesh(cam=2)
    assert mesh.shape == {"data": 4, "cam": 2}


def test_sharded_train_step_matches_single_device():
    tc = tiny_config(mc_opts)
    tcfg = TrainConfig(epochs=4, lr=0.001, pretrained=False)
    # vmap camera axis so GSPMD can shard it over 'cam'
    model = create_model(tc, tcfg, camera_reduce="vmap")
    batch = _batch(tc, n_scenes=4, num_cam=2)
    state, tx = init_state(model, tc, tcfg, jax.random.PRNGKey(0), 4, batch)
    step = make_train_step(model, tx, tc, tcfg, dim_mean=DIM_MEAN)

    # single device
    s1, ld1 = step(state, batch)

    # data=4 x cam=2 mesh
    mesh = make_mesh(data=4, cam=2)
    state_r = replicate(state, mesh)
    sharded = shard_batch(batch, mesh)
    for k in ("images", "calibs"):
        assert sharded[k].sharding.spec == P("data", "cam")
    s2, ld2 = step(state_r, sharded)

    assert float(ld1["loss"]) == pytest.approx(float(ld2["loss"]), rel=2e-4)
    a = jax.tree_util.tree_leaves(s1.params)
    b = jax.tree_util.tree_leaves(s2.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=2e-3,
                                   atol=2e-5)


def test_data_only_mesh_inference():
    tc = tiny_config(mc_opts)
    tcfg = TrainConfig(pretrained=False)
    model = create_model(tc, tcfg)
    batch = _batch(tc, n_scenes=8)
    variables = model.init(jax.random.PRNGKey(0), batch["images"],
                           batch["calibs"], batch["grid"])
    mesh = make_mesh(data=8, cam=1)
    variables = replicate(variables, mesh)
    sb = shard_batch(batch, mesh)

    fwd = jax.jit(lambda v, i, c, g: model.apply(v, i, c, g))
    pred = fwd(variables, sb["images"], sb["calibs"], sb["grid"])
    assert pred["heatmap"].shape[0] == 8
    assert np.isfinite(np.asarray(pred["heatmap"])).all()
