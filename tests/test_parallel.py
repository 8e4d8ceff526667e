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


@pytest.mark.medium
def test_sharded_train_step_matches_single_device():
    tc = tiny_config(mc_opts)
    tcfg = TrainConfig(epochs=4, lr=0.001, pretrained=False)
    # vmap camera axis so GSPMD can shard it over 'cam'
    model = create_model(tc, tcfg, camera_reduce="vmap")
    batch = _batch(tc, n_scenes=4, num_cam=2)
    state, tx = init_state(model, tc, tcfg, jax.random.PRNGKey(0), 4, batch)
    step = make_train_step(model, tx, tc, tcfg, dim_mean=DIM_MEAN)

    # single device (train_step donates its input state; keep a copy)
    state_copy = jax.tree_util.tree_map(jnp.array, state)
    s1, ld1 = step(state_copy, batch)

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


@pytest.mark.medium
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


@pytest.mark.medium
def test_camera_psum_bev_matches_unsharded(rng):
    from vfa_tpu.geometry import make_grid
    from vfa_tpu.ops.voxel import sample_voxels, voxel_boxes
    from vfa_tpu.parallel import camera_psum_bev

    tc = tiny_config(mc_opts)
    grid = jnp.asarray(make_grid(tc.world_size, tc.cube_size[:2], tc.name))
    from vfa_tpu.data.synthetic import make_calibrations

    calibs = make_calibrations(tc, 4)
    C, fh, fw = 8, tc.resize_size[0] // 8, tc.resize_size[1] // 8
    lats = jnp.asarray(rng.normal(size=(4, C, fh, fw)).astype(np.float32))
    boxes = jax.vmap(lambda c: voxel_boxes(
        c, grid, dataset=tc.name, grid_height=tc.grid_h,
        cube_size=tc.cube_size, image_size=tc.image_size,
    ))(jnp.asarray(calibs))
    nl = boxes.shape[1]
    kernel = jnp.asarray(rng.normal(size=(C * nl, 12)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(12,)).astype(np.float32))

    want = 0
    for n in range(4):
        vox = sample_voxels(lats[n], boxes[n])
        want = want + jax.nn.relu(vox @ kernel + bias)

    mesh = make_mesh(data=2, cam=4)
    got = camera_psum_bev(mesh, lats, boxes, kernel, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_process_local_indices_partition():
    """Strided shards must partition the dataset exactly (no frame read
    twice, none dropped) for any process count."""
    from vfa_tpu.parallel import process_local_indices

    for n in (1, 7, 16, 100):
        for pc in (1, 2, 3, 8):
            shards = [process_local_indices(n, pid, pc) for pid in range(pc)]
            allidx = np.sort(np.concatenate(shards))
            np.testing.assert_array_equal(allidx, np.arange(n))


def test_make_global_batch_single_process():
    """Degenerate single-process path: make_global_batch == shard_batch and
    the sharded train step runs on the result."""
    from vfa_tpu.parallel import make_global_batch

    assert jax.process_count() == 1
    tc = tiny_config(mc_opts)
    mesh = make_mesh(cam=2)
    batch = _batch(tc, 4)
    gb = make_global_batch(batch, mesh)
    assert gb["images"].sharding.mesh.shape == {"data": 4, "cam": 2}
    np.testing.assert_allclose(np.asarray(gb["images"]),
                               np.asarray(batch["images"]))


def test_scene_loader_process_sharding():
    """Two-process loaders must cover disjoint frame shards whose union is
    the whole dataset, with identical shuffles."""
    from vfa_tpu.data.synthetic_loader import SyntheticSceneLoader

    tc = tiny_config(mc_opts)
    full = SyntheticSceneLoader(tc, num_frames=6, batch_size=1, seed=3)
    parts = [SyntheticSceneLoader(tc, num_frames=6, batch_size=1, seed=3,
                                  process_id=p, process_count=2)
             for p in range(2)]
    assert len(parts[0].scenes) + len(parts[1].scenes) == len(full.scenes)
    got = np.sort(np.concatenate(
        [[float(np.sum(s.images)) for s in p.scenes] for p in parts]))
    want = np.sort([float(np.sum(s.images)) for s in full.scenes])
    np.testing.assert_allclose(got, want)


@pytest.mark.medium
def test_sharded_rig_train_step_matches_single_device():
    """The compiled-rig (window layout) training step must partition over a
    data mesh and reproduce the single-device result — this is the
    configuration multi-chip training actually runs."""
    from vfa_tpu.geometry import make_grid
    from vfa_tpu.ops.rig import build_rig, pyramid_feat_shapes

    tc = tiny_config(mc_opts)
    tcfg = TrainConfig(epochs=4, lr=0.001, pretrained=False)
    model = create_model(tc, tcfg)
    batch = _batch(tc, n_scenes=4)
    state, tx = init_state(model, tc, tcfg, jax.random.PRNGKey(0), 4, batch)
    step = make_train_step(model, tx, tc, tcfg, dim_mean=DIM_MEAN)

    rig = build_rig(np.asarray(batch["calibs"][0]), tc,
                    make_grid(tc.world_size, tc.cube_size[:2], tc.name),
                    pyramid_feat_shapes(tc.resize_size),
                    tile_v=16, dtype=jnp.float32, layout="window",
                    band_buckets=2)

    state_copy = jax.tree_util.tree_map(jnp.array, state)
    s1, ld1 = step(state_copy, batch, rig)

    mesh = make_mesh(data=4, cam=1, devices=jax.devices()[:4])
    state_r = replicate(state, mesh)
    rig_r = replicate(rig, mesh)
    sharded = shard_batch(batch, mesh)
    s2, ld2 = step(state_r, sharded, rig_r)

    assert float(ld1["loss"]) == pytest.approx(float(ld2["loss"]), rel=2e-4)
    for x, y in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=2e-3,
                                   atol=2e-5)


@pytest.mark.slow
def test_two_process_distributed_train_step(tmp_path):
    """REAL two-process jax.distributed: spawn 2 workers (4 virtual CPU
    devices each, localhost coordinator), each loading its strided shard of
    8 deterministic scenes; init_multihost + make_global_batch must assemble
    the global batch and one sharded train step must reproduce the
    single-process result computed here on the same 8 scenes."""
    import json
    import socket
    import subprocess
    import sys

    # single-process reference on the identical global batch
    tc = tiny_config(mc_opts)
    tcfg = TrainConfig(epochs=4, lr=0.001, pretrained=False)
    model = create_model(tc, tcfg)
    batch = _batch(tc, n_scenes=8)
    state, tx = init_state(model, tc, tcfg, jax.random.PRNGKey(0), 4, batch)
    step = make_train_step(model, tx, tc, tcfg, dim_mean=DIM_MEAN)
    _, ld = step(state, batch)
    want_loss = float(ld["loss"])

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    import os

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(here)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"worker{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(here, "multihost_worker.py"),
             f"localhost:{port}", "2", str(pid), str(out)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    results = [json.loads(o.read_text()) for o in outs]
    # both processes observe the same replicated global loss ...
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)
    assert results[0]["p0"] == pytest.approx(results[1]["p0"], rel=1e-6)
    # ... and it matches the single-process step on the same scenes
    assert results[0]["loss"] == pytest.approx(want_loss, rel=2e-4)
