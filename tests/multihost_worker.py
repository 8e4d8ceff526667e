"""Worker process for the real two-process jax.distributed CPU test.

Launched by tests/test_parallel.py::test_two_process_distributed_train_step
as `python multihost_worker.py <coordinator> <num_procs> <pid> <out_json>`.
Each process owns 4 virtual CPU devices (8 global), initializes
jax.distributed through vfa_tpu.parallel.init_multihost, loads its strided
shard of the scene set, assembles the global batch with make_global_batch,
runs ONE sharded train step, and writes its loss to out_json.
"""

import json
import os
import sys


def main():
    coordinator, num_procs, pid, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    # the sandbox's axon site re-selects the TPU even with JAX_PLATFORMS set
    jax.config.update("jax_platforms", "cpu")

    from vfa_tpu.parallel import init_multihost

    init_multihost(coordinator, num_procs, pid,
                   local_device_ids=list(range(4)))
    assert jax.process_count() == num_procs, jax.process_count()
    assert len(jax.devices()) == 4 * num_procs
    assert len(jax.local_devices()) == 4

    import numpy as np

    import jax.numpy as jnp

    from vfa_tpu.config import TrainConfig, mc_opts
    from vfa_tpu.data.synthetic import make_scene, tiny_config
    from vfa_tpu.parallel import (make_global_batch, make_mesh,
                                  process_local_indices, replicate)
    from vfa_tpu.train_lib import create_model, init_state, make_train_step
    from vfa_tpu.utils import pad_objects

    tc = tiny_config(mc_opts)
    tcfg = TrainConfig(epochs=4, lr=0.001, pretrained=False)
    model = create_model(tc, tcfg)

    # every process builds only ITS shard of the 8 deterministic scenes
    n_global = 8
    local_ids = process_local_indices(n_global)
    scenes = [make_scene(tc, seed=int(s), num_objects=3) for s in local_ids]
    objs = [pad_objects(s.objects, 16, tc.mode) for s in scenes]
    local_batch = {
        "images": np.stack([s.images for s in scenes]),
        "calibs": np.stack([s.calibs for s in scenes]),
        "grid": np.asarray(scenes[0].grid),
        "heatmap": np.stack([s.heatmap for s in scenes]),
        "location": np.stack([o["location"] for o in objs]),
        "valid": np.stack([o["valid"] for o in objs]),
        "dimension": np.stack([o["dimension"] for o in objs]),
        "rotation": np.stack([o["rotation"] for o in objs]),
    }

    mesh = make_mesh(data=4 * num_procs, cam=1)
    global_batch = make_global_batch(local_batch, mesh)
    assert global_batch["images"].shape[0] == n_global

    # identical PRNGKey -> identical params on every process; init on the
    # local slice (init only traces shapes)
    init_batch = {k: jnp.asarray(v) for k, v in local_batch.items()}
    state, tx = init_state(model, tc, tcfg, jax.random.PRNGKey(0), 4,
                           init_batch)
    state = replicate(state, mesh)

    dim_mean = np.array([145.0, 120.0, 255.0], np.float32)
    step = make_train_step(model, tx, tc, tcfg, dim_mean=dim_mean)
    new_state, loss_dict = step(state, global_batch)

    # fully-replicated output: every process reads the same global loss
    loss = float(jax.device_get(loss_dict["loss"]))
    p0 = float(np.sum(np.abs(jax.device_get(
        jax.tree_util.tree_leaves(new_state.params)[0]))))
    with open(out_path, "w") as f:
        json.dump({"pid": pid, "loss": loss, "p0": p0}, f)
    print(f"worker {pid}: loss={loss:.6f} OK")


if __name__ == "__main__":
    main()
