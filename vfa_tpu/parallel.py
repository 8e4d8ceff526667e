"""Multi-chip sharding: device meshes and sharded train/inference steps.

The reference is strictly single-GPU / batch-1 (SURVEY.md §2.9); here
scale-out is first-class and XLA-native: scenes shard over a `data` mesh
axis and the camera axis can shard over a `cam` axis — the per-camera BEV
sum inside the model (`vfa_tpu/model/vfanet.py`) is then partitioned by
GSPMD into an ICI all-reduce, exactly the psum the reference's sequential
camera loop (`vfa/model/vfanet.py:64-82`) implies.

No NCCL/MPI analogs: sharding annotations + jit; XLA inserts collectives.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(coordinator: str, num_processes: int, process_id: int,
                   local_device_ids: Optional[Sequence[int]] = None) -> None:
    """Multi-host bring-up: one JAX process per host, GSPMD over all chips.

    The reference has no multi-node story at all (single GPU, SURVEY §2.9);
    the TPU-native equivalent is `jax.distributed.initialize` + the same
    sharded train step — GSPMD partitions one program over every chip in the
    slice, so nothing else changes. Call this before ANY other jax API.

    Axis layout guidance (see `make_mesh`): put the 'data' axis across hosts
    — its gradient all-reduce is one psum per step and rides DCN fine — and
    keep the 'cam' axis inside a host so the per-scene camera all-reduce of
    the BEV sum stays on ICI. `make_mesh(data=-1, cam=k)` with
    `jax.devices()` (the GLOBAL device list) already produces this layout
    because TPU device order enumerates hosts contiguously.

    Single-process degenerate path: num_processes=1 starts the coordinator
    locally and is a no-op beyond that (tested in tests/test_parallel.py).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def process_local_indices(n: int, process_id: Optional[int] = None,
                          process_count: Optional[int] = None) -> np.ndarray:
    """Frame indices this process loads: a strided shard of the dataset.

    Data loading is per-host on DCN (each host reads only its scenes from
    disk/NFS); the global batch is assembled with `make_global_batch`. With
    one process this is the identity — the loaders call it unconditionally.
    """
    pid = jax.process_index() if process_id is None else process_id
    pc = jax.process_count() if process_count is None else process_count
    return np.arange(n)[pid::pc]


def make_global_batch(local_batch: Dict, mesh: Mesh) -> Dict:
    """Assemble per-process local batches into globally-sharded arrays.

    Each process passes its LOCAL slice of the batch (local_scenes =
    global_batch / process_count scenes); the result is a global jax.Array
    sharded with the canonical `batch_sharding` specs. Single-process this
    equals `shard_batch`.
    """
    if jax.process_count() == 1:
        return shard_batch(local_batch, mesh)
    sh = batch_sharding(mesh)
    return {
        k: jax.make_array_from_process_local_data(sh[k], np.asarray(v))
        for k, v in local_batch.items() if k in sh
    }


def make_mesh(data: int = -1, cam: int = 1, devices=None) -> Mesh:
    """Build a (data, cam) mesh. data=-1 uses all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data == -1:
        assert n % cam == 0, f"{n} devices not divisible by cam={cam}"
        data = n // cam
    assert data * cam == n, f"mesh {data}x{cam} != {n} devices"
    return Mesh(devices.reshape(data, cam), axis_names=("data", "cam"))


def batch_sharding(mesh: Mesh) -> Dict[str, NamedSharding]:
    """Shardings for a training batch: scenes over 'data', cameras over
    'cam', targets over 'data', grid replicated."""
    s = lambda *names: NamedSharding(mesh, P(*names))
    return {
        "images": s("data", "cam"),
        "calibs": s("data", "cam"),
        "grid": s(),
        "heatmap": s("data"),
        "location": s("data"),
        "valid": s("data"),
        "dimension": s("data"),
        "rotation": s("data"),
    }


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Device-put a host batch with the canonical shardings."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh[k]) for k, v in batch.items() if k in sh}


def replicate(tree, mesh: Mesh):
    """Replicate params/optimizer state across the mesh."""
    rep = NamedSharding(mesh, P())
    return jax.device_put(tree, rep)


def camera_psum_bev(mesh: Mesh, lats, boxes, collapse_kernel, collapse_bias):
    """Explicit camera-parallel BEV aggregation via shard_map + psum.

    The per-camera BEV sum (`vfa/model/vfanet.py:82` in the reference's
    sequential loop) IS an all-reduce over the camera axis. This computes it
    with cameras sharded over the mesh's 'cam' axis and an explicit
    `jax.lax.psum` riding ICI — the hand-written equivalent of what GSPMD
    derives from the sharding annotations in `shard_train_step` (kept as a
    reference implementation and exercised by tests on a CPU mesh).

    lats: (N, C, fh, fw) per-camera features; boxes: (N, nl, L, W, 4);
    collapse_kernel: (C*nl, O). Returns (L, W, O) = sum over cameras of
    relu(collapse(sample_voxels(lat, boxes))).
    """
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec

    from vfa_tpu.ops.voxel import sample_voxels

    def local(lat_l, boxes_l):
        def one(lat_c, boxes_c):
            vox = sample_voxels(lat_c, boxes_c)
            return jax.nn.relu(vox @ collapse_kernel + collapse_bias)

        contrib = jnp.sum(jax.vmap(one)(lat_l, boxes_l), axis=0)
        return jax.lax.psum(contrib, "cam")

    f = shard_map(
        local, mesh=mesh,
        in_specs=(PartitionSpec("cam"), PartitionSpec("cam")),
        out_specs=PartitionSpec(),
    )
    return f(lats, boxes)


def shard_train_step(train_step, mesh: Mesh):
    """Wrap a jitted train step so its batch inputs carry mesh shardings.

    With inputs sharded and params replicated, GSPMD partitions the graph:
    the camera-sum becomes an all-reduce over 'cam', gradients all-reduce
    over 'data' — standard DP+camera-parallel without explicit collectives.
    """
    def step(state, batch):
        batch = shard_batch(batch, mesh)
        return train_step(state, batch)

    return step
