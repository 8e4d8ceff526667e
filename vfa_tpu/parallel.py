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
    from jax.experimental.shard_map import shard_map
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
