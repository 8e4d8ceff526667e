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
