"""Orbax checkpointing with the reference's resume semantics.

The reference saves `{epoch, model_state_dict, optimizer_state_dict,
scheduler_state_dict, args}` every 5 epochs and restores with a
filtered partial load (`train.py:168-198`); checkpoints are self-describing
(`evaluate.py:57-72` rebuilds the model purely from stored args). Here the
same contract: an orbax checkpoint holds the TrainState plus the dataset /
train configs as metadata, and `load_for_eval` rebuilds everything from it.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from vfa_tpu.config import DatasetConfig, TrainConfig, get_config
from vfa_tpu.train_lib import TrainState


def _meta(cfg: DatasetConfig, tcfg: TrainConfig, epoch: int, extra=None) -> dict:
    return {
        "dataset": dataclasses.asdict(cfg),
        "train": dataclasses.asdict(tcfg),
        "epoch": epoch,
        "extra": extra or {},
    }


def save_checkpoint(
    savedir: str,
    state: TrainState,
    cfg: DatasetConfig,
    tcfg: TrainConfig,
    epoch: int,
    extra: Optional[dict] = None,
):
    path = os.path.abspath(os.path.join(savedir, f"epoch_{epoch:04d}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "state"), jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(_meta(cfg, tcfg, epoch, extra), f, indent=2, default=str)
    return path


def _tupleize(d: dict, cls):
    """dataclasses.asdict turns tuples into lists; restore field types."""
    fields = {f.name: f.type for f in dataclasses.fields(cls)}
    out = {}
    for k, v in d.items():
        if k not in fields:
            continue
        out[k] = tuple(v) if isinstance(v, list) else v
    return cls(**out)


def load_meta(path: str) -> Tuple[DatasetConfig, TrainConfig, int, dict]:
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    cfg = _tupleize(meta["dataset"], DatasetConfig)
    tcfg = _tupleize(meta["train"], TrainConfig)
    return cfg, tcfg, meta["epoch"], meta.get("extra", {})


def restore_checkpoint(path: str, abstract_state: TrainState) -> TrainState:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(
        os.path.abspath(os.path.join(path, "state")), abstract_state
    )


def latest_checkpoint(savedir: str) -> Optional[str]:
    if not os.path.isdir(savedir):
        return None
    cands = sorted(
        d for d in os.listdir(savedir)
        if d.startswith("epoch_") and os.path.isdir(os.path.join(savedir, d))
    )
    return os.path.join(savedir, cands[-1]) if cands else None
