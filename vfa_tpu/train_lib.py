"""Training library: jitted train/eval steps, optimizer, checkpointing.

Reference recipe (`train.py:256-258`): SGD lr=0.02 momentum=0.5 wd=5e-4 with
OneCycleLR. The reference configures OneCycleLR with
steps_per_epoch*epochs total steps but calls scheduler.step() once per EPOCH
(`train.py:274`), so training only traverses the first `epochs` steps of the
cycle; `TrainConfig.scheduler_step_per_epoch=True` (default) replicates that
quirk, False steps per iteration as the configuration implies.

TPU-first: one jitted train step covering forward, in-graph target encoding,
loss, backward and the optimizer update; scenes batch on a leading axis and
shard over the mesh's 'data' axis (vfa_tpu/parallel.py). Checkpointing is
orbax (`vfa_tpu/checkpoint.py`), replacing torch .pth dicts.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from vfa_tpu.codec import encode_frame, gaussian_csl_labels, object_cells
from vfa_tpu.config import DatasetConfig, TrainConfig
from vfa_tpu.losses import compute_loss2d, compute_loss3d
from vfa_tpu.model import VFANet


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def onecycle_schedule(tcfg: TrainConfig, steps_per_epoch: int):
    """torch OneCycleLR curve, exactly (defaults: pct_start .3, cos anneal,
    div_factor 25, final_div_factor 1e4) over steps_per_epoch*epochs steps.

    optax.cosine_onecycle_schedule has off-by-one phase boundaries vs torch;
    this reproduces torch's `_annealing_cos` milestones bit-for-bit so the
    reference recipe's LR trajectory carries over.
    """
    total = steps_per_epoch * tcfg.epochs
    pct_start, div_factor, final_div = 0.3, 25.0, 1e4
    initial = tcfg.lr / div_factor
    min_lr = initial / final_div
    up = pct_start * total - 1.0          # last index of the warmup phase
    down = (total - 1.0) - up

    def _cos(a, b, pct):
        return b + (a - b) / 2.0 * (1.0 + jnp.cos(jnp.pi * pct))

    def schedule(count):
        s = jnp.asarray(count, jnp.float32)
        warm = _cos(initial, tcfg.lr, jnp.clip(s / up, 0.0, 1.0))
        anneal = _cos(tcfg.lr, min_lr, jnp.clip((s - up) / down, 0.0, 1.0))
        return jnp.where(s <= up, warm, anneal)

    return schedule


def momentum_schedule(tcfg: TrainConfig, steps_per_epoch: int,
                      base_momentum: float = 0.85, max_momentum: float = 0.95):
    """torch OneCycleLR's momentum cycle.

    Reference quirk: `train.py:256-258` passes momentum=0.5 to SGD, but
    OneCycleLR defaults to cycle_momentum=True and OVERRIDES the optimizer's
    momentum every scheduler step — cosine from 0.95 down to 0.85 during
    warmup and back to 0.95 during anneal. The configured 0.5 never takes
    effect after the first scheduler.step(). Replicated exactly when
    tcfg.cycle_momentum (the default); with cycle_momentum=False the
    constant tcfg.momentum is honored instead (the non-quirk path).
    """
    if not tcfg.cycle_momentum:
        const = jnp.float32(tcfg.momentum)
        return lambda count: const
    total = steps_per_epoch * tcfg.epochs
    up = 0.3 * total - 1.0
    down = (total - 1.0) - up

    def _cos(a, b, pct):
        return b + (a - b) / 2.0 * (1.0 + jnp.cos(jnp.pi * pct))

    def schedule(count):
        s = jnp.asarray(count, jnp.float32)
        warm = _cos(max_momentum, base_momentum, jnp.clip(s / up, 0.0, 1.0))
        anneal = _cos(base_momentum, max_momentum, jnp.clip((s - up) / down, 0.0, 1.0))
        return jnp.where(s <= up, warm, anneal)

    return schedule


@flax.struct.dataclass
class SGDState:
    count: jnp.ndarray
    trace: Any


def make_optimizer(tcfg: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    """torch-SGD + OneCycleLR semantics, including scheduled momentum:
    g = grad + wd*p; buf = m(t)*buf + g; p -= lr(t)*buf.

    Under the reference's per-epoch stepping quirk, the scheduler step t is
    the epoch index (scheduler stepped once before each epoch => epoch e
    trains entirely at schedule(e)); otherwise t is the iteration count.
    """
    lr_cycle = onecycle_schedule(tcfg, steps_per_epoch)
    mom_cycle = momentum_schedule(tcfg, steps_per_epoch)
    if tcfg.scheduler_step_per_epoch:
        def sched_step(count):
            return count // steps_per_epoch + 1
    else:
        def sched_step(count):
            return count

    wd = tcfg.weight_decay

    def init_fn(params):
        return SGDState(
            count=jnp.zeros((), jnp.int32),
            trace=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update_fn(grads, state, params):
        t = sched_step(state.count)
        lr = lr_cycle(t)
        mom = mom_cycle(t)
        g = jax.tree_util.tree_map(lambda gi, pi: gi + wd * pi, grads, params)
        new_trace = jax.tree_util.tree_map(
            lambda ti, gi: mom * ti + gi, state.trace, g
        )
        updates = jax.tree_util.tree_map(lambda ti: -lr * ti, new_trace)
        return updates, SGDState(count=state.count + 1, trace=new_trace)

    return optax.GradientTransformation(init_fn, update_fn)


def current_lr(tcfg: TrainConfig, steps_per_epoch: int, step: int) -> float:
    cycle = onecycle_schedule(tcfg, steps_per_epoch)
    if tcfg.scheduler_step_per_epoch:
        return float(cycle(step // steps_per_epoch + 1))
    return float(cycle(step))


def create_model(cfg: DatasetConfig, tcfg: TrainConfig,
                 camera_reduce: str = "scan", rig_impl: str = "xla",
                 backbone_remat: bool = False,
                 backbone_chunks: int = 1,
                 stem_remat: bool = False,
                 bev_mesh=None, bev_axis: str = "bev") -> VFANet:
    return VFANet(cfg=cfg, base=tcfg.base, angle_range=tcfg.angle_range,
                  camera_reduce=camera_reduce, rig_impl=rig_impl,
                  backbone_remat=backbone_remat,
                  backbone_chunks=backbone_chunks,
                  stem_remat=stem_remat,
                  bev_mesh=bev_mesh, bev_axis=bev_axis)


def init_grid(grid):
    """Decimate an oversized BEV grid for parameter init.

    Param/batch-stat shapes are grid-size-independent (convs + the
    Linear(C*nl -> C) collapse), and flax's rng folding keys off module
    paths, not shapes — the initialized values are identical. Init runs the
    dynamic gather path (`ops/voxel.py`) EAGERLY (flax init dispatches op by
    op), whose integral-image gathers at the 2x-resolution stretch grid
    (325x325, BASELINE config 5) exhaust HBM before jit ever sees the graph.
    """
    sy = -(-grid.shape[0] // 256)
    sx = -(-grid.shape[1] // 256)
    return grid[::sy, ::sx] if (sy > 1 or sx > 1) else grid


def init_state(
    model: VFANet,
    cfg: DatasetConfig,
    tcfg: TrainConfig,
    rng,
    steps_per_epoch: int,
    sample_batch: Dict[str, jnp.ndarray],
) -> Tuple[TrainState, optax.GradientTransformation]:
    variables = model.init(
        rng, sample_batch["images"], sample_batch["calibs"],
        init_grid(sample_batch["grid"]),
        train=True,
    )
    tx = make_optimizer(tcfg, steps_per_epoch)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    return state, tx


def encode_targets(batch: Dict[str, jnp.ndarray], cfg: DatasetConfig,
                   dim_mean, angle_range: int, dense_rotation: bool = True):
    """vmap the per-frame encoder over the scene batch; squeeze the encoder's
    per-frame leading 1 so targets are (B, ...)."""
    def enc(objects, heatmap):
        kw = {"dim_mean": dim_mean} if cfg.mode == "3D" else {}
        return encode_frame(objects, heatmap, cfg=cfg, angle_range=angle_range,
                            dense_rotation=dense_rotation, **kw)

    objects = {k: batch[k] for k in
               ("location", "valid", "dimension", "rotation") if k in batch}
    enc_b = jax.vmap(enc)(objects, batch["heatmap"])
    return {k: v[:, 0] for k, v in enc_b.items()}  # drop per-frame dim -> (B, ...)


def gather_rotation_cells(pred_rotation, batch, cfg: DatasetConfig,
                          angle_range: int):
    """(pred_cells, gt_cells, owner) for the sparse CSL angle loss.

    Gathers the rotation head's logits at the <= M object cells (the only
    cells where the dense `csl_angle_focal_loss` is nonzero) and builds the
    matching CSL targets directly — no (B, L, W, angle_range) scatter, no
    full-map fp32 focal sweep. pred_rotation: (B, L, W, A) in the compute
    dtype; the gathered (B, M, A) slice is cast to fp32 here (the bf16
    sigmoid-saturation hazard applies to the loss math, not the gather)."""
    objects = {k: batch[k] for k in ("location", "valid") if k in batch}
    rows, cols, owner = jax.vmap(
        functools.partial(object_cells, cfg=cfg))(objects)
    B = pred_rotation.shape[0]
    pred_cells = pred_rotation[jnp.arange(B)[:, None], rows, cols]
    gt_cells = gaussian_csl_labels(jnp.rad2deg(batch["rotation"]), angle_range)
    return pred_cells.astype(jnp.float32), gt_cells, owner


def make_train_step(model: VFANet, tx, cfg: DatasetConfig, tcfg: TrainConfig,
                    dim_mean=None):
    """Returns jitted (state, batch[, rig]) -> (state, loss_dict).

    batch: images (B, N, H, W, 3), calibs (B, N, 3, 4), grid (L, W, 3),
    heatmap (B, L, W), location (B, M, 3), valid (B, M), and for 3D
    dimension (B, M, 3), rotation (B, M). `rig` (optional CameraRig) routes
    the forward through the compiled-rig sampling path; its arrays are
    non-differentiated inputs.
    """
    loss_fn3 = functools.partial(compute_loss3d, loss_weight=cfg.loss_weight)
    loss_fn2 = functools.partial(compute_loss2d, loss_weight=cfg.loss_weight)
    dim_mean = None if dim_mean is None else jnp.asarray(dim_mean)
    # Mixed precision (compute_dtype='bfloat16'): params and optimizer
    # momentum stay fp32 MASTER copies; the model applies a bf16 cast AT
    # USE each step, so convs/matmuls run bf16 while the SGD update
    # accumulates in fp32. A bf16 master copy loses small lr*grad
    # increments entirely (bf16 eps ~ 7.8e-3: 1.0 + 1e-4 == 1.0), which
    # is why params are never cast at rest (tests/test_train.py pins
    # this). The cast is differentiable — cotangents come back fp32.
    compute_dtype = (jnp.bfloat16 if tcfg.compute_dtype == "bfloat16"
                     else jnp.float32)

    def cast_at_use(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(compute_dtype)
            if x.dtype == jnp.float32 else x, tree)

    def loss_fn(params, batch_stats, batch, rig):
        pred, updates = model.apply(
            {"params": cast_at_use(params),
             "batch_stats": cast_at_use(batch_stats)},
            batch["images"], batch["calibs"], batch["grid"],
            train=True, rig=rig, mutable=["batch_stats"],
        )
        # the rotation head's loss is evaluated sparsely at the object
        # cells, so its (B, L, W, angle) map never needs the fp32 cast or
        # the dense CSL target scatter (gather_rotation_cells)
        rotation_cells = None
        if cfg.mode == "3D":
            rotation_cells = gather_rotation_cells(
                pred.pop("rotation"), batch, cfg, model.angle_range)
        # losses in fp32: bf16 sigmoids saturate to exactly 1 and the focal
        # log(1 - p) returns -inf
        pred = {k: v.astype(jnp.float32) for k, v in pred.items()}
        gt = encode_targets(batch, cfg, dim_mean, model.angle_range,
                            dense_rotation=False)
        if cfg.mode == "3D":
            loss, loss_dict = loss_fn3(pred, gt,
                                       rotation_cells=rotation_cells)
        else:
            loss, loss_dict = loss_fn2(pred, gt)
        # running BN stats live fp32 alongside the master params
        new_bs = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if x.dtype == compute_dtype else x, updates["batch_stats"])
        return loss, (loss_dict, new_bs)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, rig=None):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (loss_dict, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, batch, rig)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=new_params,
            batch_stats=new_bs, opt_state=new_opt,
        )
        return new_state, loss_dict

    return train_step


def make_eval_step(model: VFANet, cfg: DatasetConfig, dim_mean=None,
                   compute_dtype=None):
    """Jitted validation step: loss under running BN stats, no update.

    compute_dtype: cast fp32 variables at use (mixed-precision validation
    matching the train step's recipe); None = apply as stored."""
    dim_mean = None if dim_mean is None else jnp.asarray(dim_mean)

    def cast(tree):
        if compute_dtype is None:
            return tree
        return jax.tree_util.tree_map(
            lambda x: x.astype(compute_dtype)
            if x.dtype == jnp.float32 else x, tree)

    @jax.jit
    def eval_step(state: TrainState, batch, rig=None):
        pred = model.apply(
            {"params": cast(state.params),
             "batch_stats": cast(state.batch_stats)},
            batch["images"], batch["calibs"], batch["grid"], train=False,
            rig=rig,
        )
        pred = {k: v.astype(jnp.float32) for k, v in pred.items()}
        gt = encode_targets(batch, cfg, dim_mean, model.angle_range)
        if cfg.mode == "3D":
            _, loss_dict = compute_loss3d(pred, gt, cfg.loss_weight)
        else:
            _, loss_dict = compute_loss2d(pred, gt, cfg.loss_weight)
        return loss_dict, pred

    return eval_step


def make_forward(model: VFANet):
    """Jitted inference-only forward."""

    @jax.jit
    def forward(params, batch_stats, images, calibs, grid, rig=None):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, calibs, grid, train=False, rig=rig,
        )

    return forward
