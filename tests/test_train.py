"""Training-loop tests: optimizer semantics vs torch SGD+OneCycleLR,
a few train steps reduce the loss, checkpoint save/restore round trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vfa_tpu.config import TrainConfig, mc_opts
from vfa_tpu.data.synthetic import make_scene, tiny_config
from vfa_tpu.train_lib import (
    create_model,
    current_lr,
    init_state,
    make_eval_step,
    make_forward,
    make_train_step,
    onecycle_schedule,
)
from vfa_tpu.utils import pad_objects

DIM_MEAN = np.array([145.0, 120.0, 255.0], np.float32)


def _batch(tc, seeds, max_obj=16):
    scenes = [make_scene(tc, seed=s, num_objects=3) for s in seeds]
    objs = [pad_objects(s.objects, max_obj, tc.mode) for s in scenes]
    batch = {
        "images": jnp.stack([s.images for s in scenes]),
        "calibs": jnp.stack([s.calibs for s in scenes]),
        "grid": jnp.asarray(scenes[0].grid),
        "heatmap": jnp.stack([s.heatmap for s in scenes]),
        "location": jnp.stack([o["location"] for o in objs]),
        "valid": jnp.stack([o["valid"] for o in objs]),
    }
    if tc.mode == "3D":
        batch["dimension"] = jnp.stack([o["dimension"] for o in objs])
        batch["rotation"] = jnp.stack([o["rotation"] for o in objs])
    return batch


def test_onecycle_matches_torch():
    import torch

    tcfg = TrainConfig(epochs=4, lr=0.02)
    steps_per_epoch = 10
    sched = onecycle_schedule(tcfg, steps_per_epoch)

    m = torch.nn.Linear(2, 2)
    opt = torch.optim.SGD(m.parameters(), lr=tcfg.lr)
    t_sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=tcfg.lr, steps_per_epoch=steps_per_epoch, epochs=tcfg.epochs
    )
    torch_lrs = [opt.param_groups[0]["lr"]]
    for _ in range(steps_per_epoch * tcfg.epochs - 1):
        t_sched.step()
        torch_lrs.append(opt.param_groups[0]["lr"])
    ours = [float(sched(i)) for i in range(len(torch_lrs))]
    np.testing.assert_allclose(ours, torch_lrs, rtol=1e-5)


def test_scheduler_quirk_replicated():
    tcfg = TrainConfig(epochs=4, lr=0.02, scheduler_step_per_epoch=True)
    sched = onecycle_schedule(tcfg, 10)
    # under the quirk, every iteration of epoch e uses schedule(e)
    assert current_lr(tcfg, 10, step=0) == pytest.approx(float(sched(1)))
    assert current_lr(tcfg, 10, step=9) == pytest.approx(float(sched(1)))
    assert current_lr(tcfg, 10, step=10) == pytest.approx(float(sched(2)))
    tcfg2 = TrainConfig(epochs=4, lr=0.02, scheduler_step_per_epoch=False)
    assert current_lr(tcfg2, 10, step=7) == pytest.approx(float(sched(7)))


def test_sgd_update_matches_torch(rng):
    """One optimizer step on fixed grads == torch SGD(momentum, wd)."""
    import optax
    import torch

    from vfa_tpu.train_lib import make_optimizer

    tcfg = TrainConfig(epochs=2, lr=0.02, momentum=0.5, weight_decay=5e-4,
                       scheduler_step_per_epoch=False)
    p0 = rng.normal(size=(4, 3)).astype(np.float32)
    g0 = rng.normal(size=(4, 3)).astype(np.float32)
    g1 = rng.normal(size=(4, 3)).astype(np.float32)

    tx = make_optimizer(tcfg, steps_per_epoch=5)
    params = {"w": jnp.asarray(p0)}
    opt_state = tx.init(params)
    for g in (g0, g1):
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state, params)
        params = optax.apply_updates(params, updates)

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.SGD([tp], lr=tcfg.lr, momentum=tcfg.momentum,
                          weight_decay=tcfg.weight_decay)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=tcfg.lr, steps_per_epoch=5, epochs=2)
    for g in (g0, g1):
        opt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        opt.step()
        sched.step()
    np.testing.assert_allclose(np.asarray(params["w"]), tp.detach().numpy(),
                               rtol=1e-5, atol=1e-7)


def test_constant_momentum_matches_torch(rng):
    """cycle_momentum=False honors --momentum: steps == torch SGD with
    OneCycleLR(cycle_momentum=False) at the same constant momentum."""
    import optax
    import torch

    from vfa_tpu.train_lib import make_optimizer

    tcfg = TrainConfig(epochs=2, lr=0.02, momentum=0.7, weight_decay=5e-4,
                       scheduler_step_per_epoch=False, cycle_momentum=False)
    p0 = rng.normal(size=(4, 3)).astype(np.float32)
    grads = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(3)]

    tx = make_optimizer(tcfg, steps_per_epoch=5)
    params = {"w": jnp.asarray(p0)}
    opt_state = tx.init(params)
    for g in grads:
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state,
                                       params)
        params = optax.apply_updates(params, updates)

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.SGD([tp], lr=tcfg.lr, momentum=tcfg.momentum,
                          weight_decay=tcfg.weight_decay)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=tcfg.lr, steps_per_epoch=5, epochs=2,
        cycle_momentum=False)
    for g in grads:
        opt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        opt.step()
        sched.step()
    np.testing.assert_allclose(np.asarray(params["w"]), tp.detach().numpy(),
                               rtol=1e-5, atol=1e-7)


def test_momentum_flag_rejected_while_cycled():
    """--momentum != 0.5 without --no_cycle_momentum is a hard error (the
    value would be silently inert under the replicated reference quirk)."""
    import sys

    import train as train_cli

    argv = sys.argv
    try:
        sys.argv = ["train.py", "--data", "MultiviewC", "--momentum", "0.9"]
        args = train_cli.parse_args()
        with pytest.raises(SystemExit):
            train_cli.build_config(args)
        sys.argv = ["train.py", "--data", "MultiviewC", "--momentum", "0.9",
                    "--no_cycle_momentum"]
        args = train_cli.parse_args()
        _, tcfg = train_cli.build_config(args)
        assert tcfg.momentum == 0.9 and not tcfg.cycle_momentum
    finally:
        sys.argv = argv


@pytest.mark.medium
def test_train_steps_reduce_loss():
    tc = tiny_config(mc_opts)
    # long nominal cycle so the test's 12 steps sit in the low-lr warmup
    # (cycled momentum at 0.95 overshoots on a 6-step toy cycle)
    tcfg = TrainConfig(epochs=100, lr=0.002, scheduler_step_per_epoch=False,
                       pretrained=False)
    model = create_model(tc, tcfg)
    batch = _batch(tc, seeds=[0, 1])
    state, tx = init_state(model, tc, tcfg, jax.random.PRNGKey(0), 4, batch)
    step = make_train_step(model, tx, tc, tcfg, dim_mean=DIM_MEAN)

    losses = []
    for _ in range(12):
        state, ld = step(state, batch)
        losses.append(float(ld["loss"]))
    assert all(np.isfinite(losses))
    assert min(losses[6:]) < losses[0], losses
    assert int(state.step) == 12

    eval_step = make_eval_step(model, tc, dim_mean=DIM_MEAN)
    ld, pred = eval_step(state, batch)
    assert np.isfinite(float(ld["loss"]))
    assert pred["heatmap"].shape[0] == 2


@pytest.mark.medium
def test_mixed_precision_fp32_master_keeps_small_updates():
    """compute_dtype='bfloat16' is MIXED precision: the train step keeps
    fp32 master params + momentum and casts at use. At a tiny lr the
    per-step increment is below bf16 resolution relative to the weights —
    a bf16 master copy would silently drop it; the fp32 master must not."""
    tc = tiny_config(mc_opts)
    tcfg = TrainConfig(epochs=100, lr=2e-6, scheduler_step_per_epoch=False,
                       cycle_momentum=False, momentum=0.0, weight_decay=0.0,
                       pretrained=False, compute_dtype="bfloat16")
    model = create_model(tc, tcfg)
    batch = _batch(tc, seeds=[0])
    batch["images"] = batch["images"].astype(jnp.bfloat16)
    state, tx = init_state(model, tc, tcfg, jax.random.PRNGKey(0), 4, batch)
    p_before = jax.device_get(state.params)
    step = make_train_step(model, tx, tc, tcfg, dim_mean=DIM_MEAN)
    state, ld = step(state, batch)  # donates its input state
    assert np.isfinite(float(ld["loss"]))

    # master params and momentum stayed fp32 (never cast at rest)
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(state.opt_state.trace):
        assert leaf.dtype == jnp.float32

    p_after = jax.device_get(state.params)
    moved = lost_in_bf16 = 0
    for b, a in zip(jax.tree_util.tree_leaves(p_before),
                    jax.tree_util.tree_leaves(p_after)):
        b, a = np.asarray(b), np.asarray(a)
        changed = a != b
        moved += int(changed.sum())
        # elements whose update rounds away when applied to a bf16 master
        lost_in_bf16 += int((changed & (b.astype(jnp.bfloat16)
                                        == a.astype(jnp.bfloat16))).sum())
    assert moved > 0, "no parameter moved — grads did not flow"
    # at lr=2e-6 the increments are ~1e4x below bf16 eps * |w|: a bf16
    # master copy would have lost essentially every one of them
    assert lost_in_bf16 >= 0.95 * moved, (moved, lost_in_bf16)


@pytest.mark.medium
def test_mixed_precision_loss_tracks_fp32():
    """Multi-step bf16-compute loss curve stays close to the fp32 curve on
    the same synthetic recipe (convergence smoke for the bf16 bench)."""
    tc = tiny_config(mc_opts)
    losses = {}
    for dt in ("float32", "bfloat16"):
        tcfg = TrainConfig(epochs=100, lr=0.002, scheduler_step_per_epoch=False,
                           pretrained=False, compute_dtype=dt)
        model = create_model(tc, tcfg)
        batch = _batch(tc, seeds=[0, 1])
        if dt == "bfloat16":
            batch["images"] = batch["images"].astype(jnp.bfloat16)
        state, tx = init_state(model, tc, tcfg, jax.random.PRNGKey(0), 4,
                               {k: (v if k == "grid" else v[:1])
                                for k, v in batch.items()})
        step = make_train_step(model, tx, tc, tcfg, dim_mean=DIM_MEAN)
        curve = []
        for _ in range(8):
            state, ld = step(state, batch)
            curve.append(float(ld["loss"]))
        losses[dt] = curve
    np.testing.assert_allclose(losses["bfloat16"], losses["float32"],
                               rtol=0.05)


@pytest.mark.medium
def test_checkpoint_roundtrip(tmp_path):
    from vfa_tpu.checkpoint import (
        latest_checkpoint,
        load_meta,
        restore_checkpoint,
        save_checkpoint,
    )

    tc = tiny_config(mc_opts)
    tcfg = TrainConfig(epochs=2, pretrained=False)
    model = create_model(tc, tcfg)
    batch = _batch(tc, seeds=[0])
    state, tx = init_state(model, tc, tcfg, jax.random.PRNGKey(0), 4, batch)

    path = save_checkpoint(str(tmp_path), state, tc, tcfg, epoch=5)
    assert latest_checkpoint(str(tmp_path)) == path

    cfg2, tcfg2, epoch, _ = load_meta(path)
    assert cfg2 == tc and tcfg2 == tcfg and epoch == 5

    # restore into a freshly-initialized state and check equality
    model2 = create_model(cfg2, tcfg2)
    state2, _ = init_state(model2, cfg2, tcfg2, jax.random.PRNGKey(7), 4, batch)
    restored = restore_checkpoint(path, jax.device_get(state2))
    l1 = jax.tree_util.tree_leaves(state.params)
    l2 = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
