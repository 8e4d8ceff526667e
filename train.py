"""Training CLI — mirrors the reference `train.py` surface:

    python train.py --data {MultiviewC,MultiviewX,Wildtrack} [flags]

Reference recipe (`/root/reference/train.py:21-138,200-286`): 40 epochs, SGD
lr .02 / momentum .5 / wd 5e-4, OneCycleLR (stepped per epoch — replicated,
see --fix_scheduler), batch 1, checkpoint every 5 epochs. Additions over the
reference: --batch_size actually works (scenes batch over a mesh 'data'
axis), --synthetic runs the full loop without any dataset on disk, orbax
checkpoints, jsonl metrics.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time
from datetime import datetime

import numpy as np



def _apply_platform_env():
    """VFA_TPU_PLATFORM=cpu forces the CPU backend (the sandbox's axon site
    overrides JAX_PLATFORMS, so an explicit config update is needed)."""
    import os

    plat = os.environ.get("VFA_TPU_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True,
                   choices=["MultiviewC", "MultiviewX", "Wildtrack"])
    p.add_argument("--root", type=str, default=None)
    p.add_argument("--mode", type=str, default=None, choices=["2D", "3D"])
    p.add_argument("--world_size", type=int, nargs=2, default=None)
    p.add_argument("--image_size", type=int, nargs=2, default=None)
    p.add_argument("--resize_size", type=int, nargs=2, default=None)
    p.add_argument("-e", "--epochs", type=int, default=40)
    p.add_argument("-b", "--batch_size", type=int, default=1)
    p.add_argument("--lr", type=float, default=0.02)
    p.add_argument("--weight_decay", type=float, default=5e-4)
    p.add_argument("--momentum", type=float, default=0.5)
    p.add_argument("--grid_h", type=int, default=None)
    p.add_argument("--cube_size", type=int, nargs=3, default=None)
    p.add_argument("--angle_range", type=int, default=360)
    p.add_argument("--pretrained", type=int, default=1)
    p.add_argument("--heatmap", type=str, default="GK", choices=["GK", "RGK"])
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--savedir", type=str, default="experiments")
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--loss_weight", type=float, nargs="*", default=None)
    p.add_argument("--print_iter", type=int, default=1)
    p.add_argument("--vis_iter", type=int, default=50,
                   help="decode + write pred-vs-gt figures every N train "
                        "iterations (0 disables); mirrors the reference "
                        "trainer's vis_iter")
    p.add_argument("--cls_thresh", type=float, default=0.8)
    p.add_argument("--topk", type=int, default=50)
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="training compute dtype; bfloat16 halves memory and "
                        "roughly doubles MXU throughput (float32 for "
                        "checkpoint-parity runs)")
    p.add_argument("--fix_scheduler", action="store_true",
                   help="step OneCycle per iteration instead of replicating "
                        "the reference's per-epoch quirk")
    p.add_argument("--no_cycle_momentum", action="store_true",
                   help="use the constant --momentum instead of replicating "
                        "torch OneCycleLR's 0.95<->0.85 momentum cycle (the "
                        "reference quirk that makes SGD's momentum=0.5 inert, "
                        "reference train.py:256-258)")
    p.add_argument("--no_augment", action="store_true",
                   help="disable the train-split ColorJitter augmentation "
                        "(the reference trains with brightness/contrast/hue "
                        "0.2, train.py:209-214)")
    p.add_argument("--synthetic", action="store_true",
                   help="train on procedurally generated scenes (no dataset)")
    p.add_argument("--synthetic_frames", type=int, default=16)
    p.add_argument("--tiny", action="store_true",
                   help="shrink world/images for smoke runs")
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a jax.profiler trace at this global step")
    p.add_argument("--debug_nans", action="store_true",
                   help="fail fast on NaNs in jitted computations")
    from vfa_tpu.rig_cli import add_rig_args

    add_rig_args(p, training=True)
    # Multi-host (SURVEY §2.9): one JAX process per host; data axis spans
    # hosts over DCN, cam axis stays on ICI. Single-process (the default
    # --num_processes 1) is the tested degenerate path.
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed and shard the batch over "
                        "a global (data, cam) mesh; see vfa_tpu/parallel.py")
    p.add_argument("--coordinator", type=str, default="localhost:8476",
                   help="coordinator address host:port (process 0's host)")
    p.add_argument("--num_processes", type=int,
                   default=int(os.environ.get("VFA_NUM_PROCESSES", "1")))
    p.add_argument("--process_id", type=int,
                   default=int(os.environ.get("VFA_PROCESS_ID", "0")))
    p.add_argument("--mesh_cam", type=int, default=1,
                   help="devices on the mesh 'cam' axis (keep <= chips/host "
                        "so the camera all-reduce rides ICI)")
    return p.parse_args()


def build_config(args):
    from vfa_tpu.config import TrainConfig, get_config
    from vfa_tpu.data.synthetic import tiny_config

    cfg = get_config(args.data)
    overrides = {}
    for field in ("root", "mode", "grid_h"):
        v = getattr(args, field)
        if v is not None:
            overrides[field] = v
    for field in ("world_size", "image_size", "resize_size", "cube_size"):
        v = getattr(args, field)
        if v is not None:
            overrides[field] = tuple(v)
    if args.loss_weight:
        overrides["loss_weight"] = tuple(args.loss_weight)
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    if args.tiny:
        cfg = tiny_config(cfg)

    if args.momentum != 0.5 and not args.no_cycle_momentum:
        raise SystemExit(
            "--momentum has no effect while the reference's OneCycleLR "
            "momentum cycle is replicated (it overwrites SGD's momentum "
            "every step; reference train.py:256-258). Pass "
            "--no_cycle_momentum to train with a constant momentum.")

    tcfg = TrainConfig(
        epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
        weight_decay=args.weight_decay, momentum=args.momentum,
        angle_range=args.angle_range, pretrained=bool(args.pretrained),
        heatmap=args.heatmap, seed=args.seed, savedir=args.savedir,
        print_iter=args.print_iter, vis_iter=args.vis_iter,
        cls_thresh=args.cls_thresh,
        topk=args.topk, scheduler_step_per_epoch=not args.fix_scheduler,
        cycle_momentum=not args.no_cycle_momentum,
        compute_dtype=args.dtype,
    )
    return cfg, tcfg


def make_loaders(cfg, args):
    """Returns (train, val, dim_mean, device_jitter).

    device_jitter=True means the train loader stages RAW uint8 images (4x
    fewer host/H2D bytes) and the train-split ColorJitter runs ON-DEVICE
    inside the jitted staging step (vfa_tpu/data/augment.device_color_jitter)
    — the host numpy jitter measures SECONDS per scene
    (tools/bench_loader.py colorjitter_host_ms_per_scene) and would
    bottleneck any real training run. The synthetic and multi-host paths
    keep the host float path (synthetic images aren't decoded from disk;
    make_global_batch assembles host numpy arrays)."""
    # train-split ColorJitter, matching the reference recipe; never on val
    augment = None
    if not args.no_augment:
        from vfa_tpu.data.augment import ColorJitterAugment

        augment = ColorJitterAugment(brightness=0.2, contrast=0.2, hue=0.2)

    # multi-host: each process loads a disjoint strided frame shard
    shard = {"process_id": args.process_id, "process_count": args.num_processes}

    if args.synthetic:
        from vfa_tpu.data.synthetic_loader import SyntheticSceneLoader

        train = SyntheticSceneLoader(cfg, num_frames=args.synthetic_frames,
                                     batch_size=args.batch_size, seed=args.seed,
                                     augment=augment, **shard)
        val = SyntheticSceneLoader(cfg, num_frames=max(2, args.synthetic_frames // 8),
                                   batch_size=args.batch_size, seed=args.seed + 1,
                                   **shard)
        return train, val, train.dim_mean, False

    from vfa_tpu.data.adapters import ADAPTERS
    from vfa_tpu.data.frame_dataset import FrameDataset, SceneLoader

    kw = {}
    if cfg.name == "MultiviewC":
        kw["heatmap_type"] = args.heatmap
    base = ADAPTERS[cfg.name](cfg.root, world_size=cfg.world_size,
                              cube_LWH=cfg.cube_size, **kw)
    train_ds = FrameDataset(base, cfg, split="train")
    val_ds = FrameDataset(base, cfg, split="val")
    device_jitter = augment is not None and not args.multihost
    train = SceneLoader(train_ds, batch_size=args.batch_size, shuffle=True,
                        seed=args.seed,
                        augment=None if device_jitter else augment,
                        images_dtype=np.uint8 if device_jitter
                        else np.float32, **shard)
    val = SceneLoader(val_ds, batch_size=args.batch_size, shuffle=False,
                      images_dtype=np.uint8 if device_jitter else np.float32,
                      **shard)
    return train, val, train_ds.dim_mean, device_jitter


def main():
    _apply_platform_env()
    args = parse_args()
    cfg, tcfg = build_config(args)

    if args.multihost:
        # must run before any other jax API touches the backend
        from vfa_tpu.parallel import init_multihost

        init_multihost(args.coordinator, args.num_processes, args.process_id)

    import jax
    import jax.numpy as jnp

    from vfa_tpu.checkpoint import latest_checkpoint, restore_checkpoint, save_checkpoint
    from vfa_tpu.convert import load_torchvision_resnet_params
    from vfa_tpu.train_lib import (
        create_model, current_lr, init_state, make_eval_step, make_train_step,
    )
    from vfa_tpu.utils import MetricDict

    if args.debug_nans:
        from vfa_tpu.observability import enable_nan_debugging

        enable_nan_debugging()

    np.random.seed(tcfg.seed)

    train_loader, val_loader, dim_mean, device_jitter = make_loaders(cfg, args)
    steps_per_epoch = max(1, len(train_loader))
    from vfa_tpu.rig_cli import build_cli_rig, resolve_rig_impl

    rig_impl = resolve_rig_impl(args.rig_impl)
    model = create_model(cfg, tcfg, rig_impl=rig_impl)

    compute_dt = (jnp.bfloat16 if tcfg.compute_dtype == "bfloat16"
                  else jnp.float32)
    if device_jitter:
        # uint8-staged batches: [0,1] normalization + train-split
        # ColorJitter run ON-DEVICE in one jitted pass (host jitter is
        # seconds/scene — see make_loaders docstring); factors/op order
        # are host-sampled per image for determinism under --seed
        from vfa_tpu.data.augment import (device_color_jitter,
                                          sample_jitter_params)

        aug_rng = np.random.default_rng(tcfg.seed + 777)

        @jax.jit
        def _stage_jitter(x, factors, order):
            f = x.astype(jnp.float32) * (1.0 / 255.0)
            flat = f.reshape((-1,) + f.shape[2:])
            flat = device_color_jitter(flat, factors, order)
            return flat.reshape(f.shape).astype(compute_dt)

    @jax.jit
    def _stage_plain(x):
        return (x.astype(jnp.float32) * (1.0 / 255.0)).astype(compute_dt)

    def stage_images(images, jitter=False):
        imgs = jnp.asarray(images)
        if jitter:
            fac, order = sample_jitter_params(
                aug_rng, imgs.shape[0] * imgs.shape[1])
            return _stage_jitter(imgs, jnp.asarray(fac), jnp.asarray(order))
        return _stage_plain(imgs)

    sample = next(iter(train_loader))
    batch0 = {k: jnp.asarray(v) for k, v in sample.items()
              if k not in ("objects", "index", "frame")}
    if batch0["images"].dtype == jnp.uint8:
        batch0["images"] = stage_images(sample["images"])
    # init runs the dynamic voxel path; one scene is enough for params (the
    # full batch can exceed HBM through the gather formulation)
    init0 = {k: (v if k == "grid" else v[:1]) for k, v in batch0.items()}
    state, tx = init_state(model, cfg, tcfg, jax.random.PRNGKey(tcfg.seed),
                           steps_per_epoch, init0)

    if tcfg.pretrained:
        try:
            params = load_torchvision_resnet_params(state.params, tcfg.base)
            state = state.replace(params=params)
            print("loaded torchvision ImageNet backbone weights")
        except Exception as e:  # noqa: BLE001 — offline envs have no weights
            print(f"pretrained backbone unavailable ({e}); training from scratch")

    savedir = os.path.join(tcfg.savedir, args.resume or
                           datetime.now().strftime("%Y-%m-%d_%H-%M-%S"))
    os.makedirs(savedir, exist_ok=True)
    start_epoch = 1
    if args.resume:
        ckpt = latest_checkpoint(os.path.join(savedir, "checkpoints"))
        if ckpt:
            from vfa_tpu.checkpoint import load_meta

            state = restore_checkpoint(ckpt, jax.device_get(state))
            _, _, ep, _ = load_meta(ckpt)
            start_epoch = ep + 1
            print(f"resumed from {ckpt} at epoch {start_epoch}")

    # compiled-rig fast sampling is the DEFAULT (calibrations are rig
    # constants on all three datasets); --no_rig falls back to the
    # dynamic-gather reference formulation
    rig = build_cli_rig(args, cfg, sample["calibs"][0],
                        dtype=tcfg.compute_dtype, training=True,
                        rig_impl=rig_impl)

    if tcfg.compute_dtype == "bfloat16":
        # Mixed precision: params + optimizer momentum stay fp32 MASTER
        # copies in the state; make_train_step casts them to bf16 at use
        # (convs/matmuls run bf16 on the MXU, the SGD update accumulates
        # fp32 — a bf16 master copy silently drops lr*grad increments
        # below bf16 resolution; see train_lib.make_train_step).
        print("mixed precision: bfloat16 compute, float32 master params")

    mesh = None
    if args.multihost:
        from vfa_tpu.parallel import make_global_batch, make_mesh, replicate

        mesh = make_mesh(cam=args.mesh_cam)
        state = replicate(state, mesh)
        print(f"multihost: {jax.process_count()} processes, "
              f"{len(jax.devices())} devices, mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    def to_device(batch, jitter=False):
        jb = {k: v for k, v in batch.items()
              if k not in ("objects", "index", "frame")}
        if jb["images"].dtype == np.uint8:
            jb["images"] = stage_images(jb["images"], jitter=jitter)
        elif tcfg.compute_dtype == "bfloat16":
            jb["images"] = jnp.asarray(jb["images"], jnp.bfloat16)
        if mesh is None:
            return {k: jnp.asarray(v) for k, v in jb.items()}
        return make_global_batch(jb, mesh)

    train_step = make_train_step(model, tx, cfg, tcfg, dim_mean=dim_mean)
    eval_step = make_eval_step(
        model, cfg, dim_mean=dim_mean,
        compute_dtype=(jnp.bfloat16 if tcfg.compute_dtype == "bfloat16"
                       else None))

    from vfa_tpu.codec import ObjectEncoder

    encoder = ObjectEncoder(cfg, dim_mean=dim_mean, topk=tcfg.topk)

    def write_train_vis(writer, batch, pred, step):
        """Every vis_iter: pred-vs-gt heatmap + per-camera boxes, like the
        reference trainer (`vfa/trainer.py:68-87`)."""
        from vfa_tpu.visualization.figure import heatmap_figure, prediction_figure

        one = {k: v[0:1] for k, v in pred.items()}
        dets = encoder.batch_decode(one, tcfg.cls_thresh)
        pred_hm = np.asarray(jax.nn.sigmoid(pred["heatmap"][0, 0]))
        gt_hm = np.asarray(batch["heatmap"][0])
        writer.figure("train/heatmap", heatmap_figure(pred_hm, gt_hm), step)
        imgs = np.asarray(batch["images"][0])
        if imgs.dtype == np.uint8:  # uint8-staged loader (device jitter)
            imgs = imgs.astype(np.float32) / 255.0
        writer.figure("train/prediction", prediction_figure(
            imgs, np.asarray(batch["calibs"][0]),
            pred_hm, dets, batch["objects"][0], cfg), step)

    from vfa_tpu.observability import MetricsWriter, profile_trace

    writer = MetricsWriter(savedir)
    writer.text("config", json.dumps(
        {"dataset": dataclasses.asdict(cfg), "train": dataclasses.asdict(tcfg)},
        indent=2, default=str))

    global_it = 0
    for epoch in range(start_epoch, tcfg.epochs + 1):
        t0 = time.time()
        epoch_loss = MetricDict()
        for i, batch in enumerate(train_loader):
            jb = to_device(batch, jitter=device_jitter)
            tracing = args.profile_steps and global_it == args.profile_steps
            with profile_trace(os.path.join(savedir, "profile") if tracing else None):
                state, loss_dict = train_step(state, jb, rig)
                if tracing:
                    jax.block_until_ready(loss_dict)
            epoch_loss += {k: float(v) for k, v in loss_dict.items()}
            if tcfg.vis_iter and i % tcfg.vis_iter == 0:
                _, vis_pred = eval_step(state, jb, rig)
                write_train_vis(writer, batch, vis_pred, global_it)
            global_it += 1
            if i % tcfg.print_iter == 0:
                m = epoch_loss.mean
                print(f"[TRAIN] epoch {epoch}/{tcfg.epochs} it {i+1}/{steps_per_epoch} "
                      + " ".join(f"{k}={v:.5f}" for k, v in sorted(m.items())),
                      flush=True)
        train_mean = epoch_loss.mean

        val_loss = MetricDict()
        last_pred = None
        for batch in val_loader:
            jb = to_device(batch)
            loss_dict, last_pred = eval_step(state, jb, rig)
            val_loss += {k: float(v) for k, v in loss_dict.items()}
        val_mean = val_loss.mean
        lr = current_lr(tcfg, steps_per_epoch, int(state.step) - 1)
        print(f"[VAL] epoch {epoch}: train {train_mean.get('loss', 0):.5f} "
              f"val {val_mean.get('loss', 0):.5f} lr {lr:.5f}")
        writer.scalars("train", train_mean, epoch)
        writer.scalars("val", val_mean, epoch)
        writer.scalars("opt", {"lr": lr, "epoch_seconds": time.time() - t0}, epoch)
        if last_pred is not None:
            from vfa_tpu.visualization.figure import heatmap_figure

            hm = np.asarray(jax.nn.sigmoid(last_pred["heatmap"][0, 0]))
            writer.figure("val/heatmap", heatmap_figure(hm), epoch)

        if epoch % 5 == 0 or epoch == tcfg.epochs:
            path = save_checkpoint(os.path.join(savedir, "checkpoints"),
                                   state, cfg, tcfg, epoch,
                                   extra={"dim_mean": None if dim_mean is None
                                          else np.asarray(dim_mean).tolist()})
            print(f"saved checkpoint {path}")
    writer.close()


if __name__ == "__main__":
    main()
