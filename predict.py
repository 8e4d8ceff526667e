"""Single-scene inference + visualization CLI.

The reference's predict.py is non-functional as written (wrong constructor /
unpack arities, `/root/reference/predict.py:70,80,84`); this implements its
documented intent: load a checkpoint, run one validation scene, decode
detections, and save a BEV heatmap plot plus per-camera projected boxes.

    python predict.py --data MultiviewC --checkpoint <dir> [--synthetic]
"""

from __future__ import annotations

import argparse
import os

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
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--index", type=int, default=0)
    p.add_argument("--cls_thresh", type=float, default=0.9)
    p.add_argument("--out", type=str, default="prediction.png")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--tiny", action="store_true")
    from vfa_tpu.rig_cli import add_rig_args

    add_rig_args(p, training=False)
    return p.parse_args()


def main():
    _apply_platform_env()
    args = parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from vfa_tpu.codec import ObjectEncoder
    from vfa_tpu.config import TrainConfig, get_config
    from vfa_tpu.data.synthetic import tiny_config
    from vfa_tpu.train_lib import create_model, init_state, make_forward
    from vfa_tpu.visualization.figure import save_prediction_figure

    cfg = get_config(args.data)
    if args.root:
        cfg = dataclasses.replace(cfg, root=args.root)
    if args.tiny:
        cfg = tiny_config(cfg)
    tcfg = TrainConfig(pretrained=False)

    dim_mean = np.array([145.0, 120.0, 255.0], np.float32)
    if args.synthetic:
        from vfa_tpu.data.synthetic import make_scene

        scene = make_scene(cfg, seed=args.index, num_objects=6)
        images, calibs, grid = scene.images, scene.calibs, scene.grid
        gt_objects = scene.objects
    else:
        from vfa_tpu.data.adapters import ADAPTERS
        from vfa_tpu.data.frame_dataset import FrameDataset

        base = ADAPTERS[cfg.name](cfg.root, world_size=cfg.world_size,
                                  cube_LWH=cfg.cube_size)
        ds = FrameDataset(base, cfg, split="val")
        item = ds[args.index]
        images, calibs, grid = item["images"], item["calibs"], item["grid"]
        gt_objects = item["objects"]
        if ds.dim_mean is not None:
            dim_mean = ds.dim_mean

    from vfa_tpu.rig_cli import build_cli_rig, resolve_rig_impl

    rig_impl = resolve_rig_impl(args.rig_impl)
    model = create_model(cfg, tcfg, rig_impl=rig_impl)
    ji, jc, jg = jnp.asarray(images), jnp.asarray(calibs), jnp.asarray(grid)
    batch0 = {"images": ji[None], "calibs": jc[None], "grid": jg}
    state, _ = init_state(model, cfg, tcfg, jax.random.PRNGKey(0), 1, batch0)
    if args.checkpoint:
        from vfa_tpu.checkpoint import restore_checkpoint

        state = restore_checkpoint(args.checkpoint, jax.device_get(state))
        print(f"restored {args.checkpoint}")
    else:
        print("WARNING: predicting with a randomly initialized model")

    # compiled-rig fast sampling is the DEFAULT (calibrations are rig
    # constants on all three datasets); --no_rig falls back to the
    # dynamic-gather reference formulation
    rig = build_cli_rig(args, cfg, calibs, dtype="float32",
                        training=False, rig_impl=rig_impl)

    forward = make_forward(model)
    pred = forward(state.params, state.batch_stats, ji, jc, jg, rig)
    encoder = ObjectEncoder(cfg, dim_mean=dim_mean)
    dets = encoder.batch_decode(pred, args.cls_thresh)
    print(f"{len(dets)} detections above conf {args.cls_thresh}")
    for o in dets[:10]:
        print("  ", {f: np.round(np.asarray(getattr(o, f), dtype=np.float64), 2).tolist()
                     for f in o._fields
                     if f != "classname" and getattr(o, f) is not None})

    heatmap = np.asarray(jax.nn.sigmoid(pred["heatmap"][0, 0]))
    save_prediction_figure(args.out, images, calibs, heatmap, dets, gt_objects, cfg)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
