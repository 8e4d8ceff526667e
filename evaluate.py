"""Evaluation CLI — mirrors the reference `evaluate.py` surface: run the
model over the validation split, write the four detection/gt txt artifacts
(PR format `frame x y`; APAOS format `frame x y z l w h rot conf`), then
compute MODA/MODP/precision/recall and (3D mode) AP/AOS/OS.

    python evaluate.py --data MultiviewC --checkpoint <dir>

Unlike the reference (`/root/reference/evaluate.py:208-217`, dataset chosen
by editing __main__; MATLAB engine + per-pair CUDA IoU), everything here is
one pure-Python/JAX stack and the dataset is a flag. --synthetic evaluates
the metric pipeline end-to-end on procedural scenes with no dataset on disk.
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
    p.add_argument("--checkpoint", type=str, default=None,
                   help="orbax checkpoint dir (from train.py)")
    p.add_argument("--torch_checkpoint", type=str, default=None,
                   help="reference .pth checkpoint to convert and evaluate")
    p.add_argument("-b", "--batch_size", type=int, default=1)
    p.add_argument("--cls_thresh", type=float, default=0.7)
    p.add_argument("--topk", type=int, default=100)
    p.add_argument("--td", type=float, default=None,
                   help="MODA distance threshold; default is the backend's "
                        "own (30 for python/pyeval, 78 for matlab)")
    p.add_argument("--eval_tool", type=str, default="python",
                   choices=["python", "matlab"],
                   help="metric semantics to mirror (both run in-process; "
                        "'matlab' = the official devkit's td=78 behavior)")
    p.add_argument("--out_dir", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic_frames", type=int, default=8)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="compute dtype; float32 is the reference-parity "
                        "default, bfloat16 is the fast TPU recipe "
                        "(bench.py's 72 scenes/sec)")
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
    from vfa_tpu.eval.evaluate import evaluate_ap_aos, evaluate_rcll_prec_moda_modp
    from vfa_tpu.train_lib import create_model, init_state, make_forward
    from vfa_tpu.utils import to_numpy

    cfg = get_config(args.data)
    if args.root:
        cfg = dataclasses.replace(cfg, root=args.root)
    if args.tiny:
        cfg = tiny_config(cfg)
    tcfg = TrainConfig(pretrained=False, topk=args.topk,
                       compute_dtype=args.dtype)

    # ------------------------------------------------------------ data ----
    if args.synthetic:
        from vfa_tpu.data.synthetic_loader import SyntheticSceneLoader

        loader = SyntheticSceneLoader(cfg, num_frames=args.synthetic_frames,
                                      batch_size=args.batch_size, seed=123)
        dim_mean = loader.dim_mean
    else:
        from vfa_tpu.data.adapters import ADAPTERS
        from vfa_tpu.data.frame_dataset import FrameDataset, SceneLoader

        base = ADAPTERS[cfg.name](cfg.root, world_size=cfg.world_size,
                                  cube_LWH=cfg.cube_size)
        ds = FrameDataset(base, cfg, split="val")
        loader = SceneLoader(ds, batch_size=args.batch_size, shuffle=False)
        dim_mean = ds.dim_mean

    # ----------------------------------------------------------- model ----
    from vfa_tpu.rig_cli import build_cli_rig, resolve_rig_impl

    rig_impl = resolve_rig_impl(args.rig_impl)
    model = create_model(cfg, tcfg, rig_impl=rig_impl)
    sample = next(iter(loader))
    batch0 = {k: jnp.asarray(v) for k, v in sample.items()
              if k not in ("objects", "index", "frame")}
    state, _ = init_state(model, cfg, tcfg, jax.random.PRNGKey(0), 1, batch0)

    if args.checkpoint:
        from vfa_tpu.checkpoint import load_meta, restore_checkpoint

        state = restore_checkpoint(args.checkpoint, jax.device_get(state))
        _, _, _, extra = load_meta(args.checkpoint)
        if extra.get("dim_mean"):
            dim_mean = np.asarray(extra["dim_mean"], np.float32)
        print(f"restored {args.checkpoint}")
    elif args.torch_checkpoint:
        from vfa_tpu.convert import load_reference_checkpoint

        params, bs = load_reference_checkpoint(
            args.torch_checkpoint, state.params, state.batch_stats)
        state = state.replace(params=params, batch_stats=bs)
        print(f"converted reference checkpoint {args.torch_checkpoint}")
    else:
        print("WARNING: evaluating a randomly initialized model")

    # compiled-rig fast sampling is the DEFAULT (calibrations are rig
    # constants on all three datasets); --no_rig falls back to the
    # dynamic-gather reference formulation
    rig = build_cli_rig(args, cfg, sample["calibs"][0],
                        dtype=args.dtype, training=False, rig_impl=rig_impl)

    forward = make_forward(model)
    encoder = ObjectEncoder(cfg, dim_mean=dim_mean, topk=args.topk)

    out_dir = args.out_dir or os.path.join("experiments", cfg.name, "evaluation")
    os.makedirs(out_dir, exist_ok=True)
    pr_pred, pr_gt, ap_pred, ap_gt = [], [], [], []

    for batch in loader:
        pred = forward(state.params, state.batch_stats,
                       jnp.asarray(batch["images"]), jnp.asarray(batch["calibs"]),
                       jnp.asarray(batch["grid"]), rig)
        B = pred["heatmap"].shape[0]
        for b in range(B):
            frame_id = int(batch["frame"][b])
            one = {k: v[b:b + 1] for k, v in pred.items()}
            dets = encoder.batch_decode(one, args.cls_thresh)
            gts = batch["objects"][b]
            for i, o in enumerate(dets):
                loc = to_numpy(o.location)
                pr_pred.append([frame_id, loc[0], loc[1]])
                if cfg.mode == "3D":
                    dim = to_numpy(o.dimension)[::-1]  # h w l -> l w h
                    ap_pred.append([frame_id, *loc, *dim, float(o.rotation),
                                    float(o.conf)])
            for o in gts:
                loc = to_numpy(o.location)
                pr_gt.append([frame_id, loc[0], loc[1]])
                if cfg.mode == "3D":
                    dim = to_numpy(o.dimension)[::-1]
                    ap_gt.append([frame_id, *loc[:3], *dim, float(o.rotation)])

    paths = {}
    # all 4 artifacts are written even when empty (the reference's
    # FormatPRData/FormatAPAOSData always dump, `evaluate.py:84-138`); in 2D
    # mode the ap_aos pair is empty
    for name, rows in (("pr_dir_pred", pr_pred), ("pr_dir_gt", pr_gt),
                       ("ap_aos_pred", ap_pred), ("ap_aos_gt", ap_gt)):
        paths[name] = os.path.join(out_dir, f"{name}.txt")
        np.savetxt(paths[name], np.asarray(rows, dtype=np.float64))

    if not pr_pred:
        print("no detections above threshold; MODA undefined (0)")
        return

    recall, precision, moda, modp = evaluate_rcll_prec_moda_modp(
        paths["pr_dir_pred"], paths["pr_dir_gt"], dataset=cfg.name,
        eval=args.eval_tool, td=args.td)
    td = args.td if args.td is not None else (78 if args.eval_tool == "matlab" else 30)
    print(f"\n{args.eval_tool} eval: MODA {moda:.1f}, MODP {modp:.1f}, "
          f"prec {precision:.1f}, rcll {recall:.1f} (td={td:g})")
    if cfg.mode == "3D" and ap_pred:
        r = evaluate_ap_aos(paths["ap_aos_pred"], paths["ap_aos_gt"])
        for i, t in enumerate((75, 50, 25)):
            print(f"AP_{t}: {r[3*i]:.2f}, AOS_{t}: {r[3*i+1]:.2f}, "
                  f"OS_{t}: {r[3*i+2]:.2f}")


if __name__ == "__main__":
    main()
