"""End-to-end benchmark: 7-cam MultiviewC scenes/sec/chip (inference).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is relative to the 25 scenes/sec/chip target in BASELINE.json.

Measures the full per-scene path on the real device: image normalization +
ResNet-18-GN pyramid + laterals + 21 voxel projections + BEV fuse + heads +
in-graph decode (NMS + top-k), batched over scenes, steady-state timing.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

BASELINE_SCENES_PER_SEC = 25.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=0, help="scenes per step (0 = auto)")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--decode", action="store_true", default=True)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from vfa_tpu.codec import decode_frame
    from vfa_tpu.config import TrainConfig, mc_opts
    from vfa_tpu.data.synthetic import make_scene
    from vfa_tpu.train_lib import create_model

    cfg = mc_opts
    tcfg = TrainConfig(pretrained=False, compute_dtype=args.dtype)
    model = create_model(cfg, tcfg)

    dim_mean = jnp.asarray([145.0, 120.0, 255.0])

    def make_fn(batch_size):
        scenes = [make_scene(cfg, seed=s, num_objects=6) for s in range(batch_size)]
        images = jnp.stack([s.images for s in scenes])
        calibs = jnp.stack([s.calibs for s in scenes])
        grid = jnp.asarray(scenes[0].grid)
        if args.dtype == "bfloat16":
            images = images.astype(jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0), images[:1], calibs[:1], grid)

        def fwd(variables, images, calibs, grid):
            pred = model.apply(variables, images, calibs, grid)
            pred = {k: v.astype(jnp.float32) for k, v in pred.items()}
            dec = jax.vmap(
                lambda hm, lo, do, ro: decode_frame(
                    {"heatmap": hm[None], "loc_offset": lo[None],
                     "dim_offset": do[None], "rotation": ro[None]},
                    cfg, cls_thresh=0.7, topk=100, dim_mean=dim_mean,
                )
            )(pred["heatmap"], pred["loc_offset"], pred["dim_offset"],
              pred["rotation"])
            return dec

        jfn = jax.jit(fwd)
        return jfn, (variables, images, calibs, grid)

    batch_sizes = [args.batch] if args.batch else [4, 2, 1]
    for bs in batch_sizes:
        try:
            jfn, fargs = make_fn(bs)
            out = jfn(*fargs)  # compile + first run
            jax.block_until_ready(out)
            break
        except Exception as e:  # noqa: BLE001 — OOM fallback to smaller batch
            print(f"batch {bs} failed: {type(e).__name__}: {e}", file=sys.stderr)
            if bs == batch_sizes[-1]:
                raise
    else:
        raise RuntimeError("no batch size worked")

    for _ in range(args.warmup):
        jax.block_until_ready(jfn(*fargs))

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        jax.block_until_ready(jfn(*fargs))
        times.append(time.perf_counter() - t0)

    t = float(np.median(times))
    scenes_per_sec = bs / t
    p50_ms = t / bs * 1000.0
    print(
        f"# batch={bs} p50={p50_ms:.2f} ms/scene over {args.iters} iters "
        f"(dtype={args.dtype}, device={jax.devices()[0].device_kind})",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "multiviewc_7cam_scenes_per_sec_per_chip",
        "value": round(scenes_per_sec, 3),
        "unit": "scenes/sec",
        "vs_baseline": round(scenes_per_sec / BASELINE_SCENES_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
