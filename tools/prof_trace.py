"""Capture a device trace of the train step and print the op-level
time breakdown (top self-time ops), using xprof's offline converters.

This answers "where do the milliseconds go" at HLO-op granularity —
DMA-vs-MXU for the Pallas kernels shows up as fusion-vs-custom-call time.

Usage: python tools/prof_trace.py [--batch 8] [--dtype bfloat16]
       [--mode train|infer] [--top 30]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--mode", type=str, default="train",
                   choices=["train", "infer"])
    p.add_argument("--data", type=str, default="MultiviewC")
    p.add_argument("--buckets", type=int, default=0,
                   help="band buckets (0 = auto: 8, or 12 with --grid2x)")
    p.add_argument("--chunks", type=int, default=1)
    p.add_argument("--grid2x", action="store_true",
                   help="2x-voxel-resolution stretch config (325x325 BEV)")
    p.add_argument("--remat", action="store_true",
                   help="backbone remat (grid2x training needs it)")
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--trace_dir", type=str, default="",
                   help="parse an existing trace dir instead of capturing")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.expanduser("~/.cache/jax_comp_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    tdir = args.trace_dir
    if not tdir:
        from vfa_tpu.config import TrainConfig, get_config
        from vfa_tpu.data.synthetic import make_calibrations, make_scene
        from vfa_tpu.geometry import make_grid
        from vfa_tpu.ops.rig import (build_rig, default_tile_v,
                                     pyramid_feat_shapes)
        from vfa_tpu.train_lib import (create_model, init_state,
                                       make_train_step)
        from vfa_tpu.utils import pad_objects

        cfg = get_config(args.data)
        if args.grid2x:
            import dataclasses

            l, w, h = cfg.cube_size
            cfg = dataclasses.replace(cfg, cube_size=(l // 2, w // 2, h))
            print(f"# grid2x: BEV grid {cfg.grid_shape}", file=sys.stderr)
        if not args.buckets:
            args.buckets = 12 if args.grid2x else 8
        tcfg = TrainConfig(pretrained=False, compute_dtype=args.dtype)
        dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
        dim_mean = (jnp.asarray([145.0, 120.0, 255.0])
                    if cfg.mode == "3D" else None)
        B = args.batch

        model = create_model(cfg, tcfg, rig_impl="pallas",
                             backbone_chunks=args.chunks,
                             backbone_remat=args.remat)
        calibs = make_calibrations(cfg, cfg.num_cam)
        g = make_grid(cfg.world_size, cfg.cube_size[:2], cfg.name)
        tile_v = default_tile_v(cfg.num_layers, "pallas", "window",
                                dtype=dtype)
        rig = build_rig(calibs, cfg, g, pyramid_feat_shapes(cfg.resize_size),
                        tile_v=tile_v, dtype=dtype, layout="window",
                        band_buckets=args.buckets,
                        cache_dir=os.path.expanduser("~/.cache/vfa_tpu_rig"))

        scenes = [make_scene(cfg, seed=s, num_objects=6) for s in range(B)]
        objs = [pad_objects(s.objects, 16, cfg.mode) for s in scenes]
        batch = {
            "images": jnp.stack([s.images for s in scenes]).astype(dtype),
            "calibs": jnp.stack([s.calibs for s in scenes]),
            "grid": jnp.asarray(scenes[0].grid),
            "heatmap": jnp.stack([s.heatmap for s in scenes]),
            "location": jnp.stack([o["location"] for o in objs]),
            "valid": jnp.stack([o["valid"] for o in objs]),
        }
        if cfg.mode == "3D":
            batch["dimension"] = jnp.stack([o["dimension"] for o in objs])
            batch["rotation"] = jnp.stack([o["rotation"] for o in objs])

        state, tx = init_state(
            model, cfg, tcfg, jax.random.PRNGKey(0), 100,
            {k: (v if k == "grid" else v[:1]) for k, v in batch.items()})
        # mixed precision: fp32 master state, the step casts at use
        # (matches train.py / bench.py --train since round 4)
        step = make_train_step(model, tx, cfg, tcfg, dim_mean=dim_mean)

        def once():
            nonlocal state
            state, loss = step(state, batch, rig)
            return loss

        loss = once()
        float(jnp.sum(loss["loss"]))  # compile + sync
        loss = once()
        float(jnp.sum(loss["loss"]))  # steady state (donated layouts)

        tdir = tempfile.mkdtemp(prefix="vfa_trace_")
        with jax.profiler.trace(tdir):
            for _ in range(args.steps):
                loss = once()
            float(jnp.sum(loss["loss"]))
        print(f"# trace dir: {tdir}", file=sys.stderr)

    paths = sorted(glob.glob(os.path.join(tdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        print("no .xplane.pb found under", tdir, file=sys.stderr)
        sys.exit(1)

    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [paths[-1]], "framework_op_stats", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode()
    stats = json.loads(data)
    # expected: list of tables; the first has per-op rows
    rows = None
    for table in (stats if isinstance(stats, list) else [stats]):
        cols = [c.get("label", c.get("id")) for c in table.get("cols", [])]
        if "Type" in cols or "Operation" in cols or rows is None:
            rows = [dict(zip(cols, [cell.get("v") for cell in r["c"]]))
                    for r in table.get("rows", [])]
            break
    if not rows:
        print(json.dumps(stats)[:4000])
        return
    key = next((k for k in rows[0]
                if "self" in k.lower() and "time" in k.lower()), None)
    name = next((k for k in rows[0] if "operation" in k.lower()
                 or k.lower() == "op name"), list(rows[0])[0])
    rows.sort(key=lambda r: -(r.get(key) or 0))
    tot = sum((r.get(key) or 0) for r in rows)
    print(f"{'self-time':>12s}  {'%':>6s}  op")
    for r in rows[:args.top]:
        v = r.get(key) or 0
        print(f"{v:12.0f}  {100 * v / tot:6.2f}  {str(r.get(name))[:90]}")


if __name__ == "__main__":
    main()
