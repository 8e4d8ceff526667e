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
import os
import sys
import time

import numpy as np

BASELINE_SCENES_PER_SEC = 25.0
# Training has no reference number (the reference trains batch-1 on one GPU
# with no published throughput); the baseline is this repo's own round-1
# stretch target of 3x its first training measurement (3 * 4.1).
BASELINE_TRAIN_SCENES_PER_SEC = 12.3



def _apply_platform_env():
    """VFA_TPU_PLATFORM=cpu forces the CPU backend (the sandbox's axon site
    overrides JAX_PLATFORMS, so an explicit config update is needed)."""
    import os

    plat = os.environ.get("VFA_TPU_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

def main():
    _apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=0, help="scenes per step (0 = auto)")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--no-rig", action="store_true",
                   help="use the dynamic-calibration gather path instead of "
                        "the compiled-rig banded-matmul path")
    p.add_argument("--rig_impl", type=str, default="pallas",
                   choices=["pallas", "xla"],
                   help="rig sampling backend (pallas: fused kernel)")
    p.add_argument("--layout", type=str, default="window",
                   choices=["flat", "window"],
                   help="rig band layout (window: compact 2D image windows, "
                        "~2-3x fewer A bytes/FLOPs than flat)")
    p.add_argument("--buckets", type=int, default=0,
                   help="max band buckets (DP-optimal edges); 0 = auto "
                        "(12 inference / 8 training: more buckets trim A "
                        "but cost extra VJP kernel launches)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize backbone blocks in training "
                        "(frees activation HBM for larger batches)")
    p.add_argument("--stem_remat", action="store_true",
                   help="rematerialize the stem conv1+GN+maxpool only "
                        "(measured NEUTRAL at MC batch 8 — 57.96 vs 57.95 "
                        "ms/scene — and does not unlock unchunked batch 16; "
                        "kept as an experiment knob)")
    p.add_argument("--chunks", type=int, default=0,
                   help="split the backbone+laterals over the B*N camera "
                        "image axis into this many rematerialized chunks "
                        "(caps the conv1/maxpool temp allocations; 0 = auto: "
                        "unchunked first, chunked as the OOM fallback)")
    p.add_argument("--train", action="store_true",
                   help="measure training step throughput instead of "
                        "inference (fwd + encode + loss + bwd + SGD)")
    p.add_argument("--data", type=str, default="MultiviewC",
                   choices=["MultiviewC", "MultiviewX", "Wildtrack"])
    p.add_argument("--grid2x", action="store_true",
                   help="2x-voxel-resolution stretch config (BASELINE config "
                        "5): halves the ground cube_size, MultiviewC "
                        "156x156 -> 325x325 BEV grid")
    p.add_argument("--from_disk", action="store_true",
                   help="feed the steady-state loop from an on-disk JPEG "
                        "dataset through SceneLoader (decode + host->device "
                        "staging overlapped with device compute) instead of "
                        "pre-staged device arrays; generates the synthetic "
                        "dataset under --disk_dir on first use")
    p.add_argument("--disk_dir", type=str, default="/tmp/vfa_loader_bench")
    p.add_argument("--no_augment", action="store_true",
                   help="with --train --from_disk: skip the train-split "
                        "ColorJitter (reference train.py:209-214 jitters "
                        "every train image; the default applies it on-device "
                        "inside the jitted staging step)")
    p.add_argument("--disk_frames", type=int, default=24)
    p.add_argument("--loader_threads", type=int,
                   default=max(1, min(16, (os.cpu_count() or 1))))
    p.add_argument("--image_backend", type=str, default="native",
                   choices=["native", "pil"])
    p.add_argument("--bev_shards", type=int, default=0,
                   help="shard the BEV plane into this many row-slabs over "
                        "a (data=1, bev=N) mesh (the grid2x scale-out path: "
                        "each device holds rig/activations for its slab; "
                        "fuse convs halo-exchange via GSPMD). Requires N "
                        "visible devices; N=1 exercises the sharded code "
                        "path on one chip. 0 = unsharded")
    args = p.parse_args()

    import jax

    try:  # persistent compile cache makes repeat runs fast
        cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/jax_comp_cache"))
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # noqa: BLE001
        pass

    import jax.numpy as jnp

    from vfa_tpu.codec import decode_frame
    from vfa_tpu.config import TrainConfig, get_config
    from vfa_tpu.data.synthetic import make_calibrations, make_scene
    from vfa_tpu.ops.rig import build_rig, pyramid_feat_shapes
    from vfa_tpu.train_lib import create_model

    cfg = get_config(args.data)
    if args.grid2x:
        import dataclasses

        l, w, h = cfg.cube_size
        cfg = dataclasses.replace(cfg, cube_size=(l // 2, w // 2, h))
        print(f"# grid2x: BEV grid {cfg.grid_shape}", file=sys.stderr)
    if not args.buckets:
        # grid2x training needs the 12-bucket rig (the 8-bucket A is ~1 GB
        # bigger from band padding and OOMs with the VJP live)
        args.buckets = 12 if (args.grid2x or not args.train) else 8
    if args.grid2x and args.train and not args.remat:
        # measured: grid2x batch-1 training OOMs without backbone remat
        args.remat = True
        print("# grid2x train: backbone remat forced on", file=sys.stderr)
    tcfg = TrainConfig(pretrained=False, compute_dtype=args.dtype)
    rig_impl = "xla" if args.no_rig else args.rig_impl

    bev_mesh = None
    if args.bev_shards:
        from vfa_tpu.parallel_bev import make_bev_mesh

        bev_mesh = make_bev_mesh(data=1, bev=args.bev_shards,
                                 devices=jax.devices()[:args.bev_shards])

    def model_for(batch_size, chunks=0):
        # auto: unchunked first — the chunked scan pays a full extra
        # backbone forward (remat), ~3 ms/scene; since the bf16 feature-
        # dtype HBM buffers, batch 8 fits unchunked (15.9 vs 14.4
        # scenes/sec). The chunked variant remains the fallback attempt
        # for configs where unchunked batch 8 still OOMs.
        chunks = args.chunks or chunks or 1
        stem_remat = bool(args.stem_remat)
        return create_model(cfg, tcfg, rig_impl=rig_impl,
                            backbone_remat=args.remat,
                            backbone_chunks=chunks,
                            stem_remat=stem_remat,
                            bev_mesh=bev_mesh)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    dim_mean = jnp.asarray([145.0, 120.0, 255.0]) if cfg.mode == "3D" else None

    rig = None
    if not args.no_rig:
        rig_calibs = make_calibrations(cfg, cfg.num_cam)
        from vfa_tpu.geometry import make_grid

        g = make_grid(cfg.world_size, cfg.cube_size[:2], cfg.name)
        t_rig = time.perf_counter()
        from vfa_tpu.ops.rig import default_tile_v

        tile_v = default_tile_v(cfg.num_layers, rig_impl, args.layout,
                                 dtype=dtype)
        if args.bev_shards:
            from vfa_tpu.parallel_bev import build_bev_sharded_rig

            rig = build_bev_sharded_rig(
                rig_calibs, cfg, g, pyramid_feat_shapes(cfg.resize_size),
                num_shards=args.bev_shards, tile_v=tile_v, dtype=dtype,
                band_buckets=args.buckets,
                cache_dir=os.path.expanduser("~/.cache/vfa_tpu_rig"))
        else:
            rig = build_rig(rig_calibs, cfg, g,
                            pyramid_feat_shapes(cfg.resize_size),
                            tile_v=tile_v, dtype=dtype,
                            layout=args.layout, band_buckets=args.buckets,
                            cache_dir=os.path.expanduser("~/.cache/vfa_tpu_rig"))
        print(f"# rig build: {time.perf_counter() - t_rig:.1f}s", file=sys.stderr)

    def make_train_fn(batch_size, chunks=0):
        from vfa_tpu.train_lib import init_state, make_train_step
        from vfa_tpu.utils import pad_objects

        model = model_for(batch_size, chunks)

        scenes = [make_scene(cfg, seed=s, num_objects=6)
                  for s in range(batch_size)]
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
        # init runs the dynamic voxel path; one scene is enough for params
        # (the full batch OOMs HBM through the gather formulation)
        init_batch = {k: (v if k == "grid" else v[:1])
                      for k, v in batch.items()}
        state, tx = init_state(model, cfg, tcfg, jax.random.PRNGKey(0),
                               100, init_batch)
        # bf16 training is MIXED precision: params/momentum stay fp32
        # master copies in the state; make_train_step casts at use
        # (tcfg.compute_dtype), so no cast here.
        step = make_train_step(model, tx, cfg, tcfg, dim_mean=dim_mean)
        local_rig = rig
        if bev_mesh is not None:
            from vfa_tpu.parallel import replicate

            state = replicate(state, bev_mesh)
            batch = replicate(batch, bev_mesh)
            local_rig = replicate(rig, bev_mesh)

        class Runner:
            def __init__(self, state):
                self.state = state
                self.step = step  # exposed for cost_analysis (MFU)

            def __call__(self, batch, rig):
                self.state, loss = step(self.state, batch, rig)
                return loss

        return Runner(state), (batch, local_rig)

    def make_fn(batch_size, chunks=0):
        model = model_for(batch_size, chunks)
        scenes = [make_scene(cfg, seed=s, num_objects=6) for s in range(batch_size)]
        images = jnp.stack([s.images for s in scenes]).astype(dtype)
        calibs = jnp.stack([s.calibs for s in scenes])
        grid = jnp.asarray(scenes[0].grid)
        from vfa_tpu.train_lib import init_grid

        variables = model.init(jax.random.PRNGKey(0),
                               images[:1].astype(jnp.float32), calibs[:1],
                               init_grid(grid))
        if args.dtype == "bfloat16":
            variables = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, variables)
        local_rig = rig
        if bev_mesh is not None:
            from vfa_tpu.parallel import replicate

            variables = replicate(variables, bev_mesh)
            images = replicate(images, bev_mesh)
            calibs = replicate(calibs, bev_mesh)
            grid = replicate(grid, bev_mesh)
            local_rig = replicate(rig, bev_mesh)

        def fwd(variables, images, calibs, grid, rig):
            pred = model.apply(variables, images, calibs, grid, rig=rig)
            pred = {k: v.astype(jnp.float32) for k, v in pred.items()}
            if cfg.mode == "3D":
                dec = jax.vmap(
                    lambda hm, lo, do, ro: decode_frame(
                        {"heatmap": hm[None], "loc_offset": lo[None],
                         "dim_offset": do[None], "rotation": ro[None]},
                        cfg, cls_thresh=0.7, topk=100, dim_mean=dim_mean,
                    )
                )(pred["heatmap"], pred["loc_offset"], pred["dim_offset"],
                  pred["rotation"])
            else:
                dec = jax.vmap(
                    lambda hm, lo: decode_frame(
                        {"heatmap": hm[None], "loc_offset": lo[None]},
                        cfg, cls_thresh=0.7, topk=100,
                    )
                )(pred["heatmap"], pred["loc_offset"])
            return dec

        jfn = jax.jit(fwd)
        return jfn, (variables, images, calibs, grid, local_rig)

    def sync(out):
        # the axon relay's block_until_ready is a no-op; force a host read
        key = "loss" if args.train else "conf"
        return float(jnp.sum(out[key]))

    # bf16 peak matmul TFLOP/s per chip (MFU denominator); fp32 runs are
    # still reported against the bf16 peak so MFU stays comparable.
    PEAK_TFLOPS = {"TPU v4": 275.0, "TPU v5 lite": 197.0, "TPU v5e": 197.0,
                   "TPU v5": 459.0, "TPU v5p": 459.0, "TPU v6 lite": 918.0,
                   "TPU v6e": 918.0}

    def step_flops(jfn, fargs):
        """XLA's own FLOP count for the compiled step (covers backbone +
        rig matmuls + heads + decode + backward when training)."""
        try:
            if hasattr(jfn, "step"):  # train Runner: lower the jitted step
                lowered = jfn.step.lower(jfn.state, *fargs)
            else:
                lowered = jfn.lower(*fargs)
            cost = lowered.compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            return float(cost.get("flops", 0.0)) or None
        except Exception as e:  # noqa: BLE001 — relay may not expose costs
            print(f"# cost_analysis unavailable: {e}", file=sys.stderr)
            return None

    maker = make_train_fn if args.train else make_fn
    # attempts: (batch, backbone_chunks). Training tries batch 8 unchunked
    # first (fastest), then chunked (halved stem temps) before shrinking
    # the batch — at WT scale unchunked 8 can OOM where chunked 8 fits.
    if args.batch:
        attempts = [(args.batch, 0)]
    elif args.train:
        attempts = ([(4, 2), (2, 1), (2, 2), (1, 1)] if args.grid2x
                    else [(8, 1), (8, 2), (4, 1), (4, 2), (2, 1), (1, 1)])
    else:
        # batch 32 measures 72.6 vs 71.96 scenes/sec at batch 16 (round 5);
        # 24 is SLOWER (68.2). OOM falls back down the list.
        attempts = ([(8, 1), (4, 1), (2, 1), (1, 1)] if args.grid2x
                    else [(32, 1), (16, 1), (8, 1), (4, 1), (2, 1), (1, 1)])
    for bs, chunks in attempts:
        try:
            jfn, fargs = maker(bs, chunks)
            sync(jfn(*fargs))  # compile + first run
            # warmup must be inside the fallback: in --train mode the second
            # call recompiles for the donated state's output layouts, and
            # THAT compile can be the one that exceeds HBM
            for _ in range(args.warmup):
                sync(jfn(*fargs))
            break
        except Exception as e:  # noqa: BLE001 — OOM fallback to smaller batch
            print(f"batch {bs} (chunks {chunks}) failed: "
                  f"{type(e).__name__}: {e}", file=sys.stderr)
            if (bs, chunks) == attempts[-1]:
                raise
            # drop the failed attempt's executable + device args before the
            # next attempt: a mid-execution OOM leaves them bound, and the
            # leaked HBM cascades every smaller batch into the same OOM
            jfn = fargs = None
            import gc

            gc.collect()
    else:
        raise RuntimeError("no batch size worked")

    if args.from_disk:
        # real input pipeline: JPEG decode (SceneLoader thread pool) +
        # host->device transfer run concurrently with device compute —
        # dispatches are async, so while the chip executes step i the host
        # decodes batch i+1 and stages batch i's successor. Batches stage
        # as uint8 (4x fewer H2D bytes — and the reference's own pipeline
        # quantization: PIL resize is uint8 before ToTensor divides); the
        # [0,1] normalization + compute-dtype cast happen on-device.
        from tools.bench_loader import DiskFrames, ensure_dataset
        from vfa_tpu.data.frame_dataset import SceneLoader

        # drop_last=True needs at least one full batch of frames on disk
        n_frames = max(args.disk_frames, bs)
        fpaths = ensure_dataset(os.path.join(args.disk_dir, args.data),
                                n_frames, cfg.num_cam,
                                cfg.resize_size, quality=90)
        ds = DiskFrames(cfg, fpaths, n_frames, args.image_backend)
        loader = SceneLoader(ds, batch_size=bs, shuffle=False,
                             num_threads=args.loader_threads, max_objects=8,
                             drop_last=True, images_dtype=np.uint8)
        # training staging applies the reference's train-split ColorJitter
        # ON-DEVICE (vfa_tpu/data/augment.device_color_jitter): the loader
        # keeps staging quantized uint8 (4x fewer H2D bytes) and the jitter
        # is a fused elementwise pass on the chip instead of host-thread
        # numpy HSV math; factors/op order are host-sampled per image.
        jitter = args.train and not args.no_augment
        if jitter:
            from vfa_tpu.data.augment import (device_color_jitter,
                                              sample_jitter_params)

            aug_rng = np.random.default_rng(0)

            def stage_fn(x, factors, order):
                f = x.astype(jnp.float32) * (1.0 / 255.0)
                flat = f.reshape((-1,) + f.shape[2:])
                flat = device_color_jitter(flat, factors, order)
                return flat.reshape(f.shape).astype(dtype)

            jstage = jax.jit(stage_fn)

            def stage(x):
                fac, ordr = sample_jitter_params(
                    aug_rng, x.shape[0] * x.shape[1])
                return jstage(x, jnp.asarray(fac), jnp.asarray(ordr))
        else:
            stage = jax.jit(
                lambda x: (x.astype(jnp.float32) * (1.0 / 255.0)).astype(dtype))
        for nb in loader:  # warm: page cache, staging ring, stage() compile
            sync_imgs = stage(jnp.asarray(nb["images"]))
        float(jnp.sum(sync_imgs))
        done = 0
        out = None
        t0 = time.perf_counter()
        while done < args.iters:
            for nb in loader:
                imgs = stage(jnp.asarray(nb["images"]))
                if args.train:
                    db = dict(fargs[0])
                    db["images"] = imgs
                    out = jfn(db, fargs[1])
                else:
                    out = jfn(fargs[0], imgs, *fargs[2:])
                done += 1
                if done >= args.iters:
                    break
        sync(out)
        t = (time.perf_counter() - t0) / args.iters
    else:
        # steady-state throughput: pipeline dispatches, sync once at the end
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = jfn(*fargs)
        sync(out)
        t = (time.perf_counter() - t0) / args.iters

    scenes_per_sec = bs / t
    p50_ms = t / bs * 1000.0
    device_kind = jax.devices()[0].device_kind
    print(
        f"# batch={bs} p50={p50_ms:.2f} ms/scene over {args.iters} iters "
        f"(dtype={args.dtype}, device={device_kind})",
        file=sys.stderr,
    )
    # MFU: achieved FLOP/s from XLA's compiled cost model vs chip peak
    mfu_extra = {}
    flops = step_flops(jfn, fargs)
    if flops and rig is not None and rig_impl == "pallas":
        # XLA's cost model sees ~0 FLOPs inside Pallas custom calls — add
        # the rig sampling/collapse matmuls from the builder's own model
        from vfa_tpu.ops.rig import rig_matmul_flops

        flops += bs * rig_matmul_flops(rig, train=args.train)
    if flops:
        tflops_s = flops / t / 1e12
        mfu_extra["tflops_per_sec"] = round(tflops_s, 2)
        peak = PEAK_TFLOPS.get(device_kind)
        if peak:
            mfu_extra["mfu"] = round(tflops_s / peak, 4)
        print(f"# {flops / 1e9:.1f} GFLOP/step -> {tflops_s:.1f} TFLOP/s"
              + (f" = {tflops_s / peak * 100:.1f}% of {device_kind} bf16 peak"
                 if peak else ""), file=sys.stderr)
    g2x = "_grid2x" if args.grid2x else ""
    if args.bev_shards:
        g2x += f"_bev{args.bev_shards}"
    if args.from_disk:
        g2x += "_fromdisk"
    if args.train:
        print(json.dumps({
            "metric": f"{args.data.lower()}_{cfg.num_cam}cam_train"
                      f"{g2x}_scenes_per_sec_per_chip",
            "value": round(scenes_per_sec, 3),
            "unit": "scenes/sec",
            "vs_baseline": round(
                scenes_per_sec / BASELINE_TRAIN_SCENES_PER_SEC, 4),
            **mfu_extra,
        }))
        return
    print(json.dumps({
        "metric": f"{args.data.lower()}_{cfg.num_cam}cam{g2x}_scenes_per_sec_per_chip"
                  if (args.data != "MultiviewC" or args.grid2x
                      or args.bev_shards or args.from_disk)
                  else "multiviewc_7cam_scenes_per_sec_per_chip",
        "value": round(scenes_per_sec, 3),
        "unit": "scenes/sec",
        "vs_baseline": round(scenes_per_sec / BASELINE_SCENES_PER_SEC, 4),
        **mfu_extra,
    }))


if __name__ == "__main__":
    main()
