"""Component-level training-step timing on the real TPU.

Decomposes the full MultiviewC train step into:
  backbone   ResNet-GN + laterals fwd+bwd (sum-loss)
  rig        window-rig Pallas sampling fwd+bwd per scale (random lats)
  step       the full train step (fwd + encode + loss + bwd + SGD)

Timing forces a host read per iteration batch (axon relay's
block_until_ready is a no-op; see CLAUDE.md).

Usage: python tools/prof_train.py [--batch 4] [--dtype bfloat16] [--remat]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--stem_remat", action="store_true")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--data", type=str, default="MultiviewC")
    p.add_argument("--buckets", type=int, default=0,
                   help="band buckets (0 = auto: 8, or 12 with --grid2x)")
    p.add_argument("--grid2x", action="store_true",
                   help="2x-voxel-resolution stretch config (325x325 BEV)")
    p.add_argument("--tile_v", type=int, default=0,
                   help="rig tile_v override (0 = default for the layout)")
    p.add_argument("--only", type=str, default="",
                   help="comma list of sections to run (default all)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.expanduser("~/.cache/jax_comp_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from vfa_tpu.config import TrainConfig, get_config
    from vfa_tpu.data.synthetic import make_calibrations, make_scene
    from vfa_tpu.geometry import make_grid
    from vfa_tpu.ops.rig import build_rig, default_tile_v, pyramid_feat_shapes
    from vfa_tpu.train_lib import create_model, init_state, make_train_step
    from vfa_tpu.utils import pad_objects

    cfg = get_config(args.data)
    if args.grid2x:
        import dataclasses

        l, w, h = cfg.cube_size
        cfg = dataclasses.replace(cfg, cube_size=(l // 2, w // 2, h))
        print(f"# grid2x: BEV grid {cfg.grid_shape}")
    if not args.buckets:
        args.buckets = 12 if args.grid2x else 8
    tcfg = TrainConfig(pretrained=False, compute_dtype=args.dtype)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    dim_mean = jnp.asarray([145.0, 120.0, 255.0]) if cfg.mode == "3D" else None
    B = args.batch
    only = set(args.only.split(",")) if args.only else None

    model = create_model(cfg, tcfg, rig_impl="pallas",
                         backbone_remat=args.remat,
                         stem_remat=args.stem_remat)
    calibs = make_calibrations(cfg, cfg.num_cam)
    g = make_grid(cfg.world_size, cfg.cube_size[:2], cfg.name)
    tile_v = args.tile_v or default_tile_v(cfg.num_layers, "pallas",
                                           "window", dtype=dtype)
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

    def bench(name, fn, *fargs, force=None):
        # TWO warmup calls: with a donated state the second call recompiles
        # for the donated output layouts — timing after one warmup puts that
        # multi-second recompile inside the timed loop (measured: 800 vs
        # 58 ms/scene for the full train step)
        for _ in range(2):
            out = fn(*fargs)
            float(jnp.sum(force(out) if force else out))  # compile + sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*fargs)
        float(jnp.sum(force(out) if force else out))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:28s} {dt * 1e3 / B:8.2f} ms/scene "
              f"({dt * 1e3:.1f} ms/batch{B})")
        return dt

    # ----------------------------------------------------------- backbone --
    if only is None or "backbone" in only:
        from vfa_tpu.model.resnet import ResNetGN

        bb = ResNetGN((2, 2, 2, 2), remat=args.remat)
        x = batch["images"].reshape(B * cfg.num_cam, *batch["images"].shape[2:])
        bvars = bb.init(jax.random.PRNGKey(0), x[:1])
        # match the real train step: params in the compute dtype (fp32
        # params with bf16 inputs silently promote every conv to fp32)
        bparams = jax.tree_util.tree_map(lambda v: v.astype(dtype),
                                         bvars["params"])

        @jax.jit
        def bb_fwd(params, x):
            f8, f16, f32 = bb.apply({"params": params}, x)
            return (jnp.sum(f8.astype(jnp.float32))
                    + jnp.sum(f16.astype(jnp.float32))
                    + jnp.sum(f32.astype(jnp.float32)))

        @jax.jit
        def bb_fwdbwd(params, x):
            def loss(p):
                f8, f16, f32 = bb.apply({"params": p}, x)
                return (jnp.sum(f8.astype(jnp.float32) ** 2)
                        + jnp.sum(f16.astype(jnp.float32) ** 2)
                        + jnp.sum(f32.astype(jnp.float32) ** 2))
            return jax.grad(loss)(params)

        bench("backbone fwd", bb_fwd, bparams, x)
        bench("backbone fwd+bwd", bb_fwdbwd, bparams, x,
              force=lambda g_: jax.tree_util.tree_leaves(g_)[0])

    # ------------------------------------------------- stem microbenches --
    if only is not None and "stem" in only:
        import flax.linen as nn

        from vfa_tpu.model.resnet import group_norm

        x = batch["images"].reshape(B * cfg.num_cam,
                                    *batch["images"].shape[2:])

        class Stem(nn.Module):
            pool: str = "max"

            @nn.compact
            def __call__(self, z):
                z = nn.Conv(64, (7, 7), strides=(2, 2),
                            padding=((3, 3), (3, 3)), use_bias=False)(z)
                z = nn.relu(group_norm("bn1")(z))
                if self.pool == "max":
                    z = nn.max_pool(z, (3, 3), strides=(2, 2),
                                    padding=((1, 1), (1, 1)))
                else:
                    z = nn.avg_pool(z, (3, 3), strides=(2, 2),
                                    padding=((1, 1), (1, 1)))
                return z

        for pool in ("max", "avg"):
            st = Stem(pool=pool)
            sv = st.init(jax.random.PRNGKey(0), x[:1])
            sv = jax.tree_util.tree_map(lambda v: v.astype(dtype), sv)

            @jax.jit
            def st_fb(params, x):
                return jax.grad(lambda p: jnp.sum(
                    st.apply({"params": p}, x).astype(jnp.float32) ** 2)
                )(params)

            bench(f"stem fwd+bwd ({pool}pool)", st_fb, sv["params"], x,
                  force=lambda g_: jax.tree_util.tree_leaves(g_)[0])

        # GroupNorm alone at layer1 activation scale
        gn = group_norm("g")
        a = jax.random.normal(jax.random.PRNGKey(2),
                              (B * cfg.num_cam, 180, 320, 64), dtype)
        gv = gn.init(jax.random.PRNGKey(0), a)
        gv = jax.tree_util.tree_map(lambda v: v.astype(dtype), gv)

        @jax.jit
        def gn_fb(params, a):
            return jax.grad(lambda p: jnp.sum(
                gn.apply({"params": p}, a).astype(jnp.float32) ** 2))(params)

        bench("groupnorm 180x320x64 f+b", gn_fb, gv["params"], a,
              force=lambda g_: jax.tree_util.tree_leaves(g_)[0])

    # ---------------------------------------------------------------- rig --
    if only is None or "rig" in only:
        from vfa_tpu.ops.rig_pallas import rig_sample_scale_pallas

        key = jax.random.PRNGKey(1)
        feats = []
        for (fh, fw) in pyramid_feat_shapes(cfg.resize_size):
            key, k2 = jax.random.split(key)
            feats.append(jax.random.normal(
                k2, (B, cfg.num_cam, fh, fw, 256), dtype))
        nl = cfg.num_layers
        kern = jax.random.normal(key, (256 * nl, 256), dtype) * 0.01
        bias = jnp.zeros((256,), dtype)

        # rig passed as an argument (a closure-captured rig becomes a 2 GB
        # graph constant and blows the remote compiler's request limit)
        @jax.jit
        def rig_fwdbwd(rig, kern, feats):
            def loss(kern, feats):
                tot = 0.0
                for sr, lat in zip(rig.scales, feats):
                    o = rig_sample_scale_pallas(lat, sr, kern, bias,
                                                out_dtype=jnp.float32)
                    tot += jnp.sum(o)
                return tot
            return jax.grad(loss, argnums=(0, 1))(kern, feats)

        @jax.jit
        def rig_fwd(rig, kern, feats):
            tot = 0.0
            for sr, lat in zip(rig.scales, feats):
                o = rig_sample_scale_pallas(lat, sr, kern, bias,
                                            out_dtype=jnp.float32)
                tot += jnp.sum(o)
            return tot

        bench("rig fwd", rig_fwd, rig, kern, feats)
        bench("rig fwd+bwd", rig_fwdbwd, rig, kern, feats,
              force=lambda g_: g_[0])

    # --------------------------------------------------------------- step --
    if only is None or "step" in only:
        state, tx = init_state(
            model, cfg, tcfg, jax.random.PRNGKey(0), 100,
            {k: (v if k == "grid" else v[:1]) for k, v in batch.items()})
        # mixed precision: fp32 master state, the step casts at use
        # (matches train.py / bench.py --train)
        step = make_train_step(model, tx, cfg, tcfg, dim_mean=dim_mean)

        holder = {"state": state}

        def run(batch, rig):
            holder["state"], loss = step(holder["state"], batch, rig)
            return loss

        bench("full train step", run, batch, rig,
              force=lambda l: l["loss"])


if __name__ == "__main__":
    main()
