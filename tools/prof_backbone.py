"""Per-stage backbone fwd+bwd timing on the real TPU.

Bisects the ResNet-18-GN backward (measured ~8x the forward at MultiviewC
scale, tools/prof_train.py) into stem / layer1..4 contributions, and
re-times each stage with GroupNorm swapped for identity to separate the
conv backward from the norm backward.

Usage: python tools/prof_backbone.py [--batch 4] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--cams", type=int, default=7)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    cache = os.path.expanduser("~/.cache/jax_comp_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from vfa_tpu.model.resnet import conv1x1, conv3x3, group_norm

    class Block(nn.Module):
        planes: int
        stride: int = 1
        has_downsample: bool = False
        norm: bool = True

        @nn.compact
        def __call__(self, x):
            gn = group_norm if self.norm else (lambda name: (lambda z: z))
            identity = x
            out = nn.relu(gn("bn1")(conv3x3(self.planes, self.stride,
                                            "conv1")(x)))
            out = gn("bn2")(conv3x3(self.planes, 1, "conv2")(out))
            if self.has_downsample:
                identity = gn("downsample_1")(
                    conv1x1(self.planes, self.stride, "downsample_0")(x))
            return nn.relu(out + identity)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    n = args.batch * args.cams
    key = jax.random.PRNGKey(0)

    def bench(name, fn, *fargs):
        out = fn(*fargs)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*fargs)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:36s} {dt * 1e3 / args.batch:8.2f} ms/scene "
              f"({dt * 1e3:.1f} ms/batch{args.batch})", flush=True)
        return dt

    class Stage(nn.Module):
        planes: int
        stride: int
        blocks: int = 2
        norm: bool = True

        @nn.compact
        def __call__(self, x):
            for b in range(self.blocks):
                s = self.stride if b == 0 else 1
                ds = b == 0 and (s != 1 or x.shape[-1] != self.planes)
                x = Block(self.planes, s, ds, name=f"b{b}",
                          norm=self.norm)(x)
            return x

    # (input shape, planes, stride) per stage at MultiviewC 720x1280
    stages = [
        ("layer1", (n, 180, 320, 64), 64, 1),
        ("layer2", (n, 180, 320, 64), 128, 2),
        ("layer3", (n, 90, 160, 128), 256, 2),
        ("layer4", (n, 45, 80, 256), 512, 2),
    ]

    for norm in (True, False):
        tag = "gn" if norm else "nonorm"
        for name, shp, planes, stride in stages:
            x = jax.random.normal(key, shp, dtype)
            st = Stage(planes, stride, norm=norm)
            v = st.init(jax.random.PRNGKey(1), x[:1])

            @jax.jit
            def fb(params, x, st=st):
                return jax.grad(lambda p: jnp.sum(
                    st.apply({"params": p}, x).astype(jnp.float32) ** 2)
                )(params)

            bench(f"{name}[{tag}] fwd+bwd", fb, v["params"], x)

    # conv1 7x7/s2 on 3 channels: plain vs space-to-depth formulation
    import jax.numpy as jnp2  # noqa: F401

    x3 = jax.random.normal(key, (n, 720, 1280, 3), dtype)
    w7 = jax.random.normal(jax.random.PRNGKey(3), (7, 7, 3, 64), dtype) * 0.05

    def conv_plain(w, x):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def conv_s2d(w, x):
        B, H, W, Cin = x.shape
        xs = x.reshape(B, H // 2, 2, W // 2, 2, Cin)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2,
                                                    4 * Cin)
        w8 = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
        w4 = w8.reshape(4, 2, 4, 2, Cin, -1).transpose(0, 2, 1, 3, 4, 5)
        w4 = w4.reshape(4, 4, 4 * Cin, -1)
        return jax.lax.conv_general_dilated(
            xs, w4, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    ya = conv_plain(w7, x3[:2])
    yb = conv_s2d(w7, x3[:2])
    err = float(jnp.max(jnp.abs((ya - yb).astype(jnp.float32))))
    print(f"conv1 s2d max |diff| = {err:.4g}")

    for name, f in (("plain", conv_plain), ("s2d", conv_s2d)):
        fb = jax.jit(lambda w, x, f=f: jax.grad(
            lambda w_: jnp.sum(f(w_, x).astype(jnp.float32) ** 2))(w))
        bench(f"conv1[{name}] fwd+dW", fb, w7, x3)

    # GN alone at each stage's activation scale
    for name, shp in [("gn 180x320x64", (n, 180, 320, 64)),
                      ("gn 90x160x128", (n, 90, 160, 128)),
                      ("gn 45x80x256", (n, 45, 80, 256)),
                      ("gn 23x40x512", (n, 23, 40, 512))]:
        a = jax.random.normal(key, shp, dtype)
        g = group_norm("g")
        gv = g.init(jax.random.PRNGKey(1), a[:1])

        @jax.jit
        def gfb(params, a, g=g):
            return jax.grad(lambda p: jnp.sum(
                g.apply({"params": p}, a).astype(jnp.float32) ** 2))(params)

        bench(f"{name} fwd+bwd", gfb, gv["params"], a)


if __name__ == "__main__":
    main()
