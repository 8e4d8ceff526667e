"""Microbench: GroupNorm(16) fwd+bwd variants at backbone scales (real TPU).

flax nn.GroupNorm reshapes channels into (..., G, C/G) to reduce — a
layout-breaking reshape on TPU (C/G = 4 or 8 minor dim). The channel-stats
variant reduces per channel first (layout-preserving, one fused pass for
sum and sum-of-squares), then group-reduces the tiny (B, C) array.

Usage: python tools/prof_gn.py [--batch 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    cache = os.path.expanduser("~/.cache/jax_comp_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    G, eps = 16, 1e-5

    def gn_flax(x, gamma, beta):
        gn = nn.GroupNorm(num_groups=G, epsilon=eps)
        return gn.apply({"params": {"scale": gamma, "bias": beta}}, x)

    def gn_chanstats(x, gamma, beta):
        b, h, w, c = x.shape
        xf = x.astype(jnp.float32)
        s1 = jnp.sum(xf, axis=(1, 2))                      # (B, C)
        s2 = jnp.sum(xf * xf, axis=(1, 2))                 # (B, C)
        g1 = s1.reshape(b, G, c // G).sum(-1)              # (B, G) tiny
        g2 = s2.reshape(b, G, c // G).sum(-1)
        n = h * w * (c // G)
        mean = g1 / n
        var = g2 / n - mean * mean
        inv = jax.lax.rsqrt(var + eps)
        mean_c = jnp.repeat(mean, c // G, axis=1)[:, None, None, :]
        inv_c = jnp.repeat(inv, c // G, axis=1)[:, None, None, :]
        return ((xf - mean_c) * (inv_c * gamma) + beta).astype(x.dtype)

    for (h, w, c) in ((360, 640, 64), (180, 320, 64), (90, 160, 128)):
        B = args.batch * 7
        x = jax.random.normal(jax.random.PRNGKey(0), (B, h, w, c),
                              jnp.bfloat16)
        gamma = jnp.ones((c,), jnp.bfloat16)
        beta = jnp.zeros((c,), jnp.bfloat16)

        ref = gn_flax(x, gamma, beta)
        alt = gn_chanstats(x, gamma, beta)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - alt.astype(jnp.float32))))
        print(f"--- {h}x{w}x{c}  max|diff| = {err:.2e}")

        def bench(name, fn):
            f = jax.jit(jax.grad(
                lambda z, g_, b_: jnp.sum(
                    fn(z, g_, b_).astype(jnp.float32) ** 2),
                argnums=(0, 1, 2)))
            out = f(x, gamma, beta)
            float(jnp.sum(out[1]))
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = f(x, gamma, beta)
            float(jnp.sum(out[1]))
            dt = (time.perf_counter() - t0) / args.iters
            print(f"{name:20s} {dt * 1e3 / args.batch:7.2f} ms/scene")

        bench("gn flax", gn_flax)
        bench("gn chanstats", gn_chanstats)


if __name__ == "__main__":
    main()
