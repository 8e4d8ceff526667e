"""Microbench: maxpool 3x3/s2 backward variants at stem scale (real TPU).

XLA lowers nn.max_pool's VJP to SelectAndScatter, which is slow on TPU.
The slice-composition variant (max of 9 strided slices) backpropagates
through jnp.maximum chains (compare+select + interior-pad) instead.
Forward outputs are identical; gradients differ only on exact ties
(subgradient choice), which torch also resolves arbitrarily.

Usage: python tools/prof_pool.py [--batch 4]
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

    B = args.batch * 7
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 360, 640, 64),
                          jnp.bfloat16)

    def pool_flax(x):
        return nn.max_pool(x, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)))

    def pool_slices(x):
        b, h, w, c = x.shape
        h2, w2 = h // 2, w // 2
        neg = jnp.finfo(x.dtype).min
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                     constant_values=neg)
        out = None
        for dy in range(3):
            for dx in range(3):
                v = jax.lax.slice(
                    xp, (0, dy, dx, 0),
                    (b, dy + 2 * h2 - 1, dx + 2 * w2 - 1, c),
                    (1, 2, 2, 1))
                out = v if out is None else jnp.maximum(out, v)
        return out

    # forward equality check
    a = pool_flax(x)
    bsl = pool_slices(x)
    assert jnp.array_equal(a, bsl), "slice pool != flax pool"

    def bench(name, fn):
        f = jax.jit(jax.grad(lambda z: jnp.sum(fn(z).astype(jnp.float32))))
        g = f(x)
        float(jnp.sum(g))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            g = f(x)
        float(jnp.sum(g))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:24s} {dt * 1e3 / args.batch:7.2f} ms/scene")

    def pool_phases(x):
        # phase-decomposed: out[i] = max(E[i], O[i], E[i+1]) per axis where
        # E/O are the even/odd phases of the padded input. All slices are
        # stride-1 (VJP = zero-pad), no interior padding anywhere.
        b, h, w, c = x.shape
        h2, w2 = h // 2, w // 2
        neg = jnp.finfo(x.dtype).min
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                     constant_values=neg)
        xr = xp.reshape(b, h2 + 1, 2, w2 + 1, 2, c)
        out = None
        for ty in range(3):          # y-tap: E[i], O[i], E[i+1]
            py, oy = (ty % 2, ty // 2)
            for tx in range(3):
                px, ox = (tx % 2, tx // 2)
                v = xr[:, oy:oy + h2, py, ox:ox + w2, px, :]
                out = v if out is None else jnp.maximum(out, v)
        return out

    a2 = pool_phases(x)
    assert jnp.array_equal(a, a2), "phase pool != flax pool"

    bench("maxpool flax (S&S bwd)", pool_flax)
    bench("maxpool slices", pool_slices)
    bench("maxpool phases", pool_phases)


if __name__ == "__main__":
    main()
