"""Shared CLI policy for the compiled-rig fast sampling path.

The reference runs its (only) sampling formulation by default
(`/root/reference/evaluate.py:177-198`, `/root/reference/train.py:200-286`);
vfa_tpu's product default is likewise its FAST formulation: the compiled
camera rig (`ops/rig.py`) through the fused Pallas kernels on TPU. All
three datasets have fixed per-dataset calibrations, so the rig (a one-time
host-side precompute keyed by the calibrations) is always valid; `--no_rig`
is the escape hatch for dynamic/per-frame calibrations, which fall back to
the reference-semantics gather path (`ops/voxel.py`).

Tuned defaults (bench.py, TPU v5e):
  - impl:    'auto' -> pallas on TPU (fused DMA+matmul kernels, hand-written
             VJP), xla elsewhere (banded-matmul scan; pallas interpret mode
             on CPU is test-only).
  - buckets: 12 for inference, 8 for training (the 8-bucket A is smaller in
             band padding but the VJP working set makes 12 the training
             sweet spot only at grid2x; measured round 3/4).
  - tile_v:  dtype-aware via ops.rig.default_tile_v (fp32 features double
             the kernels' VMEM window scratch).
"""

from __future__ import annotations

import os

import numpy as np

INFERENCE_BUCKETS = 12
TRAIN_BUCKETS = 8


def add_rig_args(parser, training: bool = False) -> None:
    """Install the shared rig flag surface on a CLI parser."""
    parser.add_argument(
        "--no_rig", action="store_true",
        help="disable the compiled-rig fast sampling path and use the "
             "dynamic-gather reference formulation (needed only for "
             "per-frame/dynamic calibrations; ~45x slower on TPU)")
    parser.add_argument(
        "--rig", action="store_true",
        help="deprecated no-op: the compiled rig is the default")
    parser.add_argument(
        "--rig_impl", type=str, default="auto",
        choices=["auto", "xla", "pallas"],
        help="rig sampling backend; auto = fused Pallas kernels on TPU, "
             "banded XLA matmuls elsewhere")
    parser.add_argument(
        "--rig_layout", type=str, default="window",
        choices=["flat", "window"],
        help="rig band layout (window: compact 2D image windows)")
    parser.add_argument(
        "--rig_buckets", type=int, default=None,
        help="max band-width buckets (DP-optimal edges); default "
             f"{TRAIN_BUCKETS if training else INFERENCE_BUCKETS} "
             f"({'training' if training else 'inference'} policy)")


def resolve_rig_impl(impl: str) -> str:
    """'auto' -> pallas on TPU, xla on CPU/GPU (import-light)."""
    if impl != "auto":
        return impl
    import jax

    return "pallas" if jax.default_backend() == "tpu" else "xla"


def resolve_rig_buckets(buckets, training: bool) -> int:
    if buckets is not None:
        return buckets
    return TRAIN_BUCKETS if training else INFERENCE_BUCKETS


def build_cli_rig(args, cfg, calibs, *, dtype, training: bool = False,
                  rig_impl: str | None = None):
    """Build the rig a CLI run will sample through, or None under --no_rig.

    `calibs` is one scene's (N, 3, 4) projection stack — valid for the
    whole run because calibrations are rig constants per dataset. `dtype`
    must be the feature compute dtype: tile_v (VMEM window budget) and the
    A-matrix dtype both follow it.
    """
    if args.no_rig:
        return None
    import jax.numpy as jnp

    from vfa_tpu.geometry import make_grid
    from vfa_tpu.ops.rig import build_rig, default_tile_v, pyramid_feat_shapes

    impl = rig_impl if rig_impl is not None else resolve_rig_impl(args.rig_impl)
    jdtype = jnp.bfloat16 if str(dtype) in ("bfloat16", "bf16") else jnp.float32
    rig = build_rig(
        np.asarray(calibs), cfg,
        make_grid(cfg.world_size, cfg.cube_size[:2], cfg.name),
        pyramid_feat_shapes(cfg.resize_size),
        tile_v=default_tile_v(cfg.num_layers, impl, args.rig_layout,
                              dtype=jdtype),
        dtype=jdtype,
        layout=args.rig_layout,
        band_buckets=resolve_rig_buckets(args.rig_buckets, training),
        cache_dir=os.path.expanduser("~/.cache/vfa_tpu_rig"),
    )
    print(f"compiled-rig sampling enabled ({impl}, "
          f"{resolve_rig_buckets(args.rig_buckets, training)} buckets, "
          f"{jdtype.__name__})")
    return rig
