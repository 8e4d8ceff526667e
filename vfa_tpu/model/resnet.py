"""ResNet-18/34 feature pyramid with GroupNorm(16) in place of BatchNorm.

Reference: `vfa/model/resnet.py` — BasicBlock with GN(16)
(`resnet.py:26-57`), stem conv7x7/s2 + GN + maxpool3x3/s2
(`resnet.py:100-102,139-140`), and a 3-scale pyramid return
(feats8, feats16, feats32) with the classifier dropped (`resnet.py:138-147`).

TPU-first: NHWC layout (XLA's preferred conv layout on TPU), flax.linen
modules named so torch checkpoint keys map 1:1 (see `vfa_tpu/convert.py`).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

GN_EPS = 1e-5  # torch GroupNorm default eps


# Measured stem negative results (tools/prof_pool.py, prof_train.py --only
# stem; do not re-derive):
# - A space-to-depth rewrite of conv1 (2x2 phases + exact 4x4 kernel) does
#   NOT help: backbone fwd+bwd 28.1 -> 28.7 ms/scene. XLA already handles
#   the 3-input-channel conv; the stem cost is max_pool + GN, not conv1.
# - The max_pool VJP lowers to SelectAndScatter (~5.2 ms/scene f+b at
#   MultiviewC stem scale) and that IS the fastest formulation on TPU: a
#   max-of-9-strided-slices rewrite is 13x slower (interior-pad VJPs) and a
#   phase-decomposed stride-1 variant 5x slower (the (..., W, C) ->
#   (..., W/2, 2, C) reshape breaks the lane layout).




def conv3x3(features: int, stride: int = 1, name: str | None = None) -> nn.Conv:
    return nn.Conv(
        features, (3, 3), strides=(stride, stride), padding=((1, 1), (1, 1)),
        use_bias=False, name=name,
    )


def conv1x1(features: int, stride: int = 1, name: str | None = None) -> nn.Conv:
    return nn.Conv(
        features, (1, 1), strides=(stride, stride), padding="VALID",
        use_bias=False, name=name,
    )


def group_norm(name: str | None = None) -> nn.GroupNorm:
    return nn.GroupNorm(num_groups=16, epsilon=GN_EPS, name=name)


class BasicBlock(nn.Module):
    """Two 3x3 convs with GN, residual add (`vfa/model/resnet.py:26-57`)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.relu(group_norm("bn1")(conv3x3(self.planes, self.stride, "conv1")(x)))
        out = group_norm("bn2")(conv3x3(self.planes, 1, "conv2")(out))
        if self.has_downsample:
            identity = group_norm("downsample_1")(
                conv1x1(self.planes, self.stride, "downsample_0")(x)
            )
        return nn.relu(out + identity)


class ResNetGN(nn.Module):
    """ResNet trunk returning the /8, /16, /32 pyramid (NHWC).

    `layers` is (2, 2, 2, 2) for resnet18, (3, 4, 6, 3) for resnet34
    (`vfa/model/resnet.py:151-173`).
    """

    layers: Sequence[int] = (2, 2, 2, 2)
    # rematerialize each residual block in the backward pass: trades one
    # extra forward for dropping the stage activations from HBM (enables
    # larger scene batches in training; param names are unchanged)
    remat: bool = False
    # rematerialize the stem only: the pre-pool conv1 activation is the
    # single largest residual in the whole net (full-res/2 x 64ch); under
    # HBM pressure XLA compresses/uncompresses it across the step instead.
    # Recomputing conv1+GN in the backward pass drops it entirely.
    stem_remat: bool = False
    # fuse the stem's GN+relu+maxpool backward into two Pallas kernels
    # (ops/stem.py): forward numerics unchanged (exact flax op sequence),
    # backward recomputes from the conv1 activation instead of XLA's
    # SelectAndScatter + multi-pass GN reductions. MEASURED NEGATIVE at MC
    # train batch 8 bf16 (round 5): the kernels beat the ops they replace
    # in isolation (8.3 vs 11.1 ms/scene incl. fwd recompute) and in-step
    # (3.15 ms/scene pallas vs ~3.5 of select_and_scatter+adds+Unknown),
    # but the custom-call boundary costs ~7 ms/scene of XLA glue — paired
    # (W,C)->(W/2,2C) reshape copies (+1.9), halo-strip gathers (+1.3),
    # unfused max/reduce_sum/add_any passes (+4.7), conv layout
    # perturbation (+0.8) — for 65.8 vs 57.0 ms/scene e2e. Default OFF;
    # the op + kernels + tests stay for future Mosaic versions that can
    # relayout (W,64)->(W/2,128) in-kernel (the blocker for native-shape
    # I/O that would kill most of the glue). VFA_FUSED_STEM=1-style
    # experiments: construct ResNetGN(fused_stem=True).
    fused_stem: bool = False

    def _fused_stem_on(self) -> bool:
        # VFA_FUSED_STEM=1/0 overrides the attribute (bench experiments)
        import os

        env = os.environ.get("VFA_FUSED_STEM")
        if env is not None:
            return env != "0"
        return self.fused_stem

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        def stem(mdl, xc):
            del mdl  # scope carrier for nn.remat; children attach compactly
            xc = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                         use_bias=False, name="conv1")(xc)
            if self._fused_stem_on():
                from vfa_tpu.ops.stem import make_module

                return make_module(num_groups=16, epsilon=GN_EPS,
                                   name="bn1")(xc)
            xc = nn.relu(group_norm("bn1")(xc))
            return nn.max_pool(xc, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)))

        if self.stem_remat:
            # prevent_cse=True: outside a scan body XLA would otherwise CSE
            # the rematerialized stem back into the stored original
            x = nn.remat(stem, prevent_cse=True)(self, x)
        else:
            x = stem(self, x)

        inplanes = 64
        feats = []
        for stage, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), self.layers), start=1
        ):
            stride = 1 if stage == 1 else 2
            block_cls = nn.remat(BasicBlock) if self.remat else BasicBlock
            for b in range(blocks):
                s = stride if b == 0 else 1
                ds = b == 0 and (s != 1 or inplanes != planes)
                x = block_cls(planes, s, ds, name=f"layer{stage}_{b}")(x)
                inplanes = planes
            feats.append(x)
        # feats = [feats4, feats8, feats16, feats32]; drop /4
        return feats[1], feats[2], feats[3]
