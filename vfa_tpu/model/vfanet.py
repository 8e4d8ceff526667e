"""VFANet — the full multiview BEV detection model.

Reference: `vfa/model/vfanet.py:14-149`. Structure: in-graph ImageNet
normalization, ResNet-GN 3-scale pyramid, per-scale 1x1 laterals
(128/256/512 -> 256) + GN + ReLU, per-(camera, scale) VFA voxel projection
collapsed to BEV and summed across scales and cameras, a fuse block
(3x3 conv + BN + ReLU, dilated-2 3x3 conv + BN + ReLU), and CenterNet-style
heads: 1-ch heatmap (3x3 dil 4), 2-ch ty/tx, and in 3D mode a 360-bin CSL
orientation head (3x3 dil 4) + 3-ch th/tw/tl.

TPU-first: NHWC; the backbone and laterals run once batched over all N
cameras; the camera loop of the reference (`vfanet.py:64-82`) becomes a
vmapped voxel-sampling + a sum over the camera axis (the reduction XLA turns
into a psum when the camera axis is sharded — see vfa_tpu/parallel.py).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vfa_tpu.config import DatasetConfig
from vfa_tpu.model.resnet import ResNetGN, group_norm
from vfa_tpu.ops.voxel import sample_voxels, voxel_boxes

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

RESNET_LAYERS = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3)}


def torch_linear_init(fan_in: int):
    """torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    for both kernel and bias."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class VFANet(nn.Module):
    """camera_reduce: 'scan' folds the camera axis sequentially (constant
    memory in N — the TPU analog of the reference's Python camera loop,
    but inside one jitted graph); 'vmap' materializes all cameras (use when
    the camera axis is sharded over a mesh so GSPMD turns the sum into an
    all-reduce)."""

    cfg: DatasetConfig
    base: str = "resnet18"
    angle_range: int = 360
    crange: Tuple[float, float] = (-1.0, 0.95)
    camera_reduce: str = "scan"
    # rig sampling backend: 'xla' (lax.scan of banded matmuls) or 'pallas'
    # (fused DMA+matmul+collapse kernel, ~10% faster; needs tile_v<=128)
    rig_impl: str = "xla"
    # rematerialize backbone blocks in the backward pass (bigger train batch)
    backbone_remat: bool = False
    # run the backbone + laterals over the B*N camera-image axis in this
    # many rematerialized chunks: the stem's conv1/maxpool temps (the
    # largest training allocations — bf16[B*N,360,640,64] padded 2x by the
    # 64-channel lane tiling) then peak at one chunk's worth instead of the
    # whole batch. 1 = single pass (inference default).
    backbone_chunks: int = 1
    # rematerialize only the stem (conv1+GN+maxpool): drops the largest
    # single residual (pre-pool conv1 activation) for one cheap recompute
    stem_remat: bool = False
    # mesh for BEV spatial sharding: when a BevShardedRig is passed as
    # `rig`, sampling runs shard_map over this mesh's `bev_axis` (each
    # device holds one row-slab of the rig and computes its slab's BEV
    # cells; the fuse/head convs then run spatially partitioned by GSPMD
    # halo exchange). None = single-device / data-parallel only.
    bev_mesh: Any = None
    bev_axis: str = "bev"

    def setup(self):
        if self.base not in RESNET_LAYERS:
            raise ValueError(
                f"Unrecognized model, expect `resnet18` or `resnet34`, got {self.base}."
            )
        if self.cfg.mode not in ("2D", "3D"):
            raise ValueError(f"mode error, expect `2D` or `3D`, got {self.cfg.mode}")

        self.backbone = ResNetGN(RESNET_LAYERS[self.base], remat=self.backbone_remat,
                                 stem_remat=self.stem_remat, name="base")
        self.lat8 = nn.Conv(256, (1, 1), name="lat8")
        self.lat16 = nn.Conv(256, (1, 1), name="lat16")
        self.lat32 = nn.Conv(256, (1, 1), name="lat32")
        self.bn8 = group_norm("bn8")
        self.bn16 = group_norm("bn16")
        self.bn32 = group_norm("bn32")

        # collapse Linear(C*nl -> C) per scale (`vfa/model/vfa_op.py:59`),
        # as raw params (not Dense) so they can be applied inside lax.scan
        # over the camera axis; torch Linear init + (in, out) kernel layout.
        nl = self.cfg.num_layers
        fan_in = 256 * nl
        for s in (8, 16, 32):
            setattr(self, f"collapse{s}_kernel", self.param(
                f"vfa{s}_collapse_kernel", torch_linear_init(fan_in), (fan_in, 256)))
            setattr(self, f"collapse{s}_bias", self.param(
                f"vfa{s}_collapse_bias", torch_linear_init(fan_in), (256,)))

        self.fuse_conv0 = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), name="fuse_0")
        self.fuse_bn1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, name="fuse_1")
        self.fuse_conv3 = nn.Conv(
            256, (3, 3), padding=((2, 2), (2, 2)), kernel_dilation=(2, 2), name="fuse_3"
        )
        self.fuse_bn4 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, name="fuse_4")

        self.map_classifier = nn.Conv(
            1, (3, 3), padding=((4, 4), (4, 4)), kernel_dilation=(4, 4),
            use_bias=False, name="map_classifier_0",
        )
        self.tytx_conv0 = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), name="tytx_pred_0")
        self.tytx_gn1 = group_norm("tytx_pred_1")
        self.tytx_conv3 = nn.Conv(
            2, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, name="tytx_pred_3"
        )
        if self.cfg.mode == "3D":
            self.orient_pred = nn.Conv(
                self.angle_range, (3, 3), padding=((4, 4), (4, 4)),
                kernel_dilation=(4, 4), use_bias=False, name="orient_pred_0",
            )
            self.thtwtl_conv0 = nn.Conv(
                256, (3, 3), padding=((1, 1), (1, 1)), name="thtwtl_pred_0"
            )
            self.thtwtl_gn1 = group_norm("thtwtl_pred_1")
            self.thtwtl_conv3 = nn.Conv(
                3, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, name="thtwtl_pred_3"
            )

    def bev_features(self, images, calibs, grid, rig=None) -> jnp.ndarray:
        """Images (B, N, H, W, 3) in [0,1] + calibs (B, N, 3, 4) + grid
        (L, W, 3) -> fused BEV ortho features (B, L, W, 256).

        The backbone and laterals run once over all B*N camera images; the
        per-(camera, scale) voxel sampling is vmapped and the camera axis is
        reduced with a sum (the psum analog of `vfanet.py:82` when sharded).

        When `rig` (a precompiled CameraRig for the fixed calibrations) is
        given, sampling runs the gather-free banded-matmul path
        (vfa_tpu/ops/rig.py) and `calibs` is ignored for sampling.
        """
        B, N = images.shape[0], images.shape[1]
        mean = jnp.asarray(IMAGENET_MEAN, dtype=images.dtype)
        std = jnp.asarray(IMAGENET_STD, dtype=images.dtype)
        imgs_flat = images.reshape(B * N, *images.shape[2:])
        flat_calibs = calibs.reshape(B * N, 3, 4)

        def trunk(mdl, xc):
            xc = (xc - mean) / std  # in-graph ImageNet normalization
            f8, f16, f32 = mdl.backbone(xc)
            return (nn.relu(mdl.bn8(mdl.lat8(f8))),
                    nn.relu(mdl.bn16(mdl.lat16(f16))),
                    nn.relu(mdl.bn32(mdl.lat32(f32))))

        nchunk = self.backbone_chunks
        if nchunk > 1 and imgs_flat.shape[0] % nchunk == 0:
            # rematerialized scan over image chunks: scan (unlike a Python
            # loop, where XLA overlaps the chunk backwards and keeps every
            # chunk's stem temps alive) serializes fwd AND bwd, so the
            # conv1/maxpool temps peak at ONE chunk. Residuals per chunk are
            # only the lateral outputs (kept anyway as the rig's features).
            # Chunks are sliced from the original image array inside the
            # body (scanning a reshape-stacked copy kept a fully padded
            # duplicate of the batch alive), and normalization happens per
            # chunk for the same reason.
            chunk = imgs_flat.shape[0] // nchunk

            def trunk_step(mdl, carry, i):
                xc = jax.lax.dynamic_slice_in_dim(imgs_flat, i * chunk,
                                                  chunk, axis=0)
                return carry, trunk(mdl, xc)

            scanned = nn.scan(
                nn.remat(trunk_step, prevent_cse=False),
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=0, out_axes=0,
            )
            _, (l8, l16, l32) = scanned(self, 0, jnp.arange(nchunk))
            lat8 = l8.reshape(B * N, *l8.shape[2:])
            lat16 = l16.reshape(B * N, *l16.shape[2:])
            lat32 = l32.reshape(B * N, *l32.shape[2:])
        else:
            lat8, lat16, lat32 = trunk(self, imgs_flat)

        cfg = self.cfg
        L, W = grid.shape[0], grid.shape[1]

        if rig is not None and hasattr(rig, "num_shards"):
            # BevShardedRig: slab-sharded sampling over the bev mesh axis.
            # Returns (B, L, W, n_out) with the row axis sharded — the fuse
            # and head convs downstream partition spatially via GSPMD halo
            # exchange (`vfa/model/vfanet.py:45-46` are the halo consumers).
            from vfa_tpu.parallel_bev import sample_bev_sharded

            if self.bev_mesh is None:
                raise ValueError(
                    "BevShardedRig requires VFANet(bev_mesh=...) — the mesh "
                    "whose axis the BEV row-slabs shard over")
            lats = [lat.reshape(B, N, *lat.shape[1:])
                    for lat in (lat8, lat16, lat32)]
            kernels = [self.collapse8_kernel, self.collapse16_kernel,
                       self.collapse32_kernel]
            biases = [self.collapse8_bias, self.collapse16_bias,
                      self.collapse32_bias]
            return sample_bev_sharded(
                lats, rig, kernels, biases, self.bev_mesh,
                axis=self.bev_axis, out_dtype=lat8.dtype)

        if rig is not None:
            if self.rig_impl == "pallas":
                from vfa_tpu.ops.rig_pallas import (
                    rig_sample_scale_pallas as rig_sample_scale,
                )
            else:
                from vfa_tpu.ops.rig import rig_sample_scale

            ortho = jnp.zeros((B, L * W, 256), jnp.float32)
            for sr, lat, kernel, bias in (
                (rig.scales[0], lat8, self.collapse8_kernel, self.collapse8_bias),
                (rig.scales[1], lat16, self.collapse16_kernel, self.collapse16_bias),
                (rig.scales[2], lat32, self.collapse32_kernel, self.collapse32_bias),
            ):
                lat5 = lat.reshape(B, N, *lat.shape[1:])
                contrib = rig_sample_scale(lat5, sr, kernel, bias,
                                           out_dtype=jnp.float32,
                                           camera_sum=True)
                ortho = ortho + contrib
            return ortho.reshape(B, L, W, 256).astype(lat8.dtype)

        def boxes_fn(calib):
            return voxel_boxes(
                calib, grid,
                dataset=cfg.name, grid_height=cfg.grid_h,
                cube_size=cfg.cube_size, image_size=cfg.image_size,
                crange=self.crange,
            )

        boxes = jax.vmap(boxes_fn)(flat_calibs)          # (B*N, nl, L, W, 4)
        scales = (
            (lat8, self.collapse8_kernel, self.collapse8_bias),
            (lat16, self.collapse16_kernel, self.collapse16_bias),
            (lat32, self.collapse32_kernel, self.collapse32_bias),
        )

        @functools.partial(jax.checkpoint, policy=None)
        def one_camera(lat_hwc_tuple, boxes_c):
            """BEV contribution of one camera: sum over the 3 scales of
            relu(collapse(sample_voxels(...))).

            Rematerialized: the sampling gathers produce ~2 GB of residuals
            per camera at full MultiviewC scale; recomputing them in the
            backward pass keeps training within one chip's HBM."""
            # fp32 accumulator: the collapse dot already accumulates fp32
            # (preferred_element_type), so the scale/camera sums stay fp32
            # and bev_features casts back to the feature dtype ONCE at the
            # end — a bf16 carry here would mismatch the fp32 body output
            # under lax.scan (bf16 training exposed this).
            out = jnp.zeros((L, W, 256), jnp.float32)
            for lat_hwc, (_, k, b) in zip(lat_hwc_tuple, scales):
                vox = sample_voxels(
                    jnp.transpose(lat_hwc, (2, 0, 1)), boxes_c
                )                                         # (L, W, C*nl)
                out = out + nn.relu(
                    jnp.dot(vox, k, preferred_element_type=jnp.float32) + b
                )
            return out

        if self.camera_reduce == "vmap":
            per_cam = jax.vmap(one_camera)((lat8, lat16, lat32), boxes)
            ortho = jnp.sum(per_cam.reshape(B, N, L, W, 256), axis=1)
            ortho = ortho.astype(lat8.dtype)
        else:
            # scan over cameras, accumulating per scene: constant memory in N
            lat8_c = lat8.reshape(B, N, *lat8.shape[1:]).swapaxes(0, 1)
            lat16_c = lat16.reshape(B, N, *lat16.shape[1:]).swapaxes(0, 1)
            lat32_c = lat32.reshape(B, N, *lat32.shape[1:]).swapaxes(0, 1)
            boxes_c = boxes.reshape(B, N, *boxes.shape[1:]).swapaxes(0, 1)

            def body(carry, xs):
                l8, l16, l32, bx = xs
                contrib = jax.vmap(one_camera)((l8, l16, l32), bx)  # (B,L,W,256)
                return carry + contrib, None

            ortho, _ = jax.lax.scan(
                body,
                jnp.zeros((B, L, W, 256), jnp.float32),
                (lat8_c, lat16_c, lat32_c, boxes_c),
            )
            ortho = ortho.astype(lat8.dtype)
        return ortho

    def __call__(
        self, images, calibs, grid, train: bool = False, rig=None
    ) -> Dict[str, Any]:
        """Returns the reference's prediction dict (`vfanet.py:141-149`),
        batched over scenes: heatmap (B, 1, L, W); loc_offset (B, L, W, 2);
        and in 3D mode dim_offset (B, L, W, 3), rotation (B, L, W, angle).

        Accepts unbatched single-scene input (N, H, W, 3) as B=1 for
        reference-CLI compatibility.
        """
        if images.ndim == 4:
            images = images[None]
            calibs = calibs[None]
        ortho = self.bev_features(images, calibs, grid, rig=rig)  # (B, L, W, 256)

        fused = nn.relu(self.fuse_bn1(self.fuse_conv0(ortho), use_running_average=not train))
        fused = nn.relu(self.fuse_bn4(self.fuse_conv3(fused), use_running_average=not train))

        heatmap = self.map_classifier(fused)             # (B, L, W, 1)
        tytx = self.tytx_conv3(nn.relu(self.tytx_gn1(self.tytx_conv0(ortho))))
        pred = {
            "heatmap": jnp.transpose(heatmap, (0, 3, 1, 2)),  # (B, 1, L, W)
            "loc_offset": tytx,                               # (B, L, W, 2)
        }
        if self.cfg.mode == "3D":
            orient = self.orient_pred(fused)                  # (B, L, W, 360)
            thtwtl = self.thtwtl_conv3(
                nn.relu(self.thtwtl_gn1(self.thtwtl_conv0(ortho)))
            )
            pred["dim_offset"] = thtwtl                       # (B, L, W, 3)
            pred["rotation"] = orient
        return pred
