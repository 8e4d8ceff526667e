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


class VFANet(nn.Module):
    cfg: DatasetConfig
    base: str = "resnet18"
    angle_range: int = 360
    crange: Tuple[float, float] = (-1.0, 0.95)

    def setup(self):
        if self.base not in RESNET_LAYERS:
            raise ValueError(
                f"Unrecognized model, expect `resnet18` or `resnet34`, got {self.base}."
            )
        if self.cfg.mode not in ("2D", "3D"):
            raise ValueError(f"mode error, expect `2D` or `3D`, got {self.cfg.mode}")

        self.backbone = ResNetGN(RESNET_LAYERS[self.base], name="base")
        self.lat8 = nn.Conv(256, (1, 1), name="lat8")
        self.lat16 = nn.Conv(256, (1, 1), name="lat16")
        self.lat32 = nn.Conv(256, (1, 1), name="lat32")
        self.bn8 = group_norm("bn8")
        self.bn16 = group_norm("bn16")
        self.bn32 = group_norm("bn32")

        nl = self.cfg.num_layers
        self.collapse8 = nn.Dense(256, name="vfa8_collapse")
        self.collapse16 = nn.Dense(256, name="vfa16_collapse")
        self.collapse32 = nn.Dense(256, name="vfa32_collapse")
        del nl

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

    def bev_features(self, images, calibs, grid) -> jnp.ndarray:
        """Images (N, H, W, 3) in [0,1] + calibs (N, 3, 4) + grid (L, W, 3)
        -> fused BEV ortho features (L, W, 256)."""
        mean = jnp.asarray(IMAGENET_MEAN, dtype=images.dtype)
        std = jnp.asarray(IMAGENET_STD, dtype=images.dtype)
        x = (images - mean) / std

        feats8, feats16, feats32 = self.backbone(x)
        lat8 = nn.relu(self.bn8(self.lat8(feats8)))
        lat16 = nn.relu(self.bn16(self.lat16(feats16)))
        lat32 = nn.relu(self.bn32(self.lat32(feats32)))

        cfg = self.cfg
        ortho = 0.0
        for lat, collapse in (
            (lat8, self.collapse8),
            (lat16, self.collapse16),
            (lat32, self.collapse32),
        ):
            fh, fw = lat.shape[1], lat.shape[2]

            def boxes_fn(calib, fh=fh, fw=fw):
                return voxel_boxes(
                    calib, grid,
                    dataset=cfg.name, grid_height=cfg.grid_h,
                    cube_size=cfg.cube_size, image_size=cfg.image_size,
                    crange=self.crange,
                )

            boxes = jax.vmap(boxes_fn)(calibs)           # (N, nl, L, W, 4)
            lat_chw = jnp.transpose(lat, (0, 3, 1, 2))   # (N, C, fh, fw)
            vox = jax.vmap(sample_voxels)(lat_chw, boxes)  # (N, L, W, C*nl)
            ortho = ortho + jnp.sum(nn.relu(collapse(vox)), axis=0)
        return ortho

    def __call__(
        self, images, calibs, grid, train: bool = False
    ) -> Dict[str, Any]:
        """Returns the reference's prediction dict (`vfanet.py:141-149`):
        heatmap (1, 1, L, W); loc_offset (1, L, W, 2); and in 3D mode
        dim_offset (1, L, W, 3), rotation (1, L, W, angle_range)."""
        ortho = self.bev_features(images, calibs, grid)[None]  # (1, L, W, 256)

        fused = nn.relu(self.fuse_bn1(self.fuse_conv0(ortho), use_running_average=not train))
        fused = nn.relu(self.fuse_bn4(self.fuse_conv3(fused), use_running_average=not train))

        heatmap = self.map_classifier(fused)             # (1, L, W, 1)
        tytx = self.tytx_conv3(nn.relu(self.tytx_gn1(self.tytx_conv0(ortho))))
        pred = {
            "heatmap": jnp.transpose(heatmap, (0, 3, 1, 2)),  # (1, 1, L, W)
            "loc_offset": tytx,                               # (1, L, W, 2)
        }
        if self.cfg.mode == "3D":
            orient = self.orient_pred(fused)                  # (1, L, W, 360)
            thtwtl = self.thtwtl_conv3(
                nn.relu(self.thtwtl_gn1(self.thtwtl_conv0(ortho)))
            )
            pred["dim_offset"] = thtwtl                       # (1, L, W, 3)
            pred["rotation"] = orient
        return pred
