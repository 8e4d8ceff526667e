"""Tests for the voxel projection op against a torch oracle that reproduces
the reference computation (`vfa/model/vfa_op.py:61-125`) step by step on the
same inputs."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vfa_tpu.config import mc_opts, mx_opts, wt_opts
from vfa_tpu.data.synthetic import make_calibrations, tiny_config
from vfa_tpu.geometry import make_grid
from vfa_tpu.ops.voxel import (
    box_area_visibility,
    cube_corner_offsets,
    sample_voxels,
    sample_voxels_taps,
    voxel_boxes,
    voxel_taps,
    z_layer_offsets,
)

EPSILON = 1e-6


def torch_oracle_vox(feature_np, boxes_np):
    """The reference sampling chain in torch: integral image -> 4 grid_sample
    reads -> box mean -> visibility -> (L*W, C, nl) -> (L, W, C*nl)."""
    feat = torch.from_numpy(feature_np)[None]          # (1, C, fh, fw)
    nl, L, W, _ = boxes_np.shape
    fh, fw = feature_np.shape[1:]
    boxes = torch.from_numpy(boxes_np.reshape(1, nl, L * W, 4))

    area = (boxes[..., 2:] - boxes[..., :2]).prod(dim=-1) * fh * fw + EPSILON
    area = area.unsqueeze(1)                           # (1, 1, nl, L*W)
    visible = (area > EPSILON) & (area < fh * fw * 0.3)

    ii = torch.cumsum(torch.cumsum(feat, dim=-1), dim=-2)
    lt = F.grid_sample(ii, boxes[..., [0, 1]], align_corners=False)
    rb = F.grid_sample(ii, boxes[..., [2, 3]], align_corners=False)
    rt = F.grid_sample(ii, boxes[..., [2, 1]], align_corners=False)
    lb = F.grid_sample(ii, boxes[..., [0, 3]], align_corners=False)
    vox = (lt + rb - rt - lb) / area * visible
    vox = vox.permute(0, 3, 1, 2).flatten(0, 1).flatten(1, 2)  # (L*W, C*nl)
    C = feature_np.shape[0]
    return vox.reshape(L, W, C * nl).numpy()


@pytest.mark.parametrize("cfg", [mc_opts, mx_opts, wt_opts], ids=lambda c: c.name)
def test_sample_voxels_matches_torch_chain(cfg, rng):
    tc = tiny_config(cfg)
    grid = make_grid(tc.world_size, tc.cube_size[:2], tc.name)
    calib = make_calibrations(tc, 1)[0]
    boxes = np.asarray(voxel_boxes(
        jnp.asarray(calib), jnp.asarray(grid),
        dataset=tc.name, grid_height=tc.grid_h, cube_size=tc.cube_size,
        image_size=tc.image_size,
    ))
    # boxes are normalized AABBs within [-1, 0.95]
    assert boxes.min() >= -1.0 and boxes.max() <= 0.95 + 1e-6
    assert (boxes[..., 2] >= boxes[..., 0]).all()

    C, fh, fw = 8, tc.resize_size[0] // 8, tc.resize_size[1] // 8
    feature = rng.normal(size=(C, fh, fw)).astype(np.float32)

    ours = np.asarray(sample_voxels(jnp.asarray(feature), jnp.asarray(boxes)))
    ref = torch_oracle_vox(feature, boxes)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_taps_path_matches_dense_path(rng):
    tc = tiny_config(mc_opts)
    grid = make_grid(tc.world_size, tc.cube_size[:2], tc.name)
    calib = make_calibrations(tc, 1)[0]
    boxes = voxel_boxes(
        jnp.asarray(calib), jnp.asarray(grid),
        dataset=tc.name, grid_height=tc.grid_h, cube_size=tc.cube_size,
        image_size=tc.image_size,
    )
    nl, L, W, _ = boxes.shape
    C, fh, fw = 8, tc.resize_size[0] // 8, tc.resize_size[1] // 8
    feature = jnp.asarray(rng.normal(size=(C, fh, fw)).astype(np.float32))

    dense = sample_voxels(feature, boxes)
    idx, w = voxel_taps(boxes, (fh, fw))
    taps = sample_voxels_taps(feature, idx, w, nl, L, W)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(taps), rtol=1e-4, atol=1e-4)


def test_cube_corners_and_layers():
    c = cube_corner_offsets((25, 25, 32))
    assert c.shape == (8, 3)
    np.testing.assert_allclose(sorted(set(c[:, 2])), [0, 32])
    np.testing.assert_allclose(np.abs(c[:, 0]), 12.5)
    z = z_layer_offsets(160, 32)
    np.testing.assert_allclose(z[:, 2], [0, 32, 64, 96, 128])
    z = z_layer_offsets(64, 8)
    assert z.shape[0] == 8


def test_visibility_masks_degenerate_boxes():
    # a zero-area box and an oversized box must both be masked out
    boxes = jnp.array([
        [[[[-0.2, -0.2, -0.2, -0.2]]]],      # zero area
        [[[[-1.0, -1.0, 0.95, 0.95]]]],      # nearly whole image: > 0.3 ratio
    ]).reshape(2, 1, 1, 4)
    area, visible = box_area_visibility(boxes, (16, 16))
    assert not bool(visible[0, 0, 0])
    assert not bool(visible[1, 0, 0])
