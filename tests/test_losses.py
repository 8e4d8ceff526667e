"""Loss tests against a torch oracle expressing the reference formulas
(`vfa/model/loss.py:5-102`)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from vfa_tpu.losses import (
    compute_loss2d,
    compute_loss3d,
    csl_angle_focal_loss,
    focal_loss,
    smooth_l1,
)


def torch_focal(pred_logits, gt, alpha=2.0, beta=4.0, eps=1e-5):
    pred = torch.sigmoid(pred_logits).clamp(eps, 1 - eps)
    pos = gt == 1.0
    neg = ~pos
    p_loss = -(((1 - pred) ** alpha) * torch.log(pred)) * pos.float()
    n_loss = -(((1 - gt) ** beta) * (pred ** alpha) * torch.log(1 - pred)) * neg.float()
    p = p_loss.sum() / pos.sum() if pos.sum() > 0 else torch.tensor(0.0)
    n = n_loss.sum() / neg.sum() if neg.sum() > 0 else torch.tensor(0.0)
    if pos.sum() == 0:
        return n
    if neg.sum() == 0:
        return p
    return p + n


def _rand_heatmaps(rng, with_pos=True):
    gt = rng.uniform(0, 0.8, size=(1, 1, 12, 12)).astype(np.float32)
    if with_pos:
        gt[0, 0, 3, 4] = 1.0
        gt[0, 0, 8, 2] = 1.0
    logits = rng.normal(size=(1, 1, 12, 12)).astype(np.float32)
    return logits, gt


@pytest.mark.parametrize("with_pos", [True, False])
def test_focal_matches_torch(rng, with_pos):
    logits, gt = _rand_heatmaps(rng, with_pos)
    ours = float(focal_loss(jnp.asarray(logits), jnp.asarray(gt)))
    ref = float(torch_focal(torch.from_numpy(logits), torch.from_numpy(gt)))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_smooth_l1_matches_torch(rng):
    a = rng.normal(size=(5, 7)).astype(np.float32) * 3
    b = rng.normal(size=(5, 7)).astype(np.float32)
    ours = np.asarray(smooth_l1(jnp.asarray(a), jnp.asarray(b)))
    ref = torch.nn.SmoothL1Loss(reduction="none")(
        torch.from_numpy(a), torch.from_numpy(b)
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_csl_focal_matches_torch_masked(rng):
    L, W, A = 10, 10, 36
    pred = rng.normal(size=(1, L, W, A)).astype(np.float32)
    gt = rng.uniform(0, 0.9, size=(1, L, W, A)).astype(np.float32)
    fg = np.zeros((1, 1, L, W), np.float32)
    fg[0, 0, 2, 3] = 1.0
    fg[0, 0, 7, 7] = 1.0
    gt[0, 2, 3, 5] = 1.0  # one exact positive bin inside a fg cell

    ours = float(csl_angle_focal_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(fg)))
    # torch oracle: boolean-index fg cells, focal over (npos, A) (`loss.py:33-42`)
    m = torch.from_numpy(fg).squeeze(0) == 1.0
    tp = torch.from_numpy(pred)[m]
    tg = torch.from_numpy(gt)[m]
    ref = float(torch_focal(tp, tg))
    assert ours == pytest.approx(ref, rel=1e-5)


def _fake_batch(rng, mode, L=12, W=12, A=36):
    pred = {
        "heatmap": rng.normal(size=(1, 1, L, W)).astype(np.float32),
        "loc_offset": rng.normal(size=(1, L, W, 2)).astype(np.float32),
    }
    mask = np.zeros((1, 1, L, W), np.float32)
    mask[0, 0, 3, 4] = 1.0
    mask[0, 0, 9, 1] = 1.0
    hm = rng.uniform(0, 0.7, size=(1, 1, L, W)).astype(np.float32)
    hm[0, 0, 3, 4] = 1.0
    gt = {
        "mask": mask,
        "heatmap": hm,
        "loc_offset": rng.uniform(0, 1, size=(1, L, W, 2)).astype(np.float32),
    }
    if mode == "3D":
        pred["dim_offset"] = rng.normal(size=(1, L, W, 3)).astype(np.float32)
        pred["rotation"] = rng.normal(size=(1, L, W, A)).astype(np.float32)
        gt["dim_offset"] = rng.normal(size=(1, L, W, 3)).astype(np.float32)
        rot = rng.uniform(0, 0.9, size=(1, L, W, A)).astype(np.float32)
        rot[0, 3, 4, 10] = 1.0
        gt["rotation"] = rot
    return pred, gt


def torch_loss3d(pred, gt, lw):
    hm_w, pos_w, dim_w, ang_w = lw
    sl1 = torch.nn.SmoothL1Loss(reduction="none")
    t = lambda k, d: torch.from_numpy(d[k])
    mask = t("mask", gt).squeeze(0).unsqueeze(-1)
    l_yx = (sl1(torch.sigmoid(t("loc_offset", pred)), t("loc_offset", gt)) * mask)
    l_hwl = (sl1(t("dim_offset", pred), t("dim_offset", gt)) * mask)
    l_hm = torch_focal(t("heatmap", pred), t("heatmap", gt))
    m = t("mask", gt).squeeze(0) == 1.0
    l_ang = torch_focal(t("rotation", pred)[m], t("rotation", gt)[m])
    npos = max(float(t("mask", gt).sum()), 1.0)
    total = (
        l_yx.sum() / npos * pos_w + l_hwl.sum() / npos * dim_w
        + l_hm * hm_w + l_ang * ang_w
    )
    return float(total)


def test_loss3d_matches_torch(rng):
    pred, gt = _fake_batch(rng, "3D")
    lw = (1.0, 1.0, 1.0, 1.0)
    jp = {k: jnp.asarray(v) for k, v in pred.items()}
    jg = {k: jnp.asarray(v) for k, v in gt.items()}
    total, d = compute_loss3d(jp, jg, lw)
    assert float(total) == pytest.approx(torch_loss3d(pred, gt, lw), rel=1e-4)
    assert set(d) == {"loss", "loss_heatmap", "loss_pos", "loss_hwl", "loss_ang"}


def test_loss2d_matches_torch(rng):
    pred, gt = _fake_batch(rng, "2D")
    lw = (5.0, 1.0)
    jp = {k: jnp.asarray(v) for k, v in pred.items()}
    jg = {k: jnp.asarray(v) for k, v in gt.items()}
    total, d = compute_loss2d(jp, jg, lw)

    sl1 = torch.nn.SmoothL1Loss(reduction="none")
    mask = torch.from_numpy(gt["mask"]).squeeze(0).unsqueeze(-1)
    l_yx = sl1(torch.sigmoid(torch.from_numpy(pred["loc_offset"])),
               torch.from_numpy(gt["loc_offset"])) * mask
    l_hm = torch_focal(torch.from_numpy(pred["heatmap"]), torch.from_numpy(gt["heatmap"]))
    npos = max(float(mask.sum()), 1.0)
    ref = float(l_yx.sum() / npos * 1.0 + l_hm * 5.0)
    assert float(total) == pytest.approx(ref, rel=1e-4)


def test_sparse_rotation_loss_matches_dense(rng):
    """The sparse CSL angle path (gather at object cells +
    csl_angle_focal_loss_cells) reproduces the dense masked loss exactly —
    including last-writer-wins when two objects share a cell and padded
    (invalid) objects."""
    import jax

    from vfa_tpu.codec import encode_frame, gaussian_csl_labels, object_cells
    from vfa_tpu.config import get_config
    from vfa_tpu.data.synthetic import tiny_config
    from vfa_tpu.losses import csl_angle_focal_loss_cells

    cfg = tiny_config(get_config("MultiviewC"))
    L, W = cfg.grid_shape
    A = 24  # small angle_range keeps the dense map tiny
    M = 6
    loc = rng.uniform(0, min(cfg.world_size), (M, 3)).astype(np.float32)
    loc[1] = loc[0]  # duplicate cell: dense scatter keeps the LAST writer
    objects = {
        "location": jnp.asarray(loc),
        "valid": jnp.asarray([1, 1, 1, 1, 0, 0], np.float32),  # 2 padded
        "dimension": jnp.asarray(
            rng.uniform(50, 200, (M, 3)).astype(np.float32)),
        "rotation": jnp.asarray(
            rng.uniform(-np.pi, np.pi, M).astype(np.float32)),
    }
    heatmap = jnp.zeros((L, W), jnp.float32)
    gt = encode_frame(objects, heatmap, cfg=cfg,
                      dim_mean=jnp.asarray([145.0, 120.0, 255.0]),
                      angle_range=A)
    logits = jnp.asarray(rng.normal(0, 2, (1, L, W, A)).astype(np.float32))

    dense = csl_angle_focal_loss(logits, gt["rotation"], gt["mask"])

    rows, cols, owner = object_cells(objects, cfg)
    pred_cells = logits[0][rows, cols][None]
    gt_cells = gaussian_csl_labels(jnp.rad2deg(objects["rotation"]), A)[None]
    sparse = csl_angle_focal_loss_cells(pred_cells, gt_cells, owner[None])

    assert float(sparse) == pytest.approx(float(dense), rel=1e-6)

    # gradients through the gather match the dense path's at every cell
    def dense_fn(lg):
        return csl_angle_focal_loss(lg, gt["rotation"], gt["mask"])

    def sparse_fn(lg):
        return csl_angle_focal_loss_cells(lg[0][rows, cols][None], gt_cells,
                                          owner[None])

    gd = jax.grad(dense_fn)(logits)
    gs = jax.grad(sparse_fn)(logits)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gd),
                               rtol=1e-5, atol=1e-7)
