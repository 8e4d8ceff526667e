"""Detection target codec: encode gt objects to dense training targets and
decode network output back to detections.

Reference semantics: `vfa/data/encoder.py:24-333` and
`vfa/data/smooth_label.py:4-9`.

Encode (per frame): assign each object center to a grid cell (Wildtrack's
index order is swapped, `encoder.py:160-163`), fractional location offsets
(`:173-190`), log(dim / class_mean) dimension offsets (`:192-206`), and
360-bin Circular-Smooth-Label rotation targets with a sigma=6 gaussian
(`:208-217`).

Decode: sigmoid -> 5x5 maxpool-equality NMS (`:230-232`) -> top-k ->
threshold -> invert the offset/dim/CSL encodings (`decode3d` `:234-273`,
`decode2d` `:275-305`).

TPU-first: encoding is vectorized scatter (`.at[].set(mode='drop')` — padded
objects scatter out of bounds and vanish); decoding is fixed-shape top-k with
a validity mask so the whole path jits. The reference's per-object Python
loops and ragged boolean-mask outputs are gone.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vfa_tpu.config import DatasetConfig
from vfa_tpu.utils import Obj2D, Obj3D, pad_objects


def gaussian_csl_labels(angles_deg, num_class: int = 360, sigma: float = 6.0):
    """Circular smooth labels for a batch of integer angles (degrees).

    Matches `vfa/data/smooth_label.py:4-9`: a gaussian centered on the angle
    bin, wrapped circularly over `num_class` bins. angles_deg may be negative
    (reference truncates toward zero via int()).

    Returns (..., num_class).
    """
    label = jnp.trunc(angles_deg).astype(jnp.int32)
    half = num_class // 2
    x = jnp.arange(-half, num_class - half, dtype=jnp.float32)  # [-180..179]
    y = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    # reference: concatenate([y[half-label:], y[:half-label]]) == roll(y, label-half)
    bins = jnp.arange(num_class)
    idx = jnp.mod(bins[None, :] - (label[..., None] - half), num_class)
    return y[idx]


def _normalized_locations(location, world_size, grid_shape):
    """location (..., >=2) -> continuous grid coords, reference formula
    `encoder.py:155`: loc / world_size * grid_shape."""
    ws = jnp.asarray(world_size, jnp.float32)
    gs = jnp.asarray(grid_shape, jnp.float32)
    return location[..., :2] / ws * gs


def encode_frame(
    objects: Dict[str, jnp.ndarray],
    heatmap,
    cfg: DatasetConfig,
    dim_mean: Optional[jnp.ndarray] = None,
    angle_range: int = 360,
    angle_radius: float = 6.0,
    dense_rotation: bool = True,
):
    """Encode one frame's padded gt objects into dense targets.

    Args:
      objects: dict with 'location' (M, 3), 'valid' (M,), and for 3D mode
        'dimension' (M, 3), 'rotation' (M,) — see `utils.pad_objects`.
      heatmap: (L, W) precomputed gt heatmap.
      dim_mean: (3,) class-average dimensions (3D mode only).

    Returns a dict shaped like the reference's `encode3d`/`encode2d`
    (`encoder.py:98-103,130-133`): mask (1,1,L,W), heatmap (1,1,L,W),
    loc_offset (1,L,W,2), and in 3D mode dim_offset (1,L,W,3),
    rotation (1,L,W,angle_range).

    The reference returns a bare tuple for empty frames
    (`encoder.py:136-150`), which crashes its own loss; here empty frames
    encode naturally to all-zero targets (documented deviation).
    """
    L, W = cfg.grid_shape
    loc = _normalized_locations(objects["location"], cfg.world_size, cfg.grid_shape)
    valid = objects["valid"] > 0
    cx = jnp.floor(loc[:, 0]).astype(jnp.int32)
    cy = jnp.floor(loc[:, 1]).astype(jnp.int32)
    # route padded objects out of bounds; scatter mode='drop' discards them
    drop = jnp.where(valid, 0, L + W + 8)
    if cfg.name == "Wildtrack":
        row, col = cx + drop, cy
    else:
        row, col = cy + drop, cx

    mask = jnp.zeros((L, W), jnp.float32).at[row, col].set(1.0, mode="drop")

    off = loc - jnp.floor(loc)  # (M, 2) fractional offsets (x, y)
    loc_offset = (
        jnp.zeros((L, W, 2), jnp.float32)
        .at[row, col].set(off, mode="drop")
    )

    out = {
        "mask": mask[None, None],
        "heatmap": jnp.asarray(heatmap, jnp.float32)[None, None],
        "loc_offset": loc_offset[None],
    }

    if cfg.mode == "3D":
        assert dim_mean is not None
        dim_off = jnp.log(objects["dimension"] / dim_mean)
        dim_off = jnp.where(valid[:, None], dim_off, 0.0)
        out["dim_offset"] = (
            jnp.zeros((L, W, 3), jnp.float32)
            .at[row, col].set(dim_off, mode="drop")[None]
        )
        # dense_rotation=False skips scattering the (L, W, angle_range) CSL
        # map — the train step evaluates the angle loss sparsely at the
        # object cells instead (losses.csl_angle_focal_loss_cells)
        if dense_rotation:
            csl = gaussian_csl_labels(
                jnp.rad2deg(objects["rotation"]), angle_range, angle_radius
            )
            out["rotation"] = (
                jnp.zeros((L, W, angle_range), jnp.float32)
                .at[row, col].set(csl, mode="drop")[None]
            )
    return out


def object_cells(objects, cfg: DatasetConfig):
    """Grid cell (row, col) of each padded object + its 'owner' mask.

    Same cell assignment as `encode_frame` (reference `encoder.py:152-165`,
    including the Wildtrack index swap). `owner` marks objects that are
    valid, land inside the grid, AND are not overwritten by a later valid
    object on the same cell — exactly the cells where the dense encode's
    last-writer-wins scatter leaves that object's targets. Lets losses
    evaluate per-cell terms sparsely at the <= M positive cells instead of
    over the full (L, W) map (the dense CSL focal loss is identically zero
    off these cells; see losses.csl_angle_focal_loss_cells).
    """
    L, W = cfg.grid_shape
    loc = _normalized_locations(objects["location"], cfg.world_size,
                                cfg.grid_shape)
    valid = objects["valid"] > 0
    cx = jnp.floor(loc[:, 0]).astype(jnp.int32)
    cy = jnp.floor(loc[:, 1]).astype(jnp.int32)
    if cfg.name == "Wildtrack":
        row, col = cx, cy
    else:
        row, col = cy, cx
    inside = (row >= 0) & (row < L) & (col >= 0) & (col < W)
    valid = valid & inside
    key = row * W + col
    M = key.shape[0]
    same_later = ((key[None, :] == key[:, None]) & valid[None, :]
                  & jnp.triu(jnp.ones((M, M), bool), k=1))
    owner = valid & ~jnp.any(same_later, axis=1)
    return jnp.clip(row, 0, L - 1), jnp.clip(col, 0, W - 1), owner


def nms_heatmap(heatmap):
    """5x5 maxpool-equality NMS (`encoder.py:48,230-232`). heatmap (..., L, W)."""
    pooled = jax.lax.reduce_window(
        heatmap, -jnp.inf, jax.lax.max,
        window_dimensions=(1,) * (heatmap.ndim - 2) + (5, 5),
        window_strides=(1,) * heatmap.ndim,
        padding=[(0, 0)] * (heatmap.ndim - 2) + [(2, 2), (2, 2)],
    )
    return jnp.where(pooled == heatmap, heatmap, 0.0)


def decode_frame(
    pred: Dict[str, jnp.ndarray],
    cfg: DatasetConfig,
    cls_thresh: float,
    topk: int = 100,
    dim_mean: Optional[jnp.ndarray] = None,
):
    """Decode one frame's predictions into fixed-size detection arrays.

    Matches `decode3d`/`decode2d` (`encoder.py:234-305`) but returns
    fixed-shape (topk,) arrays with a `valid` mask instead of ragged
    boolean-masked tensors, so the whole decode jits.

    Returns dict: conf (K,), location (K, 3), valid (K,) bool, and in 3D mode
    dimension (K, 3), rotation (K,).
    """
    heatmap = pred["heatmap"]  # (1, 1, L, W)
    L, W = heatmap.shape[2], heatmap.shape[3]
    conf_map = nms_heatmap(jax.nn.sigmoid(heatmap))[0, 0].reshape(-1)  # (L*W,)

    grid_y, grid_x = jnp.meshgrid(
        jnp.arange(L, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    grid_size = (
        np.asarray(cfg.world_size, np.float64) / np.asarray(cfg.cube_size[:2], np.float64)
    )
    world_size = np.asarray(cfg.world_size, np.float64)

    tytx = jax.nn.sigmoid(pred["loc_offset"][0])  # (L, W, 2)
    cy = ((grid_y + tytx[..., 0]) / grid_size[0] * world_size[0]).reshape(-1)
    cx = ((grid_x + tytx[..., 1]) / grid_size[1] * world_size[1]).reshape(-1)

    conf, idx = jax.lax.top_k(conf_map, min(topk, conf_map.shape[0]))
    valid = conf > cls_thresh
    cy = jnp.take(cy, idx)
    cx = jnp.take(cx, idx)
    zeros = jnp.zeros_like(cy)

    if cfg.mode == "3D":
        assert dim_mean is not None
        thtwtl = pred["dim_offset"][0].reshape(-1, 3)
        dims = jnp.exp(jnp.take(thtwtl, idx, axis=0)) * jnp.asarray(dim_mean)  # h w l
        orient = jnp.argmax(pred["rotation"][0].reshape(-1, pred["rotation"].shape[-1]), axis=-1)
        rot_deg = jnp.take(orient, idx).astype(jnp.float32)
        return {
            "conf": conf,
            "location": jnp.stack([cx, cy, zeros], axis=-1),
            "dimension": dims,
            "rotation": jnp.deg2rad(rot_deg),
            "valid": valid,
        }

    if cfg.name == "Wildtrack":
        location = jnp.stack([cy, cx, zeros], axis=-1)  # row axis is x for WT
    else:
        location = jnp.stack([cx, cy, zeros], axis=-1)
    return {"conf": conf, "location": location, "valid": valid}


class ObjectEncoder:
    """Stateful convenience wrapper mirroring the reference API
    (`encoder.py:24-49`): holds dataset constants and converts between python
    object lists and the jitted array codec.
    """

    def __init__(
        self,
        cfg: DatasetConfig,
        dim_mean=None,
        angle_range: int = 360,
        angle_radius: float = 6.0,
        topk: int = 100,
        max_objects: int = 128,
        label_name: str = None,
    ):
        self.cfg = cfg
        self.angle_range = angle_range
        self.angle_radius = angle_radius
        self.topk = topk
        self.max_objects = max_objects
        self.dim_mean = None if dim_mean is None else np.asarray(dim_mean, np.float32)
        self.label_name = label_name or ("Cow" if cfg.name == "MultiviewC" else "Person")
        self._encode = jax.jit(
            functools.partial(
                encode_frame, cfg=cfg, angle_range=angle_range,
                angle_radius=angle_radius,
            )
        )
        self._decode = jax.jit(functools.partial(decode_frame, cfg=cfg, topk=topk))

    def encode(self, objects, heatmap):
        """objects: python list of Obj3D/Obj2D (or a pre-padded dict)."""
        if isinstance(objects, (list, tuple)):
            objects = pad_objects(objects, self.max_objects, self.cfg.mode)
        kw = {}
        if self.cfg.mode == "3D":
            kw["dim_mean"] = self.dim_mean
        return self._encode(objects, heatmap, **kw)

    # reference-compatible names --------------------------------------------
    def batch_encode(self, batch_objects, heatmaps, grids=None):
        return [
            self.encode(objs, hm) for objs, hm in zip(batch_objects, heatmaps)
        ]

    def decode(self, pred, cls_thresh: float):
        kw = {}
        if self.cfg.mode == "3D":
            kw["dim_mean"] = self.dim_mean
        return self._decode(pred, cls_thresh=cls_thresh, **kw)

    def batch_decode(self, pred, cls_thresh: float):
        """Decode to a python list of Obj3D/Obj2D (host-side, like
        `encoder.py:307-333`)."""
        d = jax.device_get(self.decode(pred, cls_thresh))
        objects = []
        for i in range(len(d["conf"])):
            if not d["valid"][i]:
                continue
            if self.cfg.mode == "3D":
                objects.append(Obj3D(
                    classname=self.label_name, conf=d["conf"][i],
                    location=d["location"][i], dimension=d["dimension"][i],
                    rotation=d["rotation"][i],
                ))
            else:
                objects.append(Obj2D(
                    classname=self.label_name, conf=d["conf"][i],
                    location=d["location"][i],
                ))
        return objects
