"""Codec tests: CSL labels vs the reference formula, encode placement /
offsets / dims, encode->decode round trip, Wildtrack axis swap."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vfa_tpu.codec import (
    ObjectEncoder,
    decode_frame,
    encode_frame,
    gaussian_csl_labels,
    nms_heatmap,
)
from vfa_tpu.config import mc_opts, mx_opts, wt_opts
from vfa_tpu.data.synthetic import make_objects, tiny_config
from vfa_tpu.utils import Obj2D, Obj3D, pad_objects


def reference_gaussian_label(label, num_class, sigma):
    """Literal transcription of `vfa/data/smooth_label.py:4-9` as an oracle."""
    label = int(label)
    x = np.arange(math.floor(-num_class / 2), math.ceil(num_class / 2))
    y = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return np.concatenate([y[math.ceil(num_class / 2) - label:],
                           y[:math.ceil(num_class / 2) - label]])


@pytest.mark.parametrize("deg", [0, 30, 179, -179, -1, 90.7, -90.7])
def test_csl_matches_reference(deg):
    ours = np.asarray(gaussian_csl_labels(jnp.array([deg]), 360, 6.0))[0]
    ref = reference_gaussian_label(deg, 360, 6.0)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)
    # peak at the (truncated) angle bin
    assert ours.argmax() == int(deg) % 360


def _mk_objects_3d(locs, dims, rots):
    return [
        Obj3D(classname="Cow", dimension=np.asarray(d), location=np.asarray(l),
              rotation=r, conf=None)
        for l, d, r in zip(locs, dims, rots)
    ]


def test_encode3d_placement_and_offsets():
    tc = tiny_config(mc_opts)
    L, W = tc.grid_shape
    ws = np.asarray(tc.world_size, np.float64)
    # object at a known fractional grid position
    gx, gy = 3.25, 5.75  # grid coords (x, y)
    loc = [gx / L * ws[0], gy / W * ws[1], 0.0]
    dim_mean = np.array([140.0, 120.0, 255.0], np.float32)
    dim = np.array([150.0, 110.0, 260.0], np.float32)
    rot = 0.5
    objs = pad_objects(_mk_objects_3d([loc], [dim], [rot]), 8, "3D")
    hm = np.zeros((L, W), np.float32)
    enc = encode_frame(objs, hm, cfg=tc, dim_mean=jnp.asarray(dim_mean))

    mask = np.asarray(enc["mask"])[0, 0]
    assert mask.sum() == 1.0
    assert mask[5, 3] == 1.0  # row=int(gy), col=int(gx)
    lo = np.asarray(enc["loc_offset"])[0]
    np.testing.assert_allclose(lo[5, 3], [0.25, 0.75], atol=1e-5)
    do = np.asarray(enc["dim_offset"])[0]
    np.testing.assert_allclose(do[5, 3], np.log(dim / dim_mean), rtol=1e-5)
    ro = np.asarray(enc["rotation"])[0]
    assert ro[5, 3].argmax() == int(np.rad2deg(0.5)) % 360
    # everywhere else zero
    assert np.abs(do).sum() == pytest.approx(np.abs(do[5, 3]).sum(), rel=1e-6)


def test_encode2d_wildtrack_axis_swap():
    tc = tiny_config(wt_opts)
    L, W = tc.grid_shape
    ws = np.asarray(tc.world_size, np.float64)
    gx, gy = 2.5, 7.5
    loc = [gx / L * ws[0], gy / W * ws[1], 0.0]
    objs = pad_objects([Obj2D("Person", np.asarray(loc), None)], 4, "2D")
    hm = np.zeros((L, W), np.float32)
    enc = encode_frame(objs, hm, cfg=tc)
    mask = np.asarray(enc["mask"])[0, 0]
    # Wildtrack: foreground[coord_x, coord_y] (`encoder.py:160-163`)
    assert mask[2, 7] == 1.0
    lo = np.asarray(enc["loc_offset"])[0]
    np.testing.assert_allclose(lo[2, 7], [0.5, 0.5], atol=1e-5)


def test_empty_frame_encodes_to_zeros():
    tc = tiny_config(mc_opts)
    L, W = tc.grid_shape
    objs = pad_objects([], 8, "3D")
    enc = encode_frame(objs, np.zeros((L, W), np.float32), cfg=tc,
                       dim_mean=jnp.ones(3))
    for k, v in enc.items():
        assert np.abs(np.asarray(v)).sum() == 0.0, k


def test_nms_keeps_local_maxima():
    hm = np.zeros((1, 1, 9, 9), np.float32)
    hm[0, 0, 4, 4] = 0.9
    hm[0, 0, 4, 5] = 0.5   # suppressed (within 5x5 of the 0.9 peak)
    hm[0, 0, 0, 0] = 0.3   # corner peak survives
    out = np.asarray(nms_heatmap(jnp.asarray(hm)))
    assert out[0, 0, 4, 4] == pytest.approx(0.9)
    assert out[0, 0, 4, 5] == 0.0
    assert out[0, 0, 0, 0] == pytest.approx(0.3)


@pytest.mark.parametrize("cfg", [mc_opts, mx_opts, wt_opts], ids=lambda c: c.name)
def test_encode_decode_round_trip(cfg, rng):
    """Perfect predictions constructed from the encoding must decode back to
    the gt locations (and dims/rotations in 3D mode)."""
    tc = tiny_config(cfg)
    L, W = tc.grid_shape
    dim_mean = np.array([145.0, 120.0, 255.0], np.float32)
    # objects spaced > 5 grid cells apart so the 5x5 NMS keeps all of them
    ws = np.asarray(tc.world_size, np.float64)
    gs = np.asarray(tc.grid_shape, np.float64)
    rg = np.random.default_rng(0)
    # pick (row, col) grid cells, then invert the reference's normalization
    # (`encoder.py:155`): norm = loc / world_size * grid_shape, where for
    # Wildtrack row<-norm_x and col<-norm_y, else row<-norm_y, col<-norm_x.
    grid_fracs = [(0.15, 0.2), (0.15, 0.8), (0.85, 0.15), (0.8, 0.85)]
    cells = [(fr * gs[0], fc * gs[1]) for fr, fc in grid_fracs]
    if tc.name == "Wildtrack":
        locs = [np.array([r * ws[0] / gs[0], c * ws[1] / gs[1], 0.0]) for r, c in cells]
    else:
        locs = [np.array([c * ws[0] / gs[0], r * ws[1] / gs[1], 0.0]) for r, c in cells]
    if tc.mode == "3D":
        objects = [
            Obj3D("Cow", dimension=rg.uniform(110, 280, 3), location=l,
                  rotation=rg.uniform(-np.pi, np.pi), conf=None)
            for l in locs
        ]
    else:
        objects = [Obj2D("Person", location=l, conf=None) for l in locs]
    objs = pad_objects(objects, 16, tc.mode)
    hm = np.zeros((L, W), np.float32)
    kw = {"dim_mean": jnp.asarray(dim_mean)} if tc.mode == "3D" else {}
    enc = encode_frame(objs, hm, cfg=tc, **kw)

    def logit(p):
        p = np.clip(p, 1e-6, 1 - 1e-6)
        return np.log(p / (1 - p))

    mask = np.asarray(enc["mask"])[0, 0]
    pred = {
        "heatmap": jnp.asarray(logit(mask * 0.999))[None, None],
        "loc_offset": jnp.asarray(logit(np.asarray(enc["loc_offset"])[0]))[None],
    }
    if tc.mode == "3D":
        pred["dim_offset"] = enc["dim_offset"]
        pred["rotation"] = jnp.asarray(
            logit(np.asarray(enc["rotation"])[0] * 0.999)
        )[None]

    dec = decode_frame(pred, tc, cls_thresh=0.7, topk=16, **kw)
    valid = np.asarray(dec["valid"])
    got = np.asarray(dec["location"])[valid][:, :2]
    want = np.stack([np.asarray(o.location)[:2] for o in objects])
    # match by nearest neighbour; cell quantization bounds the error
    assert valid.sum() == len(objects)
    cell = np.asarray(tc.world_size, np.float64) / np.asarray(tc.grid_shape)
    for w_loc in want:
        d = np.abs(got - w_loc).max(axis=1).min()
        assert d < cell.max() * 1.01, (w_loc, got)

    if tc.mode == "3D":
        dims = np.asarray(dec["dimension"])[valid]
        want_dims = np.stack([np.asarray(o.dimension) for o in objects])
        # sort both by first dim for comparison
        np.testing.assert_allclose(
            np.sort(dims[:, 0]), np.sort(want_dims[:, 0]), rtol=1e-3
        )
        rots = np.asarray(dec["rotation"])[valid]
        want_rots = np.array([o.rotation for o in objects]) % (2 * np.pi)
        # CSL argmax quantizes to 1 degree
        d = np.abs(np.sort(rots) - np.sort(want_rots))
        assert (np.minimum(d, 2 * np.pi - d) < np.deg2rad(1.5)).all()


def test_object_encoder_batch_roundtrip():
    tc = tiny_config(mc_opts)
    enc = ObjectEncoder(tc, dim_mean=np.array([145.0, 120.0, 255.0]), topk=16)
    objects = make_objects(tc, 3, np.random.default_rng(3))
    L, W = tc.grid_shape
    out = enc.batch_encode([objects], [np.zeros((L, W), np.float32)])
    assert len(out) == 1 and "rotation" in out[0]
