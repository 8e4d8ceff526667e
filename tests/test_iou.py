"""Rotated IoU tests against an independent Sutherland–Hodgman polygon
clipping oracle (different algorithm than the production argsort/shoelace
path), plus reference corner-case checks."""

import numpy as np
import pytest

import jax.numpy as jnp

from vfa_tpu.eval.iou import boxes_to_corners, iou_2d, iou_3d, iou_3d_pairwise


# ---------------------------------------------------------------- oracle ---
def _clip(subject, cx1, cy1, cx2, cy2):
    """Clip polygon by the half-plane left of edge (cx1,cy1)->(cx2,cy2)."""
    def inside(p):
        return (cx2 - cx1) * (p[1] - cy1) - (cy2 - cy1) * (p[0] - cx1) >= 0

    def inter(p, q):
        dc = (cx1 - cx2, cy1 - cy2)
        dp = (p[0] - q[0], p[1] - q[1])
        n1 = cx1 * cy2 - cy1 * cx2
        n2 = p[0] * q[1] - p[1] * q[0]
        n3 = 1.0 / (dc[0] * dp[1] - dc[1] * dp[0])
        return ((n1 * dp[0] - n2 * dc[0]) * n3, (n1 * dp[1] - n2 * dc[1]) * n3)

    out = []
    for i, cur in enumerate(subject):
        prev = subject[i - 1]
        if inside(cur):
            if not inside(prev):
                out.append(inter(prev, cur))
            out.append(tuple(cur))
        elif inside(prev):
            out.append(inter(prev, cur))
    return out


def oracle_overlap(c1, c2):
    """Intersection area of two convex quads via Sutherland-Hodgman."""
    def ccw(poly):
        a = 0.0
        for i in range(len(poly)):
            x1, y1 = poly[i - 1]
            x2, y2 = poly[i]
            a += x1 * y2 - y1 * x2
        return poly if a > 0 else poly[::-1]

    poly = ccw([tuple(p) for p in c1])
    clipper = ccw([tuple(p) for p in c2])
    for i in range(len(clipper)):
        if not poly:
            return 0.0
        x1, y1 = clipper[i - 1]
        x2, y2 = clipper[i]
        poly = _clip(poly, x1, y1, x2, y2)
    area = 0.0
    for i in range(len(poly)):
        x1, y1 = poly[i - 1]
        x2, y2 = poly[i]
        area += x1 * y2 - y1 * x2
    return abs(area) / 2.0


def _rand_boxes(rng, n):
    b = np.zeros((n, 5), np.float32)
    b[:, 0:2] = rng.uniform(-5, 5, size=(n, 2))
    b[:, 2:4] = rng.uniform(0.5, 6, size=(n, 2))
    b[:, 4] = rng.uniform(-np.pi, np.pi, size=n)
    return b


def test_iou2d_matches_clipping_oracle(rng):
    n = 200
    b1 = _rand_boxes(rng, n)
    b2 = _rand_boxes(rng, n)
    iou, overlap, union = iou_2d(jnp.asarray(b1), jnp.asarray(b2))
    overlap = np.asarray(overlap)
    c1 = np.asarray(boxes_to_corners(jnp.asarray(b1)))
    c2 = np.asarray(boxes_to_corners(jnp.asarray(b2)))
    for i in range(n):
        want = oracle_overlap(c1[i], c2[i])
        assert overlap[i] == pytest.approx(want, rel=2e-3, abs=2e-4), i


def test_identical_boxes_iou_one():
    b = jnp.asarray([[1.0, 2.0, 3.0, 4.0, 0.7]])
    iou, overlap, union = iou_2d(b, b)
    assert float(iou[0]) == pytest.approx(1.0, abs=1e-5)


def test_axis_aligned_known_values():
    b1 = jnp.asarray([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b2 = jnp.asarray([[1.0, 1.0, 2.0, 2.0, 0.0]])
    iou, overlap, _ = iou_2d(b1, b2)
    assert float(overlap[0]) == pytest.approx(1.0, abs=1e-5)
    assert float(iou[0]) == pytest.approx(1.0 / 7.0, abs=1e-5)
    # disjoint
    b3 = jnp.asarray([[10.0, 10.0, 2.0, 2.0, 0.3]])
    iou, overlap, _ = iou_2d(b1, b3)
    assert float(overlap[0]) == pytest.approx(0.0, abs=1e-6)


def test_contained_box():
    big = jnp.asarray([[0.0, 0.0, 10.0, 10.0, 0.2]])
    small = jnp.asarray([[0.0, 0.0, 2.0, 2.0, 1.0]])
    _, overlap, _ = iou_2d(big, small)
    assert float(overlap[0]) == pytest.approx(4.0, rel=1e-4)
    _, overlap2, _ = iou_2d(small, big)
    assert float(overlap2[0]) == pytest.approx(4.0, rel=1e-4)


def test_rotated_45_cross():
    # two unit squares, one rotated 45deg, same center: octagon overlap
    b1 = jnp.asarray([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b2 = jnp.asarray([[0.0, 0.0, 1.0, 1.0, np.pi / 4]])
    _, overlap, _ = iou_2d(b1, b2)
    want = 2 * (np.sqrt(2) - 1)  # octagon area
    assert float(overlap[0]) == pytest.approx(want, rel=1e-4)


def test_iou3d_z_overlap():
    b1 = jnp.asarray([[0.0, 0.0, 1.0, 2.0, 2.0, 2.0, 0.0]])
    b2 = jnp.asarray([[0.0, 0.0, 2.0, 2.0, 2.0, 2.0, 0.0]])
    # xy identical, z overlap = 1 of 2 -> inter = 4*1 = 4, union = 8+8-4 = 12
    v = float(iou_3d(b1, b2)[0])
    assert v == pytest.approx(4.0 / 12.0, rel=1e-4)
    # identical -> 1
    assert float(iou_3d(b1, b1)[0]) == pytest.approx(1.0, abs=1e-5)
    # z-disjoint -> non-positive (reference does not clamp)
    b3 = jnp.asarray([[0.0, 0.0, 10.0, 2.0, 2.0, 2.0, 0.0]])
    assert float(iou_3d(b1, b3)[0]) <= 0.0


def test_pairwise_matrix(rng):
    p = np.concatenate([_rand_boxes(rng, 4)[:, :2],
                        np.zeros((4, 1), np.float32),
                        _rand_boxes(rng, 4)[:, 2:4],
                        np.ones((4, 1), np.float32),
                        _rand_boxes(rng, 4)[:, 4:5]], axis=1).astype(np.float32)
    g = p[::-1].copy()
    M = np.asarray(iou_3d_pairwise(jnp.asarray(p), jnp.asarray(g)))
    assert M.shape == (4, 4)
    for i in range(4):
        for j in range(4):
            want = float(iou_3d(jnp.asarray(p[i]), jnp.asarray(g[j])))
            assert M[i, j] == pytest.approx(want, abs=1e-6)
