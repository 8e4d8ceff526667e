"""Generate the AP/AOS/OS golden fixture pinned by tests/test_metrics.py.

Runs a faithful loop transcription of the reference's AP/AOS sweep
(`/root/reference/vfa/evaluation/pyeval/evaluateAPAOS.py:9-170`) over a
randomized MultiviewC-scale 3D detection fixture, with the per-pair CUDA
`IoU3D` call (`evaluateAPAOS.py:79-83` -> `IoU.py:206-225`) replaced by an
independent CPU oracle: Sutherland-Hodgman polygon clipping for the rotated
2D intersection (the same oracle family tests/test_iou.py uses) combined
with the reference's exact 3D composition formula (unclamped z-overlap,
volume union).

Outputs (vendored under tests/fixtures/):
  apaos_gt.txt      gt rows    `frame x y z l w h rot`
  apaos_pred.txt    pred rows  `frame x y z l w h rot conf`
  apaos_golden.json the 9 reference numbers (AP/AOS/OS at 0.75/0.5/0.25)

Deterministic: re-running reproduces the same files byte-for-byte.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
FIXDIR = os.path.join(HERE, os.pardir, "tests", "fixtures")


# ------------------------------------------------------------- IoU oracle ---
def _corners(box5):
    """[x, y, w, h, alpha] -> (4, 2) corners, reference convention
    (`IoU.py:6-35`): offsets (.5w,.5h), (-.5w,.5h), (-.5w,-.5h), (.5w,-.5h)
    rotated by [[cos, sin], [-sin, cos]] applied on the right."""
    x, y, w, h, a = box5
    tx = np.array([0.5, -0.5, -0.5, 0.5]) * w
    ty = np.array([0.5, 0.5, -0.5, -0.5]) * h
    c, s = math.cos(a), math.sin(a)
    return np.stack([x + tx * c - ty * s, y + tx * s + ty * c], axis=-1)


def _clip(poly, x1, y1, x2, y2):
    """Clip polygon by the half-plane left of edge (x1,y1)->(x2,y2)."""
    def inside(p):
        return (x2 - x1) * (p[1] - y1) - (y2 - y1) * (p[0] - x1) >= 0

    def inter(p, q):
        dcx, dcy = x1 - x2, y1 - y2
        dpx, dpy = p[0] - q[0], p[1] - q[1]
        n1 = x1 * y2 - y1 * x2
        n2 = p[0] * q[1] - p[1] * q[0]
        inv = 1.0 / (dcx * dpy - dcy * dpx)
        return ((n1 * dpx - n2 * dcx) * inv, (n1 * dpy - n2 * dcy) * inv)

    out = []
    for i, cur in enumerate(poly):
        prev = poly[i - 1]
        if inside(cur):
            if not inside(prev):
                out.append(inter(prev, cur))
            out.append(tuple(cur))
        elif inside(prev):
            out.append(inter(prev, cur))
    return out


def _overlap2d(c1, c2):
    def ccw(poly):
        a = sum(poly[i - 1][0] * poly[i][1] - poly[i - 1][1] * poly[i][0]
                for i in range(len(poly)))
        return poly if a > 0 else poly[::-1]

    poly = ccw([tuple(p) for p in c1])
    clipper = ccw([tuple(p) for p in c2])
    for i in range(len(clipper)):
        if not poly:
            return 0.0
        poly = _clip(poly, *clipper[i - 1], *clipper[i])
    a = sum(poly[i - 1][0] * poly[i][1] - poly[i - 1][1] * poly[i][0]
            for i in range(len(poly)))
    return abs(a) / 2.0


def oracle_iou3d(b1, b2):
    """Reference `IoU3D` (`IoU.py:206-225`): rotated-2D intersection times
    UNCLAMPED z-overlap, over the volume union."""
    inter2d = _overlap2d(_corners(b1[[0, 1, 3, 4, 6]]),
                         _corners(b2[[0, 1, 3, 4, 6]]))
    z_ov = (min(b1[2] + 0.5 * b1[5], b2[2] + 0.5 * b2[5])
            - max(b1[2] - 0.5 * b1[5], b2[2] - 0.5 * b2[5]))
    inter3d = inter2d * z_ov
    v1 = b1[3] * b1[4] * b1[5]
    v2 = b2[3] * b2[4] * b2[5]
    return inter3d / (v1 + v2 - inter3d)


# ------------------------------------- reference sweep (loop transcription) -
def _cal_frame_tpfp_iou(thresh, gt_res, pred_res):
    """`evaluateAPAOS.py:68-105`. gt rows (G, 9): frame obj x y z l w h rot;
    pred rows (P, 10): frame obj x y z l w h rot conf."""
    rows = np.zeros((pred_res.shape[0], 8)) - 1
    rows[:, -4:] += 1
    for i, pred in enumerate(pred_res):
        max_iou, max_idx, cur_gt_ori = -1.0, -1, -1.0
        for j, gt in enumerate(gt_res):
            iou = oracle_iou3d(pred[2:9], gt[2:9])
            if max_iou != 0 and iou >= thresh and iou > max_iou:
                max_iou, max_idx, cur_gt_ori = iou, j, gt[8]
        rows[i][0] = pred[9]                      # conf
        rows[i][1] = max_idx
        rows[i][2] = max_iou
        rows[i][3] = pred[8] - cur_gt_ori         # delta ori (junk if FP)
    # TP iff every entry != -1 (matched); shared gts NOT removed
    for k in range(pred_res.shape[0]):
        rows[k, 4] = 1 if -1 not in rows[k, :] else 0
    return rows


def _clear_mod_hun2(gt, det, thresh):
    """`evaluateAPAOS.py:9-65`: confidence-sorted sweep, 11-point AP/AOS."""
    frames = int(max(gt[:, 0])) + 1
    info = np.concatenate([
        _cal_frame_tpfp_iou(thresh, gt[gt[:, 0] == t - 1],
                            det[det[:, 0] == t - 1])
        for t in range(1, frames + 1)
    ], axis=0)
    info = info[np.argsort(info[:, 0], axis=0)[::-1]]
    tp = fp = 0
    all_p = gt.shape[0]
    for i, data in enumerate(info):
        if data[-4] == 1:
            tp += 1
        else:
            fp += 1
        info[i, -3] = tp / (tp + fp)
        info[i, -2] = tp / all_p
        cur_aos = sum(info[m, -4] * (1 + np.cos(info[m, 3])) / 2
                      for m in range(i + 1))
        info[i, -1] = cur_aos / (i + 1)
    ap = aos = 0.0
    for r in np.arange(0, 1.1, 0.1):
        for k in range(info.shape[0]):
            if info[k][-2] >= r:
                ap += max(info[k:, -3])
                aos += max(info[k:, -1])
                break
    return ap / 11, aos / 11


def reference_ap_aos(gt_path, pred_path):
    """`evaluateDetectionAPAOS` (`evaluateAPAOS.py:107-170`)."""
    gt_raw = np.loadtxt(gt_path)
    det_raw = np.loadtxt(pred_path)
    frames = np.unique(det_raw[:, 0])
    gts, dets = [], []
    for ctr, t in enumerate(frames):
        g = gt_raw[gt_raw[:, 0] == t]
        d = det_raw[det_raw[:, 0] == t]
        gts.append(np.concatenate(
            [np.full((len(g), 1), ctr), np.arange(len(g))[:, None], g[:, 1:]],
            axis=1))
        dets.append(np.concatenate(
            [np.full((len(d), 1), ctr), np.arange(len(d))[:, None], d[:, 1:]],
            axis=1))
    gt = np.concatenate(gts)
    det = np.concatenate(dets)
    out = []
    for thresh in (0.75, 0.5, 0.25):
        ap, aos = _clear_mod_hun2(gt, det, thresh)
        out += [ap * 100, aos * 100, aos / ap]
    return out


# ----------------------------------------------------------------- fixture --
def make_fixture(seed=7, frames=8):
    """MultiviewC-scale cows: cm coordinates, dim_mean ~ (140, 120, 255)."""
    rng = np.random.default_rng(seed)
    gt_rows, pred_rows = [], []
    for f in range(frames):
        n = rng.integers(6, 12)
        x = rng.uniform(300, 3600, n)
        y = rng.uniform(300, 3600, n)
        l = rng.normal(140, 10, n)
        w = rng.normal(120, 10, n)
        h = rng.normal(255, 15, n)
        z = h / 2
        rot = rng.uniform(-np.pi, np.pi, n)
        for i in range(n):
            gt_rows.append([f, x[i], y[i], z[i], l[i], w[i], h[i], rot[i]])
            if rng.uniform() < 0.85:  # detected; jitter spans all 3 IoU tiers
                s = rng.uniform(0.90, 1.10, 3)
                sig = rng.choice([6.0, 25.0, 55.0], p=[0.5, 0.3, 0.2])
                pred_rows.append([
                    f, x[i] + rng.normal(0, sig), y[i] + rng.normal(0, sig),
                    z[i] * s[2], l[i] * s[0], w[i] * s[1], h[i] * s[2],
                    rot[i] + rng.normal(0, 0.25), rng.uniform(0.5, 1.0),
                ])
        for _ in range(rng.integers(1, 4)):  # false positives
            hh = rng.normal(255, 15)
            pred_rows.append([
                f, rng.uniform(300, 3600), rng.uniform(300, 3600), hh / 2,
                rng.normal(140, 10), rng.normal(120, 10), hh,
                rng.uniform(-np.pi, np.pi), rng.uniform(0.3, 0.9),
            ])
    return np.asarray(gt_rows), np.asarray(pred_rows)


def main():
    gt, pred = make_fixture()
    os.makedirs(FIXDIR, exist_ok=True)
    gt_path = os.path.join(FIXDIR, "apaos_gt.txt")
    pred_path = os.path.join(FIXDIR, "apaos_pred.txt")
    np.savetxt(gt_path, gt, fmt="%.6f")
    np.savetxt(pred_path, pred, fmt="%.6f")
    golden = reference_ap_aos(gt_path, pred_path)
    names = ["AP_75", "AOS_75", "OS_75", "AP_50", "AOS_50", "OS_50",
             "AP_25", "AOS_25", "OS_25"]
    blob = dict(zip(names, [float(v) for v in golden]))
    with open(os.path.join(FIXDIR, "apaos_golden.json"), "w") as f:
        json.dump(blob, f, indent=1)
    print(json.dumps(blob, indent=1))


if __name__ == "__main__":
    main()
