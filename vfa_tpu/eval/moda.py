"""CLEAR detection metrics: recall / precision / MODA / MODP.

Replaces both metric backends of the reference — the MATLAB devkit
(`motchallenge-devkit/utils/CLEAR_MOD_HUN.m`, driven out-of-process via
matlab.engine at `vfa/evaluation/evaluate.py:9-16`) and its Python port
(`vfa/evaluation/pyeval/CLEAR_MOD_HUN.py`) — with one vectorized numpy/scipy
implementation. Per frame: gt<->det Euclidean distance matrix, Hungarian
matching with costs above the distance threshold set to 1e6, matches kept
only below the threshold.

The two reference backends disagree on the threshold default (MATLAB td=78,
`CLEAR_MOD_HUN.m:36`; pyeval td=30, `CLEAR_MOD_HUN.py:27`); `td` is an
explicit parameter here, defaulting to the pyeval value.

The matching itself can run through the native C++ Jonker-Volgenant solver
(vfa_tpu/native — the TPU-stack equivalent of the devkit's MinCostMatching
mex) with scipy as fallback.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

DEFAULT_TD = 30.0


def _linear_sum_assignment(cost: np.ndarray):
    from vfa_tpu.native import linear_sum_assignment

    return linear_sum_assignment(cost)


def clear_mod_metrics(gt: np.ndarray, det: np.ndarray, td: float = DEFAULT_TD):
    """CLEAR MOD metrics over reindexed matrices.

    gt, det: (n, 4) rows [frame, obj_id, x, y] with frames 0..F-1 (the format
    produced by `load_detection_files`). Returns (recall, precision, MODA,
    MODP) in percent, with the reference's clamp-at-zero behavior
    (`CLEAR_MOD_HUN.py:94-99`).
    """
    F = int(gt[:, 0].max()) + 1 if len(gt) else 0
    c = np.zeros(F)        # true positives per frame
    fp = np.zeros(F)
    miss = np.zeros(F)
    g = np.zeros(F)        # gt count per frame
    modp_sum = 0.0

    for t in range(F):
        gt_t = gt[gt[:, 0] == t, 2:4]
        det_t = det[det[:, 0] == t, 2:4] if len(det) else np.zeros((0, 2))
        g[t] = len(gt_t)
        matched_d = np.zeros(0)
        if len(gt_t) and len(det_t):
            dist = np.linalg.norm(gt_t[:, None, :] - det_t[None, :, :], axis=-1)
            cost = np.where(dist > td, 1e6, dist)
            rows, cols = _linear_sum_assignment(cost)
            keep = cost[rows, cols] < td
            rows, cols = rows[keep], cols[keep]
            matched_d = dist[rows, cols]
        c[t] = len(matched_d)
        fp[t] = len(det_t) - c[t]
        miss[t] = g[t] - c[t]
        modp_sum += np.sum(1.0 - matched_d[matched_d < td] / td)

    n_c, n_g, n_fp, n_m = c.sum(), g.sum(), fp.sum(), miss.sum()
    modp = modp_sum / n_c * 100 if n_c > 0 else 0.0
    moda = (1.0 - (n_m + n_fp) / n_g) * 100 if n_g > 0 else 0.0
    recall = n_c / n_g * 100 if n_g > 0 else 0.0
    precision = n_c / (n_fp + n_c) * 100 if (n_fp + n_c) > 0 else 0.0
    # reference clamps each metric at zero (`CLEAR_MOD_HUN.py:94-99`)
    return max(recall, 0.0), max(precision, 0.0), max(moda, 0.0), max(modp, 0.0)


MATLAB_TD = 78.0


def clear_mod_matlab(gt: np.ndarray, det: np.ndarray, td: float = MATLAB_TD):
    """Exact semantics of the official MATLAB devkit detection path
    (`motchallenge-devkit/utils/CLEAR_MOD_HUN.m`, driven by
    `evaluateDetection.m` / `eval_demo.m`) — the backend the paper-grade
    numbers come from.

    Differences vs the pyeval port (`clear_mod_metrics`):
      * td defaults to 78 (`CLEAR_MOD_HUN.m:33-39`), not 30;
      * pairs at exactly dist == td are matchable (MATLAB forbids only
        dist > td, `CLEAR_MOD_HUN.m:189`) though they contribute 0 to MODP
        (`distances<td` is strict, `:258`);
      * the frame loop runs over the detection file's frames
        (`evaluateDetection.m:38`, `CLEAR_MOD_HUN.m:53` F=max det frame),
        so trailing det-only frames still count their false positives;
      * no clamp-at-zero — MODA can go negative; MATLAB only maps NaN->0
        (`CLEAR_MOD_HUN.m:270`);
      * the full 9-metric row [Rcll Prcn FAR GT TP FP FN MODA MODP].

    MATLAB's `Hungarian.m` computes a maximum-cardinality minimum-cost
    matching over the allowed (dist <= td) pairs: its padding construction
    (deficiency `cnum` extra rows/cols, `Hungarian.m:48-55`) forces maximum
    cardinality, and Inf edges are never taken. A uniform big-M substitute
    with post-filtering is equivalent: minimizing total cost first minimizes
    the number of big-M (forbidden) assignments — i.e. maximizes allowed
    cardinality — and then minimizes the allowed-pair cost. The metric values
    depend only on the matching's cardinality and total matched distance,
    both of which are unique across optimal matchings.

    Returns a dict with keys recall/precision/far/gt/tp/fp/fn/moda/modp.
    """
    F = int(det[:, 0].max()) + 1 if len(det) else 0
    Fgt = int(gt[:, 0].max()) + 1 if len(gt) else 0
    c = np.zeros(F)
    fp = np.zeros(F)
    miss = np.zeros(F)
    g = np.zeros(F)
    modp_sum = 0.0

    for t in range(F):
        gt_t = gt[gt[:, 0] == t, 2:4] if len(gt) else np.zeros((0, 2))
        det_t = det[det[:, 0] == t, 2:4]
        g[t] = len(gt_t)
        matched_d = np.zeros(0)
        if len(gt_t) and len(det_t):
            dist = np.linalg.norm(gt_t[:, None, :] - det_t[None, :, :], axis=-1)
            cost = np.where(dist > td, 1e6, dist)
            if (cost < 1e6).any():
                rows, cols = _linear_sum_assignment(cost)
                keep = dist[rows, cols] <= td
                matched_d = dist[rows[keep], cols[keep]]
        c[t] = len(matched_d)
        fp[t] = len(det_t) - c[t]
        miss[t] = g[t] - c[t]
        modp_sum += np.sum(1.0 - matched_d[matched_d < td] / td)

    n_c, n_g, n_fp, n_m = c.sum(), g.sum(), fp.sum(), miss.sum()
    out = {
        "recall": n_c / n_g * 100 if n_g > 0 else 0.0,
        "precision": n_c / (n_fp + n_c) * 100 if (n_fp + n_c) > 0 else 0.0,
        "far": n_fp / Fgt if Fgt > 0 else 0.0,
        "gt": n_g,
        "tp": n_c,
        "fp": n_fp,
        "fn": n_m,
        "moda": (1.0 - (n_m + n_fp) / n_g) * 100 if n_g > 0 else 0.0,
        "modp": modp_sum / n_c * 100 if n_c > 0 else 0.0,
    }
    return out


def evaluate_detection_matlab(res_fpath: str, gt_fpath: str,
                              td: float = MATLAB_TD):
    """File-level MATLAB-devkit-semantics entry point (td=78 default)."""
    gt, det = load_detection_files(res_fpath, gt_fpath)
    if len(det) == 0:
        return {k: 0.0 for k in
                ("recall", "precision", "far", "gt", "tp", "fp", "fn",
                 "moda", "modp")}
    return clear_mod_matlab(gt, det, td)


def load_detection_files(res_fpath: str, gt_fpath: str):
    """Load `frame x y` txt files and reindex frames to 0..F-1.

    Follows `pyeval/evaluateDetection.py:28-70`: the frame list comes from the
    *detection* file; gt rows in frames with no detections are dropped
    (reference quirk, kept for parity).
    """
    gt_raw = np.atleast_2d(np.loadtxt(gt_fpath))
    det_raw = np.atleast_2d(np.loadtxt(res_fpath))
    if det_raw.size == 0:
        return np.zeros((0, 4)), np.zeros((0, 4))
    frames = np.unique(det_raw[:, 0])
    gt_rows, det_rows = [], []
    for fc, t in enumerate(frames):
        for raw, out in ((gt_raw, gt_rows), (det_raw, det_rows)):
            sel = raw[raw[:, 0] == t]
            a = np.zeros((len(sel), 4))
            a[:, 0] = fc
            a[:, 1] = np.arange(len(sel))
            a[:, 2:4] = sel[:, 1:3]
            out.append(a)
    return np.concatenate(gt_rows), np.concatenate(det_rows)


def evaluate_detection(
    res_fpath: str, gt_fpath: str, td: float = DEFAULT_TD
) -> Tuple[float, float, float, float]:
    """File-level entry point: (recall, precision, MODA, MODP)."""
    gt, det = load_detection_files(res_fpath, gt_fpath)
    if len(det) == 0:
        return 0.0, 0.0, 0.0, 0.0
    return clear_mod_metrics(gt, det, td)
