"""Evaluation dispatch (reference: `vfa/evaluation/evaluate.py:7-27`).

The reference dispatches between an out-of-process MATLAB engine and a Python
port; both are replaced by the single pure-Python/JAX backend here, so
`eval_tool` is accepted for CLI compatibility but ignored (there is no MATLAB
or CUDA dependency anywhere in this framework). The matching distance
threshold `td` is exposed because the two reference backends silently
disagreed (78 vs 30).
"""

from __future__ import annotations

from vfa_tpu.eval.apaos import evaluate_ap_aos  # noqa: F401
from vfa_tpu.eval.moda import DEFAULT_TD, evaluate_detection


def evaluate_rcll_prec_moda_modp(
    res_fpath: str,
    gt_fpath: str,
    dataset: str = "Wildtrack",
    eval: str = "python",
    td: float = DEFAULT_TD,
):
    """Returns (recall, precision, MODA, MODP) in percent."""
    del dataset, eval  # kept for reference CLI compatibility
    return evaluate_detection(res_fpath, gt_fpath, td=td)
