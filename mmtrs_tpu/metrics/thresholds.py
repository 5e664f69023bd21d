"""Threshold selection, vectorized over the whole grid at once.

Parity targets:
- experiments/fusion_v1/stack_blend.py:50-85  ``choose_threshold`` —
  grid ``linspace(0.01, 0.99, 199)``; modes max_f1 / max_acc / youden /
  target_prec (first t with prec>=target) / target_rec (last t with
  rec>=target); strict ``>`` improvement so the *lowest* best threshold wins.
- src/fusion/metrics.py:27-45  ``tune_threshold`` — grid
  ``linspace(0.05, 0.95, 181)``; objectives f1 / youden / pr_auc.
- models/xgboost_model.py:86-101 ``_find_best_threshold`` — same 181-grid;
  objectives balanced_accuracy / f1 / accuracy.

Instead of a Python loop over thresholds re-scanning all samples (the
reference's O(T·N)), counts at every threshold are derived with two
``searchsorted`` calls on the sorted positive/negative scores — O(N log N + T).
Results are numerically identical.
"""

from __future__ import annotations

import numpy as np

from mmtrs_tpu.metrics.binary import average_precision


def threshold_grid(kind: str = "stack") -> np.ndarray:
    if kind == "stack":  # stack_blend.py:51
        return np.linspace(0.01, 0.99, 199)
    if kind == "fusion":  # src/fusion/metrics.py:33, xgboost_model.py:87
        return np.linspace(0.05, 0.95, 181)
    if kind == "mm":  # train_mm_joint_dualtask.py:290-295
        return np.linspace(0.2, 0.8, 61)
    raise ValueError(f"unknown grid kind: {kind}")


def sweep_thresholds(y_true, y_prob, thresholds) -> dict[str, np.ndarray]:
    """Confusion-derived metrics at every threshold simultaneously.

    Prediction rule is ``p >= t`` (all reference sites use >=).
    Returns arrays of shape [T] for acc, bal_acc, prec, rec, f1, youden_j.
    """
    y = np.asarray(y_true).reshape(-1).astype(np.int64)
    p = np.asarray(y_prob).reshape(-1).astype(np.float64)
    t = np.asarray(thresholds, dtype=np.float64).reshape(-1)

    pos = np.sort(p[y == 1])
    neg = np.sort(p[y == 0])
    n_pos, n_neg = pos.size, neg.size
    # count of scores >= t  ==  n - first index where score >= t
    tp = n_pos - np.searchsorted(pos, t, side="left")
    fp = n_neg - np.searchsorted(neg, t, side="left")
    fn = n_pos - tp
    tn = n_neg - fp

    with np.errstate(divide="ignore", invalid="ignore"):
        prec = np.where(tp + fp > 0, tp / np.maximum(tp + fp, 1), 0.0)
        rec = np.where(n_pos > 0, tp / max(n_pos, 1), 0.0)
        spec = np.where(n_neg > 0, tn / max(n_neg, 1), 0.0)
        f1 = np.where(prec + rec > 0, 2 * prec * rec / np.maximum(prec + rec, 1e-300), 0.0)
    acc = (tp + tn) / max(n_pos + n_neg, 1)
    return {
        "thresholds": t,
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "acc": acc,
        "bal_acc": 0.5 * (rec + spec),
        "prec": prec,
        "rec": rec,
        "f1": f1,
        "youden_j": rec - (1.0 - spec),
    }


def _first_strict_argmax(values: np.ndarray) -> int:
    """Index of the max, first occurrence — matches the reference loops that
    update only on strict improvement."""
    return int(np.argmax(values))


def choose_threshold(y, p, mode: str = "max_f1", target: float = 0.80) -> float:
    """stack_blend.py:50-85 parity."""
    ts = threshold_grid("stack")
    s = sweep_thresholds(y, p, ts)
    if mode == "max_f1":
        return float(ts[_first_strict_argmax(s["f1"])])
    if mode == "max_acc":
        return float(ts[_first_strict_argmax(s["acc"])])
    if mode == "youden":
        # evaluated at the distinct observed scores, descending, like
        # sklearn.roc_curve (stack_blend.py:66-69)
        scores = np.unique(np.asarray(p, dtype=np.float64))[::-1]
        ss = sweep_thresholds(y, p, scores)
        return float(scores[_first_strict_argmax(ss["youden_j"])])
    if mode == "target_prec":
        ok = np.nonzero(s["prec"] >= target)[0]
        return float(ts[ok[0]]) if ok.size else 0.5
    if mode == "target_rec":
        ok = np.nonzero(s["rec"] >= target)[0]
        return float(ts[ok[-1]]) if ok.size else 0.5
    return 0.5


def tune_threshold(y, p, metric: str = "f1") -> tuple[float, float]:
    """src/fusion/metrics.py:27-45 + xgboost_model.py:86-101 parity.

    Supported objectives: f1, accuracy, balanced_accuracy, youden, pr_auc.
    (youden/pr_auc are threshold-free in the reference too — the loop just
    returns the first grid point; reproduce that quirk.)
    """
    ts = threshold_grid("fusion")
    if metric in ("youden", "pr_auc"):
        # reference computes a threshold-independent value inside the loop,
        # so the "best" threshold is always the first grid point
        if metric == "pr_auc":
            return float(ts[0]), float(average_precision(y, p))
        s = sweep_thresholds(y, p, np.unique(np.asarray(p))[::-1])
        return float(ts[0]), float(np.max(s["youden_j"]))
    s = sweep_thresholds(y, p, ts)
    key = {"f1": "f1", "accuracy": "acc", "balanced_accuracy": "bal_acc"}[metric]
    i = _first_strict_argmax(s[key])
    return float(ts[i]), float(s[key][i])
