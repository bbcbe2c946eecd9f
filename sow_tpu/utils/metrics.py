"""Classification/regression metrics — local numpy implementations.

Replaces the reference's ``evaluate.load("glue", ...)`` (``run_glue.py``),
which downloads metric scripts at runtime; these are the standard GLUE
definitions computed in-process.
"""

from __future__ import annotations

import numpy as np


def accuracy(preds: np.ndarray, refs: np.ndarray) -> float:
    preds, refs = np.asarray(preds), np.asarray(refs)
    return float((preds == refs).mean()) if len(refs) else 0.0


def f1(preds: np.ndarray, refs: np.ndarray, positive: int = 1) -> float:
    preds, refs = np.asarray(preds), np.asarray(refs)
    tp = float(((preds == positive) & (refs == positive)).sum())
    fp = float(((preds == positive) & (refs != positive)).sum())
    fn = float(((preds != positive) & (refs == positive)).sum())
    denom = 2 * tp + fp + fn
    return 2 * tp / denom if denom else 0.0


def matthews_corrcoef(preds: np.ndarray, refs: np.ndarray) -> float:
    preds, refs = np.asarray(preds), np.asarray(refs)
    classes = np.unique(np.concatenate([preds, refs]))
    k = len(classes)
    idx = {c: i for i, c in enumerate(classes)}
    c = np.zeros((k, k), dtype=np.float64)
    for p, r in zip(preds, refs):
        c[idx[r], idx[p]] += 1
    t = c.sum(axis=1)  # true counts
    p = c.sum(axis=0)  # predicted counts
    n = c.sum()
    cov_tp = c.trace() * n - (t * p).sum()
    denom = np.sqrt(n**2 - (p * p).sum()) * np.sqrt(n**2 - (t * t).sum())
    return float(cov_tp / denom) if denom else 0.0


def pearson(preds: np.ndarray, refs: np.ndarray) -> float:
    preds, refs = np.asarray(preds, np.float64), np.asarray(refs, np.float64)
    if preds.std() == 0 or refs.std() == 0:
        return 0.0
    return float(np.corrcoef(preds, refs)[0, 1])


def spearman(preds: np.ndarray, refs: np.ndarray) -> float:
    def rank(x):
        order = np.argsort(x)
        r = np.empty_like(order, dtype=np.float64)
        r[order] = np.arange(len(x))
        # average ties
        _, inv, counts = np.unique(x, return_inverse=True, return_counts=True)
        sums = np.zeros(len(counts))
        np.add.at(sums, inv, r)
        return sums[inv] / counts[inv]

    return pearson(rank(np.asarray(preds)), rank(np.asarray(refs)))


def glue_metrics(task: str, preds: np.ndarray, refs: np.ndarray) -> dict[str, float]:
    """Standard GLUE metric set per task."""
    if task == "cola":
        return {"matthews_correlation": matthews_corrcoef(preds, refs)}
    if task == "stsb":
        return {"pearson": pearson(preds, refs), "spearmanr": spearman(preds, refs)}
    if task in ("mrpc", "qqp"):
        return {"accuracy": accuracy(preds, refs), "f1": f1(preds, refs)}
    return {"accuracy": accuracy(preds, refs)}
