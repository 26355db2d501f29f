"""Evaluation metrics.

The reference computes all headline numbers with scikit-learn on host
(``Trainer.py:868-932``); we do the same for bit-exact parity, and
additionally provide a jit-compiled on-device AUROC/F1 approximation for
cheap in-loop monitoring without a device->host sync of the full score
matrix.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def compute_metrics(y_true: np.ndarray, y_pred: np.ndarray, y_score: np.ndarray) -> Dict[str, float]:
    """The exact metric set of ``Trainer.evaluate_model`` (Trainer.py:871-877)."""
    from sklearn.metrics import (
        accuracy_score,
        f1_score,
        precision_score,
        recall_score,
        roc_auc_score,
    )

    return {
        "accuracy": float(accuracy_score(y_true, y_pred)),
        "f1_macro": float(f1_score(y_true, y_pred, average="macro")),
        "f1_weighted": float(f1_score(y_true, y_pred, average="weighted")),
        "auroc_macro": float(roc_auc_score(y_true, y_score, average="macro", multi_class="ovr")),
        "auroc_weighted": float(
            roc_auc_score(y_true, y_score, average="weighted", multi_class="ovr")
        ),
        "precision_weighted": float(
            precision_score(y_true, y_pred, average="weighted", zero_division=0)
        ),
        "recall_weighted": float(recall_score(y_true, y_pred, average="weighted", zero_division=0)),
    }


def per_class_metrics(
    y_true: np.ndarray, y_pred: np.ndarray, y_score: np.ndarray
) -> Dict[str, np.ndarray]:
    """Per-class rows for the epoch x class / task x class heatmaps
    (Trainer.py:934-943) and the accuracy/precision/recall scatter plots
    (Trainer.py:922-932)."""
    from sklearn.metrics import (
        accuracy_score,
        f1_score,
        precision_score,
        recall_score,
        roc_auc_score,
    )

    c = y_true.shape[1]
    out = {k: np.zeros(c) for k in ("f1", "auroc", "accuracy", "precision", "recall")}
    for i in range(c):
        out["f1"][i] = f1_score(y_true[:, i], y_pred[:, i])
        out["auroc"][i] = roc_auc_score(y_true[:, i], y_score[:, i])
        out["accuracy"][i] = accuracy_score(y_true[:, i], y_pred[:, i])
        out["precision"][i] = precision_score(y_true[:, i], y_pred[:, i], zero_division=0)
        out["recall"][i] = recall_score(y_true[:, i], y_pred[:, i], zero_division=0)
    return out


# ----------------------------------------------------------------------
# On-device monitoring approximations (no reference counterpart; the
# reference syncs every batch to host for sklearn)
# ----------------------------------------------------------------------
def auroc_device(scores: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Per-class AUROC via the rank statistic (Mann-Whitney U), tie-aware.

    scores/labels: (N, C); mask: (N,) validity.  Jittable; exact for
    distinct scores, average-rank for ties (same convention as sklearn).
    """
    n, c = scores.shape
    n_masked = n - jnp.sum(mask)

    def one_class(s, y):
        # Masked rows sort to the very front (rank 1..n_masked) and carry
        # zero weight; subtracting n_masked restores valid-only ranks.
        s = jnp.where(mask > 0, s, -jnp.inf)
        order = jnp.argsort(s)
        s_sorted = s[order]
        y_sorted = y[order]
        m_sorted = mask[order]
        ranks = jnp.arange(1, n + 1, dtype=jnp.float32)
        # average ranks for ties: group by equal score
        same_as_prev = jnp.concatenate([jnp.zeros(1, bool), s_sorted[1:] == s_sorted[:-1]])
        grp = jnp.cumsum(~same_as_prev)
        grp_sum = jnp.zeros(n + 1).at[grp].add(ranks)
        grp_cnt = jnp.zeros(n + 1).at[grp].add(1.0)
        avg_rank = (grp_sum / jnp.maximum(grp_cnt, 1.0))[grp] - n_masked
        n_pos = jnp.sum(y_sorted * m_sorted)
        n_neg = jnp.sum((1 - y_sorted) * m_sorted)
        rank_sum_pos = jnp.sum(avg_rank * y_sorted * m_sorted)
        u = rank_sum_pos - n_pos * (n_pos + 1) / 2.0
        # a class with no valid positives or no valid negatives has no
        # defined AUROC (sklearn raises there); NaN surfaces it instead of
        # a silent 0.0 dragging a sweep's mean ranking
        return jnp.where(
            n_pos * n_neg > 0, u / jnp.maximum(n_pos * n_neg, 1.0), jnp.nan
        )

    return jnp.stack([one_class(scores[:, i], labels[:, i]) for i in range(c)])


def f1_device(preds: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Per-class binary F1 on device."""
    m = mask[:, None]
    tp = jnp.sum(preds * labels * m, axis=0)
    fp = jnp.sum(preds * (1 - labels) * m, axis=0)
    fn = jnp.sum((1 - preds) * labels * m, axis=0)
    return 2 * tp / jnp.maximum(2 * tp + fp + fn, 1.0)


def subset_accuracy_device(preds: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    exact = jnp.all(preds == labels, axis=1).astype(jnp.float32)
    return jnp.sum(exact * mask) / jnp.maximum(jnp.sum(mask), 1.0)
