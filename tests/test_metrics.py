import pytest
import jax.numpy as jnp
import numpy as np
from sklearn.metrics import f1_score, roc_auc_score

from incremental_multimodal_medical_learning_ii_tpu.evaluation.metrics import (
    auroc_device,
    compute_metrics,
    f1_device,
    per_class_metrics,
    subset_accuracy_device,
)


def _fake_eval(rng, n=200, c=5):
    y_true = (rng.random((n, c)) < 0.4).astype(np.float32)
    y_score = np.clip(0.5 * y_true + 0.3 * rng.random((n, c)), 0, 1)
    y_pred = (y_score > 0.4).astype(np.float32)
    return y_true, y_pred, y_score


def test_compute_metrics_matches_sklearn(rng):
    y_true, y_pred, y_score = _fake_eval(rng)
    m = compute_metrics(y_true, y_pred, y_score)
    assert m["auroc_macro"] == roc_auc_score(y_true, y_score, average="macro", multi_class="ovr")
    assert m["f1_macro"] == f1_score(y_true, y_pred, average="macro")
    assert 0 <= m["accuracy"] <= 1


def test_per_class_metrics_shapes(rng):
    y_true, y_pred, y_score = _fake_eval(rng)
    pc = per_class_metrics(y_true, y_pred, y_score)
    for k in ("f1", "auroc", "accuracy", "precision", "recall"):
        assert pc[k].shape == (5,)
    assert pc["auroc"][0] == roc_auc_score(y_true[:, 0], y_score[:, 0])


@pytest.mark.slow
def test_auroc_device_matches_sklearn(rng):
    y_true, _, y_score = _fake_eval(rng, n=300)
    mask = np.ones(300, np.float32)
    got = np.asarray(auroc_device(jnp.asarray(y_score), jnp.asarray(y_true), jnp.asarray(mask)))
    for i in range(5):
        expected = roc_auc_score(y_true[:, i], y_score[:, i])
        np.testing.assert_allclose(got[i], expected, atol=1e-5)


def test_auroc_device_with_ties_and_mask(rng):
    n = 128
    y_true = (rng.random((n, 1)) < 0.5).astype(np.float32)
    y_score = np.round(rng.random((n, 1)) * 4) / 4  # heavy ties
    mask = np.ones(n, np.float32)
    mask[100:] = 0  # padded tail
    got = float(
        auroc_device(jnp.asarray(y_score), jnp.asarray(y_true), jnp.asarray(mask))[0]
    )
    expected = roc_auc_score(y_true[:100, 0], y_score[:100, 0])
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_f1_device_matches_sklearn(rng):
    y_true, y_pred, _ = _fake_eval(rng)
    mask = np.ones(len(y_true), np.float32)
    got = np.asarray(f1_device(jnp.asarray(y_pred), jnp.asarray(y_true), jnp.asarray(mask)))
    for i in range(5):
        np.testing.assert_allclose(got[i], f1_score(y_true[:, i], y_pred[:, i]), atol=1e-6)


def test_subset_accuracy_device(rng):
    y_true, y_pred, _ = _fake_eval(rng)
    mask = np.ones(len(y_true), np.float32)
    got = float(subset_accuracy_device(jnp.asarray(y_pred), jnp.asarray(y_true), jnp.asarray(mask)))
    expected = np.mean(np.all(y_pred == y_true, axis=1))
    np.testing.assert_allclose(got, expected, atol=1e-6)


@pytest.mark.fast
def test_auroc_device_degenerate_class_is_nan(rng):
    """A class with no valid positives (or negatives) has no defined AUROC —
    sklearn raises; the device metric must surface NaN, not a silent 0.0."""
    n = 32
    y_score = rng.random((n, 3)).astype(np.float32)
    y_true = (rng.random((n, 3)) > 0.5).astype(np.float32)
    y_true[:, 0] = 0.0  # all-negative class
    y_true[:, 1] = 1.0  # all-positive class
    mask = np.ones(n, np.float32)
    got = np.asarray(
        auroc_device(jnp.asarray(y_score), jnp.asarray(y_true), jnp.asarray(mask))
    )
    assert np.isnan(got[0]) and np.isnan(got[1])
    from sklearn.metrics import roc_auc_score

    assert got[2] == pytest.approx(roc_auc_score(y_true[:, 2], y_score[:, 2]), abs=1e-6)


@pytest.mark.slow
def test_auroc_device_randomized_sweep_vs_sklearn(rng):
    """Distribution-level evidence for the rank-statistic AUROC: 40 random
    trials sweeping tie density (2..64 score levels), class imbalance, and
    padded-tail length, each against sklearn.  All trials share ONE device
    shape (the validity mask expresses the logical length): auroc_device
    is jitted per shape, and 40 distinct lengths would compile 40 programs
    (~60 s of pure re-trace on this 1-vCPU host, measured)."""
    n_pad = 512
    for trial in range(40):
        n = int(rng.integers(16, 400))
        levels = int(rng.integers(2, 64))
        p_pos = float(rng.uniform(0.05, 0.95))
        y_true = np.zeros((n_pad, 1), np.float32)
        y_true[:n] = (rng.random((n, 1)) < p_pos).astype(np.float32)
        y_score = np.zeros((n_pad, 1), np.float32)
        y_score[:n] = np.round(rng.random((n, 1)) * levels) / levels
        valid = int(rng.integers(8, n + 1))
        mask = np.zeros(n_pad, np.float32)
        mask[:valid] = 1.0
        got = float(
            auroc_device(jnp.asarray(y_score), jnp.asarray(y_true), jnp.asarray(mask))[0]
        )
        yt, ys = y_true[:valid, 0], y_score[:valid, 0]
        if len(np.unique(yt)) < 2:
            assert np.isnan(got), (trial, "degenerate class must be NaN")
            continue
        np.testing.assert_allclose(
            got, roc_auc_score(yt, ys), atol=1e-5,
            err_msg=f"trial {trial}: n={n} levels={levels} valid={valid}",
        )
