"""Parity tests of the prompt-cosine scorer against torch reference formulas.

The torch side reproduces the reference's math directly from its primitives
(``pairwise_cosine_similarity`` semantics, mean-after-adapter, max-over-
prompts) so the JAX scorer is validated against an independent
implementation, not against itself.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from incremental_multimodal_medical_learning_ii_tpu.models.adapters import (
    AdapterPair,
)
from incremental_multimodal_medical_learning_ii_tpu.objectives.losses import (
    bce_with_logits,
    change_labels,
)
from incremental_multimodal_medical_learning_ii_tpu.objectives.scorer import (
    PromptBank,
    apply_text_adapter_to_bank,
    score_embeddings,
)
from incremental_multimodal_medical_learning_ii_tpu.ops.cosine import pairwise_cosine
from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
    AdapterKind,
    PromptMode,
)


def torch_pairwise_cosine(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    xt, yt = torch.tensor(x), torch.tensor(y)
    xn = F.normalize(xt, dim=-1)
    yn = F.normalize(yt, dim=-1)
    return (xn @ yn.T).numpy()


def make_bank(rng, c=5, p=4, d=128, counts=None):
    pos = rng.normal(size=(c, p, d)).astype(np.float32)
    neg = rng.normal(size=(c, p, d)).astype(np.float32)
    pos_count = np.full(c, p, np.int32) if counts is None else np.asarray(counts, np.int32)
    neg_count = pos_count.copy()
    # zero the padding
    for i in range(c):
        pos[i, pos_count[i]:] = 0
        neg[i, neg_count[i]:] = 0
    return PromptBank(
        pos=jnp.asarray(pos), neg=jnp.asarray(neg),
        pos_count=jnp.asarray(pos_count), neg_count=jnp.asarray(neg_count),
    )


def test_pairwise_cosine_matches_torch(rng):
    x = rng.normal(size=(17, 128)).astype(np.float32)
    y = rng.normal(size=(9, 128)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(pairwise_cosine(jnp.asarray(x), jnp.asarray(y))),
        torch_pairwise_cosine(x, y),
        atol=1e-6,
    )


def test_mean_mode_matches_reference_math(rng):
    """MEAN mode: mean prompt embedding per polarity, cosine vs the mean."""
    bank = make_bank(rng, counts=[4, 3, 2, 4, 1])
    x = rng.normal(size=(32, 128)).astype(np.float32)
    out = score_embeddings(jnp.asarray(x), bank, PromptMode.MEAN, True, False)

    pos = np.asarray(bank.pos)
    counts = np.asarray(bank.pos_count)
    for c in range(5):
        mean_vec = pos[c, : counts[c]].mean(axis=0, keepdims=True)
        expected = torch_pairwise_cosine(x, mean_vec)[:, 0]
        np.testing.assert_allclose(np.asarray(out.pos_sim)[:, c], expected, atol=1e-5)
    # logits = pos - neg in TRAIN_LOGIT_DIFF mode
    np.testing.assert_allclose(
        np.asarray(out.logits), np.asarray(out.pos_sim - out.neg_sim), atol=1e-6
    )
    # default score = (pos + 1) / 2
    np.testing.assert_allclose(
        np.asarray(out.scores), (np.asarray(out.pos_sim) + 1) / 2, atol=1e-6
    )


@pytest.mark.slow
def test_max_mode_matches_reference_math(rng):
    bank = make_bank(rng, p=6, counts=[6, 4, 2, 5, 1])
    x = rng.normal(size=(16, 128)).astype(np.float32)
    out = score_embeddings(jnp.asarray(x), bank, PromptMode.MAX, True, False)

    pos = np.asarray(bank.pos)
    counts = np.asarray(bank.pos_count)
    for c in range(5):
        sims = torch_pairwise_cosine(x, pos[c, : counts[c]])  # (B, P_c)
        np.testing.assert_allclose(np.asarray(out.pos_sim)[:, c], sims.max(axis=1), atol=1e-5)
    assert out.max_mean_gap.shape == (2, x.shape[0], 5)  # per-row gaps
    # gap per class = per-row (max - mean over valid prompts); the engine
    # masks padded rows before averaging (steps.py::_train_core)
    sims0 = torch_pairwise_cosine(x, pos[0, : counts[0]])
    gap0 = sims0.max(axis=1) - sims0.mean(axis=1)
    np.testing.assert_allclose(np.asarray(out.max_mean_gap)[0, :, 0], gap0, atol=1e-5)


def test_pred_logit_diff_score(rng):
    bank = make_bank(rng)
    x = rng.normal(size=(8, 128)).astype(np.float32)
    out = score_embeddings(jnp.asarray(x), bank, PromptMode.MEAN, True, True)
    np.testing.assert_allclose(
        np.asarray(out.scores),
        (np.asarray(out.pos_sim) - np.asarray(out.neg_sim) + 2) / 4,
        atol=1e-6,
    )


def test_predictions_are_pos_greater_than_neg(rng):
    bank = make_bank(rng)
    x = rng.normal(size=(8, 128)).astype(np.float32)
    out = score_embeddings(jnp.asarray(x), bank, PromptMode.MEAN, True, False)
    np.testing.assert_array_equal(
        np.asarray(out.preds), (np.asarray(out.pos_sim) > np.asarray(out.neg_sim)).astype(np.float32)
    )


def test_text_adapter_applied_per_prompt_then_padding_rezeroed(rng):
    pair = AdapterPair(AdapterKind.MLP, shared=False, use_image=False, use_text=True)
    params = pair.init(jax.random.PRNGKey(0))
    bank = make_bank(rng, counts=[2, 2, 2, 2, 2])
    adapted = apply_text_adapter_to_bank(pair.apply_text, params, bank)
    # valid rows transformed
    one = pair.apply_text(params, bank.pos[0, :2])
    np.testing.assert_allclose(np.asarray(adapted.pos[0, :2]), np.asarray(one), atol=1e-6)
    # padded rows stay exactly zero (adapter bias must not leak into means)
    assert np.all(np.asarray(adapted.pos[:, 2:]) == 0)


def test_bce_with_logits_matches_torch(rng):
    logits = rng.normal(size=(16, 5)).astype(np.float32)
    labels = (rng.random((16, 5)) < 0.5).astype(np.float32)
    expected = torch.nn.BCEWithLogitsLoss()(torch.tensor(logits), torch.tensor(labels)).item()
    got = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(labels)))
    assert got == pytest.approx(expected, abs=1e-6)


def test_bce_masked_equals_submatrix(rng):
    logits = rng.normal(size=(16, 5)).astype(np.float32)
    labels = (rng.random((16, 5)) < 0.5).astype(np.float32)
    mask = np.zeros((16, 5), np.float32)
    mask[:10, :3] = 1  # 10 valid rows, first 3 classes (MORE_LABELS-style)
    got = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask)))
    expected = torch.nn.BCEWithLogitsLoss()(
        torch.tensor(logits[:10, :3]), torch.tensor(labels[:10, :3])
    ).item()
    assert got == pytest.approx(expected, abs=1e-5)


def test_change_labels():
    lbl = jnp.asarray([[0.0, 1.0], [1.0, 0.0]])
    np.testing.assert_array_equal(
        np.asarray(change_labels(lbl)), np.asarray([[-1.0, 1.0], [1.0, -1.0]])
    )


def test_adapter_matches_torch_mlp(rng):
    """myMLP forward parity: Linear(128,256)+ReLU+Linear(256,128)."""
    pair = AdapterPair(AdapterKind.MLP, shared=False, use_image=True, use_text=False)
    params = pair.init(jax.random.PRNGKey(1))
    x = rng.normal(size=(7, 128)).astype(np.float32)

    w1 = np.asarray(params["image"]["dense1"]["kernel"])
    b1 = np.asarray(params["image"]["dense1"]["bias"])
    w2 = np.asarray(params["image"]["dense2"]["kernel"])
    b2 = np.asarray(params["image"]["dense2"]["bias"])
    tl1 = torch.nn.Linear(128, 256)
    tl2 = torch.nn.Linear(256, 128)
    with torch.no_grad():
        tl1.weight.copy_(torch.tensor(w1.T))
        tl1.bias.copy_(torch.tensor(b1))
        tl2.weight.copy_(torch.tensor(w2.T))
        tl2.bias.copy_(torch.tensor(b2))
    expected = tl2(torch.relu(tl1(torch.tensor(x)))).detach().numpy()
    got = np.asarray(pair.apply_image(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_shared_adapter_single_param_tree():
    pair = AdapterPair(AdapterKind.MLP, shared=True, use_image=True, use_text=True)
    params = pair.init(jax.random.PRNGKey(2))
    assert set(params) == {"shared"}
    x = jnp.ones((3, 128))
    np.testing.assert_allclose(
        np.asarray(pair.apply_image(params, x)), np.asarray(pair.apply_text(params, x))
    )
