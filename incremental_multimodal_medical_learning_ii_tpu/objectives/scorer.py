"""The prompt-cosine classifier.

This is the mathematical core of the framework: image embeddings are scored
against per-class positive/negative prompt-embedding banks by cosine
similarity, reproducing the reference's classifier exactly
(``Trainer.py:557-577`` train logits, ``:824-837`` eval scores/predictions,
``bert_forward_mean`` ``:1657-1680``, ``myCosineSimilarity`` ``:1682-1704``):

* the (trainable) text adapter is applied to each *raw* prompt embedding;
* MEAN/SINGLE modes average prompt embeddings per polarity *after* the
  adapter, then take the cosine of each image against the mean vector;
* MAX mode takes the cosine against every prompt and reduces with max over
  prompts (logging the max-mean gap, reference ``Trainer.py:1693-1703``);
* train logit = pos - neg (TRAIN_LOGIT_DIFF) or pos;
* eval score  = (pos+1)/2 (default) or (pos-neg+2)/4 (PRED_LOGIT_DIFF);
* prediction  = 1 iff pos > neg (the reference's argmax over [neg, pos]
  resolves ties to the first/negative entry, ``Trainer.py:836-837``).

TPU-first difference from the reference: prompt embeddings live in a padded
``PromptBank`` cached in HBM, so one jitted step scores all classes with a
single einsum instead of 10 CXR-BERT forwards per batch.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from incremental_multimodal_medical_learning_ii_tpu.ops.cosine import (
    cosine_to_banks,
    masked_mean,
    pairwise_cosine,
)
from incremental_multimodal_medical_learning_ii_tpu.utils.config import PromptMode


class PromptBank(NamedTuple):
    """Padded per-class prompt embeddings (raw, pre-text-adapter).

    pos / neg : (C, P_max, D) float, zero-padded on the prompt axis
    pos_count / neg_count : (C,) int32 valid-prompt counts

    When the model trains on positive logits only (TRAIN_LOGIT_DIFF=False)
    the builder mirrors ``pos`` into ``neg``, matching the reference's
    "trick per non riscrivere il codice" (Trainer.py:563-564).
    """

    pos: jnp.ndarray
    neg: jnp.ndarray
    pos_count: jnp.ndarray
    neg_count: jnp.ndarray

    @property
    def num_classes(self) -> int:
        return self.pos.shape[0]


class ScorerOutput(NamedTuple):
    logits: jnp.ndarray  # (B, C) train logits
    scores: jnp.ndarray  # (B, C) AUROC scores in [0, 1]
    preds: jnp.ndarray  # (B, C) {0., 1.} predictions
    pos_sim: jnp.ndarray  # (B, C) reduced positive similarity
    neg_sim: jnp.ndarray  # (B, C) reduced negative similarity
    max_mean_gap: Optional[jnp.ndarray]  # (2, C) [pos;neg] batch-mean max-mean gap (MAX mode)


def apply_text_adapter_to_bank(adapter_fn, params, bank: PromptBank) -> PromptBank:
    """Apply the text adapter to every (valid) prompt embedding.

    Padding rows are re-zeroed afterwards (the adapter has biases, so the
    image of a zero row is not zero) to keep masked means exact.
    """
    if adapter_fn is None:
        return bank
    c, p, d = bank.pos.shape

    def _apply(emb, count):
        out = adapter_fn(params, emb.reshape(c * p, d)).reshape(c, p, -1)
        mask = (jnp.arange(p)[None, :] < count[:, None]).astype(out.dtype)[..., None]
        return out * mask

    return PromptBank(
        pos=_apply(bank.pos, bank.pos_count),
        neg=_apply(bank.neg, bank.neg_count),
        pos_count=bank.pos_count,
        neg_count=bank.neg_count,
    )


def _pairwise(x: jnp.ndarray, t: jnp.ndarray, use_pallas: bool) -> jnp.ndarray:
    """(B, D) x (T, D) -> (B, T); Pallas fused kernel on TPU (no-grad paths
    only — the kernel has no VJP), jnp reference otherwise."""
    if use_pallas:
        import jax

        from incremental_multimodal_medical_learning_ii_tpu.ops.pallas_cosine import (
            pallas_pairwise_cosine,
        )

        # interpret off-TPU so the flag is testable (and safe) on CPU
        interpret = jax.default_backend() not in ("tpu", "axon")
        return pallas_pairwise_cosine(x, t, interpret=interpret)
    return pairwise_cosine(x, t)


def _reduced_similarities(
    image_embs: jnp.ndarray,
    bank: PromptBank,
    prompt_mode: PromptMode,
    use_pallas: bool = False,
):
    """Return ((B,C) pos, (B,C) neg, optional max-mean gaps)."""
    if prompt_mode == PromptMode.MAX:
        c, p, d = bank.pos.shape

        def _max_and_mean(emb, count):
            valid = jnp.arange(p)[None, :] < count[:, None]  # (C, P)
            # Zero padding rows have zero norm; normalising them is fine
            # forward (eps guard) but d||x||/dx at x=0 is NaN and the
            # where-masked cotangent still propagates it (NaN * 0 = NaN).
            # Substitute a constant unit vector on padding rows — their
            # similarities are masked out of both reductions below.
            unit = jnp.zeros((d,), emb.dtype).at[0].set(1.0)
            emb = jnp.where(valid[..., None], emb, unit)
            if use_pallas:
                sims = _pairwise(image_embs, emb.reshape(c * p, d), True).reshape(
                    image_embs.shape[0], c, p
                )
            else:
                sims = cosine_to_banks(image_embs, emb)  # (B, C, P)
            neg_inf = jnp.finfo(sims.dtype).min
            sim_max = jnp.max(jnp.where(valid[None], sims, neg_inf), axis=-1)
            sim_mean = jnp.sum(jnp.where(valid[None], sims, 0.0), axis=-1) / jnp.maximum(
                count, 1
            ).astype(sims.dtype)[None, :]
            return sim_max, sim_mean

        pos_max, pos_mean = _max_and_mean(bank.pos, bank.pos_count)
        neg_max, neg_mean = _max_and_mean(bank.neg, bank.neg_count)
        # Reference logs mean(max - mean) per class per call
        # (Trainer.py:1698-1703) over the REAL batch rows; return PER-ROW
        # gaps (2, B, C) so the engine can exclude zero-padded rows (its
        # elem_mask) before averaging — an unmasked batch mean here would
        # let padding rows contaminate the monitor.
        gaps = jnp.stack([pos_max - pos_mean, neg_max - neg_mean])
        return pos_max, neg_max, gaps

    # SINGLE / MEAN: mean over prompts after the adapter, then cosine of the
    # mean vector (normalising the mean, not the per-prompt embeddings).
    pos_mean = masked_mean(bank.pos, bank.pos_count)  # (C, D)
    neg_mean = masked_mean(bank.neg, bank.neg_count)
    if use_pallas:
        c = pos_mean.shape[0]
        both = _pairwise(image_embs, jnp.concatenate([pos_mean, neg_mean]), True)
        return both[:, :c], both[:, c:], None
    pos_sim = pairwise_cosine(image_embs, pos_mean)
    neg_sim = pairwise_cosine(image_embs, neg_mean)
    return pos_sim, neg_sim, None


def score_embeddings(
    image_embs: jnp.ndarray,
    bank: PromptBank,
    prompt_mode: PromptMode,
    train_logit_diff: bool,
    pred_logit_diff: bool,
    use_pallas: bool = False,
) -> ScorerOutput:
    """Full scorer: train logits, eval scores, predictions for all classes.

    ``use_pallas`` routes the cosine contraction through the fused TPU
    kernel (ops/pallas_cosine.py); only valid on no-grad paths.
    """
    pos_sim, neg_sim, gaps = _reduced_similarities(
        image_embs, bank, prompt_mode, use_pallas=use_pallas
    )
    logits = pos_sim - neg_sim if train_logit_diff else pos_sim
    scores = (pos_sim - neg_sim + 2.0) / 4.0 if pred_logit_diff else (pos_sim + 1.0) / 2.0
    preds = (pos_sim > neg_sim).astype(jnp.float32)
    return ScorerOutput(
        logits=logits,
        scores=scores,
        preds=preds,
        pos_sim=pos_sim,
        neg_sim=neg_sim,
        max_mean_gap=gaps,
    )
