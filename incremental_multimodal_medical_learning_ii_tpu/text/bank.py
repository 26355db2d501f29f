"""Build the on-device :class:`PromptBank` from a prompt dictionary.

The reference re-encodes every prompt list through full CXR-BERT for every
class, every batch, every epoch (``Trainer.py:566`` -> ``:1657-1680``), even
though BERT runs under ``@torch.no_grad`` and its output never changes.
Here every prompt is encoded exactly once (one batched BERT forward over
the flattened bank) and cached in HBM, padded to a static
``(C, P_max, 128)`` layout; the trainable text adapter is applied to the
cached raw embeddings inside the jitted step.

When ``train_logit_diff`` is False, the negative side mirrors the positive
prompts — the reference's "trick per non riscrivere il codice"
(``Trainer.py:563-564``) — so pos-neg differences vanish identically.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax.numpy as jnp
import numpy as np

from incremental_multimodal_medical_learning_ii_tpu.objectives.scorer import PromptBank
from incremental_multimodal_medical_learning_ii_tpu.text.prompts import Prompts

EncodeFn = Callable[[List[str]], np.ndarray]  # texts -> (len(texts), D) raw embeddings


def build_prompt_bank(
    encode_fn: EncodeFn,
    prompts: Prompts,
    class_names: Sequence[str],
    train_logit_diff: bool = True,
    emb_dim: int = 128,
) -> PromptBank:
    pos_lists: List[List[str]] = []
    neg_lists: List[List[str]] = []
    for c in class_names:
        pos_lists.append(list(prompts[c]["positive"]))
        if train_logit_diff:
            if "negative" not in prompts[c]:
                raise ValueError(
                    f"prompt bank for {c!r} has no negatives but "
                    "train_logit_diff=True needs them — build the prompts "
                    "with include_negatives=True (create_prompts wires this "
                    "from the same flag)"
                )
            neg_lists.append(list(prompts[c]["negative"]))
        else:
            neg_lists.append(list(prompts[c]["positive"]))

    # One batched encoder call over the UNIQUE prompts ("every prompt is
    # encoded exactly once" — with train_logit_diff=False the negative side
    # mirrors the positives, and through a real CXR-BERT the duplicate
    # forward is the single most expensive part of the bank build).
    # Bit-identical to encoding the full list: padded positions never
    # affect a prompt's [CLS] embedding, so batch composition is free.
    flat: List[str] = [t for lst in pos_lists + neg_lists for t in lst]
    uniq: List[str] = list(dict.fromkeys(flat))
    uniq_embs = np.asarray(encode_fn(uniq), dtype=np.float32)
    if uniq_embs.shape != (len(uniq), emb_dim):
        raise ValueError(
            f"encode_fn returned {uniq_embs.shape}, expected {(len(uniq), emb_dim)}"
        )
    index = {t: i for i, t in enumerate(uniq)}
    embs = uniq_embs[[index[t] for t in flat]]

    c = len(class_names)
    p_max = max(len(lst) for lst in pos_lists + neg_lists)
    pos = np.zeros((c, p_max, emb_dim), np.float32)
    neg = np.zeros((c, p_max, emb_dim), np.float32)
    pos_count = np.zeros(c, np.int32)
    neg_count = np.zeros(c, np.int32)

    offset = 0
    for i, lst in enumerate(pos_lists):
        pos[i, : len(lst)] = embs[offset : offset + len(lst)]
        pos_count[i] = len(lst)
        offset += len(lst)
    for i, lst in enumerate(neg_lists):
        neg[i, : len(lst)] = embs[offset : offset + len(lst)]
        neg_count[i] = len(lst)
        offset += len(lst)

    return PromptBank(
        pos=jnp.asarray(pos),
        neg=jnp.asarray(neg),
        pos_count=jnp.asarray(pos_count),
        neg_count=jnp.asarray(neg_count),
    )


def save_prompt_bank(path, bank: PromptBank) -> None:
    """Persist a bank (~64 KB) — deployment ships this instead of the
    CXR-BERT weights; the text adapter still applies on device."""
    np.savez(
        path,
        pos=np.asarray(bank.pos),
        neg=np.asarray(bank.neg),
        pos_count=np.asarray(bank.pos_count),
        neg_count=np.asarray(bank.neg_count),
    )


def load_prompt_bank(path) -> PromptBank:
    with np.load(path) as z:
        return PromptBank(
            pos=jnp.asarray(z["pos"]),
            neg=jnp.asarray(z["neg"]),
            pos_count=jnp.asarray(z["pos_count"]),
            neg_count=jnp.asarray(z["neg_count"]),
        )


def synthetic_encode_fn(seed: int = 0, emb_dim: int = 128) -> EncodeFn:
    """Deterministic text-hash encoder for tests/CI (no BERT weights needed):
    each distinct prompt string maps to a fixed pseudo-random embedding."""

    def encode(texts: List[str]) -> np.ndarray:
        import hashlib

        out = np.empty((len(texts), emb_dim), np.float32)
        for i, t in enumerate(texts):
            # hashlib, NOT hash(): Python string hashing is salted per
            # process, so hash() would give a trained adapter one bank and
            # a later serving process another
            digest = hashlib.sha256(f"{seed}|{t}".encode()).digest()
            h = int.from_bytes(digest[:8], "little") % (2**32)
            out[i] = np.random.default_rng(h).normal(size=emb_dim)
        return out

    return encode
