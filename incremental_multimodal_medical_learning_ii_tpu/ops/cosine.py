"""Cosine-similarity primitives for the prompt scorer.

Semantics follow ``torchmetrics.functional.pairwise_cosine_similarity`` as
used by the reference (``Trainer.py:1682-1704``): rows of both operands are
L2-normalised, then multiplied on the MXU.  Everything here is shape-static
and jit/pjit-friendly; the batched variants keep the contraction large so
XLA tiles it onto the systolic array in one pass instead of the reference's
per-class Python loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-8

# fp32 MXU passes: the scorer contractions are tiny (D=128, C*P<=64) so full
# precision costs nothing, and the default TPU bf16 matmul would break the
# reference-parity tolerances.
_HIGHEST = jax.lax.Precision.HIGHEST


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = EPS) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def pairwise_cosine(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """(N, D) x (M, D) -> (N, M) cosine similarities."""
    return jnp.matmul(l2_normalize(x), l2_normalize(y).T, precision=_HIGHEST)


def cosine_to_banks(x: jnp.ndarray, banks: jnp.ndarray) -> jnp.ndarray:
    """(B, D) images vs (C, P, D) per-class prompt embeddings -> (B, C, P).

    One einsum: the (C*P, D) operand is flattened so the whole prompt bank
    is scored in a single MXU contraction.
    """
    xn = l2_normalize(x)
    bn = l2_normalize(banks)
    return jnp.einsum(
        "bd,cpd->bcp", xn, bn, precision=_HIGHEST, preferred_element_type=jnp.float32
    )


def masked_mean(emb: jnp.ndarray, count: jnp.ndarray, p_axis: int = 1) -> jnp.ndarray:
    """Mean over the (zero-padded) prompt axis given true counts.

    ``emb``: (C, P, D) zero-padded; ``count``: (C,) number of valid prompts.
    Padding rows are zero so a plain sum / count reproduces the reference's
    ``.mean(dim=0)`` over the unpadded prompt list (Trainer.py:1666).
    """
    total = jnp.sum(emb, axis=p_axis)
    return total / jnp.maximum(count, 1).astype(emb.dtype)[:, None]
