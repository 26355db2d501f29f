"""Losses and label transforms.

``bce_with_logits`` matches ``torch.nn.BCEWithLogitsLoss`` (mean reduction)
via the numerically-stable log-sum-exp form; an element mask supports padded
final batches (the reference uses drop_last=False, ``Trainer.py:238-246``)
and the growing class set of MORE_LABELS mode (``Trainer.py:701-709``)
without dynamic shapes.

``change_labels`` reproduces ``change_values`` (``Trainer.py:1707-1728``):
1 -> +1, 0 -> -1.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def bce_with_logits(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mean binary cross-entropy with logits over (masked) elements.

    max(x,0) - x*y + log(1+exp(-|x|)), the same stable form torch uses.
    """
    x, y = logits, labels
    per_elem = jnp.maximum(x, 0.0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
    if mask is None:
        return jnp.mean(per_elem)
    mask = mask.astype(per_elem.dtype)
    return jnp.sum(per_elem * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def change_labels(labels: jnp.ndarray) -> jnp.ndarray:
    """{0,1} -> {-1,+1} float labels (reference ``change_values``)."""
    return jnp.where(labels == 1, 1.0, -1.0).astype(jnp.float32)
