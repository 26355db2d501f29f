"""Downstream classification heads.

Parity with the vendored ``MLP`` (non-conv variant) and ``MultiTaskModel``
(``health_multimodal/image/model/modules.py:12-88``): per-task MLP heads
over pooled trunk features, returning (batch, num_classes, num_tasks)
logits.  Unused on the reference's main path but part of its model surface.

TPU-first difference: the per-task heads are stacked into one batched
einsum over a task axis instead of a Python loop of separate modules.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

_HIGHEST = jax.lax.Precision.HIGHEST


def init_multitask_head(
    key: jax.Array,
    input_dim: int,
    num_classes: int,
    num_tasks: int,
    hidden_dim: Optional[int] = None,
) -> Params:
    """Stacked heads: kernels carry a leading task axis."""
    import numpy as np

    k1, k2 = jax.random.split(key)

    def u(k, shape, fan_in):
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(k, shape, jnp.float32, -bound, bound)

    if hidden_dim is None:
        return {
            "w": u(k1, (num_tasks, input_dim, num_classes), input_dim),
            "b": u(k2, (num_tasks, num_classes), input_dim),
        }
    k3, k4 = jax.random.split(k2)
    return {
        "w1": u(k1, (num_tasks, input_dim, hidden_dim), input_dim),
        # first projection is bias-free in the vendored MLP (modules.py:30)
        "bn_scale": jnp.ones((num_tasks, hidden_dim), jnp.float32),
        "bn_bias": jnp.zeros((num_tasks, hidden_dim), jnp.float32),
        "bn_mean": jnp.zeros((num_tasks, hidden_dim), jnp.float32),
        "bn_var": jnp.ones((num_tasks, hidden_dim), jnp.float32),
        "w2": u(k3, (num_tasks, hidden_dim, num_classes), hidden_dim),
        "b2": u(k4, (num_tasks, num_classes), hidden_dim),
    }


def multitask_head_forward(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """(B, D) pooled features -> (B, num_classes, num_tasks) logits
    (the vendored output layout, ``modules.py:80-88``)."""
    if "w" in params:
        logits = jnp.einsum("bd,tdc->btc", x, params["w"], precision=_HIGHEST)
        logits = logits + params["b"][None]
    else:
        h = jnp.einsum("bd,tdh->bth", x, params["w1"], precision=_HIGHEST)
        h = (h - params["bn_mean"][None]) / jnp.sqrt(params["bn_var"][None] + 1e-5)
        h = h * params["bn_scale"][None] + params["bn_bias"][None]
        h = jax.nn.relu(h)
        logits = jnp.einsum("bth,thc->btc", h, params["w2"], precision=_HIGHEST)
        logits = logits + params["b2"][None]
    return logits.transpose(0, 2, 1)  # (B, C, T)
