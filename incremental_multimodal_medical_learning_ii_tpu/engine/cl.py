"""Continual-learning weight reset ("myCL" / "profCL").

Reference semantics (``Trainer.py:1556-1632``): for each parameter tensor,
compute the elementwise |delta| from a snapshot, derive a per-tensor reset
cutoff ``min + threshold * (max - min)``, and reset every weight whose delta
is below the cutoff back to the snapshot value, counting resets/updates.

The reference walks ``named_parameters()`` in a Python loop per tensor; here
the whole thing is one pure function over the params pytree, jittable inside
the train step (per-step for myCL, ``Trainer.py:592-594``) or applied
per-epoch on device (profCL).  In SHARED-adapter mode the reference applies
the reset twice to the same module (its image/text adapters alias one
object, ``Trainer.py:1558-1587``); callers reproduce that by passing
``applications=2``.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

Params = Any


def _reset_leaf(p: jnp.ndarray, s: jnp.ndarray, threshold) -> Tuple[jnp.ndarray, jnp.ndarray]:
    diff = jnp.abs(p - s)
    lo, hi = jnp.min(diff), jnp.max(diff)
    cutoff = lo + threshold * (hi - lo)
    mask = diff < cutoff
    return jnp.where(mask, s, p), jnp.sum(mask)


def weight_reset(
    params: Params,
    snapshot: Params,
    threshold,
    applications: int = 1,
) -> Tuple[Params, jnp.ndarray, jnp.ndarray]:
    """Reset low-|delta| weights to the snapshot; return (params, n_reset, n_updated).

    Counts sum over all parameter tensors and over ``applications`` passes
    (the reference re-counts per pass).
    """
    n_reset = jnp.zeros((), jnp.int32)
    n_total = jnp.zeros((), jnp.int32)
    for _ in range(applications):
        leaves, treedef = jax.tree_util.tree_flatten(params)
        s_leaves = treedef.flatten_up_to(snapshot)
        new_leaves = []
        for p, s in zip(leaves, s_leaves):
            new_p, k = _reset_leaf(p, s, threshold)
            new_leaves.append(new_p)
            n_reset = n_reset + k.astype(jnp.int32)
            n_total = n_total + jnp.asarray(p.size, jnp.int32)
        params = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return params, n_reset, n_total - n_reset
