"""Vmapped hyperparameter-sweep execution.

K sweep configurations that differ only in learning rate share one XLA
executable (lr is a dynamic optax hyperparameter, engine/steps.py::
make_optimizer); stacking their TrainStates and ``jax.vmap``-ing the whole
train-then-score program (engine/steps.py::build_vmapped_sweep) trains all
K concurrently in ONE dispatch+readback — K x E dispatches otherwise.  The
adapters are 128-d (a few hundred KB of state), so even large K costs
nothing in HBM, and the batched matmuls feed the MXU far better than one
config's.  Nothing in the reference constrains this: its drivers hard-code
one configuration per process (``ZERO_JOINT_BOUNDS.py:16-31``).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from incremental_multimodal_medical_learning_ii_tpu.data.store import (
    EmbeddingDataset,
    num_batches,
)
from incremental_multimodal_medical_learning_ii_tpu.engine.steps import (
    build_vmapped_sweep,
    epoch_permutation,
    init_train_state,
)
from incremental_multimodal_medical_learning_ii_tpu.models.adapters import AdapterPair
from incremental_multimodal_medical_learning_ii_tpu.objectives.scorer import PromptBank
from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
    ExperimentConfig,
)


def _pad_whole_batches(ds: EmbeddingDataset, bs: int):
    """Zero-pad to whole batches with a validity mask — the same layout
    Trainer._device_data uploads (engine/trainer.py)."""
    n = len(ds)
    n_pad = num_batches(n, bs) * bs
    embs = np.zeros((n_pad, ds.embeddings.shape[1]), np.float32)
    labels = np.zeros((n_pad, ds.labels.shape[1]), np.float32)
    valid = np.zeros(n_pad, np.float32)
    embs[:n] = ds.embeddings
    labels[:n] = ds.labels
    valid[:n] = 1.0
    return jnp.asarray(embs), jnp.asarray(labels), jnp.asarray(valid)


def run_vmapped_sweep(
    cfgs: Sequence[ExperimentConfig],
    train: EmbeddingDataset,
    val: EmbeddingDataset,
    bank: PromptBank,
) -> np.ndarray:
    """Train every config in ``cfgs`` (identical programs, different lr)
    for ``cfg.epochs`` fused epochs and return the (K, C) per-class val
    AUROCs — one dispatch for the whole group.

    Exactly the sequential path's math: the per-epoch permutations are the
    same ``fold_in(PRNGKey(seed+1), epoch)`` stream a fresh Trainer
    consumes (engine/trainer.py::_epoch_perm), the train scan is the same
    ``_epoch_scan`` body, and scoring is the same fused eval pass +
    ``auroc_device`` that ``Trainer.quick_auroc`` runs — pinned equal by
    tests/test_sweep_vmap.py (within fp reassociation of the batched dots:
    <=1e-6 at test scale, <=2e-4 measured at CLI scale; batching changes
    summation order, nothing else).  Measured CLI A/B (CPU, 16 points,
    8192 rows x 3 epochs): sequential 24.9 s vs --vmap 4.7 s = 5.3x; on
    the real tunneled TPU an 8-point group (4 lrs x 2 seeds, 3 epochs)
    measured 50.2-51.8 s sequential vs 18.5-29.5 s vmapped, identical
    AUROCs to 4 decimals (2026-08-19, slow-sync link phase); on a
    tunneled TPU the win is the dispatch count (K x E + K -> 1 per group).
    Raises ValueError for point sets a single program cannot serve
    (callers fall back to the sequential loop, loudly).
    """
    cfg0 = cfgs[0]
    for c in cfgs[1:]:
        if dataclasses.replace(c, lr=cfg0.lr, seed=cfg0.seed) != cfg0:
            raise ValueError(
                "vmapped sweep points must differ only in lr/seed (adapter/"
                "optim/prompt knobs change the compiled program — group them)"
            )
    if cfg0.lr_schedule is not None:
        raise ValueError(
            "vmapped sweep needs a constant lr (the dynamic optax "
            "hyperparam); an lr schedule bakes the rate into the program"
        )
    pair = AdapterPair(
        kind=cfg0.adapter, shared=cfg0.shared,
        use_image=cfg0.image_adapter, use_text=cfg0.text_adapter,
    )
    if not cfg0.trains_anything:
        raise ValueError("nothing to sweep: the config trains no adapter")
    states, tx = [], None
    for c in cfgs:
        params = pair.init(jax.random.PRNGKey(c.seed))
        st, tx = init_train_state(pair, params, c)  # lr lands in opt_state
        states.append(st)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)

    t_embs, t_labels, t_valid = _pad_whole_batches(train, cfg0.batch_size)
    v_embs, v_labels, v_valid = _pad_whole_batches(val, cfg0.eval_batch_size)
    if cfg0.shuffle_train:
        # per-config epoch orders: the same fold_in(PRNGKey(seed+1), epoch)
        # stream a fresh Trainer at that seed would draw (K, E, n_pad)
        perms = jnp.stack([
            jnp.stack([
                epoch_permutation(
                    jax.random.fold_in(jax.random.PRNGKey(c.seed + 1), e),
                    len(train), int(t_embs.shape[0]),
                )
                for e in range(1, cfg0.epochs + 1)
            ])
            for c in cfgs
        ])
    else:
        perms = jnp.zeros((len(cfgs), cfg0.epochs, 0), jnp.int32)

    sweep = build_vmapped_sweep(pair, tx, cfg0)
    _, aurocs = sweep(
        stacked, t_embs, t_labels, t_valid, bank, perms,
        v_embs, v_labels, v_valid,
    )
    return np.asarray(jax.device_get(aurocs))
