"""Jit-compiled train / eval steps.

One fused step replaces the reference's per-batch Python work
(``Trainer.py:537-601``): image-adapter forward, text-adapter applied to the
HBM-cached prompt bank, cosine scoring of all classes in one einsum, masked
BCE, backward, optimizer update, and (optionally) the myCL weight reset —
all inside a single XLA computation.  Class subsets (class-incremental /
MORE_LABELS) and ragged final batches are handled with dynamic *masks* over
static shapes, so each regime compiles exactly once.

Steps are built per static configuration and jitted with donated state; they
run unchanged under ``pjit`` when inputs carry a batch sharding (parameters
and the bank are replicated, XLA inserts the gradient all-reduce over ICI).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from incremental_multimodal_medical_learning_ii_tpu.engine.cl import weight_reset
from incremental_multimodal_medical_learning_ii_tpu.models.adapters import AdapterPair
from incremental_multimodal_medical_learning_ii_tpu.objectives.losses import (
    bce_with_logits,
    change_labels,
)
from incremental_multimodal_medical_learning_ii_tpu.objectives.scorer import (
    PromptBank,
    apply_text_adapter_to_bank,
    score_embeddings,
)
from incremental_multimodal_medical_learning_ii_tpu.utils.config import ExperimentConfig

Params = Any


class TrainState(NamedTuple):
    params: Params
    opt_state: optax.OptState
    step: jnp.ndarray


def lr_schedule_fn(cfg: ExperimentConfig):
    """Per-step learning rate (the reference's optional per-batch
    ``scheduler.step()``, Trainer.py:598-601)."""
    if cfg.lr_schedule is None:
        return lambda step: cfg.lr
    if cfg.lr_schedule == "exponential":
        return optax.exponential_decay(cfg.lr, transition_steps=1, decay_rate=cfg.lr_gamma)
    raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")


def make_optimizer(cfg: ExperimentConfig) -> optax.GradientTransformation:
    """Adam / SGD with torch-default hyperparameters (Trainer.py:172-186).

    With a constant LR the rate is injected as a *dynamic* hyperparameter
    (it lives in the opt state, not the compiled program), so sweeps over
    learning rates reuse one XLA executable — compiles are minutes on
    remote-compile terminals.
    """
    if cfg.lr_schedule is None:
        if cfg.optim.value == "adam":
            return optax.inject_hyperparams(optax.adam)(
                learning_rate=cfg.lr, b1=0.9, b2=0.999, eps=1e-8
            )
        return optax.inject_hyperparams(optax.sgd)(learning_rate=cfg.lr)
    lr = lr_schedule_fn(cfg)
    if cfg.optim.value == "adam":
        return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    return optax.sgd(lr)


def init_train_state(pair: AdapterPair, params: Params, cfg: ExperimentConfig) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = make_optimizer(cfg)
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)), tx


def _forward(
    pair: AdapterPair,
    params: Params,
    embs: jnp.ndarray,
    bank: PromptBank,
    cfg: ExperimentConfig,
    use_pallas: bool = False,
):
    image_embs = pair.apply_image(params, embs)
    adapted_bank = (
        apply_text_adapter_to_bank(pair.apply_text, params, bank) if pair.use_text else bank
    )
    return score_embeddings(
        image_embs,
        adapted_bank,
        cfg.prompt_mode,
        cfg.train_logit_diff,
        cfg.pred_logit_diff,
        use_pallas=use_pallas,
    )


def _eval_uses_pallas() -> bool:
    """Fused Pallas cosine on the (no-grad) eval path when running on a real
    TPU backend; the jnp reference everywhere else (CPU tests, autodiff,
    GPU — where the scorer would otherwise fall into the pallas INTERPRETER,
    orders of magnitude slower than the einsum)."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _train_core(
    pair: AdapterPair,
    tx: optax.GradientTransformation,
    cfg: ExperimentConfig,
    guard_empty: bool = False,
) -> Callable:
    """The one training-step body shared by the per-batch jitted step and
    the fused-epoch scan: forward, masked BCE, backward, optax update,
    optional myCL reset, monitor metrics.  ``core(state, embs, labels,
    elem_mask, class_mask, bank, threshold) -> (state, metrics)``.

    ``guard_empty`` makes a FULLY-masked batch (``sum(elem_mask) == 0``) a
    true no-op on the carried state: params, optimizer state (Adam
    moments / step count), and the step counter keep their previous values
    bitwise.  A zero-grad step is NOT a no-op by itself — Adam still
    decays its moments and emits a nonzero update from stale momentum —
    so the whole-run fold uses this to pad UNEVEN units (the by-label
    class-pos splits, reference Trainer.py:1187-1212) to a uniform batch
    count with fully-masked batches.  For a real batch the select is the
    identity, so guarded and unguarded programs emit bitwise-identical
    streams (tests/test_fused_run.py pins this)."""
    use_cl = cfg.continual_learning is not None and cfg.continual_learning.value == "myCL"
    # SHARED mode: the reference resets the aliased module twice
    # (Trainer.py:1558-1587); reproduce the double application.
    applications = 2 if cfg.shared else 1

    def core(state: TrainState, embs, labels, elem_mask, class_mask, bank, threshold):
        snapshot = state.params

        def loss_fn(params):
            out = _forward(pair, params, embs, bank, cfg)
            lbl = change_labels(labels) if cfg.change_labels else labels
            mask = elem_mask[:, None] * class_mask[None, :]
            loss = bce_with_logits(out.logits, lbl, mask)
            return loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        metrics: Dict[str, jnp.ndarray] = {"loss": loss}
        if use_cl:
            params, n_reset, n_updated = weight_reset(
                params, snapshot, threshold, applications=applications
            )
            metrics["n_reset"] = n_reset
            metrics["n_updated"] = n_updated
        if out.max_mean_gap is not None:
            # the reference averages over REAL rows (Trainer.py:1698-1703);
            # zero-padded rows (elem_mask == 0) are excluded from the gap
            # monitor, then either the (C,) per-class gaps are logged raw
            # (max_gap_per_class — the reference's exact stream shape) or
            # reduced to one mean over the trained classes
            denom_c = jnp.maximum(jnp.sum(class_mask), 1.0)
            denom_r = jnp.maximum(jnp.sum(elem_mask), 1.0)
            row_w = elem_mask[:, None]
            gap_pos = jnp.sum(out.max_mean_gap[0] * row_w, axis=0) / denom_r
            gap_neg = jnp.sum(out.max_mean_gap[1] * row_w, axis=0) / denom_r
            if cfg.max_gap_per_class:
                metrics["max_mean_gap_pos_vec"] = gap_pos
                metrics["max_mean_gap_neg_vec"] = gap_neg
            else:
                metrics["max_mean_gap_pos"] = jnp.sum(gap_pos * class_mask) / denom_c
                metrics["max_mean_gap_neg"] = jnp.sum(gap_neg * class_mask) / denom_c
        out_state = TrainState(params, opt_state, state.step + 1)
        if guard_empty:
            # padded-batch step guard: keep the ENTIRE previous state when
            # the batch had no real rows (metrics of such a batch are
            # trimmed host-side before logging)
            keep = jnp.sum(elem_mask) > 0
            out_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(keep, new, old), out_state, state
            )
        return out_state, metrics

    return core


def build_train_step(
    pair: AdapterPair,
    tx: optax.GradientTransformation,
    cfg: ExperimentConfig,
) -> Callable:
    """Returns step(state, embs, labels, elem_mask, class_mask, bank, threshold)
    -> (state, metrics dict)."""
    return jax.jit(_train_core(pair, tx, cfg), donate_argnums=(0,))


def build_fused_epoch(
    pair: AdapterPair,
    tx: optax.GradientTransformation,
    cfg: ExperimentConfig,
) -> Callable:
    """A WHOLE training epoch as one jitted ``lax.scan``.

    The cached-embedding dataset is tiny by TPU standards (191k x 128 fp32 =
    98 MB), so it lives in HBM for the whole run; the epoch shuffles on
    device (``jax.random.permutation``), gathers each batch from HBM, and
    scans the train step across all batches in a single XLA program — no
    per-step host dispatch, no host->device batch transfers, no readbacks
    until the stacked metrics are fetched once at the end.  This is the
    structural opposite of the reference's per-batch Python loop with
    ``.to(device)`` copies (``Trainer.py:537-601``).

    Returns ``epoch(state, embs, labels, valid, bank, class_mask, threshold,
    perm) -> (state, stacked metrics)`` where embs/labels/valid are padded to
    ``n_batches * batch_size`` rows and ``perm`` is the (N_pad,) int32 row
    order for this epoch (real rows permuted, padding indices at the tail —
    the Trainer builds it via :func:`epoch_permutation` or an injected
    source).  With ``shuffle_train=False`` perm is ignored (pass a 0-size
    array) and the gather is skipped entirely (compile-time branch).
    """
    core = _train_core(pair, tx, cfg)

    def epoch(state: TrainState, embs, labels, valid, bank, class_mask, threshold, perm):
        return _epoch_scan(core, cfg, state, embs, labels, valid, bank, class_mask, threshold, perm)

    return jax.jit(epoch, donate_argnums=(0,))


def _epoch_scan(core, cfg, state, embs, labels, valid, bank, class_mask, threshold, perm):
    """One epoch as a lax.scan over batch slabs (shared by the fused epoch
    and the fused unit).  One epoch-level permutation gather OUTSIDE the
    scan; the scan then streams contiguous (B, D) slabs (cheap to compile
    and to run — per-batch gathers inside the scan body compile far
    slower)."""
    b = cfg.batch_size
    if cfg.shuffle_train:
        embs_s = jnp.take(embs, perm, axis=0).reshape(-1, b, embs.shape[1])
        labels_s = jnp.take(labels, perm, axis=0).reshape(-1, b, labels.shape[1])
        valid_s = jnp.take(valid, perm, axis=0).reshape(-1, b)
    else:
        embs_s = embs.reshape(-1, b, embs.shape[1])
        labels_s = labels.reshape(-1, b, labels.shape[1])
        valid_s = valid.reshape(-1, b)

    def body(st, batch):
        b_embs, b_labels, b_mask = batch
        return core(st, b_embs, b_labels, b_mask, class_mask, bank, threshold)

    return jax.lax.scan(body, state, (embs_s, labels_s, valid_s))


def build_fused_unit(
    pair: AdapterPair,
    tx: optax.GradientTransformation,
    cfg: ExperimentConfig,
    use_prof: bool = False,
    eval_mode: Optional[str] = None,
    on_mesh: bool = False,
) -> Callable:
    """A WHOLE incremental unit — all E epochs of one data-inc part or one
    class-inc task — as ONE jitted program: ``lax.scan`` over epochs around
    the fused-epoch scan over batches.

    The reference (and this trainer's per-epoch fused path) dispatches once
    per epoch; through a tunneled device link each dispatch's readback costs
    a full round-trip (~30-750 ms measured here), so a 10-epoch unit pays
    10 RTTs for ~76 ms of device work.  The unit program pays ONE.  The
    per-epoch driver bookkeeping moves inside: the myCL threshold schedule
    becomes an (E,) operand (``DATA_INCREMENTAL.py:78`` advances threshold
    every epoch), the per-epoch shuffle orders an (E, n_pad) operand, and
    the profCL snapshot/reset pair (``model_copy`` + ``profIncremental``,
    CLASS_INCREMENTAL.py:73-88) runs between epoch scans on-device.

    ``eval_mode`` additionally folds the val/test eval passes (the same
    scan :func:`build_fused_eval` runs standalone) into the program, so the
    per-unit ``validate``/``test`` dispatches (protocols call both after
    every part/task, DATA_INCREMENTAL.py:80-86) ride the SAME dispatch and
    readback:

    * ``"final"``     — evaluate once, after the last epoch (how the
      incremental protocols interleave train and eval);
    * ``"per_epoch"`` — evaluate after EVERY epoch, outputs stacked with a
      leading (E,) axis (how the joint driver interleaves them,
      ZERO_JOINT_BOUNDS.py:33-45 — the whole joint run becomes one
      program), plus the post-epoch TrainStates stacked the same way (so
      the driver's live-params figures — text-embedding/t-SNE after every
      epoch, Trainer.py:1074-1554 — can draw from each epoch's own params
      under the fold).

    Returns ``unit(state, embs, labels, valid, bank, class_mask,
    thresholds (E,), perms (E, n_pad) or (E, 0)) -> (state, stacked)``
    where every metric in ``stacked`` has a leading (E, n_batches) shape;
    with ``use_prof`` the per-epoch reset counts are stacked under
    ``prof_n_reset`` / ``prof_n_updated`` (E,).  With ``eval_mode`` the
    signature gains ``(val_embs, val_labels, val_valid, test_embs,
    test_labels, test_valid)`` operands (padded to whole eval batches) and
    the return gains ``(val_out, test_out)`` where each is ``(losses,
    scores, preds)`` as :func:`build_fused_eval` returns them.
    """
    core = _train_core(pair, tx, cfg)
    applications = 2 if cfg.shared else 1
    if eval_mode not in (None, "final", "per_epoch"):
        raise ValueError(f"unknown eval_mode {eval_mode!r}")
    use_pallas = _eval_uses_pallas() and not on_mesh

    def _eval_both(params, bank, val_ops, test_ops):
        return (
            _fused_eval_pass(pair, cfg, use_pallas, params, *val_ops, bank),
            _fused_eval_pass(pair, cfg, use_pallas, params, *test_ops, bank),
        )

    def unit(state: TrainState, embs, labels, valid, bank, class_mask, thresholds, perms,
             *eval_ops):
        if len(eval_ops) != (6 if eval_mode else 0):
            raise TypeError(
                f"eval_mode={eval_mode!r} expects "
                f"{6 if eval_mode else 0} trailing eval operands "
                f"(val embs/labels/valid, test embs/labels/valid); got {len(eval_ops)}"
            )
        val_ops, test_ops = (eval_ops[:3], eval_ops[3:]) if eval_mode else (None, None)

        def epoch_body(st, per_epoch):
            threshold, perm = per_epoch
            snapshot = st.params if use_prof else None
            st, stacked = _epoch_scan(
                core, cfg, st, embs, labels, valid, bank, class_mask, threshold, perm
            )
            if use_prof:
                params, n_reset, n_updated = weight_reset(
                    st.params, snapshot, threshold, applications=applications
                )
                st = st._replace(params=params)
                stacked = dict(stacked, prof_n_reset=n_reset, prof_n_updated=n_updated)
            out = stacked
            if eval_mode == "per_epoch":
                out = (stacked, _eval_both(st.params, bank, val_ops, test_ops), st)
            return st, out

        state, out = jax.lax.scan(epoch_body, state, (thresholds, perms))
        if eval_mode is None:
            return state, out
        if eval_mode == "final":
            return state, out, _eval_both(state.params, bank, val_ops, test_ops)
        return state, out[0], out[1], out[2]

    return jax.jit(unit, donate_argnums=(0,))


def build_fused_run(
    pair: AdapterPair,
    tx: optax.GradientTransformation,
    cfg: ExperimentConfig,
    use_prof: bool = False,
    on_mesh: bool = False,
) -> Callable:
    """A WHOLE incremental run — every part of a data-incremental run
    (``DATA_INCREMENTAL.py:44-97``) or every task of a class-incremental one
    (``CLASS_INCREMENTAL.py:32-97``), each unit's epochs AND its post-unit
    val/test eval passes — as ONE jitted program: ``lax.scan`` over units
    around the fused-unit epoch scan.

    :func:`build_fused_unit` collapsed a unit to one dispatch; an
    incremental run still pays one dispatch+readback round-trip per unit
    (20 for the reference's data-incremental shape).  Here the per-unit
    slabs ride in stacked as ``(U, n_pad, D)`` operands — every unit padded
    to the LARGEST unit's batch count (contiguous splits are already
    uniform; by-label class-pos splits pad with fully-masked batches,
    which the ``guard_empty`` step guard makes exact state no-ops) — and
    the whole run costs ONE round-trip.  Per-unit driver
    state that the protocols need between units comes back as stacked scan
    outputs: the train metric streams ``(U, E, n_batches)``, the folded
    val/test eval results ``(U, ...)``, and the post-unit ``TrainState``
    (params, opt state, step) so unit-boundary checkpoints
    (engine/protocols.py::_save_unit) and live-params figures see each
    unit's own state, not the final one.

    Per-unit variation is data, not program: the class masks ``(U, C)``
    (class-incremental current-task / MORE_LABELS masks), the myCL/profCL
    threshold schedule ``(U, E)`` (zeros where a unit's reset is guarded
    off — an exact no-op, the same trick the unit fold uses for
    ``actual_task == 1``), and the per-epoch shuffle orders ``(U, E,
    n_pad)``.  ``use_prof`` compiles the profCL epoch reset in for every
    unit; a guarded unit (class-inc task 1, CLASS_INCREMENTAL.py:73-88)
    neutralises it with zero thresholds.

    Returns ``run(state, embs (U,n_pad,D), labels (U,n_pad,C), valid
    (U,n_pad), bank, class_masks (U,C), thresholds (U,E), perms (U,E,n_pad)
    or (U,E,0), val_embs, val_labels, val_valid, test_embs, test_labels,
    test_valid) -> (state, stacked, (val_out, test_out), unit_states)``
    where ``stacked`` metrics lead with (U, E, n_batches), each eval output
    leads with (U,), and ``unit_states`` is a TrainState of (U, ...)-stacked
    leaves.
    """
    core = _train_core(pair, tx, cfg, guard_empty=True)
    applications = 2 if cfg.shared else 1
    use_pallas = _eval_uses_pallas() and not on_mesh

    def run(state: TrainState, embs, labels, valid, bank, class_masks,
            thresholds, perms, val_embs, val_labels, val_valid,
            test_embs, test_labels, test_valid):
        def unit_body(st, per_unit):
            u_embs, u_labels, u_valid, u_cmask, u_thr, u_perms = per_unit

            def epoch_body(st2, per_epoch):
                threshold, perm = per_epoch
                snapshot = st2.params if use_prof else None
                st2, stacked = _epoch_scan(
                    core, cfg, st2, u_embs, u_labels, u_valid, bank, u_cmask,
                    threshold, perm,
                )
                if use_prof:
                    params, n_reset, n_updated = weight_reset(
                        st2.params, snapshot, threshold, applications=applications
                    )
                    st2 = st2._replace(params=params)
                    stacked = dict(stacked, prof_n_reset=n_reset, prof_n_updated=n_updated)
                return st2, stacked

            st, stacked = jax.lax.scan(epoch_body, st, (u_thr, u_perms))
            evals = (
                _fused_eval_pass(pair, cfg, use_pallas, st.params,
                                 val_embs, val_labels, val_valid, bank),
                _fused_eval_pass(pair, cfg, use_pallas, st.params,
                                 test_embs, test_labels, test_valid, bank),
            )
            return st, (stacked, evals, st)

        state, (stacked, evals, unit_states) = jax.lax.scan(
            unit_body, state, (embs, labels, valid, class_masks, thresholds, perms)
        )
        return state, stacked, evals, unit_states

    return jax.jit(run, donate_argnums=(0,))


def build_vmapped_sweep(
    pair: AdapterPair,
    tx: optax.GradientTransformation,
    cfg: ExperimentConfig,
) -> Callable:
    """K whole joint-training runs (same program, different learning rates)
    + their val scoring as ONE vmapped dispatch — the sweep CLI's ``--vmap``
    engine (``cli/sweep.py``).

    The learning rate is a *dynamic* optax hyperparameter (it lives in the
    opt state, :func:`make_optimizer`), so K configs differing only in lr
    share one XLA executable; vmapping over the stacked ``TrainState``
    trains them all concurrently — K tiny (128-d) adapter problems batch
    into matmuls that actually feed the MXU, and a K-point sweep costs one
    dispatch+readback instead of K x E.  Nothing in the reference
    constrains this (its drivers hard-code one config per process,
    ``ZERO_JOINT_BOUNDS.py:16-31``).

    Returns ``sweep(states, embs, labels, valid, bank, perms, val_embs,
    val_labels, val_valid) -> (states, (K, C) per-class val AUROC)`` where
    ``states`` has (K, ...)-stacked leaves, train data is padded to whole
    batches (replicated across K), and ``perms`` is the (K, E, n_pad)
    per-config epoch orders — seed sweeps give each config its own stream,
    exactly like K sequential Trainers.  Eval scores come from the same
    :func:`_fused_eval_pass` + ``auroc_device`` the sequential path's
    ``quick_auroc`` uses (the jnp scorer: pallas_call does not vmap).
    """
    from incremental_multimodal_medical_learning_ii_tpu.evaluation.metrics import (
        auroc_device,
    )

    core = _train_core(pair, tx, cfg)
    if cfg.continual_learning is not None:
        raise ValueError("--vmap sweeps train without CL resets "
                         "(the joint sweep grid never sets them)")

    def one(state, embs, labels, valid, bank, perms, val_embs, val_labels, val_valid):
        class_mask = jnp.ones(labels.shape[1], jnp.float32)

        def epoch_body(st, perm):
            st, _ = _epoch_scan(
                core, cfg, st, embs, labels, valid, bank, class_mask,
                jnp.zeros(()), perm,
            )
            return st, None

        state, _ = jax.lax.scan(epoch_body, state, perms)
        _, scores, _ = _fused_eval_pass(
            pair, cfg, False, state.params, val_embs, val_labels, val_valid, bank
        )
        return state, auroc_device(scores, val_labels, val_valid)

    return jax.jit(
        jax.vmap(one, in_axes=(0, None, None, None, None, 0, None, None, None)),
        donate_argnums=(0,),
    )


@functools.partial(jax.jit, static_argnums=(1, 2))
def epoch_permutation(key, n_real: int, n_pad: int) -> jnp.ndarray:
    """Device-side epoch row order: permute the ``n_real`` real rows, keep
    the padding indices at the tail — the same semantics as the reference's
    reshuffling DataLoader (real rows shuffled, the final batch carries the
    partial tail, Trainer.py:238-240) and as this framework's per-batch
    ``iterate_batches`` path, so the fused and per-batch engines see
    identical batch composition for a given permutation.  Stays in HBM (no
    host round-trip); recompiles per (n_real, n_pad), which only varies
    across datasets/parts."""
    p = jax.random.permutation(key, n_real).astype(jnp.int32)
    if n_pad > n_real:
        p = jnp.concatenate([p, jnp.arange(n_real, n_pad, dtype=jnp.int32)])
    return p


def build_epoch_reset(cfg: ExperimentConfig) -> Callable:
    """profCL per-epoch reset: (params, snapshot, threshold) -> (params, nr, nu)."""
    applications = 2 if cfg.shared else 1
    return jax.jit(
        functools.partial(weight_reset, applications=applications),
        donate_argnums=(0,),
    )


def build_eval_step(pair: AdapterPair, cfg: ExperimentConfig, on_mesh: bool = False) -> Callable:
    """Returns step(params, embs, labels, elem_mask, bank) ->
    (loss, scores, preds, logits); all five classes are always scored
    (the reference evaluates the full label set in every regime,
    ``Trainer.py:772-866``)."""

    # pallas_call under whole-array jit does not accept sharded operands
    # (that needs shard_map); keep the jnp path on meshes.
    use_pallas = _eval_uses_pallas() and not on_mesh

    def step(params, embs, labels, elem_mask, bank):
        out = _forward(pair, params, embs, bank, cfg, use_pallas=use_pallas)
        lbl = change_labels(labels) if cfg.change_labels else labels
        loss = bce_with_logits(out.logits, lbl, elem_mask[:, None] * jnp.ones((1, lbl.shape[1])))
        return loss, out.scores, out.preds, out.logits

    return jax.jit(step)


def build_fused_eval(pair: AdapterPair, cfg: ExperimentConfig, on_mesh: bool = False) -> Callable:
    """The whole eval pass as one jitted scan over HBM-resident data:
    (params, embs (Npad,D), labels, valid, bank) -> (losses (n_b,),
    scores (Npad,C), preds (Npad,C)).  Batching follows the reference's
    fixed eval batch (Trainer.py:241-246) so per-batch val/Loss scalars
    are preserved."""
    use_pallas = _eval_uses_pallas() and not on_mesh

    def eval_pass(params, embs, labels, valid, bank):
        return _fused_eval_pass(pair, cfg, use_pallas, params, embs, labels, valid, bank)

    return jax.jit(eval_pass)


def _fused_eval_pass(pair, cfg, use_pallas, params, embs, labels, valid, bank):
    """The eval-scan body shared by :func:`build_fused_eval` (standalone
    program) and :func:`build_fused_unit` (eval folded into the unit
    dispatch): (losses (n_b,), scores (Npad,C), preds (Npad,C))."""
    if embs.shape[0] % cfg.eval_batch_size:
        # the scan floor-divides: a non-multiple row count would silently
        # drop the tail (callers pad via _device_data; enforce it)
        raise ValueError(
            f"{embs.shape[0]} rows not a multiple of eval batch "
            f"{cfg.eval_batch_size}; pad the dataset first"
        )
    n_b = embs.shape[0] // cfg.eval_batch_size
    # the text-adapted bank is loop-invariant: adapt ONCE per eval pass,
    # not once per scan iteration (XLA does not hoist out of scan bodies)
    adapted_bank = (
        apply_text_adapter_to_bank(pair.apply_text, params, bank)
        if pair.use_text else bank
    )

    def body(_, idx):
        b_embs = jax.lax.dynamic_slice_in_dim(embs, idx * cfg.eval_batch_size, cfg.eval_batch_size)
        b_labels = jax.lax.dynamic_slice_in_dim(labels, idx * cfg.eval_batch_size, cfg.eval_batch_size)
        b_mask = jax.lax.dynamic_slice_in_dim(valid, idx * cfg.eval_batch_size, cfg.eval_batch_size)
        image_embs = pair.apply_image(params, b_embs)
        out = score_embeddings(
            image_embs, adapted_bank, cfg.prompt_mode,
            cfg.train_logit_diff, cfg.pred_logit_diff, use_pallas=use_pallas,
        )
        lbl = change_labels(b_labels) if cfg.change_labels else b_labels
        loss = bce_with_logits(out.logits, lbl, b_mask[:, None] * jnp.ones((1, lbl.shape[1])))
        return None, (loss, out.scores, out.preds)

    _, (losses, scores, preds) = jax.lax.scan(body, None, jnp.arange(n_b))
    c = scores.shape[-1]
    return losses, scores.reshape(-1, c), preds.reshape(-1, c)


def build_embed_fn(pair: AdapterPair, cfg: ExperimentConfig) -> Callable:
    """(params, embs) -> adapted image embeddings (for t-SNE / analysis)."""

    def fn(params, embs):
        return pair.apply_image(params, embs)

    return jax.jit(fn)
