"""High-level training / evaluation engine.

Drives the jitted steps of :mod:`engine.steps` through the reference's three
regimes with its exact iteration bookkeeping and TensorBoard schema:

* ``train``                         — joint & data-incremental epochs
                                      (``Trainer.py:526-605``)
* ``train_class_incremental``       — one class per task
                                      (``Trainer.py:608-680``)
* ``train_class_more_labels``       — growing class set
                                      (``Trainer.py:682-756``)
* ``validate`` / ``test``           — full-label-set evaluation with sklearn
                                      metrics (``Trainer.py:772-1072``)
* ``model_copy`` / ``prof_incremental`` — profCL epoch-level weight reset
                                      (``Trainer.py:1589-1641``)

Differences from the reference (all TPU-motivated):
* prompt embeddings come from the HBM-cached :class:`PromptBank`; the text
  adapter is applied inside the step (same math, no per-batch BERT);
* final partial batches are zero-padded with masks (static shapes);
* the MAX-mode max-mean gap is logged per step as the mean over the trained
  classes by default; ``cfg.max_gap_per_class`` opts into the reference's
  raw stream shape (one scalar per class per batch, own running counter);
* myCL reset counts are returned from the device step instead of mutating
  Python state (last batch's counts are logged at epoch end, which is also
  what the reference effectively logs since ``model_copy`` zeroes the
  counters every step, ``Trainer.py:538-540``).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import numpy as np

from incremental_multimodal_medical_learning_ii_tpu.data.store import (
    EmbeddingDataset,
    iterate_batches,
    num_batches,
)
from incremental_multimodal_medical_learning_ii_tpu.engine.steps import (
    build_embed_fn,
    build_epoch_reset,
    build_eval_step,
    build_fused_epoch,
    build_fused_eval,
    build_fused_run,
    build_fused_unit,
    build_train_step,
    init_train_state,
)
from incremental_multimodal_medical_learning_ii_tpu.evaluation import plots
from incremental_multimodal_medical_learning_ii_tpu.evaluation.metrics import (
    compute_metrics,
    per_class_metrics,
)
from incremental_multimodal_medical_learning_ii_tpu.evaluation.tb import TBWriter
from incremental_multimodal_medical_learning_ii_tpu.models.adapters import AdapterPair
from incremental_multimodal_medical_learning_ii_tpu.objectives.scorer import (
    PromptBank,
    apply_text_adapter_to_bank,
)
from incremental_multimodal_medical_learning_ii_tpu.ops.cosine import masked_mean
from incremental_multimodal_medical_learning_ii_tpu.parallel import mesh as mesh_lib
from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
    ContinualLearning,
    ExperimentConfig,
    NUM_CLASSES,
)


def _unit_class_mask(current_task: Optional[int], more_labels: bool) -> np.ndarray:
    """The (C,) class mask one incremental unit trains: all classes
    (joint/data-inc), labels[:, :task+1] (MORE_LABELS, Trainer.py:701) or
    labels[:, task] (class-incremental, Trainer.py:625)."""
    if current_task is None:
        return np.ones(NUM_CLASSES, np.float32)
    mask = np.zeros(NUM_CLASSES, np.float32)
    if more_labels:
        mask[: current_task + 1] = 1.0
    else:
        mask[current_task] = 1.0
    return mask


class Trainer:
    def __init__(
        self,
        cfg: ExperimentConfig,
        bank: PromptBank,
        writer: Optional[TBWriter] = None,
        mesh=None,
    ):
        self.cfg = cfg
        self.writer = writer or TBWriter(None)
        self.mesh = mesh
        self.class_names = list(cfg.class_names)

        self.pair = AdapterPair(
            kind=cfg.adapter,
            shared=cfg.shared,
            use_image=cfg.image_adapter,
            use_text=cfg.text_adapter,
        )
        params = self.pair.init(jax.random.PRNGKey(cfg.seed))
        self.state, self.tx = init_train_state(self.pair, params, cfg)
        self._train_step = build_train_step(self.pair, self.tx, cfg) if cfg.trains_anything else None
        self._eval_step = build_eval_step(self.pair, cfg, on_mesh=mesh is not None)
        self._embed = build_embed_fn(self.pair, cfg)
        self._epoch_reset = build_epoch_reset(cfg)
        if cfg.lr_schedule is not None:
            from incremental_multimodal_medical_learning_ii_tpu.engine.steps import (
                lr_schedule_fn,
            )

            self._lr_sched = lr_schedule_fn(cfg)
        else:
            self._lr_sched = None

        if mesh is not None:
            bank = mesh_lib.replicate(mesh, bank)
            self.state = mesh_lib.replicate(mesh, self.state)
        self.bank = bank

        self._snapshot = None  # profCL epoch snapshot
        self._shuffle_rng = np.random.default_rng(cfg.seed)
        self._pad_multiple = 1 if mesh is None else int(np.prod(mesh.devices.shape))
        # Optional injected epoch order: callable (epoch_index, n_rows) ->
        # permutation of range(n_rows).  Lets the twin-run harness feed the
        # reference DataLoader's exact seeded-RandomSampler order through
        # both engine paths; None uses the trainer's own RNG streams.
        self.permutation_source = None
        self._perm_counter = 0  # epochs begun with shuffling (both paths)

        # heatmap accumulators (Trainer.py:187-190)
        self.val_f1_rows: List[np.ndarray] = []
        self.val_auroc_rows: List[np.ndarray] = []
        self.test_f1_rows: List[np.ndarray] = []
        self.test_auroc_rows: List[np.ndarray] = []
        self._gap_counter = 0
        self._py_step = 0  # host-side mirror of state.step (for LR logging)

        # fused-epoch machinery: on a mesh the HBM-resident dataset is
        # row-sharded and the epoch's permutation gather rides XLA
        # collectives; params/bank stay replicated.
        self._fused_epoch = (
            build_fused_epoch(self.pair, self.tx, cfg)
            if cfg.trains_anything and cfg.fused_epoch
            else None
        )
        self._fused_eval = (
            build_fused_eval(self.pair, cfg, on_mesh=mesh is not None)
            if cfg.fused_epoch
            else None
        )
        # Device-data cache: keyed by (id(dataset), batch_size), guarded by a
        # weakref per dataset whose finalizer evicts all of its entries — a
        # freed-then-reallocated dataset reusing the id can never serve a
        # stale hit, and dead datasets don't pin device memory.
        self._device_data_cache: dict = {}
        self._cache_refs: dict = {}  # id(dataset) -> weakref.ref
        self._epoch_counter = 0
        # fused-UNIT programs (all E epochs of an incremental unit in one
        # dispatch, engine/steps.py::build_fused_unit), built lazily per
        # (profCL-flag, eval-folded) since both change the program
        self._fused_unit_cache: dict = {}
        # one-shot precomputed eval results from an eval-folded unit
        # dispatch: [(dataset, (losses, scores, preds)), ...] in the
        # order the protocol will consume them (validate then test),
        # matched by object identity.  Invalidated whenever params can
        # change outside the fold.
        self._pending_eval: list = []
        # fused joint-run staging (train_joint_run -> emit_joint_epoch;
        # released after the final epoch's emit)
        self._joint_fetched = None
        self._joint_evals = None
        self._joint_eval_data = None
        self._joint_states = None
        # fused incremental-run staging (train_incremental_run ->
        # emit_incremental_unit; released after the last unit's emit)
        self._fused_run_cache: dict = {}
        self._run_staging = None

    # ------------------------------------------------------------------
    # Host-side stream state (for bit-reproducible resume)
    # ------------------------------------------------------------------
    def aux_state(self) -> dict:
        """JSON-serializable snapshot of everything host-side that advances
        during training besides ``state``: the shuffle-rng stream, the
        TB iteration counters, and the heatmap accumulator rows.  Restoring
        it makes a resumed run's batch order and TB output byte-match an
        uninterrupted run's (the reference has no resume at all)."""
        return {
            "shuffle_rng": self._shuffle_rng.bit_generator.state,
            "py_step": self._py_step,
            "gap_counter": self._gap_counter,
            "epoch_counter": self._epoch_counter,
            "perm_counter": self._perm_counter,
            "val_f1_rows": [r.tolist() for r in self.val_f1_rows],
            "val_auroc_rows": [r.tolist() for r in self.val_auroc_rows],
            "test_f1_rows": [r.tolist() for r in self.test_f1_rows],
            "test_auroc_rows": [r.tolist() for r in self.test_auroc_rows],
        }

    def load_aux_state(self, aux: dict) -> None:
        # Parse everything BEFORE assigning anything: a partially-valid aux
        # (old format, truncated write) must not leave the trainer
        # half-restored when the caller catches the error and falls back.
        rng_state = aux["shuffle_rng"]
        py_step = int(aux["py_step"])
        gap_counter = int(aux["gap_counter"])
        epoch_counter = int(aux["epoch_counter"])
        rows = {
            key: [np.asarray(r, np.float64) for r in aux[key]]
            for key in ("val_f1_rows", "val_auroc_rows", "test_f1_rows", "test_auroc_rows")
        }
        self._shuffle_rng.bit_generator.state = rng_state
        self._py_step = py_step
        self._gap_counter = gap_counter
        self._epoch_counter = epoch_counter
        self._perm_counter = int(aux.get("perm_counter", epoch_counter))
        self.val_f1_rows = rows["val_f1_rows"]
        self.val_auroc_rows = rows["val_auroc_rows"]
        self.test_f1_rows = rows["test_f1_rows"]
        self.test_auroc_rows = rows["test_auroc_rows"]

    # ------------------------------------------------------------------
    # Shared internals
    # ------------------------------------------------------------------
    @property
    def params(self):
        return self.state.params

    def _place(self, batch):
        if self.mesh is None:
            return batch
        return mesh_lib.shard_batch(self.mesh, batch)

    def _batches(self, dataset, batch_size: int, shuffle: bool):
        """Batch iterator; accepts an :class:`EmbeddingDataset` or anything
        exposing ``iterate_batches`` (e.g. the native mmap store,
        data/native.py)."""
        if hasattr(dataset, "iterate_batches"):
            if shuffle and self.permutation_source is not None:
                raise ValueError(
                    "permutation_source injection is not supported for "
                    "native batch sources (their shuffle lives in C++)"
                )
            # per-epoch seed drawn from the persistent shuffle stream: a
            # fixed cfg.seed would replay the IDENTICAL permutation every
            # epoch (unlike the numpy path / the reference's DataLoader
            # reshuffle), and drawing from the stream keeps resume
            # bit-reproducible (the stream state lives in aux_state)
            seed = int(self._shuffle_rng.integers(2**31)) if shuffle else self.cfg.seed
            return dataset.iterate_batches(
                batch_size, shuffle=shuffle, seed=seed,
                pad_multiple=self._pad_multiple,
            )
        order = None
        if shuffle and self.permutation_source is not None:
            order = self._injected_permutation(len(dataset))
        return iterate_batches(
            dataset, batch_size, shuffle=shuffle,
            rng=self._shuffle_rng if shuffle else None,
            order=order,
            pad_multiple=self._pad_multiple,
        )

    def _injected_permutation(self, n: int) -> np.ndarray:
        """Next epoch order from the injected source (twin-run harness)."""
        self._perm_counter += 1
        order = np.asarray(self.permutation_source(self._perm_counter - 1, n))
        if order.shape != (n,):
            raise ValueError(
                f"permutation_source returned shape {order.shape}, expected ({n},)"
            )
        return order

    def _invalidate_folds(self) -> None:
        """Params are about to change outside a fold: staged eval results
        and any staged fused-run state are stale now (emitting a stale unit
        or epoch would silently REVERT self.state to the fold's slice)."""
        self._pending_eval = []
        self._run_staging = None
        self._joint_fetched = self._joint_evals = None
        self._joint_eval_data = self._joint_states = None

    def _run_train_batch(self, embs, labels, mask, class_mask, threshold):
        embs, labels, mask = self._place((embs, labels, mask))
        self.state, metrics = self._train_step(
            self.state, embs, labels, mask, class_mask, self.bank, threshold
        )
        return metrics

    def _flush_train_logs(self, pending, cfg, trained_classes=None) -> Optional[dict]:
        """One batched device->host readback per epoch (a per-batch scalar
        sync costs ~80ms through the TPU tunnel; the reference syncs every
        batch because torch .item() is cheap locally). Returns the last
        batch's metrics (host values).  ``trained_classes``: ascending class
        indices this epoch trains — consumed by the exact per-class MAX-gap
        stream (cfg.max_gap_per_class)."""
        if not pending:
            return None
        import jax as _jax

        fetched = _jax.device_get([m for _, m in pending])
        last = None
        sched = self._lr_sched
        for (iteration, _), metrics in zip(pending, fetched):
            self.writer.add_scalar("train/Loss", float(metrics["loss"]), iteration)
            if sched is not None:
                # reference logs AFTER scheduler.step() (Trainer.py:598-601):
                # the value for iteration i is the post-step LR, sched(i)
                self.writer.add_scalar(
                    "train/LR", float(sched(metrics["_step"] + 1)), iteration
                )
            if "max_mean_gap_pos" in metrics and self.writer.enabled:
                self._gap_counter += 1
                self.writer.add_scalar(
                    "max-mean-comparison/pos", float(metrics["max_mean_gap_pos"]), self._gap_counter
                )
                self.writer.add_scalar(
                    "max-mean-comparison/neg", float(metrics["max_mean_gap_neg"]), self._gap_counter
                )
            if "max_mean_gap_pos_vec" in metrics and self.writer.enabled:
                # raw reference stream: one scalar pair per trained class
                # per batch, classes in ascending index order (the
                # reference's `for label_name in self.class_names` loops,
                # Trainer.py:557, :714), each at its own running counter
                # (pos_mean_counter/neg_mean_counter advance in lockstep)
                for ci in (trained_classes if trained_classes is not None
                           else range(len(metrics["max_mean_gap_pos_vec"]))):
                    self._gap_counter += 1
                    self.writer.add_scalar(
                        "max-mean-comparison/pos",
                        float(metrics["max_mean_gap_pos_vec"][ci]), self._gap_counter,
                    )
                    self.writer.add_scalar(
                        "max-mean-comparison/neg",
                        float(metrics["max_mean_gap_neg_vec"][ci]), self._gap_counter,
                    )
            last = metrics
        return last

    def _log_reset_counts(self, metrics, iteration):
        """monitor-resets/* scalars (Trainer.py:758-770)."""
        # one batched readback for both scalars (each int() on a device
        # array costs a full tunnel round-trip here)
        n_reset, n_updated = jax.device_get((metrics["n_reset"], metrics["n_updated"]))
        n_reset, n_updated = int(n_reset), int(n_updated)
        total = max(n_reset + n_updated, 1)
        self.writer.add_scalar("monitor-resets/resets", n_reset, iteration)
        self.writer.add_scalar("monitor-resets/updates", n_updated, iteration)
        self.writer.add_scalar("monitor-resets/percentage resets", n_reset / total, iteration)

    # ------------------------------------------------------------------
    # Training (joint / data-incremental)  —  Trainer.py:526-605
    # ------------------------------------------------------------------
    def train(
        self,
        dataset: EmbeddingDataset,
        epoch: int,
        threshold: Optional[float] = None,
        part: Optional[int] = None,
        epochs: Optional[int] = None,
        actual_task: Optional[int] = None,
    ) -> None:
        cfg = self.cfg
        self._invalidate_folds()  # params change below: staged folds go stale
        use_my_cl = (
            cfg.continual_learning == ContinualLearning.MY_CL
            and actual_task is not None
            and actual_task > 1
        )
        class_mask = np.ones(NUM_CLASSES, np.float32)
        n_b = num_batches(len(dataset), cfg.batch_size)
        if self._fused_epoch is not None and isinstance(dataset, EmbeddingDataset):
            if part is None:
                iteration_of = lambda i: (epoch - 1) * n_b + i + 1  # noqa: E731
            else:
                iteration_of = (  # noqa: E731
                    lambda i: (part - 1) * (epochs or 0) * n_b + (epoch - 1) * n_b + i + 1
                )
            self._train_fused(
                dataset, class_mask, threshold if use_my_cl else 0.0, use_my_cl, iteration_of
            )
            return
        pending = []
        for batch_idx, (embs, labels, mask) in enumerate(
            self._batches(dataset, cfg.batch_size, shuffle=cfg.shuffle_train), start=1
        ):
            metrics = dict(
                self._run_train_batch(
                    embs, labels, mask, class_mask, threshold if use_my_cl else 0.0
                )
            )
            metrics["_step"] = self._py_step
            self._py_step += 1
            if part is None:
                iteration = (epoch - 1) * n_b + batch_idx
            else:
                iteration = (part - 1) * (epochs or 0) * n_b + (epoch - 1) * n_b + batch_idx
            pending.append((iteration, metrics))
        last_metrics = self._flush_train_logs(
            pending, cfg, trained_classes=np.nonzero(class_mask)[0]
        )
        if use_my_cl and last_metrics is not None:
            # counts of the LAST batch, like the reference (model_copy zeroes
            # the counters every step, Trainer.py:538-540, 758-770)
            self._log_reset_counts(last_metrics, pending[-1][0])

    def _device_data(self, dataset: EmbeddingDataset, bs: Optional[int] = None):
        """Upload a dataset once, padded to a whole number of batches; reused
        across all epochs touching it (data-incremental trains 10 epochs per
        part — the reference re-copies every batch every epoch)."""
        import weakref

        import jax.numpy as jnp

        bs = bs or self.cfg.batch_size
        did = id(dataset)
        key = (did, bs)
        cached = self._device_data_cache.get(key)
        if cached is not None:
            return cached
        n = len(dataset)
        n_pad = num_batches(n, bs) * bs
        embs = np.zeros((n_pad, dataset.embeddings.shape[1]), np.float32)
        labels = np.zeros((n_pad, dataset.labels.shape[1]), np.float32)
        valid = np.zeros(n_pad, np.float32)
        embs[:n] = dataset.embeddings
        labels[:n] = dataset.labels
        valid[:n] = 1.0
        if self.mesh is not None and n_pad % self._pad_multiple == 0:
            cached = mesh_lib.shard_batch(self.mesh, (embs, labels, valid))
        elif self.mesh is not None:
            cached = mesh_lib.replicate(self.mesh, (jnp.asarray(embs), jnp.asarray(labels), jnp.asarray(valid)))
        else:
            cached = (jnp.asarray(embs), jnp.asarray(labels), jnp.asarray(valid))
        try:
            if did not in self._cache_refs:
                wself = weakref.ref(self)

                def _evict(_ref, did=did, wself=wself):
                    s = wself()
                    if s is None:
                        return
                    s._cache_refs.pop(did, None)
                    for k in [k for k in s._device_data_cache if k[0] == did]:
                        del s._device_data_cache[k]

                self._cache_refs[did] = weakref.ref(dataset, _evict)
            self._device_data_cache[key] = cached
        except TypeError:
            pass  # dataset not weakref-able: skip caching over risking stale hits
        return cached

    def _epoch_perm(self, n: int, n_pad: int):
        """One epoch's row order, consuming the shared shuffle counters.
        The bit-reproducible-resume and twin contracts depend on the
        per-epoch and fused-unit paths consuming ``_epoch_counter`` /
        ``_perm_counter`` / the injected permutation source in exactly the
        same order, so this is the ONE place that does it."""
        cfg = self.cfg
        self._epoch_counter += 1
        if not cfg.shuffle_train:
            return np.zeros(0, np.int32)  # compile-time-ignored operand
        if self.permutation_source is not None:
            real = self._injected_permutation(n)
            return np.concatenate(
                [real.astype(np.int32), np.arange(n, n_pad, dtype=np.int32)]
            )
        from incremental_multimodal_medical_learning_ii_tpu.engine.steps import (
            epoch_permutation,
        )

        self._perm_counter += 1
        key = jax.random.fold_in(
            jax.random.PRNGKey(cfg.seed + 1), self._epoch_counter
        )
        # device-side: real rows permuted, padding at the tail — same
        # batch composition as the per-batch path / the reference's
        # DataLoader; no host round-trip for the order
        return epoch_permutation(key, n, n_pad)

    def _flush_epoch_metrics(self, fetched, class_mask, use_my_cl, iteration_of) -> None:
        """Re-shape one epoch's stacked metrics (``{k: (n_batches,) array}``)
        into the per-batch (iteration, dict) form and delegate to the ONE
        logging implementation the per-batch path uses (_flush_train_logs:
        train/Loss, post-step LR, gap pair).  ``iteration_of(i)`` maps the
        0-based batch index to the regime's TB iteration number."""
        n_b = len(fetched["loss"])
        if n_b == 0:
            # empty unit (split_contiguous tail / class with no positives):
            # nothing trained, nothing to log — mirror the non-fused path's
            # last_metrics-is-None skip instead of indexing empty arrays
            return
        pending = []
        for i in range(n_b):
            metrics = {k: v[i] for k, v in fetched.items()}
            metrics["_step"] = self._py_step
            self._py_step += 1
            pending.append((iteration_of(i), metrics))
        last_metrics = self._flush_train_logs(
            pending, self.cfg, trained_classes=np.nonzero(np.asarray(class_mask))[0]
        )
        if use_my_cl and last_metrics is not None and "n_reset" in last_metrics:
            self._log_reset_counts(last_metrics, pending[-1][0])

    def _train_fused(self, dataset, class_mask, threshold, use_my_cl, iteration_of) -> int:
        """One-lax.scan epoch (engine/steps.py::build_fused_epoch); returns
        the number of batches run. ``iteration_of(i)`` maps the 0-based
        batch index to the regime's TB iteration number."""
        from incremental_multimodal_medical_learning_ii_tpu.utils.profiling import (
            annotate,
        )

        d_embs, d_labels, d_valid = self._device_data(dataset)
        n, n_pad = len(dataset), int(d_embs.shape[0])
        perm = self._epoch_perm(n, n_pad)
        with annotate("fused-train-epoch"):
            self.state, stacked = self._fused_epoch(
                self.state, d_embs, d_labels, d_valid, self.bank, class_mask,
                threshold, perm
            )
            fetched = jax.device_get(stacked)
        self._flush_epoch_metrics(fetched, class_mask, use_my_cl, iteration_of)
        return len(fetched["loss"])

    # ------------------------------------------------------------------
    # Fused unit: all E epochs of one incremental unit in ONE dispatch
    # ------------------------------------------------------------------
    def unit_fusible(self, dataset) -> bool:
        """Whether :meth:`train_unit` can run this dataset: the opt-in flag
        is set, the fused-epoch machinery exists, and the data is an
        HBM-residentable :class:`EmbeddingDataset` (native mmap stores
        stream from C++ and stay on the per-batch path)."""
        return (
            self.cfg.fused_unit
            and self._fused_epoch is not None
            and isinstance(dataset, EmbeddingDataset)
        )

    def train_unit(
        self,
        dataset: EmbeddingDataset,
        thresholds: Sequence[float],
        *,
        part: Optional[int] = None,
        actual_task: Optional[int] = None,
        last_batch: int = 0,
        current_task: Optional[int] = None,
        more_labels: bool = False,
        use_prof: bool = False,
        eval_data: Optional[tuple] = None,
    ) -> int:
        """All ``len(thresholds)`` epochs of one unit (a data-incremental
        part or a class-incremental task) as ONE on-device program
        (engine/steps.py::build_fused_unit): the per-epoch dispatch+readback
        round-trips collapse to one, with the myCL threshold schedule, the
        per-epoch shuffle orders, and the profCL snapshot/reset inside the
        scan.  TB streams, counters, and RNG consumption are identical to
        ``epochs`` consecutive :meth:`train` / :meth:`train_class_incremental`
        calls (the twin suite pins this).  Returns ``last_batch + E * n_b``
        for the class-incremental iteration threading.

        ``eval_data=(val_dataset, test_dataset)`` folds the post-unit eval
        passes into the SAME program (``eval_mode="final"``) so the
        protocol's ``validate``/``test`` calls (which both protocols make
        after every unit, DATA_INCREMENTAL.py:80-86) consume the results
        from :attr:`_pending_eval` instead of dispatching again — on a
        tunneled link the two eval round-trips were the remaining
        per-unit cost once training fused (docs/RUNBOOK.md rehearsal
        table).  Results are bit-identical to the standalone fused eval
        (pinned by tests/test_fused_unit.py)."""
        cfg = self.cfg
        self._invalidate_folds()  # anything unconsumed is stale now
        n_epochs = len(thresholds)
        if n_epochs == 0:
            # eval-only run (epochs=0): nothing to dispatch — match the
            # per-epoch path, whose epoch loop simply doesn't execute
            return last_batch
        use_my_cl = (
            cfg.continual_learning == ContinualLearning.MY_CL
            and actual_task is not None
            and actual_task > 1
        )
        class_mask = _unit_class_mask(current_task, more_labels)
        # the threshold operand only feeds the myCL per-step reset and the
        # profCL epoch reset; zeros make both exact no-ops (|delta| < min
        # is false everywhere), matching the per-epoch path's
        # `threshold if use_my_cl else 0.0`
        eff = list(thresholds) if (use_my_cl or use_prof) else [0.0] * n_epochs
        fold_eval = (
            eval_data is not None
            and self._fused_eval is not None
            and all(isinstance(d, EmbeddingDataset) for d in eval_data)
        )
        fetched, evals, _ = self._dispatch_fused_unit(
            dataset, eff, use_prof, "final" if fold_eval else None,
            eval_data if fold_eval else None, class_mask, "fused-train-unit",
        )
        if fold_eval:
            # stage by dataset OBJECT (strong ref): consumed by the very
            # next validate/test or dropped at the next train entry, so no
            # leak — and id()-reuse after a GC'd dataset can never match
            self._pending_eval = [
                (eval_data[0], evals[0]), (eval_data[1], evals[1])
            ]
        prof_nr = fetched.pop("prof_n_reset", None)
        prof_nu = fetched.pop("prof_n_updated", None)
        n_b = fetched["loss"].shape[1]
        epochs_for_base = cfg.epochs
        for e in range(n_epochs):
            if part is not None:
                base = (part - 1) * epochs_for_base * n_b + e * n_b
            else:
                base = last_batch + e * n_b
            self._flush_epoch_metrics(
                {k: v[e] for k, v in fetched.items()}, class_mask, use_my_cl,
                lambda i, base=base: base + i + 1,
            )
            if use_prof:
                # prof_incremental's stream position (Trainer.py:1589-1632)
                step = ((actual_task or 1) - 1) * epochs_for_base + e + 1
                self._log_reset_counts(
                    {"n_reset": prof_nr[e], "n_updated": prof_nu[e]}, step
                )
        return last_batch + n_epochs * n_b

    def _get_fused_unit(self, use_prof: bool, eval_mode):
        key = (use_prof, eval_mode)
        fused_unit = self._fused_unit_cache.get(key)
        if fused_unit is None:
            fused_unit = build_fused_unit(
                self.pair, self.tx, self.cfg, use_prof=use_prof,
                eval_mode=eval_mode, on_mesh=self.mesh is not None,
            )
            self._fused_unit_cache[key] = fused_unit
        return fused_unit

    def _dispatch_fused_unit(
        self, dataset, eff_thresholds, use_prof, eval_mode, eval_data,
        class_mask, tag,
    ):
        """Assemble one fused-unit program's operands and dispatch it:
        device upload, the (E, n_pad) per-epoch orders, the (E,) threshold
        array, and (with ``eval_mode``) the folded val/test operands.
        Returns host-fetched ``(train_metrics, evals_or_None)``.  This is
        the ONE place the per-epoch orders are drawn (via
        :meth:`_epoch_perm`, consuming the SAME counters/streams as E
        individual ``_train_fused`` calls) — bit-reproducible resume and
        the twin suite depend on that consumption order, so unit and
        joint-run fusion must share it."""
        import jax.numpy as jnp

        from incremental_multimodal_medical_learning_ii_tpu.utils.profiling import (
            annotate,
        )

        cfg = self.cfg
        n_epochs = len(eff_thresholds)
        d_embs, d_labels, d_valid = self._device_data(dataset)
        n, n_pad = len(dataset), int(d_embs.shape[0])
        d_perms = jnp.stack(
            [jnp.asarray(self._epoch_perm(n, n_pad)) for _ in range(n_epochs)]
        )
        d_thresholds = jnp.asarray(np.asarray(eff_thresholds, np.float32))
        eval_ops = ()
        if eval_mode is not None:
            val_ops = self._device_data(eval_data[0], cfg.eval_batch_size)
            test_ops = self._device_data(eval_data[1], cfg.eval_batch_size)
            eval_ops = (*val_ops, *test_ops)
        fused = self._get_fused_unit(use_prof, eval_mode)
        with annotate(tag):
            if eval_mode == "per_epoch":
                self.state, stacked, evals, epoch_states = fused(
                    self.state, d_embs, d_labels, d_valid, self.bank,
                    class_mask, d_thresholds, d_perms, *eval_ops,
                )
                # epoch_states stay on device (sliced lazily per emit)
                return (*jax.device_get((stacked, evals)), epoch_states)
            if eval_mode is not None:
                self.state, stacked, evals = fused(
                    self.state, d_embs, d_labels, d_valid, self.bank,
                    class_mask, d_thresholds, d_perms, *eval_ops,
                )
                return (*jax.device_get((stacked, evals)), None)
            self.state, stacked = fused(
                self.state, d_embs, d_labels, d_valid, self.bank,
                class_mask, d_thresholds, d_perms,
            )
            return jax.device_get(stacked), None, None

    # ------------------------------------------------------------------
    # Fused joint run: ALL epochs + per-epoch val/test in ONE dispatch
    # ------------------------------------------------------------------
    def joint_run_fusible(self, train_ds, eval_data) -> bool:
        """Whether :meth:`train_joint_run` can fuse a whole joint run.
        ``plot_figures="reference"`` (text-embedding/t-SNE figures from
        LIVE params after every epoch, Trainer.py:1074-1554) is fine: the
        fold stacks each epoch's post-epoch TrainState and
        :meth:`emit_joint_epoch` restores it, so the figures draw from the
        epoch's own params — same mechanism as the incremental whole-run
        fold's per-unit states."""
        return (
            self.unit_fusible(train_ds)
            and self._fused_eval is not None
            and all(isinstance(d, EmbeddingDataset) for d in eval_data)
        )

    def train_joint_run(self, dataset: EmbeddingDataset, threshold, eval_data) -> None:
        """All ``cfg.epochs`` epochs of a joint run PLUS each epoch's val and
        test eval passes as ONE XLA program (``eval_mode="per_epoch"`` —
        the joint driver interleaves train and eval every epoch,
        ZERO_JOINT_BOUNDS.py:33-45, so "fuse the unit" for joint means
        fusing the whole run).  Dispatches and reads back everything here;
        :meth:`emit_joint_epoch` then replays one epoch's TB logging and
        stages that epoch's eval results for ``validate``/``test`` to
        consume — streams are bit-identical to the per-epoch path
        (tests/test_fused_unit.py).  myCL's epoch-1 guard (``actual_task``
        = epoch, so no reset in epoch 1) rides in through a zero first
        threshold, which makes the reset an exact no-op."""
        cfg = self.cfg
        self._pending_eval = []
        use_my_cl = cfg.continual_learning == ContinualLearning.MY_CL
        # train() applies `threshold if use_my_cl else 0.0` with
        # use_my_cl = (myCL and actual_task > 1), actual_task = epoch
        eff = [
            (threshold if (use_my_cl and ep > 1) else 0.0)
            for ep in range(1, cfg.epochs + 1)
        ]
        fetched, evals, epoch_states = self._dispatch_fused_unit(
            dataset, eff, False, "per_epoch", eval_data,
            np.ones(NUM_CLASSES, np.float32), "fused-joint-run",
        )
        self._joint_fetched = fetched
        self._joint_evals = evals
        self._joint_eval_data = eval_data  # strong refs, see _pending_eval
        self._joint_states = epoch_states  # DEVICE TrainState, (E,...) leaves

    def emit_joint_epoch(self, epoch: int) -> None:
        """Replay epoch ``epoch``'s TB logging from the fused joint run and
        stage its eval results (consumed by the next ``validate``/``test``
        pair).  Call in epoch order — the logging counters (_py_step,
        _gap_counter) advance exactly as the per-epoch path's."""
        e = epoch - 1
        fetched = self._joint_fetched
        if fetched is None:
            # staging was invalidated (a param-changing call interleaved
            # since train_joint_run) or never created: emitting would replay
            # stale logging and revert self.state to a stale epoch slice
            raise RuntimeError(
                "emit_joint_epoch without a staged train_joint_run (the "
                "staging is dropped whenever params change outside the fold)"
            )
        n_b = fetched["loss"].shape[1]
        use_my_cl = (
            self.cfg.continual_learning == ContinualLearning.MY_CL and epoch > 1
        )
        class_mask = np.ones(NUM_CLASSES, np.float32)
        self._flush_epoch_metrics(
            {k: v[e] for k, v in fetched.items()}, class_mask, use_my_cl,
            lambda i: e * n_b + i + 1,
        )
        val_out, test_out = self._joint_evals
        self._pending_eval = [
            (self._joint_eval_data[0], tuple(x[e] for x in val_out)),
            (self._joint_eval_data[1], tuple(x[e] for x in test_out)),
        ]
        # restore THIS epoch's post-epoch state (device-side slice): the
        # driver's live-params figures (plot_figures="reference") and any
        # mid-run checkpointing see the epoch's own params, exactly as the
        # per-epoch path would; the final epoch's slice equals the scan's
        # final carry
        self.state = jax.tree_util.tree_map(lambda x: x[e], self._joint_states)
        if epoch == self.cfg.epochs:
            # final epoch replayed: drop the run's staging (the stacked
            # train metrics and (E, Npad, C) eval arrays would otherwise
            # stay pinned for the Trainer's lifetime — ~tens of MB at
            # reference scale).  The per-epoch slices staged above are
            # views; they keep their bases alive until consumed.
            self._joint_fetched = self._joint_evals = None
            self._joint_eval_data = self._joint_states = None

    # ------------------------------------------------------------------
    # Fused incremental run: ALL units + their post-unit evals, ONE dispatch
    # ------------------------------------------------------------------
    def incremental_run_fusible(self, units, eval_data) -> bool:
        """Whether :meth:`train_incremental_run` can fold a whole
        incremental run into one dispatch.  Units of UNEVEN length fold
        too: each pads to the largest unit's (n_batches, n_pad) slab with
        fully-masked batches, which the fused-run program's step guard
        (engine/steps.py::_train_core ``guard_empty``) makes exact state
        no-ops — so ``split_contiguous`` parts (already uniform) and the
        by-label class-pos splits (reference Trainer.py:1187-1212) both
        ride the scan.  Mesh runs fold too: the stacked (U, n_pad, D)
        slabs shard on their row axis (parallel/mesh.py::
        stacked_batch_sharding) and GSPMD inserts the gradient all-reduce
        inside the scan — verified bitwise vs the per-unit mesh path
        (tests/test_fused_run.py) and asserted in the compiled SPMD
        (``__graft_entry__.dryrun_multichip``)."""
        return (
            self.cfg.fused_unit
            and self.cfg.epochs > 0
            and self._fused_epoch is not None
            and self._fused_eval is not None
            and len(units) > 0
            and all(isinstance(u, EmbeddingDataset) and len(u) > 0 for u in units)
            and eval_data is not None
            and all(isinstance(d, EmbeddingDataset) for d in eval_data)
        )

    def _get_fused_run(self, use_prof: bool):
        fused = self._fused_run_cache.get(use_prof)
        if fused is None:
            fused = build_fused_run(
                self.pair, self.tx, self.cfg, use_prof=use_prof,
                on_mesh=self.mesh is not None,
            )
            self._fused_run_cache[use_prof] = fused
        return fused

    def train_incremental_run(
        self,
        units: Sequence[EmbeddingDataset],
        schedules: Sequence[Sequence[float]],
        *,
        use_my_cl_units: Sequence[bool],
        use_prof_units: Sequence[bool],
        current_tasks: Optional[Sequence[Optional[int]]] = None,
        more_labels: bool = False,
        eval_data: tuple,
    ) -> None:
        """ALL remaining units of an incremental run — each unit's epochs
        AND its post-unit val/test evals — as ONE on-device program
        (engine/steps.py::build_fused_run).  Dispatches and reads back the
        metric streams and eval results here; :meth:`emit_incremental_unit`
        then replays one unit's TB logging, stages its eval results, and
        restores that unit's own post-unit ``TrainState`` — so unit-boundary
        checkpoints, live-params figures, and bit-reproducible resume are
        identical to per-unit dispatches (tests/test_fused_run.py pins the
        streams, params, and per-unit states bitwise).

        ``schedules`` is the per-unit myCL/profCL threshold schedule (the
        protocols advance ``threshold += adder`` once per epoch,
        DATA_INCREMENTAL.py:78 / CLASS_INCREMENTAL.py:70); units whose
        resets are guarded off (``use_my_cl_units[i]`` and
        ``use_prof_units[i]`` both false) ride in as zeros — an exact
        no-op.  ``current_tasks[i]`` is the class-incremental trained class
        (None = all classes)."""
        import jax.numpy as jnp

        from incremental_multimodal_medical_learning_ii_tpu.utils.profiling import (
            annotate,
        )

        cfg = self.cfg
        self._invalidate_folds()
        n_units = len(units)
        n_epochs = len(schedules[0])
        if current_tasks is None:
            current_tasks = [None] * n_units
        bs = cfg.batch_size
        # uneven units pad to the LARGEST unit's slab; their trailing
        # fully-masked batches are exact no-ops (the program's step guard)
        # and their metric columns are trimmed off at emit time
        n_bs = [num_batches(len(u), bs) for u in units]
        n_b = max(n_bs)
        n_pad = n_b * bs
        dim = units[0].embeddings.shape[1]
        n_cls = units[0].labels.shape[1]
        embs = np.zeros((n_units, n_pad, dim), np.float32)
        labels = np.zeros((n_units, n_pad, n_cls), np.float32)
        valid = np.zeros((n_units, n_pad), np.float32)
        for i, u in enumerate(units):
            n = len(u)
            embs[i, :n] = u.embeddings
            labels[i, :n] = u.labels
            valid[i, :n] = 1.0
        class_masks = np.stack(
            [_unit_class_mask(ct, more_labels) for ct in current_tasks]
        )
        eff = np.asarray(
            [
                list(s) if (mc or up) else [0.0] * n_epochs
                for s, mc, up in zip(schedules, use_my_cl_units, use_prof_units)
            ],
            np.float32,
        )
        # the per-epoch orders consume the SAME counters/streams in the
        # SAME unit-major order as per-unit dispatches would; the pre-fold
        # counter values are kept so emit_incremental_unit can rewind the
        # aux state to each unit boundary (unit-level resume replays the
        # remaining units' perms from there)
        counters0 = (self._epoch_counter, self._perm_counter)
        d_perms = jnp.stack(
            [
                jnp.stack(
                    [jnp.asarray(self._epoch_perm(len(u), n_pad)) for _ in range(n_epochs)]
                )
                for u in units
            ]
        )
        val_ops = self._device_data(eval_data[0], cfg.eval_batch_size)
        test_ops = self._device_data(eval_data[1], cfg.eval_batch_size)
        if self.mesh is not None:
            # fold x data-parallel: shard the stacked slabs on their ROW
            # axis (axis 1 of (U, n_pad, ...)) so each device trains its
            # row shard and GSPMD inserts the gradient all-reduce — same
            # layout rule as _device_data's per-dataset row sharding, with
            # the same replicate fallback for non-divisible row counts
            if n_pad % self._pad_multiple == 0:
                place = lambda x: jax.device_put(  # noqa: E731
                    x, mesh_lib.stacked_batch_sharding(self.mesh, x.ndim)
                )
            else:
                place = lambda x: jax.device_put(  # noqa: E731
                    x, mesh_lib.replicated(self.mesh)
                )
            d_embs, d_labels, d_valid = place(embs), place(labels), place(valid)
        else:
            d_embs, d_labels, d_valid = (
                jnp.asarray(embs), jnp.asarray(labels), jnp.asarray(valid)
            )
        use_prof = any(use_prof_units)
        fused = self._get_fused_run(use_prof)
        with annotate("fused-incremental-run"):
            self.state, stacked, evals, unit_states = fused(
                self.state, d_embs, d_labels, d_valid, self.bank,
                jnp.asarray(class_masks), jnp.asarray(eff), d_perms,
                *val_ops, *test_ops,
            )
            fetched, evals = jax.device_get((stacked, evals))
        self._run_staging = {
            "fetched": fetched,            # {k: (U, E, n_b)} host arrays
            "evals": evals,                # ((U,...) val, (U,...) test), host
            "eval_data": eval_data,        # strong refs, see _pending_eval
            "unit_states": unit_states,    # DEVICE TrainState, (U,...) leaves
            "class_masks": class_masks,
            "use_my_cl": list(use_my_cl_units),
            "use_prof": list(use_prof_units),
            "counters0": counters0,
            "n_units": n_units,
            "n_bs": n_bs,  # per-unit REAL batch counts (emit trims to these)
        }

    def emit_incremental_unit(
        self,
        idx: int,
        *,
        part: Optional[int] = None,
        actual_task: Optional[int] = None,
        last_batch: int = 0,
    ) -> int:
        """Replay unit ``idx``'s TB logging from the fused run, stage its
        eval results for the next ``validate``/``test`` pair, and set
        ``self.state`` to the post-unit state (device-side slice of the
        stacked scan output) so per-unit checkpoints and 'reference'-cadence
        figures see the unit's own params.  Call in unit order.  Returns the
        class-incremental ``last_batch`` threading value, like
        :meth:`train_unit`."""
        staging = self._run_staging
        if staging is None:
            raise RuntimeError(
                "emit_incremental_unit without a staged train_incremental_run"
            )
        fetched = {k: v[idx] for k, v in staging["fetched"].items()}
        prof_nr = fetched.pop("prof_n_reset", None)
        prof_nu = fetched.pop("prof_n_updated", None)
        # trim the padded batch columns (uneven units pad to the largest
        # unit's n_batches; their metrics are from step-guarded no-ops)
        n_b = staging["n_bs"][idx]
        fetched = {k: v[:, :n_b] for k, v in fetched.items()}
        class_mask = staging["class_masks"][idx]
        use_my_cl = staging["use_my_cl"][idx]
        n_epochs = fetched["loss"].shape[0]
        epochs_for_base = self.cfg.epochs
        for e in range(n_epochs):
            if part is not None:
                base = (part - 1) * epochs_for_base * n_b + e * n_b
            else:
                base = last_batch + e * n_b
            self._flush_epoch_metrics(
                {k: v[e] for k, v in fetched.items()}, class_mask, use_my_cl,
                lambda i, base=base: base + i + 1,
            )
            if staging["use_prof"][idx]:
                # prof_incremental's stream position (Trainer.py:1589-1632)
                step = ((actual_task or 1) - 1) * epochs_for_base + e + 1
                self._log_reset_counts(
                    {"n_reset": prof_nr[e], "n_updated": prof_nu[e]}, step
                )
        val_out, test_out = staging["evals"]
        self._pending_eval = [
            (staging["eval_data"][0], tuple(x[idx] for x in val_out)),
            (staging["eval_data"][1], tuple(x[idx] for x in test_out)),
        ]
        self.state = jax.tree_util.tree_map(
            lambda x: x[idx], staging["unit_states"]
        )
        # rewind the shuffle counters to this unit's boundary: aux_state()
        # saved at unit k must equal the per-unit path's (all U units' perms
        # were drawn upfront), so a unit-level resume replays the remaining
        # units' permutation stream bit-identically
        c_epoch, c_perm = staging["counters0"]
        self._epoch_counter = c_epoch + (idx + 1) * n_epochs
        if self.cfg.shuffle_train:
            self._perm_counter = c_perm + (idx + 1) * n_epochs
        if idx + 1 == staging["n_units"]:
            # last unit emitted: release the staged run (the stacked train
            # metrics, eval arrays, and device unit states would otherwise
            # stay pinned for the Trainer's lifetime); self.state keeps the
            # final unit's slice — the same values as the scan's final carry
            self._run_staging = None
        return last_batch + n_epochs * n_b

    # ------------------------------------------------------------------
    # Class-incremental  —  Trainer.py:608-756
    # ------------------------------------------------------------------
    def train_class_incremental(
        self,
        dataset: EmbeddingDataset,
        epoch: int,
        current_task: int,
        last_batch: int = 0,
        threshold: Optional[float] = None,
        actual_task: Optional[int] = None,
        more_labels: bool = False,
    ) -> int:
        cfg = self.cfg
        self._invalidate_folds()  # params change below: staged folds go stale
        use_my_cl = (
            cfg.continual_learning == ContinualLearning.MY_CL
            and actual_task is not None
            and actual_task > 1
        )
        class_mask = np.zeros(NUM_CLASSES, np.float32)
        if more_labels:
            class_mask[: current_task + 1] = 1.0  # labels[:, :task+1] (Trainer.py:701)
        else:
            class_mask[current_task] = 1.0  # labels[:, task] (Trainer.py:625)
        batch_idx = last_batch
        if self._fused_epoch is not None and isinstance(dataset, EmbeddingDataset):
            n_b = self._train_fused(
                dataset, class_mask, threshold if use_my_cl else 0.0, use_my_cl,
                lambda i: last_batch + i + 1,
            )
            return last_batch + n_b
        pending = []
        for embs, labels, mask in self._batches(dataset, cfg.batch_size, shuffle=cfg.shuffle_train):
            batch_idx += 1
            metrics = dict(
                self._run_train_batch(
                    embs, labels, mask, class_mask, threshold if use_my_cl else 0.0
                )
            )
            metrics["_step"] = self._py_step
            self._py_step += 1
            pending.append((batch_idx, metrics))
        last_metrics = self._flush_train_logs(
            pending, cfg, trained_classes=np.nonzero(class_mask)[0]
        )
        if use_my_cl and last_metrics is not None:
            self._log_reset_counts(last_metrics, batch_idx)
        return batch_idx

    # ------------------------------------------------------------------
    # profCL  —  Trainer.py:1589-1641
    # ------------------------------------------------------------------
    def model_copy(self) -> None:
        # Deep copy: the train step donates its state buffers, so holding a
        # reference to state.params would alias soon-to-be-deleted arrays.
        import jax.numpy as jnp

        self._snapshot = jax.tree_util.tree_map(jnp.copy, self.state.params)

    def prof_incremental(self, epoch: int, epochs: int, actual_task: int, threshold: float) -> None:
        if self._snapshot is None:
            raise RuntimeError("prof_incremental requires a prior model_copy()")
        self._invalidate_folds()  # the reset changes params
        params, n_reset, n_updated = self._epoch_reset(self.state.params, self._snapshot, threshold)
        self.state = self.state._replace(params=params)
        step = (actual_task - 1) * epochs + epoch
        self._log_reset_counts({"n_reset": n_reset, "n_updated": n_updated}, step)

    # ------------------------------------------------------------------
    # Evaluation  —  Trainer.py:772-1072
    # ------------------------------------------------------------------
    def _eval_pass(self, dataset: EmbeddingDataset, epoch: int, log_loss_prefix: Optional[str]):
        from incremental_multimodal_medical_learning_ii_tpu.utils.profiling import (
            annotate,
        )

        cfg = self.cfg
        import jax as _jax

        with annotate("eval-pass"):
            return self._eval_pass_inner(dataset, epoch, log_loss_prefix, cfg, _jax)

    def _eval_pass_inner(self, dataset, epoch, log_loss_prefix, cfg, _jax):

        n_b = num_batches(len(dataset), cfg.eval_batch_size)
        precomputed = None
        if self._pending_eval:
            if self._pending_eval[0][0] is dataset:
                # eval-folded unit dispatch already ran this pass with the
                # current (post-unit) params; consume its results one-shot
                precomputed = self._pending_eval.pop(0)[1]
            else:
                # a different dataset than the fold targeted: the pending
                # order no longer matches the protocol's — drop it all and
                # recompute (correct either way, folding is only a
                # dispatch-count optimization)
                self._pending_eval = []
        if precomputed is None and self._fused_eval is not None and isinstance(dataset, EmbeddingDataset):
            d_embs, d_labels, d_valid = self._device_data(dataset, cfg.eval_batch_size)
            precomputed = _jax.device_get(
                self._fused_eval(self.state.params, d_embs, d_labels, d_valid, self.bank)
            )
        if precomputed is not None:
            losses, scores, preds = precomputed
            if log_loss_prefix is not None:
                for i, loss in enumerate(losses, start=1):
                    iteration = (epoch - 1) * n_b + i
                    self.writer.add_scalar(f"{log_loss_prefix}/Loss", float(loss), iteration)
            n = len(dataset)
            return dataset.labels, preds[:n], scores[:n]
        device_out = []  # defer all device->host readbacks to one transfer
        host_labels, host_masks = [], []
        for embs, labels, mask in self._batches(dataset, cfg.eval_batch_size, shuffle=False):
            d_embs, d_labels, d_mask = self._place((embs, labels, mask))
            loss, scores, preds, _ = self._eval_step(
                self.state.params, d_embs, d_labels, d_mask, self.bank
            )
            device_out.append((loss, scores, preds))
            host_labels.append(labels)
            host_masks.append(mask)
        fetched = _jax.device_get(device_out)
        y_true, y_pred, y_score = [], [], []
        for batch_idx, ((loss, scores, preds), labels, mask) in enumerate(
            zip(fetched, host_labels, host_masks), start=1
        ):
            if log_loss_prefix is not None:
                iteration = (epoch - 1) * n_b + batch_idx
                self.writer.add_scalar(f"{log_loss_prefix}/Loss", float(loss), iteration)
            valid = mask > 0
            y_true.append(labels[valid])
            y_pred.append(preds[valid])
            y_score.append(scores[valid])
        return np.concatenate(y_true), np.concatenate(y_pred), np.concatenate(y_score)

    def _emit_heatmaps_if_due(self, val_test, mode, epoch, epochs, tasks_order,
                              f1_rows, auroc_rows, final_unit=None):
        """Epoch x class (joint/data-inc) and task x class (class-inc)
        forgetting heatmaps (Trainer.py:944-984).  The reference hardcodes
        the class-incremental milestone at task 5 (Trainer.py:965);
        ``final_unit`` makes it follow the run's actual task count when the
        protocol is invoked with n_tasks != 5 (default preserves parity)."""
        if epoch == epochs and mode in ("joint", "zero", "data-inc"):
            # label only the rows actually accumulated (differs from
            # range(1, epochs+1) only after a mid-run resume)
            rows = [str(i) for i in range(epochs - len(f1_rows) + 1, epochs + 1)]
            cols = self.class_names
            tag = f"{val_test}/joint train/"
        elif (epoch == (final_unit if final_unit is not None else 5)
              and mode in ("class-pos-neg", "class-pos")):
            order = list(tasks_order or range(NUM_CLASSES))
            unit = final_unit if final_unit is not None else 5
            # row i is the eval after training task i, whose class is
            # order[i-1]; only the FIRST `unit` classes are ever trained, and
            # a mid-run resume keeps only the trailing rows — so label with
            # the tail of the first `unit` trained classes (plain [-len:]
            # would mislabel every n_tasks < 5 run with the UNtrained tail)
            rows = [self.class_names[i] for i in order][:unit][-len(f1_rows):]
            cols = [self.class_names[i] for i in order]
            tag = f"{val_test}/{mode} incremental/"
        else:
            return
        f1_map = np.stack(f1_rows)
        auroc_map = np.stack(auroc_rows)
        self.writer.add_figure(
            tag + "F1 score Heatmap",
            plots.heatmap_figure(f1_map, rows, cols, "F1 score", "F1"),
        )
        self.writer.add_figure(
            tag + "AUROC score Heatmap",
            plots.heatmap_figure(auroc_map, rows, cols, "AUROC score", "AUROC"),
        )

    def evaluate_model(
        self, y_true, y_pred, y_score, mode, epoch, val_test, epochs, tasks_order,
        final_unit=None,
    ):
        metrics = compute_metrics(y_true, y_pred, y_score)
        w = self.writer
        w.add_scalar(f"{val_test}/Accuracy", metrics["accuracy"], epoch)
        w.add_scalar(f"{val_test}/F1-macro score", metrics["f1_macro"], epoch)
        w.add_scalar(f"{val_test}/F1-weighted score", metrics["f1_weighted"], epoch)
        w.add_scalar(f"{val_test}/AUROC-macro", metrics["auroc_macro"], epoch)
        w.add_scalar(f"{val_test}/AUROC-weighted", metrics["auroc_weighted"], epoch)

        pc = per_class_metrics(y_true, y_pred, y_score)
        # class-incremental evals pass epoch=task and epochs=per-task epoch
        # count (reference convention) — the 'final' milestone there is the
        # LAST TASK, same rule test() applies for its figures
        last = final_unit if (
            final_unit is not None and mode in ("class-pos-neg", "class-pos")
        ) else epochs
        plot_now = w.enabled and (
            self.cfg.plot_figures == "reference"
            or (self.cfg.plot_figures == "final" and epoch == last)
        )
        if plot_now:
            for i in range(y_true.shape[1]):
                w.add_figure(
                    f"{val_test} ROC Curve/Curve for Class {i}",
                    plots.roc_curve_figure(y_true[:, i], y_score[:, i], i),
                    epoch,
                )
                w.add_figure(
                    f"{val_test} Precision-Recall Curve/Curve for Class {i}",
                    plots.pr_curve_figure(y_true[:, i], y_score[:, i], i),
                    epoch,
                )
            for name, key in (("Accuracy", "accuracy"), ("Precision", "precision"), ("Recall", "recall")):
                w.add_figure(
                    f"{val_test} Class-metric/Class {name}",
                    plots.class_scatter_figure(pc[key], name),
                    epoch,
                )

        if val_test == "val":
            self.val_f1_rows.append(pc["f1"])
            self.val_auroc_rows.append(pc["auroc"])
            rows = (self.val_f1_rows, self.val_auroc_rows)
        else:
            self.test_f1_rows.append(pc["f1"])
            self.test_auroc_rows.append(pc["auroc"])
            rows = (self.test_f1_rows, self.test_auroc_rows)
        if w.enabled and self.cfg.plot_figures != "off":
            self._emit_heatmaps_if_due(val_test, mode, epoch, epochs, tasks_order,
                                       *rows, final_unit=final_unit)
        return metrics

    def quick_auroc(self, dataset: EmbeddingDataset) -> np.ndarray:
        """Per-class AUROC computed entirely on device (evaluation/metrics
        rank statistic) — no sklearn, no per-batch host sync; for in-loop
        monitoring and sweeps. Returns a (C,) array; a class with no valid
        positives or negatives is NaN (sklearn raises there — a NaN mean is
        louder than a silently wrong ranking)."""
        from incremental_multimodal_medical_learning_ii_tpu.evaluation.metrics import (
            auroc_device,
        )

        if self._fused_eval is None:
            import jax.numpy as jnp

            y_true, _, y_score = self._eval_pass(dataset, 1, log_loss_prefix=None)
            mask = np.ones(len(y_true), np.float32)
            return np.asarray(
                auroc_device(jnp.asarray(y_score), jnp.asarray(y_true), jnp.asarray(mask))
            )
        d_embs, d_labels, d_valid = self._device_data(dataset, self.cfg.eval_batch_size)
        _, scores, _ = self._fused_eval(self.state.params, d_embs, d_labels, d_valid, self.bank)
        return np.asarray(jax.device_get(auroc_device(scores, d_labels, d_valid)))

    def validate(self, dataset, epoch, epochs, mode="joint", tasks_order=None,
                 final_unit=None):
        y_true, y_pred, y_score = self._eval_pass(dataset, epoch, log_loss_prefix="val")
        return self.evaluate_model(y_true, y_pred, y_score, mode, epoch, "val",
                                   epochs, tasks_order, final_unit=final_unit)

    def test(
        self,
        dataset,
        epoch,
        epochs,
        mode="joint",
        tasks_order=None,
        tsne_datasets: Optional[Sequence[EmbeddingDataset]] = None,
        final_unit=None,
    ):
        y_true, y_pred, y_score = self._eval_pass(dataset, epoch, log_loss_prefix=None)
        metrics = self.evaluate_model(
            y_true, y_pred, y_score, mode, epoch, "test", epochs, tasks_order,
            final_unit=final_unit,
        )
        # 'final' milestone: last epoch/part for joint/data-inc, last TASK
        # for class-incremental (where `epoch` carries the task index and
        # `epochs` the per-task epoch count, following the reference's
        # argument convention, CLASS_INCREMENTAL.py:89)
        last = final_unit if (
            final_unit is not None and mode in ("class-pos-neg", "class-pos")
        ) else epochs
        plot_now = self.writer.enabled and (
            self.cfg.plot_figures == "reference"
            or (self.cfg.plot_figures == "final" and epoch == last)
        )
        if plot_now:
            self._plot_text_embedding_figures(epoch)
            if tsne_datasets is not None:
                self._plot_image_tsne(tsne_datasets, epoch)
        return metrics

    # ------------------------------------------------------------------
    # Analysis plots (Trainer.py:1074-1554)
    # ------------------------------------------------------------------
    def adapted_mean_prompt_embeddings(self):
        """(C, D) pos / neg adapted mean prompt embeddings (the 'to_plot'
        path of bert_forward_mean: mean even in MAX mode)."""
        bank = self.bank
        if self.pair.use_text:
            bank = apply_text_adapter_to_bank(self.pair.apply_text, self.state.params, bank)
        pos = np.asarray(masked_mean(bank.pos, bank.pos_count))
        neg = np.asarray(masked_mean(bank.neg, bank.neg_count))
        return pos, neg

    def _plot_text_embedding_figures(self, epoch: int) -> None:
        pos, neg = self.adapted_mean_prompt_embeddings()
        if self.cfg.train_logit_diff:
            fig = plots.prompt_cosine_heatmap_figure(pos, neg, self.cfg.single_prompt)
        else:
            fig = plots.prompt_cosine_heatmap_figure(pos, None, self.cfg.single_prompt)
        self.writer.add_figure("visual-embeddings/cosine-similarity Heatmap text-embs", fig, epoch)
        pca_fig, tsne_fig = plots.prompt_projection_figures(pos, neg, seed=self.cfg.seed)
        self.writer.add_figure("visual-embeddings/PCA text-embs", pca_fig, epoch)
        self.writer.add_figure("visual-embeddings/t-SNE text-embs", tsne_fig, epoch)

    def _plot_image_tsne(self, tsne_datasets: Sequence[EmbeddingDataset], epoch: int) -> None:
        multiclass, sani_malati = tsne_datasets
        for ds, kind, tag in (
            (sani_malati, "sani-malati", "tsne-chexpert/t-SNE sani-malati"),
            (multiclass, "multiclass", "tsne-chexpert/t-SNE 5x1000"),
        ):
            if len(ds) == 0:
                continue
            adapted = np.asarray(self._embed(self.state.params, ds.embeddings))
            fig = plots.embedding_tsne_figure(adapted, ds.labels, kind, seed=self.cfg.seed)
            self.writer.add_figure(tag, fig, epoch)
