"""The three experiment protocols as library functions.

These mirror the reference's driver ``__main__`` blocks:

* :func:`run_zero_joint`        — ``ZERO_JOINT_BOUNDS.py:16-72``
* :func:`run_data_incremental`  — ``DATA_INCREMENTAL.py:44-97``
* :func:`run_class_incremental` — ``CLASS_INCREMENTAL.py:32-97``

including threshold scheduling (``threshold += adder`` before every epoch),
profCL snapshot/reset hooks, per-part loader freeing (irrelevant here: parts
are index views), and the end-of-run checkpoint save.  Exceptions propagate
(the reference's bare ``except`` that silently swallows training errors,
``DATA_INCREMENTAL.py:91-92``, is intentionally not reproduced).

Crash contract for the incremental protocols: the FINAL save runs only on
success — on a crash the partial-unit TB events are discarded and the last
*unit-boundary* checkpoint (written by ``_save_unit`` after every completed
part/task) is left as the durable state, so ``resume=True`` re-trains the
interrupted unit from clean weights instead of a dirty mid-unit state.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, Optional

from incremental_multimodal_medical_learning_ii_tpu.data.store import (
    EmbeddingDataset,
    filter_multiclass,
    filter_sani_malati,
    split_by_label,
    split_contiguous,
)
from incremental_multimodal_medical_learning_ii_tpu.engine.checkpoint import (
    load_aux,
    load_progress,
    restore_checkpoint,
    save_checkpoint,
    save_progress,
)
from incremental_multimodal_medical_learning_ii_tpu.engine.trainer import Trainer
from incremental_multimodal_medical_learning_ii_tpu.evaluation.tb import TBWriter
from incremental_multimodal_medical_learning_ii_tpu.objectives.scorer import PromptBank
from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
    ContinualLearning,
    ExperimentConfig,
)
from incremental_multimodal_medical_learning_ii_tpu.utils.profiling import maybe_trace


@dataclasses.dataclass
class DataBundle:
    train: EmbeddingDataset
    val: EmbeddingDataset
    test: EmbeddingDataset
    tsne_multiclass: Optional[EmbeddingDataset] = None
    tsne_sani_malati: Optional[EmbeddingDataset] = None

    def with_tsne_subsets(self) -> "DataBundle":
        """The t-SNE subsets the reference extracts from the train set
        (Trainer.py:249-250)."""
        return dataclasses.replace(
            self,
            tsne_multiclass=filter_multiclass(self.train),
            tsne_sani_malati=filter_sani_malati(self.train),
        )

    @property
    def tsne_datasets(self):
        if self.tsne_multiclass is None or self.tsne_sani_malati is None:
            return None
        return (self.tsne_multiclass, self.tsne_sani_malati)


def _make_writer(cfg: ExperimentConfig, log_dir: Optional[str]) -> TBWriter:
    if log_dir is None:
        return TBWriter(None)
    return TBWriter(str(Path(log_dir) / cfg.run_name()))


def _save_final(trainer: Trainer, writer: TBWriter) -> None:
    if trainer.cfg.trains_anything and writer.log_dir is not None:
        save_checkpoint(writer.log_dir, trainer.state)


def _maybe_resume(trainer: Trainer, writer: TBWriter, resume: bool):
    """Restore state + completed-unit count for part/task-level resume (the
    reference has no resume at all: SURVEY.md section 5). Also restores the
    trainer's host-side stream state (shuffle rng, iteration counters,
    heatmap rows) so the resumed run's batch order and TB output byte-match
    an uninterrupted run's. Returns (completed_units, aux_dict_or_None)."""
    if not resume or writer.log_dir is None:
        return 0, None
    completed = load_progress(writer.log_dir)
    aux = load_aux(writer.log_dir)
    if completed > 0:
        name = (aux or {}).get("state_name", "train_state")
        try:
            trainer.state = restore_checkpoint(writer.log_dir, trainer.state, name=name)
        except Exception:
            if name == "train_state":
                raise
            # old-format progress pointing at a since-cleaned staged dir
            trainer.state = restore_checkpoint(writer.log_dir, trainer.state)
        if trainer.mesh is not None:
            # restore_checkpoint returns host numpy; re-establish the
            # replicated-params placement Trainer.__init__ guarantees
            from incremental_multimodal_medical_learning_ii_tpu.parallel import (
                mesh as mesh_lib,
            )

            trainer.state = mesh_lib.replicate(trainer.mesh, trainer.state)
        if aux is not None:
            try:
                trainer.load_aux_state(aux)
            except Exception as e:  # old/partial progress file: still resume,
                print(f"[resume] aux state unreadable ({e}); resuming without "
                      "bit-reproducibility")  # just without byte-identical TB output
                aux = None
        if aux is None:
            # degraded (aux-less) resume: the optimizer count restored with
            # the checkpoint, so the LR actually applied continues from
            # state.step — reseed the host-side mirror or the train/LR
            # stream would restart at sched(1) while training runs at
            # sched(step+1)
            import jax as _jax

            trainer._py_step = int(_jax.device_get(trainer.state.step))
        print(f"[resume] restored checkpoint; skipping {completed} completed unit(s)")
    return completed, aux


def _save_unit(trainer: Trainer, writer: TBWriter, completed: int, extra: Optional[dict] = None) -> None:
    """Durably commit one finished unit.  The checkpoint is staged under a
    per-unit name FIRST; the atomic progress.json write then points at it —
    a crash between the two leaves progress at unit N-1 with its checkpoint
    intact, so resume re-trains unit N from clean weights instead of
    silently double-training it."""
    if trainer.cfg.trains_anything and writer.log_dir is not None:
        name = f"train_state_unit{completed}"
        save_checkpoint(writer.log_dir, trainer.state, name=name)
        # TB events BEFORE the progress pointer (redo-log order): a crash
        # between the two re-trains unit N on resume and re-appends its
        # (identical-valued) events — recoverable.  The reverse order would
        # mark unit N complete while its events were still in the discardable
        # buffer, losing them permanently.
        writer.commit()
        aux = trainer.aux_state()
        if extra:
            aux.update(extra)
        aux["state_name"] = name
        save_progress(writer.log_dir, completed, aux)  # the atomic commit point
        import shutil

        for stale in Path(writer.log_dir).glob("train_state_unit*"):
            if stale.name != name:
                shutil.rmtree(stale, ignore_errors=True)
    else:
        # TB events become durable only at unit boundaries — a crashed
        # attempt leaves no partial-unit events behind.
        writer.commit()


def run_zero_joint(
    cfg: ExperimentConfig,
    data: DataBundle,
    bank: PromptBank,
    log_dir: Optional[str] = None,
    mesh=None,
    trace_dir: Optional[str] = None,
) -> Dict[str, Dict[str, float]]:
    """Zero-shot (epochs=0) or joint-train upper bound.  ``trace_dir``
    captures a jax.profiler device trace of the whole train/eval loop
    (SURVEY.md section 5 tracing; the reference has only tqdm bars)."""
    writer = _make_writer(cfg, log_dir)
    trainer = Trainer(cfg, bank, writer, mesh)
    results: Dict[str, Dict[str, float]] = {}
    threshold = cfg.threshold
    try:
        with maybe_trace(trace_dir):
            if cfg.epochs > 0:
                # fused whole-run dispatch: all epochs + their per-epoch
                # val/test evals in ONE program (the joint analogue of the
                # incremental unit fusion); the epoch loop below then only
                # replays TB logging and consumes the staged eval results
                fuse_run = trainer.joint_run_fusible(data.train, (data.val, data.test))
                if cfg.fused_unit and not fuse_run:
                    # loud, like reproduce's ignored-flag warning: the user
                    # opted into fusion for a reason (link latency) and
                    # should not attribute per-epoch RTTs to link health
                    print("[warn] --fused-unit: joint whole-run fusion "
                          "disabled (train or val/test data is not an "
                          "HBM-residentable EmbeddingDataset, or the fused "
                          "eval machinery is off); running per-epoch")
                if fuse_run:
                    trainer.train_joint_run(data.train, threshold, (data.val, data.test))
                for epoch in range(1, cfg.epochs + 1):
                    if fuse_run:
                        trainer.emit_joint_epoch(epoch)
                    else:
                        trainer.train(data.train, epoch, threshold=threshold,
                                      actual_task=epoch)
                    results[f"val_ep{epoch}"] = trainer.validate(
                        data.val, epoch, cfg.epochs, mode="joint"
                    )
                    results[f"test_ep{epoch}"] = trainer.test(
                        data.test, epoch, cfg.epochs, mode="joint",
                        tsne_datasets=data.tsne_datasets,
                    )
                    writer.commit()
            else:
                results["val_zero"] = trainer.validate(data.val, 0, 0, mode="zero")
                results["test_zero"] = trainer.test(
                    data.test, 0, 0, mode="zero", tsne_datasets=data.tsne_datasets
                )
    except BaseException:
        writer.discard()  # un-committed partial-epoch events
        raise
    finally:
        # the reference always saves adapters in its finally
        # (ZERO_JOINT_BOUNDS.py try/finally); keep that even on crash
        _save_final(trainer, writer)
        writer.close()
    results["trainer"] = trainer  # type: ignore[assignment]
    return results


def run_data_incremental(
    cfg: ExperimentConfig,
    data: DataBundle,
    bank: PromptBank,
    log_dir: Optional[str] = None,
    mesh=None,
    resume: bool = False,
    trace_dir: Optional[str] = None,
) -> Dict[str, Dict[str, float]]:
    writer = _make_writer(cfg, log_dir)
    trainer = Trainer(cfg, bank, writer, mesh)
    parts = split_contiguous(data.train, cfg.parts)
    results: Dict[str, Dict[str, float]] = {}
    threshold = cfg.threshold
    skip, _ = _maybe_resume(trainer, writer, resume)
    count = skip * cfg.epochs
    for _ in range(count):  # replay, not multiply: keeps fp accumulation
        threshold += cfg.adder  # order identical to an uninterrupted run
    remaining = list(range(1 + skip, cfg.parts + 1))
    # the whole remaining threshold schedule advances host-side ONCE here,
    # in the same sequential fp-accumulation order the per-unit loop used
    # (the resume replay above depends on it); the scheduling scalars are
    # still logged inside the unit loop at their original stream position
    schedule = []
    for _ in remaining:
        unit_thr = []
        for _ in range(cfg.epochs):
            threshold += cfg.adder  # DATA_INCREMENTAL.py:78
            unit_thr.append(threshold)
        schedule.append(unit_thr)
    use_prof = cfg.continual_learning == ContinualLearning.PROF_CL
    try:
        with maybe_trace(trace_dir):
            units = [parts[p - 1] for p in remaining]
            fold = trainer.incremental_run_fusible(units, (data.val, data.test))
            if cfg.fused_unit and not fold and units:
                # like run_zero_joint's warn: the user opted into fusion for
                # link-latency reasons and should know the run still pays
                # one dispatch per unit
                print("[info] --fused-unit: whole-run fold unavailable "
                      "(an empty unit, eval/train data not "
                      "HBM-residentable, or epochs=0); dispatching "
                      "per unit")
            if fold:
                # the WHOLE remaining run (every part's epochs + its
                # post-part val/test evals) as one dispatch; the loop below
                # only replays TB logging and consumes the staged results
                trainer.train_incremental_run(
                    units, schedule,
                    use_my_cl_units=[
                        cfg.continual_learning == ContinualLearning.MY_CL and p > 1
                        for p in remaining
                    ],
                    use_prof_units=[use_prof] * len(units),
                    eval_data=(data.val, data.test),
                )
            for i, part in enumerate(remaining):
                for thr in schedule[i]:
                    count += 1
                    if cfg.threshold_scheduling and cfg.continual_learning is not None:
                        writer.add_scalar("monitor-resets/threshold-scheduling", thr, count)
                if fold:
                    trainer.emit_incremental_unit(i, part=part, actual_task=part)
                elif trainer.unit_fusible(parts[part - 1]):
                    trainer.train_unit(
                        parts[part - 1], schedule[i], part=part, actual_task=part,
                        use_prof=use_prof,
                        eval_data=(data.val, data.test),
                    )
                else:
                    for epoch, thr in enumerate(schedule[i], start=1):
                        if use_prof:
                            trainer.model_copy()
                        trainer.train(
                            parts[part - 1], epoch, threshold=thr,
                            part=part, epochs=cfg.epochs, actual_task=part,
                        )
                        if use_prof:
                            trainer.prof_incremental(epoch, cfg.epochs, part, thr)
                results[f"val_part{part}"] = trainer.validate(
                    data.val, part, cfg.parts, mode="data-inc", tasks_order=part
                )
                results[f"test_part{part}"] = trainer.test(
                    data.test, part, cfg.parts, mode="data-inc", tasks_order=part,
                    tsne_datasets=data.tsne_datasets,
                )
                _save_unit(trainer, writer, part)
        _save_final(trainer, writer)
    except BaseException:
        # Crash mid-unit: drop the partial-unit TB events and leave the
        # unit-boundary checkpoint from _save_unit intact (overwriting it
        # with mid-unit state would make resume re-train on a dirty state).
        writer.discard()
        raise
    finally:
        writer.close()
    results["trainer"] = trainer  # type: ignore[assignment]
    return results


def run_class_incremental(
    cfg: ExperimentConfig,
    data: DataBundle,
    bank: PromptBank,
    log_dir: Optional[str] = None,
    mesh=None,
    n_tasks: int = 5,
    resume: bool = False,
    trace_dir: Optional[str] = None,
) -> Dict[str, Dict[str, float]]:
    writer = _make_writer(cfg, log_dir)
    trainer = Trainer(cfg, bank, writer, mesh)
    if cfg.mode == "class-pos-neg":
        tasks = split_contiguous(data.train, 5)  # Trainer.py:350-351
    elif cfg.mode == "class-pos":
        tasks = split_by_label(data.train)  # Trainer.py:353-354
    else:
        raise ValueError(f"not a class-incremental mode: {cfg.mode}")

    tasks_order = list(cfg.tasks_order)
    if n_tasks > min(len(tasks), len(tasks_order)):
        # fail BEFORE training: task n_tasks would IndexError five tasks in,
        # discarding the partial run's TB events
        raise ValueError(
            f"n_tasks={n_tasks} exceeds the {len(tasks)} task splits / "
            f"{len(tasks_order)}-entry tasks_order (5 disease classes)"
        )
    results: Dict[str, Dict[str, float]] = {}
    threshold = cfg.threshold
    skip, aux = _maybe_resume(trainer, writer, resume)
    if aux is not None:
        last_batch = int(aux.get("last_batch", 0))
    else:
        # aux missing/unreadable (old-format progress.json): reconstruct the
        # TB train-iteration counter from the completed tasks' batch counts
        # instead of restarting at 0, which would re-log train/Loss over
        # global steps the finished units already committed.
        last_batch = sum(
            -(-len(tasks[t]) // cfg.batch_size) * cfg.epochs for t in range(skip)
        )
        if skip:
            print(f"[resume] no aux state; reconstructed last_batch={last_batch} "
                  "from completed tasks' batch counts")
    count = skip * cfg.epochs
    for _ in range(count):  # replay, not multiply: keeps fp accumulation
        threshold += cfg.adder  # order identical to an uninterrupted run
    remaining = list(range(1 + skip, n_tasks + 1))
    # see run_data_incremental: the whole remaining schedule, same fp order
    schedule = []
    for _ in remaining:
        unit_thr = []
        for _ in range(cfg.epochs):
            threshold += cfg.adder  # CLASS_INCREMENTAL.py:70
            unit_thr.append(threshold)
        schedule.append(unit_thr)
    try:
        with maybe_trace(trace_dir):
            units = [tasks[t - 1] for t in remaining]
            fold = trainer.incremental_run_fusible(units, (data.val, data.test))
            if cfg.fused_unit and not fold and units:
                print("[info] --fused-unit: whole-run fold unavailable "
                      "(an empty unit, eval/train data not "
                      "HBM-residentable, or epochs=0); dispatching "
                      "per unit")
            if fold:
                trainer.train_incremental_run(
                    units, schedule,
                    use_my_cl_units=[
                        cfg.continual_learning == ContinualLearning.MY_CL and t > 1
                        for t in remaining
                    ],
                    use_prof_units=[
                        cfg.continual_learning == ContinualLearning.PROF_CL and t > 1
                        for t in remaining
                    ],
                    current_tasks=[tasks_order[t - 1] for t in remaining],
                    more_labels=cfg.more_labels,
                    eval_data=(data.val, data.test),
                )
            for i, actual_task in enumerate(remaining):
                for thr in schedule[i]:
                    count += 1
                    if cfg.threshold_scheduling and cfg.continual_learning is not None:
                        writer.add_scalar("monitor-resets/threshold-scheduling", thr, count)
                use_prof = (cfg.continual_learning == ContinualLearning.PROF_CL
                            and actual_task > 1)
                if fold:
                    last_batch = trainer.emit_incremental_unit(
                        i, actual_task=actual_task, last_batch=last_batch
                    )
                elif trainer.unit_fusible(tasks[actual_task - 1]):
                    last_batch = trainer.train_unit(
                        tasks[actual_task - 1], schedule[i],
                        actual_task=actual_task, last_batch=last_batch,
                        current_task=tasks_order[actual_task - 1],
                        more_labels=cfg.more_labels,
                        use_prof=use_prof,
                        eval_data=(data.val, data.test),
                    )
                else:
                    for epoch, thr in enumerate(schedule[i], start=1):
                        if use_prof:
                            trainer.model_copy()
                        last_batch = trainer.train_class_incremental(
                            tasks[actual_task - 1], epoch,
                            current_task=tasks_order[actual_task - 1],
                            last_batch=last_batch, threshold=thr,
                            actual_task=actual_task, more_labels=cfg.more_labels,
                        )
                        if use_prof:
                            trainer.prof_incremental(epoch, cfg.epochs, actual_task, thr)
                results[f"val_task{actual_task}"] = trainer.validate(
                    data.val, actual_task, cfg.epochs, mode=cfg.mode, tasks_order=tasks_order,
                    final_unit=n_tasks,
                )
                results[f"test_task{actual_task}"] = trainer.test(
                    data.test, actual_task, cfg.epochs, mode=cfg.mode, tasks_order=tasks_order,
                    tsne_datasets=data.tsne_datasets, final_unit=n_tasks,
                )
                _save_unit(trainer, writer, actual_task, extra={"last_batch": last_batch})
        _save_final(trainer, writer)
    except BaseException:
        writer.discard()  # see run_data_incremental: keep the unit checkpoint clean
        raise
    finally:
        writer.close()
    results["trainer"] = trainer  # type: ignore[assignment]
    return results
