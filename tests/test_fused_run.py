"""Whole-run incremental fold == per-epoch / per-unit paths, stream for stream.

``build_fused_run`` (engine/steps.py) folds EVERY unit of an incremental
run — each part/task's epochs AND its post-unit val/test eval passes
(DATA_INCREMENTAL.py:44-97, CLASS_INCREMENTAL.py:32-97) — into ONE XLA
program: a lax.scan over units around the fused-unit epoch scan, with the
per-unit class masks, threshold schedules, and shuffle orders riding in as
stacked operands and the per-unit metric streams, eval results, and
post-unit TrainStates coming back as stacked outputs.  These tests pin
that the fold is purely a dispatch-count optimization: every TB scalar
stream, the final params, the per-unit checkpoint states, and even the
live-params figure cadence are IDENTICAL to the unfolded paths.
"""

import numpy as np
import pytest

import jax

from incremental_multimodal_medical_learning_ii_tpu.engine import protocols
from incremental_multimodal_medical_learning_ii_tpu.engine.protocols import (
    run_class_incremental,
    run_data_incremental,
)
from incremental_multimodal_medical_learning_ii_tpu.engine.trainer import Trainer
from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
    ExperimentConfig,
)
from test_fused_unit import _assert_identical, _bank, _bundle, _Recorder, _run


def _count_folds(monkeypatch):
    """Wrap Trainer.train_incremental_run with a call counter (the fold
    must actually ENGAGE — a silent fallback to per-unit dispatches would
    make every equality test below pass vacuously)."""
    calls = []
    orig = Trainer.train_incremental_run

    def wrapper(self, *a, **k):
        calls.append(1)
        return orig(self, *a, **k)

    monkeypatch.setattr(Trainer, "train_incremental_run", wrapper)
    return calls


def test_fused_run_data_incremental_mycl_shuffled(monkeypatch):
    """myCL per-step resets + threshold scheduling + device-RNG shuffling
    through the whole-run fold: identical streams and final params, with
    the fold confirmed engaged (one dispatch for all 3 parts)."""
    calls = _count_folds(monkeypatch)
    _assert_identical(
        dict(mode="data-inc", parts=3, epochs=2, batch_size=64,
             eval_batch_size=64, lr=1e-3, continual_learning="myCL",
             threshold=0.01, adder=0.001, threshold_scheduling=True,
             shuffle_train=True),
        run_data_incremental,
    )
    assert calls == [1]


@pytest.mark.slow
def test_fused_run_class_incremental_posneg_profcl_task_guard(monkeypatch):
    """class-pos-neg tasks are a contiguous split (Trainer.py:350-351), so
    the whole class-incremental run folds; profCL's task>1 guard rides in
    as zero thresholds for task 1 (an exact no-op reset) and the
    monitor-resets stream must only start at task 2."""
    calls = _count_folds(monkeypatch)
    _assert_identical(
        dict(mode="class-pos-neg", epochs=2, batch_size=64,
             eval_batch_size=64, lr=1e-3, continual_learning="profCL",
             threshold=0.05, adder=0.001, shuffle_train=True),
        run_class_incremental,
    )
    assert calls == [1]


@pytest.mark.slow
def test_fused_run_class_incremental_shared_sgd_permuted_mycl(monkeypatch):
    calls = _count_folds(monkeypatch)
    _assert_identical(
        dict(mode="class-pos-neg", epochs=2, batch_size=64,
             eval_batch_size=64, lr=0.1, optim="sgd", shared=True,
             continual_learning="myCL", threshold=0.01, adder=0.001,
             tasks_order=(2, 0, 4, 1, 3), shuffle_train=True),
        run_class_incremental,
    )
    assert calls == [1]


@pytest.mark.slow
def test_fused_run_class_incremental_more_labels_max_gaps(monkeypatch):
    """Per-unit growing class masks (MORE_LABELS) x the raw
    per-(class,polarity) MAX-gap stream: the gap counters advance per
    trained class per batch across ALL units of the single dispatch."""
    calls = _count_folds(monkeypatch)
    _assert_identical(
        dict(mode="class-pos-neg", epochs=2, batch_size=64,
             eval_batch_size=64, lr=1e-3, more_labels=True,
             prompt_mode="max", max_gap_per_class=True, shuffle_train=False),
        run_class_incremental,
    )
    assert calls == [1]


def test_fused_run_per_unit_checkpoint_states(monkeypatch):
    """_save_unit checkpoints each unit's own post-unit state; under the
    fold those come from the stacked scan outputs (sliced device-side in
    emit_incremental_unit) and must be bitwise-equal to per-epoch
    training's — this is also what makes 'reference'-cadence figures
    exact under the fold (they draw from self.state.params)."""
    captured = {}

    def capture(key):
        def _save(trainer, writer, completed, extra=None):
            captured.setdefault(key, []).append(
                jax.device_get(trainer.state.params)
            )

        return _save

    kwargs = dict(mode="data-inc", parts=3, epochs=1, batch_size=64,
                  eval_batch_size=64, lr=1e-3, shuffle_train=True)
    monkeypatch.setattr(protocols, "_save_unit", capture("per_epoch"))
    _run(run_data_incremental, dict(kwargs, fused_unit=False))
    monkeypatch.setattr(protocols, "_save_unit", capture("fused"))
    _run(run_data_incremental, dict(kwargs, fused_unit=True))
    assert len(captured["per_epoch"]) == len(captured["fused"]) == 3
    for pa, pb in zip(captured["per_epoch"], captured["fused"]):
        for la, lb in zip(jax.tree_util.tree_leaves(pa), jax.tree_util.tree_leaves(pb)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_fused_run_uneven_units_fold(monkeypatch):
    """Units whose padded batch counts DIFFER (here a 129-row set split
    into 65+64-row parts at batch 64: a 2-batch and a 1-batch unit) fold
    too: the shorter unit pads to the longer one's slab with fully-masked
    batches, which the program's step guard makes exact state no-ops — an
    Adam step on a zero-grad batch would otherwise still decay the moments
    and advance the count, so stream equality here proves the guard."""
    from incremental_multimodal_medical_learning_ii_tpu.data.store import (
        synthetic_dataset,
    )
    from incremental_multimodal_medical_learning_ii_tpu.engine.protocols import (
        DataBundle,
    )

    calls = _count_folds(monkeypatch)
    rng = np.random.default_rng(7)
    dirs = rng.normal(size=(5, 128)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    bundle = DataBundle(
        train=synthetic_dataset(129, seed=1, class_directions=dirs),
        val=synthetic_dataset(128, seed=2, class_directions=dirs),
        test=synthetic_dataset(128, seed=3, class_directions=dirs),
    )

    def run(fused):
        rec = _Recorder()
        orig = protocols._make_writer
        protocols._make_writer = lambda cfg, log_dir: rec
        try:
            cfg = ExperimentConfig(
                mode="data-inc", parts=2, epochs=2, batch_size=64,
                eval_batch_size=64, lr=1e-3, fused_unit=fused,
                shuffle_train=True, plot_figures="off",
            )
            results = run_data_incremental(cfg, bundle, _bank(), log_dir=None)
        finally:
            protocols._make_writer = orig
        return rec, results["trainer"]

    rec_a, tr_a = run(False)
    rec_b, tr_b = run(True)
    assert calls == [1]  # the fold must ENGAGE on the uneven units
    assert tr_b._run_staging is None  # released after the last emit
    assert rec_a.scalars == rec_b.scalars
    for la, lb in zip(
        jax.tree_util.tree_leaves(jax.device_get(tr_a.params)),
        jax.tree_util.tree_leaves(jax.device_get(tr_b.params)),
    ):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


@pytest.mark.slow
def test_fused_run_by_label_class_pos_folds(monkeypatch):
    """The by-label class-pos splitter (reference Trainer.py:1187-1212)
    produces units of different sizes; the whole class-incremental run
    must still fold into ONE dispatch with streams and final params equal
    to the per-epoch path — including the padded batches' no-op on Adam
    state, the myCL task>1 guard, and per-unit class masks."""
    calls = _count_folds(monkeypatch)
    _assert_identical(
        dict(mode="class-pos", epochs=2, batch_size=64,
             eval_batch_size=64, lr=1e-3, continual_learning="myCL",
             threshold=0.01, adder=0.001, shuffle_train=True),
        run_class_incremental,
    )
    assert calls == [1]


def test_fused_run_reference_figures_stay_exact():
    """plot_figures='reference' draws text/t-SNE figures from LIVE params
    after every unit.  Unlike the joint whole-run fold (which must disable
    itself there), the incremental fold stages each unit's own TrainState,
    so the figure cadence survives: same figure tags at the same steps on
    both paths."""

    class FigRecorder(_Recorder):
        def __init__(self):
            super().__init__()
            self.figures = []

        def add_figure(self, tag, figure, step=0):
            self.figures.append((tag, int(step)))
            super().add_figure(tag, figure, step)

    def run_with(fused):
        rec = FigRecorder()
        orig = protocols._make_writer
        protocols._make_writer = lambda cfg, log_dir: rec
        try:
            cfg = ExperimentConfig(
                mode="data-inc", parts=2, epochs=1, batch_size=64,
                eval_batch_size=64, lr=1e-3, fused_unit=fused,
                shuffle_train=False, plot_figures="reference",
            )
            results = run_data_incremental(
                cfg, _bundle().with_tsne_subsets(), _bank(), log_dir=None
            )
        finally:
            protocols._make_writer = orig
        return rec, results["trainer"]

    rec_a, _ = run_with(False)
    rec_b, tr_b = run_with(True)
    assert rec_a.figures == rec_b.figures
    assert any("t-SNE" in t for t, _ in rec_b.figures)
    assert rec_a.scalars == rec_b.scalars


@pytest.mark.slow
def test_fused_run_mesh_matches_per_unit_mesh(monkeypatch):
    """Fold x data-parallel: under an 8-device mesh the whole-run fold
    shards the stacked (U, n_pad, D) slabs on their row axis and GSPMD
    inserts the gradient all-reduce inside the unit scan.  Both mesh paths
    partition each unit's rows identically, so the fold must equal the
    per-unit mesh path bitwise (streams and final params)."""
    from incremental_multimodal_medical_learning_ii_tpu.parallel.mesh import (
        create_mesh,
    )

    kwargs = dict(mode="data-inc", parts=3, epochs=2, batch_size=64,
                  eval_batch_size=64, lr=1e-3, continual_learning="myCL",
                  threshold=0.01, adder=0.001, shuffle_train=True)

    def run(fold_on):
        if not fold_on:
            monkeypatch.setattr(
                Trainer, "incremental_run_fusible",
                lambda self, units, eval_data: False,
            )
        rec = _Recorder()
        orig = protocols._make_writer
        protocols._make_writer = lambda cfg, log_dir: rec
        try:
            cfg = ExperimentConfig(plot_figures="off", fused_unit=True, **kwargs)
            results = run_data_incremental(
                cfg, _bundle(), _bank(), log_dir=None, mesh=create_mesh(8)
            )
        finally:
            protocols._make_writer = orig
            if not fold_on:
                monkeypatch.undo()
        return rec, results["trainer"]

    rec_a, tr_a = run(False)  # per-unit dispatches, mesh
    rec_b, tr_b = run(True)   # whole-run fold, mesh
    assert rec_a.scalars == rec_b.scalars
    for la, lb in zip(
        jax.tree_util.tree_leaves(jax.device_get(tr_a.params)),
        jax.tree_util.tree_leaves(jax.device_get(tr_b.params)),
    ):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_fused_run_emit_without_staging_raises():
    cfg = ExperimentConfig(mode="data-inc", parts=2, epochs=1, batch_size=64,
                           eval_batch_size=64, lr=1e-3, fused_unit=True,
                           plot_figures="off")
    trainer = Trainer(cfg, _bank(), _Recorder())
    with pytest.raises(RuntimeError, match="staged train_incremental_run"):
        trainer.emit_incremental_unit(0, part=1, actual_task=1)


def test_fused_run_fusible_preconditions():
    """Uneven batch counts fold (padded + step-guarded); empty unit lists,
    missing eval data, epochs=0, and empty units fall back."""
    bundle = _bundle()
    cfg = ExperimentConfig(mode="data-inc", parts=2, epochs=1, batch_size=64,
                           eval_batch_size=64, lr=1e-3, fused_unit=True,
                           plot_figures="off")
    trainer = Trainer(cfg, _bank(), _Recorder())
    from incremental_multimodal_medical_learning_ii_tpu.data.store import (
        split_contiguous,
        synthetic_dataset,
    )

    parts = split_contiguous(bundle.train, 2)
    ev = (bundle.val, bundle.test)
    assert trainer.incremental_run_fusible(parts, ev)
    # unequal batch counts: 64 rows (1 batch) vs 200 (4 batches) — folds now
    uneven = [synthetic_dataset(64, seed=5), synthetic_dataset(200, seed=6)]
    assert trainer.incremental_run_fusible(uneven, ev)
    # an EMPTY unit stays on the fallback path (nothing to train there;
    # the reference crashes outright on empty parts)
    empty = [synthetic_dataset(64, seed=5), bundle.train.subset([])]
    assert not trainer.incremental_run_fusible(empty, ev)
    assert not trainer.incremental_run_fusible([], ev)
    assert not trainer.incremental_run_fusible(parts, None)
    cfg0 = ExperimentConfig(mode="data-inc", parts=2, epochs=0, batch_size=64,
                            eval_batch_size=64, lr=1e-3, fused_unit=True,
                            plot_figures="off")
    assert not Trainer(cfg0, _bank(), _Recorder()).incremental_run_fusible(parts, ev)
