"""Fused-unit dispatch == the per-epoch fused path, stream for stream.

``cfg.fused_unit`` runs ALL epochs of one incremental unit (a data-inc
part / class-inc task) as ONE XLA program (engine/steps.py::
build_fused_unit), moving the per-epoch driver bookkeeping — the myCL
threshold schedule (DATA_INCREMENTAL.py:78), per-epoch shuffle orders,
and the profCL snapshot/reset pair (CLASS_INCREMENTAL.py:73-88) — inside
the program.  These tests pin that every TB scalar stream and the final
parameters are IDENTICAL to the default per-epoch path across regimes,
CL modes, the MAX-gap monitors, and shuffling — so unit fusion is purely
a dispatch-count optimization, never a semantics change.
"""

import numpy as np
import pytest

import jax

from incremental_multimodal_medical_learning_ii_tpu.data.store import (
    synthetic_dataset,
)
from incremental_multimodal_medical_learning_ii_tpu.engine import protocols
from incremental_multimodal_medical_learning_ii_tpu.engine.protocols import (
    DataBundle,
    run_class_incremental,
    run_data_incremental,
    run_zero_joint,
)
from incremental_multimodal_medical_learning_ii_tpu.text.bank import (
    build_prompt_bank,
    synthetic_encode_fn,
)
from incremental_multimodal_medical_learning_ii_tpu.text.prompts import (
    create_prompts,
)
from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
    CHEXPERT_COMPETITION_TASKS,
    ExperimentConfig,
)


@pytest.fixture(autouse=True)
def _pin_per_unit_dispatches(monkeypatch):
    """These tests pin the PER-UNIT fold against the per-epoch path; the
    whole-run fold (engine/steps.py::build_fused_run, tested in
    test_fused_run.py) would otherwise supersede it for uniform units and
    leave train_unit untested on exactly the regimes it serves."""
    from incremental_multimodal_medical_learning_ii_tpu.engine.trainer import (
        Trainer,
    )

    monkeypatch.setattr(
        Trainer, "incremental_run_fusible", lambda self, units, eval_data: False
    )


def _bundle(n_train=400, n_eval=192, seed=7):
    rng = np.random.default_rng(seed)
    dirs = rng.normal(size=(5, 128)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    return DataBundle(
        train=synthetic_dataset(n_train, seed=1, class_directions=dirs),
        val=synthetic_dataset(n_eval, seed=2, class_directions=dirs),
        test=synthetic_dataset(n_eval, seed=3, class_directions=dirs),
    )


def _bank():
    prompts = create_prompts(CHEXPERT_COMPETITION_TASKS)
    return build_prompt_bank(
        synthetic_encode_fn(), prompts, CHEXPERT_COMPETITION_TASKS,
        train_logit_diff=True,
    )


class _Recorder:
    """Minimal TBWriter stand-in capturing scalar streams."""

    log_dir = None
    enabled = True

    def __init__(self):
        self.scalars = []

    def add_scalar(self, tag, value, step):
        self.scalars.append((tag, float(value), int(step)))

    def add_figure(self, tag, figure, step=0):
        import matplotlib.pyplot as plt

        plt.close(figure)

    def add_image(self, *a, **k):
        pass

    def commit(self):
        pass

    def discard(self):
        pass

    def close(self):
        pass


def _run(runner, cfg_kwargs):
    rec = _Recorder()
    orig = protocols._make_writer
    protocols._make_writer = lambda cfg, log_dir: rec
    try:
        cfg = ExperimentConfig(plot_figures="off", **cfg_kwargs)
        results = runner(cfg, _bundle(), _bank(), log_dir=None)
    finally:
        protocols._make_writer = orig
    return rec, results["trainer"]


def _assert_identical(kwargs, runner):
    rec_a, tr_a = _run(runner, dict(kwargs, fused_unit=False))
    rec_b, tr_b = _run(runner, dict(kwargs, fused_unit=True))
    tags = {t for t, _, _ in rec_a.scalars}
    assert tags == {t for t, _, _ in rec_b.scalars}
    for tag in sorted(tags):
        a = [(s, v) for t, v, s in rec_a.scalars if t == tag]
        b = [(s, v) for t, v, s in rec_b.scalars if t == tag]
        assert [s for s, _ in a] == [s for s, _ in b], tag
        np.testing.assert_allclose(
            [v for _, v in a], [v for _, v in b], rtol=0, atol=0,
            err_msg=tag,
        )
    pa = jax.device_get(tr_a.params)
    pb = jax.device_get(tr_b.params)
    for la, lb in zip(jax.tree_util.tree_leaves(pa), jax.tree_util.tree_leaves(pb)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_fused_unit_data_incremental_mycl_shuffled():
    """myCL per-step resets + threshold scheduling + the trainer's own
    device-RNG shuffle: the unit program must consume the identical
    fold_in(epoch_counter) permutation stream."""
    _assert_identical(
        dict(mode="data-inc", parts=3, epochs=2, batch_size=64,
             eval_batch_size=64, lr=1e-3, continual_learning="myCL",
             threshold=0.01, adder=0.001, threshold_scheduling=True,
             shuffle_train=True),
        run_data_incremental,
    )


@pytest.mark.slow
def test_fused_unit_data_incremental_profcl():
    """profCL: model_copy + epoch reset move inside the scan; the
    monitor-resets streams (counts at (part-1)*epochs+epoch) must match."""
    _assert_identical(
        dict(mode="data-inc", parts=2, epochs=3, batch_size=64,
             eval_batch_size=64, lr=1e-3, continual_learning="profCL",
             threshold=0.05, adder=0.001, threshold_scheduling=True,
             shuffle_train=False),
        run_data_incremental,
    )


@pytest.mark.slow
def test_fused_unit_class_incremental_shared_sgd_permuted_mycl():
    _assert_identical(
        dict(mode="class-pos-neg", epochs=2, batch_size=64,
             eval_batch_size=64, lr=0.1, optim="sgd", shared=True,
             continual_learning="myCL", threshold=0.01, adder=0.001,
             tasks_order=(2, 0, 4, 1, 3), shuffle_train=True),
        run_class_incremental,
    )


@pytest.mark.slow
def test_fused_unit_class_incremental_more_labels_max_gaps():
    """MORE_LABELS growing class masks x the raw per-(class,polarity)
    MAX-gap stream: the gap counters advance per trained class per batch
    and must land on identical TB steps through the unit program."""
    _assert_identical(
        dict(mode="class-pos", epochs=2, batch_size=64, eval_batch_size=64,
             lr=1e-3, more_labels=True, prompt_mode="max",
             max_gap_per_class=True, shuffle_train=False),
        run_class_incremental,
    )


@pytest.mark.slow
def test_fused_unit_class_incremental_profcl_task_guard():
    """profCL's class-inc task>1 guard: task 1 must train with NO reset
    (use_prof off) — a distinct unit program from tasks 2..5."""
    _assert_identical(
        dict(mode="class-pos-neg", epochs=2, batch_size=64,
             eval_batch_size=64, lr=1e-3, continual_learning="profCL",
             threshold=0.05, adder=0.001, shuffle_train=True),
        run_class_incremental,
    )


def test_fused_unit_epochs_zero_eval_only():
    """epochs=0 (an eval-only sweep over the units): the fused path must
    handle the empty threshold schedule — previously ``jnp.stack([])``
    crashed where the per-epoch path just skipped its epoch loop."""
    _assert_identical(
        dict(mode="data-inc", parts=2, epochs=0, batch_size=64,
             eval_batch_size=64, lr=1e-3),
        run_data_incremental,
    )


def test_fused_unit_joint_whole_run_interleaving():
    """Joint mode evaluates between epochs (ZERO_JOINT_BOUNDS.py:33-45), so
    its fusion is the WHOLE run: every epoch plus its val/test eval passes
    in one program (eval_mode='per_epoch').  The replayed TB logging must
    preserve even the GLOBAL scalar interleaving (train epoch e, then val e,
    then test e), not just per-tag streams."""
    rec_a, tr_a = _run(run_zero_joint,
                       dict(mode="joint", epochs=2, batch_size=64,
                            eval_batch_size=64, lr=1e-3, fused_unit=False))
    rec_b, tr_b = _run(run_zero_joint,
                       dict(mode="joint", epochs=2, batch_size=64,
                            eval_batch_size=64, lr=1e-3, fused_unit=True))
    assert rec_a.scalars == rec_b.scalars
    pa, pb = jax.device_get((tr_a.params, tr_b.params))
    for la, lb in zip(jax.tree_util.tree_leaves(pa), jax.tree_util.tree_leaves(pb)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


@pytest.mark.slow
def test_fused_unit_joint_mycl_shuffled():
    """Joint + myCL: the reference passes actual_task=epoch, so epoch 1
    must train WITHOUT the reset (the fold encodes that as a zero first
    threshold — an exact no-op) while epochs 2+ reset and log
    monitor-resets/* per epoch."""
    _assert_identical(
        dict(mode="joint", epochs=3, batch_size=64, eval_batch_size=64,
             lr=1e-3, continual_learning="myCL", threshold=0.01,
             shuffle_train=True),
        run_zero_joint,
    )


def test_fused_unit_stale_pending_eval_dropped():
    """Folded eval results are staged per dataset OBJECT and consumed
    one-shot; evaluating a DIFFERENT dataset first must drop the stage and
    recompute (correct either way — folding is only a dispatch
    optimization), and the staged targets must still evaluate correctly
    afterwards via the standalone path."""
    from incremental_multimodal_medical_learning_ii_tpu.engine.trainer import (
        Trainer,
    )

    cfg = ExperimentConfig(mode="data-inc", parts=1, epochs=1, batch_size=64,
                           eval_batch_size=64, lr=1e-3, fused_unit=True,
                           shuffle_train=False, plot_figures="off")
    b = _bundle()
    other = b.train  # not what the fold targeted
    trainer = Trainer(cfg, _bank(), _Recorder())
    trainer.train_unit(b.train, [0.0], part=1, actual_task=1,
                       eval_data=(b.val, b.test))
    assert trainer._pending_eval[0][0] is b.val
    m_other = trainer.validate(other, 1, 1)  # mismatch: stage dropped
    assert not trainer._pending_eval
    m_val = trainer.validate(b.val, 1, 1)  # recomputed standalone
    # cross-check the recomputed result against a fresh fold's staged one
    trainer2 = Trainer(cfg, _bank(), _Recorder())
    trainer2.train_unit(b.train, [0.0], part=1, actual_task=1,
                        eval_data=(b.val, b.test))
    m_val2 = trainer2.validate(b.val, 1, 1)
    assert m_val["auroc_macro"] == m_val2["auroc_macro"]
    assert np.isfinite(m_other["auroc_macro"])


def test_fused_unit_joint_reference_figures_fold_exact():
    """plot_figures='reference' draws text/t-SNE figures from LIVE params
    after every epoch.  The joint fold stacks each epoch's post-epoch
    TrainState and emit_joint_epoch restores it, so the fold stays ON and
    the figure cadence AND each epoch's figure-source params match the
    per-epoch path exactly."""
    import jax as _jax

    from incremental_multimodal_medical_learning_ii_tpu.engine.protocols import (
        DataBundle as _DB,
        run_zero_joint as _rzj,
    )

    class FigRecorder(_Recorder):
        def __init__(self):
            super().__init__()
            self.figures = []

        def add_figure(self, tag, figure, step=0):
            self.figures.append((tag, int(step)))
            super().add_figure(tag, figure, step)

    from incremental_multimodal_medical_learning_ii_tpu.engine.trainer import (
        Trainer,
    )

    bundle = _bundle()
    cfg = ExperimentConfig(mode="joint", epochs=2, batch_size=64,
                           eval_batch_size=64, lr=1e-3, fused_unit=True,
                           plot_figures="reference")
    assert Trainer(cfg, _bank(), FigRecorder()).joint_run_fusible(
        bundle.train, (bundle.val, bundle.test)
    )

    # epoch-1 figure params must be epoch 1's, not the final ones: capture
    # the params each text-embedding figure draws from on both paths
    captured = {}

    def run_with(fused, key):
        rec = FigRecorder()
        import incremental_multimodal_medical_learning_ii_tpu.engine.protocols as protocols

        orig_writer = protocols._make_writer
        orig_plot = Trainer._plot_text_embedding_figures

        def spy(self, epoch):
            captured.setdefault(key, []).append(
                _jax.device_get(self.state.params)
            )
            return orig_plot(self, epoch)

        protocols._make_writer = lambda cfg, log_dir: rec
        Trainer._plot_text_embedding_figures = spy
        try:
            c = ExperimentConfig(mode="joint", epochs=2, batch_size=64,
                                 eval_batch_size=64, lr=1e-3,
                                 fused_unit=fused, plot_figures="reference")
            _rzj(c, bundle, _bank(), log_dir=None)
        finally:
            protocols._make_writer = orig_writer
            Trainer._plot_text_embedding_figures = orig_plot
        return rec

    rec_a = run_with(False, "per_epoch")
    rec_b = run_with(True, "fused")
    assert rec_a.figures == rec_b.figures
    assert rec_a.scalars == rec_b.scalars
    assert len(captured["per_epoch"]) == len(captured["fused"]) == 2
    for pa, pb in zip(captured["per_epoch"], captured["fused"]):
        for la, lb in zip(_jax.tree_util.tree_leaves(pa), _jax.tree_util.tree_leaves(pb)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_joint_staging_invalidated_by_param_change():
    """A param-changing call between ``train_joint_run`` and
    ``emit_joint_epoch`` drops the joint staging
    (Trainer._invalidate_folds), and a later emit RAISES instead of
    silently replaying stale logging and reverting ``self.state`` to the
    fold's stale epoch slice."""
    from incremental_multimodal_medical_learning_ii_tpu.engine.trainer import (
        Trainer,
    )

    cfg = ExperimentConfig(mode="joint", epochs=2, batch_size=64,
                           eval_batch_size=64, lr=1e-3, fused_unit=True,
                           shuffle_train=False, plot_figures="off")
    b = _bundle()
    trainer = Trainer(cfg, _bank(), _Recorder())
    assert trainer.joint_run_fusible(b.train, (b.val, b.test))
    trainer.train_joint_run(b.train, 0.0, (b.val, b.test))
    trainer.emit_joint_epoch(1)  # the in-order emit works

    trainer.train(b.train, epoch=1)  # params change OUTSIDE the fold
    trained = jax.device_get(trainer.state.params)
    with pytest.raises(RuntimeError, match="staged train_joint_run"):
        trainer.emit_joint_epoch(2)
    # ... and the refused emit must not have touched params
    after = jax.device_get(trainer.state.params)
    for la, lb in zip(jax.tree_util.tree_leaves(trained),
                      jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
