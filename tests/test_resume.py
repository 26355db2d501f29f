"""Part-level crash-resume of the incremental protocols."""

import numpy as np
import pytest

from incremental_multimodal_medical_learning_ii_tpu.data.store import synthetic_dataset
from incremental_multimodal_medical_learning_ii_tpu.engine.checkpoint import load_progress
from incremental_multimodal_medical_learning_ii_tpu.engine.protocols import (
    DataBundle,
    run_data_incremental,
)
from incremental_multimodal_medical_learning_ii_tpu.text.bank import (
    build_prompt_bank,
    synthetic_encode_fn,
)
from incremental_multimodal_medical_learning_ii_tpu.text.prompts import create_prompts
from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
    CHEXPERT_COMPETITION_TASKS,
    data_incremental_config,
)


def _bundle():
    return DataBundle(
        train=synthetic_dataset(384, seed=1),
        val=synthetic_dataset(128, seed=2),
        test=synthetic_dataset(128, seed=3),
    )


def _bank():
    return build_prompt_bank(
        synthetic_encode_fn(), create_prompts(CHEXPERT_COMPETITION_TASKS),
        CHEXPERT_COMPETITION_TASKS,
    )


@pytest.mark.slow
def test_data_incremental_resume(tmp_path):
    cfg = data_incremental_config(
        batch_size=64, eval_batch_size=64, epochs=1, parts=3, lr=1e-3,
    )
    bank = _bank()
    bundle = _bundle()

    # full run in one go
    full = run_data_incremental(cfg, bundle, bank, log_dir=str(tmp_path / "full"))

    # interrupted run: a poisoned part-3 loader raises after part 2
    class Boom:
        def __len__(self):
            return 128

        def __getattr__(self, name):
            raise RuntimeError("boom")

    import incremental_multimodal_medical_learning_ii_tpu.engine.protocols as protocols

    orig_split = protocols.split_contiguous

    def broken_split(ds, parts):
        out = orig_split(ds, parts)
        out[2] = Boom()
        return out

    protocols.split_contiguous = broken_split
    try:
        import pytest

        with pytest.raises(Exception):
            run_data_incremental(cfg, bundle, bank, log_dir=str(tmp_path / "resumed"))
    finally:
        protocols.split_contiguous = orig_split

    run_dir = tmp_path / "resumed" / cfg.run_name()
    assert load_progress(run_dir) == 2  # parts 1-2 completed before the crash

    # resume completes the run and skips the finished parts
    resumed = run_data_incremental(
        cfg, bundle, bank, log_dir=str(tmp_path / "resumed"), resume=True
    )
    assert "test_part3" in resumed
    assert "test_part2" not in resumed  # skipped (already completed)
    assert load_progress(run_dir) == 3
    # quality comparable to the uninterrupted run
    assert abs(resumed["test_part3"]["auroc_macro"] - full["test_part3"]["auroc_macro"]) < 0.1


def _tb_scalars(run_dir):
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(str(run_dir), size_guidance={"scalars": 0})
    acc.Reload()
    return {
        tag: [(e.step, e.value) for e in acc.Scalars(tag)]
        for tag in acc.Tags()["scalars"]
    }


@pytest.mark.slow
@pytest.mark.parametrize("fused_unit", [False, True],
                         ids=["per-epoch", "fused-unit"])
def test_resume_is_bit_reproducible(tmp_path, fused_unit):
    """A resumed run's TB scalars must byte-match an uninterrupted run's:
    the shuffle-rng stream, iteration counters, threshold accumulation and
    heatmap rows are all restored/replayed (VERDICT r1 weak #6).  The
    fused-unit variant pins that train_unit advances the SAME persisted
    counters (epoch/perm/py_step) as per-epoch training, so resume stays
    bit-reproducible through one-dispatch units."""
    cfg = data_incremental_config(
        batch_size=64, eval_batch_size=64, epochs=2, parts=3, lr=1e-3,
        continual_learning="myCL", threshold=0.1, adder=0.01,
        threshold_scheduling=True, fused_unit=fused_unit,
    )
    bank = _bank()
    bundle = _bundle()

    run_data_incremental(cfg, bundle, bank, log_dir=str(tmp_path / "full"))

    import incremental_multimodal_medical_learning_ii_tpu.engine.protocols as protocols

    class Boom:
        def __len__(self):
            return 128

        def __getattr__(self, name):
            raise RuntimeError("boom")

    orig_split = protocols.split_contiguous

    def broken_split(ds, parts):
        out = orig_split(ds, parts)
        out[2] = Boom()
        return out

    protocols.split_contiguous = broken_split
    try:
        with pytest.raises(Exception):
            run_data_incremental(cfg, bundle, bank, log_dir=str(tmp_path / "resumed"))
    finally:
        protocols.split_contiguous = orig_split
    run_data_incremental(
        cfg, bundle, bank, log_dir=str(tmp_path / "resumed"), resume=True
    )

    full = _tb_scalars(tmp_path / "full" / cfg.run_name())
    resumed = _tb_scalars(tmp_path / "resumed" / cfg.run_name())
    assert set(full) == set(resumed)
    for tag in full:
        assert full[tag] == resumed[tag], f"scalar stream differs at {tag}"


def test_progress_file_corruption_is_tolerated(tmp_path):
    """A truncated/corrupt progress.json must not abort the run — resume
    degrades to a from-scratch run (code-review finding r2)."""
    from incremental_multimodal_medical_learning_ii_tpu.engine.checkpoint import (
        load_aux,
        load_progress,
        save_progress,
    )

    save_progress(tmp_path, 3, {"state_name": "train_state_unit3"})
    assert load_progress(tmp_path) == 3
    assert load_aux(tmp_path)["state_name"] == "train_state_unit3"

    (tmp_path / "progress.json").write_text('{"completed": 3, "aux": {tru')
    assert load_progress(tmp_path) == 0
    assert load_aux(tmp_path) is None
    # no stray tmp files from the atomic write
    assert not list(tmp_path.glob("*.tmp"))


@pytest.mark.slow  # two orbax checkpoints + a full protocol run (~11s)
def test_unit_checkpoints_are_staged_and_cleaned(tmp_path):
    """_save_unit stages per-unit checkpoint dirs and progress.json names
    the one it committed; older staged dirs are removed (finding r3)."""
    cfg = data_incremental_config(
        batch_size=64, eval_batch_size=64, epochs=1, parts=2, lr=1e-3,
    )
    run_data_incremental(cfg, _bundle(), _bank(), log_dir=str(tmp_path))
    run_dir = tmp_path / cfg.run_name()
    from incremental_multimodal_medical_learning_ii_tpu.engine.checkpoint import load_aux

    aux = load_aux(run_dir)
    assert aux["state_name"] == "train_state_unit2"
    assert (run_dir / "train_state_unit2").exists()
    assert not (run_dir / "train_state_unit1").exists()  # cleaned
    assert (run_dir / "train_state").exists()  # final artifact for serving


def test_load_aux_state_is_all_or_nothing():
    """A partially-valid aux dict must not half-restore the trainer
    (finding r6)."""
    from incremental_multimodal_medical_learning_ii_tpu.engine.trainer import Trainer
    from incremental_multimodal_medical_learning_ii_tpu.utils.config import joint_config

    cfg = joint_config(batch_size=64, eval_batch_size=64, epochs=1, lr=1e-3)
    trainer = Trainer(cfg, _bank())
    before = trainer.aux_state()
    bad = dict(before)
    del bad["val_f1_rows"]  # missing field discovered only mid-restore before
    with pytest.raises(KeyError):
        trainer.load_aux_state(bad)
    assert trainer.aux_state() == before  # nothing was applied


@pytest.mark.slow
def test_auxless_resume_reseeds_lr_step(tmp_path):
    """Degraded (aux-unreadable) resume: the optimizer count restores with
    the checkpoint, so the host-side LR mirror must continue from
    state.step — not restart the train/LR stream at sched(1)."""
    import json

    import jax

    from incremental_multimodal_medical_learning_ii_tpu.engine.protocols import (
        _maybe_resume,
    )
    from incremental_multimodal_medical_learning_ii_tpu.engine.trainer import Trainer
    from incremental_multimodal_medical_learning_ii_tpu.evaluation.tb import TBWriter

    cfg = data_incremental_config(
        batch_size=64, eval_batch_size=64, epochs=1, parts=3, lr=1e-3,
    )
    bank = _bank()
    run_data_incremental(cfg, bundle := _bundle(), bank, log_dir=str(tmp_path))
    run_dir = tmp_path / cfg.run_name()
    assert load_progress(run_dir) == 3

    # corrupt the aux payload but keep completed + the checkpoint pointer
    progress = json.loads((run_dir / "progress.json").read_text())
    state_name = progress["aux"]["state_name"]
    progress["aux"] = {"state_name": state_name, "py_step": "corrupt"}
    (run_dir / "progress.json").write_text(json.dumps(progress))

    trainer = Trainer(cfg, bank)
    assert trainer._py_step == 0
    completed, aux = _maybe_resume(trainer, TBWriter(str(run_dir)), resume=True)
    assert completed == 3 and aux is None
    restored_step = int(jax.device_get(trainer.state.step))
    assert restored_step > 0
    assert trainer._py_step == restored_step
