"""On-device quick AUROC and CL-monitoring TB tags."""

import pytest
import numpy as np

from incremental_multimodal_medical_learning_ii_tpu.data.store import synthetic_dataset
from incremental_multimodal_medical_learning_ii_tpu.engine.protocols import (
    DataBundle,
    run_data_incremental,
)
from incremental_multimodal_medical_learning_ii_tpu.engine.trainer import Trainer
from incremental_multimodal_medical_learning_ii_tpu.text.bank import (
    build_prompt_bank,
    synthetic_encode_fn,
)
from incremental_multimodal_medical_learning_ii_tpu.text.prompts import create_prompts
from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
    CHEXPERT_COMPETITION_TASKS,
    data_incremental_config,
    joint_config,
)


def _bank():
    return build_prompt_bank(
        synthetic_encode_fn(), create_prompts(CHEXPERT_COMPETITION_TASKS),
        CHEXPERT_COMPETITION_TASKS,
    )


@pytest.mark.slow
def test_quick_auroc_matches_sklearn():
    from sklearn.metrics import roc_auc_score

    cfg = joint_config(batch_size=64, eval_batch_size=64, epochs=1, lr=1e-3)
    trainer = Trainer(cfg, _bank())
    ds = synthetic_dataset(256, seed=5)
    quick = trainer.quick_auroc(ds)
    assert quick.shape == (5,)

    y_true, _, y_score = trainer._eval_pass(ds, 1, log_loss_prefix=None)
    for c in range(5):
        expected = roc_auc_score(y_true[:, c], y_score[:, c])
        np.testing.assert_allclose(quick[c], expected, atol=1e-5)


@pytest.mark.slow
def test_cl_monitoring_tags_written(tmp_path):
    cfg = data_incremental_config(
        batch_size=64, eval_batch_size=64, epochs=2, parts=2, lr=1e-3,
        continual_learning="myCL", threshold=0.1, threshold_scheduling=True,
        adder=0.01, plot_figures="off",
    )
    bundle = DataBundle(
        train=synthetic_dataset(256, seed=1),
        val=synthetic_dataset(128, seed=2),
        test=synthetic_dataset(128, seed=3),
    )
    run_data_incremental(cfg, bundle, _bank(), log_dir=str(tmp_path))

    from tensorboard.backend.event_processing.event_accumulator import EventAccumulator

    acc = EventAccumulator(str(tmp_path / cfg.run_name()))
    acc.Reload()
    tags = acc.Tags()["scalars"]
    for tag in (
        "monitor-resets/threshold-scheduling",
        "monitor-resets/resets",
        "monitor-resets/updates",
        "monitor-resets/percentage resets",
    ):
        assert tag in tags, f"missing {tag}: {tags}"
