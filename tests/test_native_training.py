"""Training straight from the native mmap store."""

import numpy as np
import pytest

from incremental_multimodal_medical_learning_ii_tpu.data.native import (
    NativeEmbeddingStore,
    native_available,
)
from incremental_multimodal_medical_learning_ii_tpu.data.store import synthetic_dataset
from incremental_multimodal_medical_learning_ii_tpu.engine.trainer import Trainer
from incremental_multimodal_medical_learning_ii_tpu.text.bank import (
    build_prompt_bank,
    synthetic_encode_fn,
)
from incremental_multimodal_medical_learning_ii_tpu.text.prompts import create_prompts
from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
    CHEXPERT_COMPETITION_TASKS,
    joint_config,
)

pytestmark = pytest.mark.skipif(not native_available(), reason="no g++ toolchain")


@pytest.mark.slow
def test_trainer_runs_on_native_store(tmp_path):
    ds = synthetic_dataset(300, seed=0)
    store = NativeEmbeddingStore.write(tmp_path / "train.embstore", ds)
    cfg = joint_config(batch_size=64, eval_batch_size=64, epochs=1, lr=1e-3)
    bank = build_prompt_bank(
        synthetic_encode_fn(), create_prompts(CHEXPERT_COMPETITION_TASKS),
        CHEXPERT_COMPETITION_TASKS,
    )
    trainer = Trainer(cfg, bank)
    trainer.train(store, epoch=1)
    assert int(trainer.state.step) == 5  # ceil(300/64)
    metrics = trainer.validate(store, 1, 1)
    assert np.isfinite(metrics["auroc_macro"])
    store.close()
