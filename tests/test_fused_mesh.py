"""Fused-epoch / fused-eval on a mesh: numerically equivalent to the
single-device fused path (same key -> same permutation -> same batches)."""

import numpy as np
import pytest

import jax

from incremental_multimodal_medical_learning_ii_tpu.data.store import synthetic_dataset
from incremental_multimodal_medical_learning_ii_tpu.engine.trainer import Trainer
from incremental_multimodal_medical_learning_ii_tpu.parallel.mesh import create_mesh
from incremental_multimodal_medical_learning_ii_tpu.text.bank import (
    build_prompt_bank,
    synthetic_encode_fn,
)
from incremental_multimodal_medical_learning_ii_tpu.text.prompts import create_prompts
from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
    CHEXPERT_COMPETITION_TASKS,
    joint_config,
)


@pytest.mark.slow
def test_fused_epoch_mesh_matches_single():
    cfg = joint_config(batch_size=64, eval_batch_size=64, epochs=1, lr=1e-3)
    bank = build_prompt_bank(
        synthetic_encode_fn(), create_prompts(CHEXPERT_COMPETITION_TASKS),
        CHEXPERT_COMPETITION_TASKS,
    )
    train = synthetic_dataset(256, seed=1)
    val = synthetic_dataset(128, seed=2)

    t1 = Trainer(cfg, bank)
    assert t1._fused_epoch is not None
    t1.train(train, epoch=1)
    m1 = t1.validate(val, 1, 1)

    mesh = create_mesh(8)
    assert int(np.prod(mesh.devices.shape)) == 8, "expected an 8-device CPU mesh"
    t2 = Trainer(cfg, bank, mesh=mesh)
    assert t2._fused_epoch is not None
    t2.train(train, epoch=1)
    m2 = t2.validate(val, 1, 1)

    k1 = np.asarray(jax.device_get(t1.state.params["image"]["dense1"]["kernel"]))
    k2 = np.asarray(jax.device_get(t2.state.params["image"]["dense1"]["kernel"]))
    np.testing.assert_allclose(k1, k2, rtol=1e-4, atol=1e-5)
    assert m1["auroc_macro"] == pytest.approx(m2["auroc_macro"], abs=2e-3)
