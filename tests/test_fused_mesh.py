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


@pytest.mark.slow
def test_fused_unit_eval_fold_mesh_matches_single():
    """The eval-folded unit program (train scan + val/test eval scans in one
    dispatch) under an 8-device mesh: same results as single-device."""
    cfg = joint_config(
        mode="data-inc", parts=1, batch_size=64, eval_batch_size=64,
        epochs=2, lr=1e-3, fused_unit=True, shuffle_train=False,
    )
    bank = build_prompt_bank(
        synthetic_encode_fn(), create_prompts(CHEXPERT_COMPETITION_TASKS),
        CHEXPERT_COMPETITION_TASKS,
    )
    train = synthetic_dataset(256, seed=1)
    val = synthetic_dataset(128, seed=2)
    test = synthetic_dataset(128, seed=3)

    def run(mesh):
        t = Trainer(cfg, bank, mesh=mesh)
        assert t.unit_fusible(train)
        t.train_unit(train, [0.0, 0.0], part=1, actual_task=1,
                     eval_data=(val, test))
        assert t._pending_eval[0][0] is val and t._pending_eval[1][0] is test
        mv = t.validate(val, 1, 1)
        mt = t.test(test, 1, 1)
        assert not t._pending_eval  # both consumed one-shot
        return t, mv, mt

    t1, mv1, mt1 = run(None)
    t2, mv2, mt2 = run(create_mesh(8))
    k1 = np.asarray(jax.device_get(t1.state.params["image"]["dense1"]["kernel"]))
    k2 = np.asarray(jax.device_get(t2.state.params["image"]["dense1"]["kernel"]))
    np.testing.assert_allclose(k1, k2, rtol=1e-4, atol=1e-5)
    assert mv1["auroc_macro"] == pytest.approx(mv2["auroc_macro"], abs=2e-3)
    assert mt1["auroc_macro"] == pytest.approx(mt2["auroc_macro"], abs=2e-3)
