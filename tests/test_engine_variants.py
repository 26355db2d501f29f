"""Less-traveled reference configurations, end-to-end."""

import pytest
import numpy as np

from incremental_multimodal_medical_learning_ii_tpu.data.store import synthetic_dataset
from incremental_multimodal_medical_learning_ii_tpu.engine.protocols import (
    DataBundle,
    run_zero_joint,
)
from incremental_multimodal_medical_learning_ii_tpu.text.bank import (
    build_prompt_bank,
    synthetic_encode_fn,
)
from incremental_multimodal_medical_learning_ii_tpu.text.prompts import create_prompts
from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
    CHEXPERT_COMPETITION_TASKS as TASKS,
    joint_config,
)


def _bundle(n=512):
    rng = np.random.default_rng(7)
    dirs = rng.normal(size=(5, 128)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    return DataBundle(
        train=synthetic_dataset(n, seed=1, class_directions=dirs),
        val=synthetic_dataset(256, seed=2, class_directions=dirs),
        test=synthetic_dataset(256, seed=3, class_directions=dirs),
    )


def _bank(cfg):
    prompts = create_prompts(
        TASKS, single_prompt=cfg.single_prompt, new_prompts=cfg.new_prompts,
        train_logit_diff=cfg.train_logit_diff, seed=cfg.seed,
    )
    return build_prompt_bank(
        synthetic_encode_fn(), prompts, TASKS, train_logit_diff=cfg.train_logit_diff
    )


def _run(cfg):
    return run_zero_joint(cfg, _bundle(), _bank(cfg))


def test_only_text_adapter_trains():
    """Gradient flows only through the bank adaptation (Trainer.py:143-154)."""
    cfg = joint_config(
        batch_size=128, eval_batch_size=128, epochs=2, lr=1e-2,
        image_adapter=False, text_adapter=True,
    )
    res = _run(cfg)
    t = res["trainer"]
    assert set(t.state.params) == {"text"}
    assert res["test_ep2"]["auroc_macro"] > 0.5


@pytest.mark.slow
def test_only_image_adapter_trains():
    cfg = joint_config(
        batch_size=128, eval_batch_size=128, epochs=2, lr=1e-3,
        image_adapter=True, text_adapter=False,
    )
    res = _run(cfg)
    assert set(res["trainer"].state.params) == {"image"}
    assert res["test_ep2"]["auroc_macro"] > 0.6


@pytest.mark.slow
def test_change_labels_mode():
    """Loss trains on {-1,+1} labels (BCE with out-of-domain targets — the
    reference's experimental mode, Trainer.py:1707-1728); metrics stay on
    the original {0,1} labels (Trainer.py:840-857)."""
    cfg = joint_config(
        batch_size=128, eval_batch_size=128, epochs=3, lr=1e-2, change_labels=True
    )
    res = _run(cfg)
    m = res["test_ep3"]
    assert 0.0 <= m["auroc_macro"] <= 1.0
    assert np.isfinite(m["f1_macro"])


@pytest.mark.slow
def test_single_prompt_mode():
    cfg = joint_config(
        batch_size=128, eval_batch_size=128, epochs=1, lr=1e-3, prompt_mode="single"
    )
    res = _run(cfg)
    assert "test_ep1" in res


@pytest.mark.slow
def test_new_prompts_max_mode():
    """Compositional bank (10 pos / 4 neg, ragged counts) under MAX reduction."""
    cfg = joint_config(
        batch_size=128, eval_batch_size=128, epochs=1, lr=1e-3,
        new_prompts=True, prompt_mode="max",
    )
    bank = _bank(cfg)
    assert bank.pos.shape[1] == 10 and int(bank.neg_count[0]) == 4
    res = run_zero_joint(cfg, _bundle(), bank)
    assert "test_ep1" in res


@pytest.mark.slow
def test_train_logit_pos_only():
    """TRAIN_LOGIT_DIFF=False: neg mirrors pos, logits are pos-only, and all
    predictions collapse to 0 (pos == neg, strict > tie-break)."""
    cfg = joint_config(
        batch_size=128, eval_batch_size=128, epochs=1, lr=1e-3, train_logit_diff=False
    )
    bank = _bank(cfg)
    np.testing.assert_array_equal(np.asarray(bank.pos), np.asarray(bank.neg))
    res = run_zero_joint(cfg, _bundle(), bank)
    assert res["test_ep1"]["f1_macro"] == 0.0  # all preds 0 (reference argmax tie)
    assert res["test_ep1"]["auroc_macro"] > 0.5  # scores still rank


@pytest.mark.slow
def test_sgd_optimizer_variant():
    cfg = joint_config(batch_size=128, eval_batch_size=128, epochs=1, lr=0.1, optim="sgd")
    res = _run(cfg)
    assert "test_ep1" in res
