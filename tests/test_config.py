import pytest

from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
    AdapterKind,
    ContinualLearning,
    ExperimentConfig,
    PromptMode,
    class_incremental_config,
    data_incremental_config,
    joint_config,
    zero_shot_config,
)


def test_joint_run_name_matches_reference_format():
    # Reference run dir: NUOVI_RISULTATI/zero-and-joint/joint-train-loss-standard
    # -opt-adam-lr-0.001-bs6144-ep10-chex-MAX-prompt-all-mlp-double-adapter...
    cfg = joint_config(
        lr=0.001, epochs=10, batch_size=6144, prompt_mode=PromptMode.MAX,
        folder_name="zero-and-joint",
    )
    assert cfg.run_name() == (
        "zero-and-joint/joint-train-loss-standard-opt-adam-lr-0.001-bs6144-ep10"
        "-chex-MAX-prompt-all-mlp-double-adapter-TRAIN-logit-DIFF-PRED-logit-POS"
    )


def test_zero_shot_run_name_matches_reference_format():
    # Reference: zero-shot-model-chex-mean-prompt-all-no-head
    cfg = zero_shot_config(folder_name="zero-and-joint")
    assert cfg.run_name() == (
        "zero-and-joint/zero-shot-model-chex-mean-prompt-all-no-head"
        "-TRAIN-logit-DIFF-PRED-logit-POS"
    )


def test_class_incremental_run_name():
    # Reference: fine-tuning-class-pos-neg-loss-standard-opt-sgd-lr-0.1-bs6144
    # -ep10-chex-mean-prompt-all-mlp-SHARED-adapter
    cfg = class_incremental_config(
        optim="sgd", lr=0.1, shared=True, more_labels=False,
        folder_name="stuff",
    )
    name = cfg.run_name()
    assert name.startswith(
        "stuff/fine-tuning-class-pos-neg-loss-standard-opt-sgd-lr-0.1-bs6144-ep10"
        "-chex-mean-prompt-all-mlp-SHARED-adapter"
    )
    assert name.endswith("-TRAIN-logit-DIFF-PRED-logit-POS-DD")


def test_data_incremental_run_name_contains_parts():
    cfg = data_incremental_config(parts=20)
    assert "-parts20" in cfg.run_name()
    assert "fine-tuning-data-inc" in cfg.run_name()


def test_gradient_clipping_prefix_with_cl():
    cfg = data_incremental_config(
        parts=5, continual_learning=ContinualLearning.MY_CL, threshold=0.01,
        threshold_scheduling=True, adder=0.001,
    )
    name = cfg.run_name()
    assert "gradient-clipping-data-inc" in name
    assert "-myCL-ratio-0.01" in name
    assert "-th-scheduled-0.001" in name


def test_shared_forces_both_adapters():
    cfg = ExperimentConfig(shared=True, image_adapter=False, text_adapter=False)
    assert cfg.image_adapter and cfg.text_adapter


def test_no_head_disables_adapters():
    cfg = ExperimentConfig(adapter=AdapterKind.NO_HEAD, epochs=0)
    assert not cfg.image_adapter and not cfg.text_adapter
    assert not cfg.trains_anything


def test_zero_shot_requires_no_head_or_shared():
    with pytest.raises(ValueError):
        ExperimentConfig(epochs=0, shared=False, image_adapter=True, text_adapter=True)


def test_only_text_adapter_typo_parity():
    # The reference misspells "adapter" on the incremental paths only
    # (Trainer.py:401/489 vs :288); run names must match byte-for-byte.
    joint = joint_config(image_adapter=False, text_adapter=True)
    assert "-only-text-adapter" in joint.run_name()
    inc = class_incremental_config(image_adapter=False, text_adapter=True)
    assert "-only-text-adapeter" in inc.run_name()
