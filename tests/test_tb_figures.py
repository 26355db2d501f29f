"""Figure tags in the TensorBoard event files (reference schema)."""

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
    CHEXPERT_COMPETITION_TASKS,
    joint_config,
)


import pytest

pytestmark = pytest.mark.slow


def test_joint_run_emits_reference_figure_tags(tmp_path):
    rng = np.random.default_rng(7)
    dirs = rng.normal(size=(5, 128)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    # t-SNE subsets need single-positive and all-0/all-1 rows
    eye = np.eye(5, dtype=np.float32)
    labels = np.concatenate(
        [np.tile(eye, (8, 1)), np.zeros((12, 5), np.float32), np.ones((12, 5), np.float32)]
    )
    embs = labels @ dirs + 0.3 * rng.normal(size=(len(labels), 128)).astype(np.float32)
    from incremental_multimodal_medical_learning_ii_tpu.data.store import EmbeddingDataset

    train = EmbeddingDataset(embs.astype(np.float32), labels)
    bundle = DataBundle(
        train=train,
        val=synthetic_dataset(96, seed=2, class_directions=dirs),
        test=synthetic_dataset(96, seed=3, class_directions=dirs),
    ).with_tsne_subsets()
    assert len(bundle.tsne_multiclass) == 40
    assert len(bundle.tsne_sani_malati) == 24

    cfg = joint_config(batch_size=32, eval_batch_size=32, epochs=1, lr=1e-3)
    bank = build_prompt_bank(
        synthetic_encode_fn(), create_prompts(CHEXPERT_COMPETITION_TASKS),
        CHEXPERT_COMPETITION_TASKS,
    )
    run_zero_joint(cfg, bundle, bank, log_dir=str(tmp_path))

    from tensorboard.backend.event_processing.event_accumulator import EventAccumulator

    acc = EventAccumulator(str(tmp_path / cfg.run_name()), size_guidance={"images": 0})
    acc.Reload()
    image_tags = set(acc.Tags()["images"])
    for tag in (
        "test ROC Curve/Curve for Class 0",
        "test Precision-Recall Curve/Curve for Class 4",
        "test Class-metric/Class Accuracy",
        "test Class-metric/Class Precision",
        "test Class-metric/Class Recall",
        "visual-embeddings/cosine-similarity Heatmap text-embs",
        "visual-embeddings/PCA text-embs",
        "visual-embeddings/t-SNE text-embs",
        "tsne-chexpert/t-SNE 5x1000",
        "tsne-chexpert/t-SNE sani-malati",
        "test/joint train/F1 score Heatmap",
        "test/joint train/AUROC score Heatmap",
        "val/joint train/F1 score Heatmap",
    ):
        assert any(t.startswith(tag) for t in image_tags), f"missing figure tag {tag}: {sorted(image_tags)}"


def test_label_pattern_frequency_figure():
    """faq-patterns bar chart (count_pos_neg_V2.py:20-47): '+'-joined
    abbreviations of positive classes, frequency-sorted."""
    from collections import Counter

    from incremental_multimodal_medical_learning_ii_tpu.evaluation.plots import (
        label_pattern_frequency_figure,
    )
    from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
        CHEXPERT_COMPETITION_TASKS,
    )

    counts = Counter({
        (0, 0, 0, 0, 0): 6,
        (1, 0, 0, 0, 1): 3,
        (0, 1, 0, 0, 0): 1,
    })
    fig = label_pattern_frequency_figure(counts, CHEXPERT_COMPETITION_TASKS)
    ax = fig.axes[0]
    ticklabels = [t.get_text() for t in ax.get_xticklabels()]
    assert ticklabels == ["", "ATEL+PLEF", "CMG"]  # frequency order
    heights = [p.get_height() for p in ax.patches]
    np.testing.assert_allclose(heights, [0.6, 0.3, 0.1])


def test_label_pattern_frequency_figure_guards_and_custom_names():
    from collections import Counter

    from incremental_multimodal_medical_learning_ii_tpu.evaluation.plots import (
        label_pattern_frequency_figure,
    )

    with pytest.raises(ValueError, match="pattern of length"):
        label_pattern_frequency_figure(Counter({(1, 0): 1}), ["A", "B", "C"])
    fig = label_pattern_frequency_figure(
        Counter({(1, 0, 1): 2, (0, 0, 0): 1}), ["Nodule", "Mass", "Fibrosis"]
    )
    labels = [t.get_text() for t in fig.axes[0].get_xticklabels()]
    assert labels == ["NODU+FIBR", ""]
