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


@pytest.mark.fast
def test_class_inc_heatmap_row_labels(monkeypatch):
    """Forgetting-heatmap row i must be labeled with the class trained at
    task i (order[i-1]) — for n_tasks < 5 the labels are the FIRST n_tasks
    classes of tasks_order (a plain [-len:] tail would attribute each row
    to an untrained disease), while a resume that kept only trailing rows
    still gets the trailing labels."""
    from incremental_multimodal_medical_learning_ii_tpu.engine.trainer import Trainer
    from incremental_multimodal_medical_learning_ii_tpu.evaluation import plots
    from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
        ExperimentConfig,
    )

    cfg = ExperimentConfig(mode="class-pos", epochs=1, batch_size=32)
    bank = build_prompt_bank(
        synthetic_encode_fn(), create_prompts(CHEXPERT_COMPETITION_TASKS),
        CHEXPERT_COMPETITION_TASKS,
    )
    trainer = Trainer(cfg, bank)
    captured = []
    monkeypatch.setattr(
        plots, "heatmap_figure",
        lambda data, rows, cols, title, metric: captured.append((rows, cols)),
    )
    monkeypatch.setattr(trainer.writer, "add_figure", lambda *a, **kw: None)
    names = trainer.class_names
    order = [4, 2, 0, 1, 3]
    rows3 = [np.zeros(5)] * 3

    # 3-task run: rows are the 3 TRAINED classes, in training order
    trainer._emit_heatmaps_if_due(
        "test", "class-pos", epoch=3, epochs=10, tasks_order=order,
        f1_rows=rows3, auroc_rows=rows3, final_unit=3,
    )
    rows, cols = captured[-1]
    assert rows == [names[4], names[2], names[0]]
    assert cols == [names[i] for i in order]

    # 5-task resume that kept only the last 2 rows: trailing labels
    captured.clear()
    trainer._emit_heatmaps_if_due(
        "test", "class-pos", epoch=5, epochs=10, tasks_order=order,
        f1_rows=rows3[:2], auroc_rows=rows3[:2], final_unit=5,
    )
    rows, cols = captured[-1]
    assert rows == [names[1], names[3]]

    # reference shape: 5 tasks, 5 rows -> full order (parity unchanged)
    captured.clear()
    trainer._emit_heatmaps_if_due(
        "test", "class-pos", epoch=5, epochs=10, tasks_order=order,
        f1_rows=[np.zeros(5)] * 5, auroc_rows=[np.zeros(5)] * 5, final_unit=None,
    )
    rows, cols = captured[-1]
    assert rows == [names[i] for i in order]
