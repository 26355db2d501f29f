"""CLI driver surface: every entry point runs end-to-end on synthetic data."""

import numpy as np
import pytest


pytestmark = pytest.mark.slow


def test_zero_joint_cli_zero_shot(tmp_path, capsys):
    from incremental_multimodal_medical_learning_ii_tpu.cli.zero_joint_bounds import main

    main([
        "--synthetic", "--epochs", "0", "--batch-size", "128",
        "--log-dir", str(tmp_path),
    ])
    out = capsys.readouterr().out
    assert "zero-shot-model-chex-mean-prompt-all-no-head" in out
    assert "test_zero" in out


def test_zero_joint_cli_train(tmp_path, capsys):
    from incremental_multimodal_medical_learning_ii_tpu.cli.zero_joint_bounds import main

    main([
        "--synthetic", "--epochs", "1", "--batch-size", "512", "--lr", "1e-3",
        "--log-dir", str(tmp_path), "--mesh-devices", "1",
    ])
    out = capsys.readouterr().out
    assert "joint-train-loss-standard-opt-adam" in out
    assert "test_ep1" in out


def test_data_incremental_cli(tmp_path, capsys):
    from incremental_multimodal_medical_learning_ii_tpu.cli.data_incremental import main

    main([
        "--synthetic", "--parts", "2", "--epochs", "1", "--batch-size", "512",
        "--lr", "1e-3", "--continual-learning", "myCL", "--threshold", "0.1",
        "--log-dir", str(tmp_path), "--mesh-devices", "1",
    ])
    out = capsys.readouterr().out
    assert "gradient-clipping-data-inc" in out
    assert "test_part2" in out


def test_class_incremental_cli(tmp_path, capsys):
    from incremental_multimodal_medical_learning_ii_tpu.cli.class_incremental import main

    main([
        "--synthetic", "--epochs", "1", "--batch-size", "512", "--lr", "1e-3",
        "--mode", "class-pos", "--no-more-labels",
        "--log-dir", str(tmp_path), "--mesh-devices", "1",
    ])
    out = capsys.readouterr().out
    assert "fine-tuning-class-pos" in out
    assert "test_task5" in out


def test_extract_cli(tmp_path, capsys):
    from incremental_multimodal_medical_learning_ii_tpu.cli.extract_embeddings import main

    main([
        "--synthetic", "12", "--out-dir", str(tmp_path / "emb"),
        "--batch-size", "4", "--size", "64", "--pad-to", "512",
    ])
    out = capsys.readouterr().out
    assert "extracted 12 embeddings" in out
    assert (tmp_path / "emb" / "dataset.npz").exists()

    from incremental_multimodal_medical_learning_ii_tpu.data.store import EmbeddingDataset

    ds = EmbeddingDataset.load(tmp_path / "emb" / "dataset.npz")
    assert ds.embeddings.shape == (12, 128)


def test_reproduce_dry_run(tmp_path, capsys):
    """The BASELINE.md parity-gate runbook command is executable end-to-end
    today (tiny synthetic data, assertions skipped)."""
    from incremental_multimodal_medical_learning_ii_tpu.cli.reproduce import main

    main(["--dry-run", "--log-dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert "zero-shot: test AUROC-macro" in out
    assert "joint: best test AUROC-macro" in out
    assert "class-inc curve:" in out
    assert "dry-run OK" in out
