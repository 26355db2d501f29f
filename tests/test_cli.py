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


def test_extract_cli_multi_host(tmp_path, capsys):
    """--num-hosts/--host-index shard the image list across hosts; two hosts
    run as SIMULTANEOUS subprocesses against ONE output root (the actual
    deployment shape — a file-level race in the store/merge glue would
    surface here), then the per-host shard dirs glue back (prepare_data)
    into exactly the single-host result."""
    import subprocess
    import sys

    import numpy as np

    from incremental_multimodal_medical_learning_ii_tpu.cli.extract_embeddings import (
        main as extract_main,
    )
    from incremental_multimodal_medical_learning_ii_tpu.cli.prepare_data import (
        main as prepare_main,
    )
    from incremental_multimodal_medical_learning_ii_tpu.data.store import EmbeddingDataset

    common = ["--synthetic", "10", "--batch-size", "4", "--size", "64",
              "--pad-to", "512"]
    extract_main(common + ["--out-dir", str(tmp_path / "single")])

    def host_cmd(h):
        args = common + [
            "--out-dir", str(tmp_path / "multi"),
            "--num-hosts", "2", "--host-index", str(h),
        ]
        # subprocess must pin the CPU backend itself: the axon sitecustomize
        # force-sets jax_platforms after env parsing (CLAUDE.md)
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu');"
            "from incremental_multimodal_medical_learning_ii_tpu.cli."
            f"extract_embeddings import main; main({args!r})"
        )
        return [sys.executable, "-c", code]

    procs = [
        subprocess.Popen(host_cmd(h), cwd="/root/repo",
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for h in range(2)
    ]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for h, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"host {h} failed:\n{out}"
    capsys.readouterr()
    prepare_main([
        "--shards", str(tmp_path / "multi" / "host-0"), str(tmp_path / "multi" / "host-1"),
        "--out", str(tmp_path / "merged.npz"),
    ])
    assert "10 rows" in capsys.readouterr().out
    single = EmbeddingDataset.load(tmp_path / "single" / "dataset.npz")
    merged = EmbeddingDataset.load(tmp_path / "merged.npz")
    np.testing.assert_allclose(merged.embeddings, single.embeddings, atol=1e-6)
    np.testing.assert_array_equal(merged.labels, single.labels)

    import pytest as _pytest

    with _pytest.raises(SystemExit, match="host-index"):
        extract_main(common + ["--out-dir", str(tmp_path / "bad"),
                               "--num-hosts", "2", "--host-index", "2"])


def test_sweep_cli(tmp_path, capsys):
    from incremental_multimodal_medical_learning_ii_tpu.cli.sweep import main

    main([
        "--synthetic", "--epochs", "1", "--batch-size", "256",
        "--lrs", "0.001", "0.01", "--optims", "adam",
        "--adapters", "dense", "--prompt-modes", "mean",
        "--log-dir", str(tmp_path),
    ])
    out = capsys.readouterr().out
    assert out.count("val-AUROC-macro=") == 2


def test_sweep_cli_mixed_prompt_modes(tmp_path, capsys):
    """'single' and 'mean' grid points use DIFFERENT prompt banks (the bank
    cache keys on the prompt set; a shared bank would score one of them
    against the wrong prompts)."""
    from incremental_multimodal_medical_learning_ii_tpu.cli.sweep import main

    main([
        "--synthetic", "--epochs", "1", "--batch-size", "256",
        "--lrs", "0.001", "--optims", "adam", "--adapters", "dense",
        "--prompt-modes", "single", "mean",
        "--log-dir", str(tmp_path),
    ])
    out = capsys.readouterr().out
    assert out.count("val-AUROC-macro=") == 2
    lines = [l for l in out.splitlines() if "val-AUROC-macro=" in l]
    vals = [float(l.split("val-AUROC-macro=")[1]) for l in lines]
    # different banks -> different scores (equal values would indicate the
    # single-prompt bank leaked into the mean grid point)
    assert vals[0] != vals[1]
    assert "best: AUROC" in out


def test_dataset_stats_cli(tmp_path, capsys):
    import pandas as pd

    df = pd.DataFrame({
        "Path": ["a.jpg", "b.jpg", "c.jpg"],
        "Atelectasis": [1, 0, 0], "Cardiomegaly": [0, 0, 0],
        "Consolidation": [0, 0, 0], "Edema": [0, 0, 0],
        "Pleural Effusion": [1, 0, 0],
    })
    csv = tmp_path / "labels.csv"
    df.to_csv(csv, index=False)
    png = tmp_path / "patterns.png"

    from incremental_multimodal_medical_learning_ii_tpu.cli.dataset_stats import main

    main(["--csv", str(csv), "--patterns-png", str(png)])
    out = capsys.readouterr().out
    assert "Atelectasis 1 0.333333 2 0.666667" in out  # count_pos_neg_V2.py:50-51
    assert "2 distinct patterns over 3 rows" in out
    assert png.exists() and png.stat().st_size > 0


def test_ground_cli_smoke(tmp_path, capsys, rng):
    """Phrase-grounding CLI over random weights: score + map + overlay PNG."""
    from PIL import Image

    img_path = tmp_path / "cxr.png"
    Image.fromarray((rng.random((120, 100)) * 255).astype("uint8"), "L").save(img_path)

    from incremental_multimodal_medical_learning_ii_tpu.cli.ground import main

    out_png = tmp_path / "overlay.png"
    out_map = tmp_path / "map.npy"
    main([
        "--image", str(img_path), "--query", "pleural effusion",
        "--random-weights", "--resize", "64", "--crop", "64",
        "--out", str(out_png), "--save-map", str(out_map),
    ])
    out = capsys.readouterr().out
    assert "similarity score:" in out
    assert out_png.exists() and out_png.stat().st_size > 0
    import numpy as np

    m = np.load(out_map)
    assert m.shape == (120, 100)  # back-projected to original image geometry
