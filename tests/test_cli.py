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
    today (tiny synthetic data, assertions skipped) — and --trace-dir
    actually captures a device trace (it was once accepted but ignored)."""
    from incremental_multimodal_medical_learning_ii_tpu.cli.reproduce import main

    trace_dir = tmp_path / "trace"
    main(["--dry-run", "--log-dir", str(tmp_path),
          "--gates", "zero-shot", "--trace-dir", str(trace_dir)])
    out = capsys.readouterr().out
    assert "zero-shot: test AUROC-macro" in out
    assert "dry-run OK" in out
    assert any(f.is_file() for f in trace_dir.rglob("*")), \
        "no trace captured under --trace-dir"

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


def test_full_lifecycle_extract_train_classify(tmp_path, capsys, rng):
    """The complete user journey through CLI surfaces ONLY — the path a
    reference user follows after docs/MIGRATION.md:

        raw PNGs + CheXpert-format CSV
          -> cli.extract_embeddings (real torch BioViL checkpoint, bf16)
          -> {train,val,test}.npz
          -> cli.zero_joint_bounds --data-dir  (joint train; checkpoint
             lands in the TB run dir, reference run-name format)
          -> cli.classify --adapter-checkpoint on the SAME raw test images

    Cross-surface invariant: classify's scores equal scoring the
    pre-extracted test embeddings through the restored adapters with the
    same bank/scorer (checkpoint restore, bank identity, and the two
    encode paths all have to agree for this to hold)."""
    import sys

    import torch
    from PIL import Image

    sys.path.insert(0, "tests")
    from torch_biovil_fixture import TorchBioViLImage

    torch.manual_seed(0)
    ckpt = tmp_path / "biovil.pt"
    torch.save(TorchBioViLImage().state_dict(), ckpt)

    # --- raw dataset: PNGs + CheXpert-format CSVs (Path + 5 label cols) ---
    import pandas as pd

    from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
        CHEXPERT_COMPETITION_TASKS,
    )

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    splits = {"train": 12, "val": 6, "test": 6}
    csvs = {}
    k = 0
    for split, n in splits.items():
        rows = []
        for _ in range(n):
            name = f"cxr{k}.png"
            Image.fromarray(
                (rng.random((90, 80)) * 255).astype(np.uint8), "L"
            ).save(img_dir / name)
            rows.append([name] + list((rng.random(5) < 0.4).astype(float)))
            k += 1
        csvs[split] = tmp_path / f"{split}.csv"
        pd.DataFrame(rows, columns=["Path"] + list(CHEXPERT_COMPETITION_TASKS)).to_csv(
            csvs[split], index=False
        )

    # --- 1. extraction CLI per split -> data_dir/{split}.npz ---
    import shutil

    from incremental_multimodal_medical_learning_ii_tpu.cli.extract_embeddings import (
        main as extract_main,
    )

    data_dir = tmp_path / "emb"
    data_dir.mkdir()
    for split, n in splits.items():
        out = tmp_path / f"raw-{split}"
        extract_main([
            "--csv", str(csvs[split]), "--img-dir", str(img_dir) + "/",
            "--biovil-checkpoint", str(ckpt), "--out-dir", str(out),
            "--batch-size", "4", "--size", "64", "--pad-to", "512",
        ])
        assert f"extracted {n} embeddings" in capsys.readouterr().out
        shutil.copy(out / "dataset.npz", data_dir / f"{split}.npz")

    # --- 2. joint training CLI over the extracted embeddings ---
    from incremental_multimodal_medical_learning_ii_tpu.cli.zero_joint_bounds import (
        main as train_main,
    )

    logs = tmp_path / "logs"
    train_main([
        "--data-dir", str(data_dir), "--epochs", "2", "--batch-size", "8",
        "--lr", "0.01", "--log-dir", str(logs),
    ])
    out = capsys.readouterr().out
    assert "test_ep2" in out
    run_dirs = [d for d in (logs / "zero-and-joint").iterdir() if d.is_dir()]
    assert len(run_dirs) == 1  # reference-format run dir with the checkpoint

    # --- 3. classify CLI with the trained checkpoint on raw test images ---
    from incremental_multimodal_medical_learning_ii_tpu.cli.classify import (
        main as classify_main,
    )

    test_imgs = [str(img_dir / f"cxr{k - splits['test'] + i}.png") for i in range(2)]
    classify_main(test_imgs + [
        "--biovil-checkpoint", str(ckpt), "--adapter-checkpoint", str(run_dirs[0]),
        "--batch-size", "2", "--size", "64", "--pad-to", "512",
    ])
    lines = [l for l in capsys.readouterr().out.splitlines()
             if l.startswith(str(img_dir))]
    assert len(lines) == 2
    cli_scores = np.array([[float(v) for v in l.split(",")[1:]] for l in lines])
    assert cli_scores.shape == (2, 5)
    assert ((cli_scores >= 0) & (cli_scores <= 1)).all()

    # --- 4. cross-surface invariant: same scores from the pre-extracted
    # embeddings through the restored checkpoint + the same bank/scorer ---
    import jax

    from incremental_multimodal_medical_learning_ii_tpu.data.store import (
        EmbeddingDataset,
    )
    from incremental_multimodal_medical_learning_ii_tpu.engine.checkpoint import (
        restore_checkpoint,
    )
    from incremental_multimodal_medical_learning_ii_tpu.engine.steps import (
        init_train_state,
    )
    from incremental_multimodal_medical_learning_ii_tpu.models.adapters import (
        AdapterPair,
    )
    from incremental_multimodal_medical_learning_ii_tpu.objectives.scorer import (
        apply_text_adapter_to_bank,
        score_embeddings,
    )
    from incremental_multimodal_medical_learning_ii_tpu.text.bank import (
        build_prompt_bank,
        synthetic_encode_fn,
    )
    from incremental_multimodal_medical_learning_ii_tpu.text.prompts import (
        create_prompts,
    )
    from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
        joint_config,
    )

    cfg = joint_config()
    pair = AdapterPair(cfg.adapter, cfg.shared, cfg.image_adapter, cfg.text_adapter)
    template, _ = init_train_state(pair, pair.init(jax.random.PRNGKey(0)), cfg)
    params = restore_checkpoint(run_dirs[0], template).params
    # seed 27: both CLIs' synthetic-bank fallback encodes with
    # synthetic_encode_fn(seed=cfg.seed) (cli/common.py::build_bank)
    bank = build_prompt_bank(
        synthetic_encode_fn(seed=cfg.seed),
        create_prompts(CHEXPERT_COMPETITION_TASKS),
        CHEXPERT_COMPETITION_TASKS,
    )
    embs = EmbeddingDataset.load(data_dir / "test.npz").embeddings[:2]
    x = pair.apply_image(params, embs)
    b = apply_text_adapter_to_bank(pair.apply_text, params, bank)
    ref_scores = np.asarray(score_embeddings(
        x, b, cfg.prompt_mode, cfg.train_logit_diff, cfg.pred_logit_diff
    ).scores)
    # both encode paths are bf16 but compile as different programs (batch 4
    # extraction vs batch 2 serving), so allow conv-rounding-level slack
    np.testing.assert_allclose(cli_scores, ref_scores, atol=2e-2)
    assert np.abs(cli_scores - ref_scores).max() < 2e-2
