"""Composed full-fidelity twin: raw pixels -> trained adapters, with ZERO
data-path patches on the reference side.

Every piece of the reference pipeline is twinned individually elsewhere
(image stack, extraction script, .pt tooling, text stack, Trainer, driver
scripts).  This test runs the pieces COMPOSED, exactly as the author did:

1. ``chexpert-get-embedding.py`` executes three times (train/val/test
   images + CSVs materialised at its committed literal Windows paths,
   the real vendored ``get_biovil_resnet`` loading the committed
   checkpoint path) and each final ``.pt`` artifact is renamed into
   ``Trainer._preprocessing``'s committed load paths — the author's one
   manual step.
2. ``ZERO_JOINT_BOUNDS.py`` executes with the REAL ``_preprocessing``
   (Trainer.py:204-256): its actual ``torch.load`` calls, its shuffling
   DataLoaders (single-batch at the committed 6144/1024 sizes, so every
   compared stream is permutation-invariant), and its real t-SNE subset
   filters.  The text tower is the REAL vendored CXR-BERT stack
   (random-init weights).  Nothing on the reference data path is patched;
   only SummaryWriter capture, playsound, and the torchvision primitives
   stand in.
3. The framework runs its OWN composed surfaces on the same artifacts:
   ``cli.zero_joint_bounds --data-dir`` consuming the extraction script's
   ``.pt`` files directly (``load_torch_pt``), with the same CXR-BERT
   weights via ``--cxr-bert-checkpoint``/``--cxr-bert-vocab``.

A seam bug between individually-twinned pieces (artifact dtype/order,
bank construction from a checkpoint file, `.pt` handoff into training)
cannot hide from this composition.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import matplotlib  # noqa: E402

matplotlib.use("Agg")

import pandas as pd  # noqa: E402
from PIL import Image  # noqa: E402

import reference_twin as rt  # noqa: E402
from reference_twin import (  # noqa: E402
    assert_stream_match,
    make_vendored_image_model,
    max_param_diff,
    mkflat_parent,
    patched_protocols,
    real_text_stack,
    run_reference_driver_script,
    run_reference_script,
    stream,
    torch_adapter_params,
)

from incremental_multimodal_medical_learning_ii_tpu.cli import (  # noqa: E402
    zero_joint_bounds,
)

pytestmark = pytest.mark.slow

RESNET_PT = (
    "C:\\Users\\mistr\\OneDrive\\Desktop\\mcs_only_local\\hi-ml\\"
    "hi-ml-multimodal\\src\\biovil_image_resnet50_proj_size_128.pt"
)
TEST_IMG_PREFIX = "C:\\Users\\mistr\\OneDrive\\Desktop\\real-chexpert\\"
EXTRACT_OUT = "new_embeddingDataset\\test\\embeddings_dataset_final.pt"
# Trainer._preprocessing's committed load paths for xrays_position="all"
# (ZERO_JOINT_BOUNDS.py:25), chex-competition branch
TRAINER_PT = {
    split: (
        f"embeddingDataset\\{split}\\512-chex-not-normalize\\"
        "embeddings_dataset_final_old.pt"
    )
    for split in ("train", "val", "test")
}

LOSS_ATOL = 5e-5  # real-BERT fp32 prompt embeddings agree to ~1.5e-7
METRIC_ATOL = 1e-3
PARAM_ATOL = 1e-4


def _labels(n=8):
    """Every class gets >=2 positives and >=3 negatives in 8 rows, so the
    eval AUROCs are non-degenerate."""
    y = np.zeros((n, 5), dtype=np.float32)
    for i in range(5):
        y[i, i] = 1.0
    y[5] = 1.0
    y[6] = 0.0
    y[7] = [1.0, 0.0, 1.0, 0.0, 1.0]
    return y


def _extract_split(cwd, rng, seed_shapes) -> None:
    """Write 8 PNGs + the CSV at the extraction script's committed literal
    paths, run the script, and return nothing — caller renames the
    artifact."""
    y = _labels()
    rows = []
    for i, (h, w) in enumerate(seed_shapes):
        name = f"img_{i}.png"
        Image.fromarray((rng.random((h, w)) * 255).astype(np.uint8), mode="L").save(
            cwd / (TEST_IMG_PREFIX + name)
        )
        rows.append({
            "Path": name,
            "Atelectasis": y[i, 0], "Cardiomegaly": y[i, 1],
            "Consolidation": y[i, 2], "Edema": y[i, 3],
            "Pleural Effusion": y[i, 4],
        })
    pd.DataFrame(rows).to_csv(cwd / (TEST_IMG_PREFIX + "test_labels.csv"),
                              index=False)
    run_reference_script("chexpert-get-embedding.py", cwd)


SHAPES = {
    "train": [(40, 64), (64, 40), (33, 47), (52, 44), (36, 36), (48, 32),
              (44, 56), (60, 36)],
    "val": [(38, 50), (50, 38), (42, 42), (34, 58), (58, 34), (46, 40),
            (40, 46), (54, 30)],
    "test": [(36, 62), (62, 36), (45, 45), (31, 53), (53, 31), (49, 37),
             (37, 49), (57, 41)],
}


def test_twin_full_pipeline_extract_then_train(tmp_path):
    model, _ = make_vendored_image_model(seed=11, model_type="resnet50")
    torch.save(model.state_dict(), tmp_path / RESNET_PT)
    mkflat_parent(tmp_path, EXTRACT_OUT)

    # ---- stage 1: the reference extraction script, three times ----
    rng = np.random.default_rng(21)
    for split in ("train", "val", "test"):
        _extract_split(tmp_path, rng, SHAPES[split])
        os.rename(tmp_path / EXTRACT_OUT, tmp_path / TRAINER_PT[split])

    # ---- stage 2: ZERO_JOINT_BOUNDS.py with the REAL _preprocessing ----
    mod = rt.load_reference_trainer_module()
    rt.configure_reference(mod)  # the committed Trainer.py:41-57 globals
    with real_text_stack(tmp_path, seed=3) as (_, engine):
        ref_rec, g, init_params, w_path = run_reference_driver_script(
            "ZERO_JOINT_BOUNDS.py", None, tmp_path,
            real_preprocessing_cwd=tmp_path,
        )
    assert len(stream(ref_rec.scalars, "train/Loss")) == 10  # 10 ep x 1 batch

    # ---- stage 3: the framework CLI on the SAME artifacts ----
    data_dir = tmp_path / "fw_data"
    data_dir.mkdir()
    for split in ("train", "val", "test"):
        shutil.copy(tmp_path / TRAINER_PT[split], data_dir / f"{split}.pt")
    text_ckpt = tmp_path / "cxr_bert_twin_state.pt"
    torch.save(engine.model.state_dict(), text_ckpt)

    with patched_protocols(init_params) as fw_rec:
        zero_joint_bounds.main([
            "--data-dir", str(data_dir),
            "--no-shuffle", "--mesh-devices", "1",
            "--log-dir", str(tmp_path / "fw_runs"),
            "--cxr-bert-checkpoint", str(text_ckpt),
            "--cxr-bert-vocab", str(tmp_path / "twin_vocab.txt"),
            "--cxr-bert-num-heads", str(engine.model.config.num_attention_heads),
        ])

    # ---- stream, run-name, and final/saved-param parity ----
    for tag in ("train/Loss", "val/Loss"):
        assert_stream_match(ref_rec.scalars, fw_rec.scalars, tag, atol=LOSS_ATOL)
    for vt in ("val", "test"):
        for m in ("Accuracy", "F1-macro score", "F1-weighted score",
                  "AUROC-macro", "AUROC-weighted"):
            assert_stream_match(
                ref_rec.scalars, fw_rec.scalars, f"{vt}/{m}", atol=METRIC_ATOL
            )
    assert w_path.rstrip("/").split("/")[-1] == (
        fw_rec.cfgs[-1].run_name().split("/")[-1]
    )

    fw_params = fw_rec.trainers[-1].params
    final_ref = rt.reference_final_params(g["trainer"], shared=False)
    assert max_param_diff(final_ref, fw_params) < PARAM_ATOL
    for name, key in (("image_adapter.pt", "image"), ("text_adapter.pt", "text")):
        loaded = torch.load(f"{ref_rec.log_dir}/{name}", weights_only=False)
        saved = torch_adapter_params(loaded)
        assert max_param_diff({key: saved}, {key: fw_params[key]}) < PARAM_ATOL


def test_twin_real_preprocessing_frontal(tmp_path):
    """The REAL ``Trainer._preprocessing``'s FRONTAL branch
    (Trainer.py:228-236 — DATA_INCREMENTAL.py's committed position, the one
    branch the composed joint twin above doesn't take) executes its actual
    ``torch.load``s over artifacts at the committed literal paths, and its
    real t-SNE subset filters (Trainer.py:59-98) are twinned against the
    framework's ``filter_multiclass`` / ``filter_sani_malati``."""
    from incremental_multimodal_medical_learning_ii_tpu.data.store import (
        EmbeddingDataset,
        filter_multiclass,
        filter_sani_malati,
    )
    from reference_twin import CLASS_NAMES, reference_script_env

    mod = rt.load_reference_trainer_module()
    rng = np.random.default_rng(13)
    data = {}
    for split, n in (("train", 64), ("val", 24), ("test", 24)):
        x = rng.normal(size=(n, 128)).astype(np.float32)
        y = (rng.random((n, 5)) < 0.35).astype(np.float32)
        # seed the exact patterns the t-SNE filters look for
        y[0] = [1, 0, 0, 0, 0]
        y[1] = [0, 1, 0, 0, 0]
        y[2] = [0, 0, 1, 0, 0]
        y[3] = 0.0
        y[4] = 1.0
        data[split] = (x, y)
        torch.save(
            torch.utils.data.TensorDataset(
                torch.from_numpy(x), torch.from_numpy(y)
            ),
            tmp_path / (
                f"embeddingDataset\\{split}\\512-chex-not-normalize-frontal\\"
                "embeddings_dataset_final_old.pt"
            ),
        )

    with reference_script_env(tmp_path):
        class_names, chex_str, tr, va, te, tsne = mod.Trainer._preprocessing(
            True, "frontal", 6144
        )

    assert class_names == CLASS_NAMES and chex_str == "-chex"
    for loader, (x, y) in ((tr, data["train"]), (va, data["val"]),
                           (te, data["test"])):
        np.testing.assert_array_equal(loader.dataset.tensors[0].numpy(), x)
        np.testing.assert_array_equal(loader.dataset.tensors[1].numpy(), y)
    assert (tr.batch_size, va.batch_size, te.batch_size) == (6144, 1024, 1024)

    fw_train = EmbeddingDataset(*data["train"])
    for ref_loader, fw_subset in (
        (tsne[0], filter_multiclass(fw_train)),
        (tsne[1], filter_sani_malati(fw_train)),
    ):
        assert len(ref_loader.dataset) == len(fw_subset) > 0
        ref_x = np.stack([inp.numpy() for inp, _ in ref_loader.dataset])
        ref_y = np.stack([lbl.numpy() for _, lbl in ref_loader.dataset])
        np.testing.assert_array_equal(ref_x, fw_subset.embeddings)
        np.testing.assert_array_equal(ref_y, fw_subset.labels)
