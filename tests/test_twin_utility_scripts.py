"""Utility-script twins: the reference's .pt/CSV tooling executes as files.

The driver twins (test_twin_driver_scripts.py) cover the three L4 training
scripts; these cover the rest of the reference's executable surface — the
extraction driver (``chexpert-get-embedding.py``), the author's own parity
harness (``test_first_emb.py``), the dataset gluing/splitting/filtering
scripts (``CSV_reformatting/glue_dataset.py``, ``splitTrainingEmbedding.py``,
``new_test_set_senza sani.py``), and the CSV statistics scripts
(``remove_NA.py``, ``count_pos_neg_in_csv.py``, ``count_pos_neg_V2.py``).

Execution trick: every hard-coded Windows path in these scripts
(``C:\\Users\\...``, ``D:\\CheXpert-v1.0\\...``,
``new_embeddingDataset\\test\\...``) is, on Linux, an ordinary *relative
filename containing backslashes*.  Materialising files under those literal
names in a temp cwd lets ``runpy`` execute the scripts UNPATCHED — real
``torch.load``/``torch.save``/``pd.read_csv`` on the committed paths.  The
only substitutions are the harness's standing ones (functional torchvision
primitives, tests/torchvision_stub.py) plus a DataLoader worker-count clamp
(``reference_twin.serial_dataloaders`` — an execution-environment knob,
not semantics: forked loader workers in a JAX-initialised 1-vCPU test
process are hang-prone, and with ``shuffle=False`` the order and math are
identical at ``num_workers=0``).

The framework side consumes the scripts' real on-disk artifacts through its
own product surfaces: ``EmbeddingDataset.load_torch_pt`` (TensorDataset /
ConcatDataset / Subset — the three shapes these scripts actually save),
``cli.extract_embeddings``, ``cli.verify_embeddings``'s ``verify``, and the
``ChexpertManifest`` CSV statistics.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import matplotlib  # noqa: E402

matplotlib.use("Agg")

import pandas as pd  # noqa: E402
from PIL import Image  # noqa: E402

from reference_twin import (  # noqa: E402
    _install_driver_stubs,
    _install_stubs,
    load_reference_trainer_module,
    make_vendored_image_model,
    mkflat_parent,
    run_reference_script as run_script,
)

from incremental_multimodal_medical_learning_ii_tpu.data.manifest import (  # noqa: E402
    ChexpertManifest,
)
from incremental_multimodal_medical_learning_ii_tpu.data.store import (  # noqa: E402
    EmbeddingDataset,
)

CLASS_NAMES = [
    "Atelectasis", "Cardiomegaly", "Consolidation", "Edema", "Pleural Effusion",
]

# the committed literal paths (DataRetrieval is fed prefix + CSV column 0,
# so the image "directory" is just a string prefix)
RESNET_PT = (
    "C:\\Users\\mistr\\OneDrive\\Desktop\\mcs_only_local\\hi-ml\\"
    "hi-ml-multimodal\\src\\biovil_image_resnet50_proj_size_128.pt"
)
TEST_IMG_PREFIX = "C:\\Users\\mistr\\OneDrive\\Desktop\\real-chexpert\\"
TRAIN_IMG_PREFIX = "D:\\CheXpert-v1.0\\CheXpert-v1.0\\"


def make_tensor_dataset(rng, n, dim=128):
    x = rng.normal(size=(n, dim)).astype(np.float32)
    y = (rng.random((n, 5)) < 0.35).astype(np.float32)
    ds = torch.utils.data.TensorDataset(torch.from_numpy(x), torch.from_numpy(y))
    return x, y, ds


# ----------------------------------------------------------------------
# glue_dataset.py — the ConcatDataset glue whose output is the actual
# on-disk format Trainer._preprocessing loads
# ----------------------------------------------------------------------
def test_twin_glue_dataset_script(tmp_path):
    _install_stubs()
    rng = np.random.default_rng(5)
    cwd = tmp_path / "CSV_reformatting"
    cwd.mkdir()
    out_dir = tmp_path / "embeddingDataset/train/512-chex-not-normalize-frontal"
    out_dir.mkdir(parents=True)

    # 39 shards at the committed names (glue_dataset.py:33-36), ragged sizes
    xs, ys = [], []
    for i in range(1, int(200000 / 5000)):
        x, y, ds = make_tensor_dataset(rng, 3 + (i % 4))
        xs.append(x)
        ys.append(y)
        torch.save(ds, cwd / (
            "embeddingDataset\\train\\512-chex-not-normalize-frontal\\"
            f"embeddings_dataset_{i * 5000}.pt"
        ))

    run_script("CSV_reformatting/glue_dataset.py", cwd)

    got = EmbeddingDataset.load_torch_pt(out_dir / "embeddings_dataset_final_old.pt")
    np.testing.assert_array_equal(got.embeddings, np.concatenate(xs))
    np.testing.assert_array_equal(got.labels, np.concatenate(ys))


# ----------------------------------------------------------------------
# splitTrainingEmbedding.py — Subset head/tail at the real 191,027-row
# boundary (175,000 + 16,027)
# ----------------------------------------------------------------------
def test_twin_split_training_embedding_script(tmp_path):
    _install_stubs()
    rng = np.random.default_rng(6)
    n = 191027  # the real frontal-train row count the script was written for
    x = rng.normal(size=(n, 2)).astype(np.float32)  # slim dim: Subset is shape-blind
    y = (rng.random((n, 5)) < 0.3).astype(np.float32)
    ds = torch.utils.data.TensorDataset(torch.from_numpy(x), torch.from_numpy(y))
    torch.save(ds, tmp_path / (
        "embeddingDataset\\train\\512-chex-not-normalize-frontal\\"
        "embeddings_dataset_final.pt"
    ))

    prefix = "embeddingDataset\\train\\512-chex-not-normalize-frontal\\"
    mkflat_parent(tmp_path, prefix + "first175k.pt")
    run_script("splitTrainingEmbedding.py", tmp_path)

    head = EmbeddingDataset.load_torch_pt(tmp_path / (prefix + "first175k.pt"))
    tail = EmbeddingDataset.load_torch_pt(tmp_path / (prefix + "last16027.pt"))
    assert len(head) == 175000 and len(tail) == 16027
    np.testing.assert_array_equal(head.embeddings, x[:175000])
    np.testing.assert_array_equal(tail.embeddings, x[175000:])
    np.testing.assert_array_equal(head.labels, y[:175000])
    np.testing.assert_array_equal(tail.labels, y[175000:])


def test_load_torch_pt_subset_bounds(tmp_path):
    """A Subset over a truncated base must fail loudly, not wrap."""
    from torch.utils.data import Subset, TensorDataset

    ds = TensorDataset(torch.zeros(10, 4), torch.zeros(10, 5))
    torch.save(Subset(ds, range(5, 15)), tmp_path / "bad.pt")
    with pytest.raises(ValueError, match="out of range"):
        EmbeddingDataset.load_torch_pt(tmp_path / "bad.pt")


# ----------------------------------------------------------------------
# new_test_set_senza sani.py — all-negative-row filter over a cached
# embedding dataset
# ----------------------------------------------------------------------
def test_twin_senza_sani_script(tmp_path):
    _install_stubs()
    rng = np.random.default_rng(7)
    cwd = tmp_path / "CSV_reformatting"
    cwd.mkdir()
    out_dir = tmp_path / "embeddingDataset/test/512-chex-not-normalize"
    out_dir.mkdir(parents=True)
    x, y, ds = make_tensor_dataset(rng, 64)
    y[::5] = 0.0  # guarantee some all-negative ("sani") rows
    ds = torch.utils.data.TensorDataset(torch.from_numpy(x), torch.from_numpy(y))
    torch.save(ds, cwd / (
        "embeddingDataset\\test\\512-chex-not-normalize\\"
        "embeddings_dataset_final_old.pt"
    ))

    run_script("CSV_reformatting/new_test_set_senza sani.py", cwd)

    ref = EmbeddingDataset.load_torch_pt(out_dir / "embeddings_dataset_final_new.pt")
    fw = EmbeddingDataset(x, y).remove_all_negative()
    assert len(ref) < 64
    np.testing.assert_array_equal(ref.embeddings, fw.embeddings)
    np.testing.assert_array_equal(ref.labels, fw.labels)


# ----------------------------------------------------------------------
# CSV statistics scripts vs ChexpertManifest
# ----------------------------------------------------------------------
def _stats_csv(rng, n=40, extra_cols=True):
    rows = []
    for i in range(n):
        row = {"Path": f"patient{i:03d}/study1/view1_frontal.jpg"}
        if extra_cols:
            row["Sex"] = "Female" if i % 2 else "Male"
            row["Frontal/Lateral"] = "Frontal"
        for j, c in enumerate(CLASS_NAMES):
            row[c] = int(rng.random() < 0.3 + 0.1 * j)
        if extra_cols:
            row["Support Devices"] = int(rng.random() < 0.5)
        rows.append(row)
    return pd.DataFrame(rows)


def test_twin_remove_na_script(tmp_path):
    """The live tail of remove_NA.py (the SOLO_LABEL_CHEX column
    selection) vs ChexpertManifest.labels()."""
    rng = np.random.default_rng(8)
    df = _stats_csv(rng)
    df.to_csv(tmp_path / (TRAIN_IMG_PREFIX + "train_visualCheXbert_fixed.csv"),
              index=False)

    run_script("CSV_reformatting/remove_NA.py", tmp_path)

    out = pd.read_csv(
        tmp_path / (TRAIN_IMG_PREFIX + "train_visualCheXbert_fixed_SOLO_LABEL_CHEX.csv")
    )
    assert list(out.columns) == CLASS_NAMES
    m = ChexpertManifest(df)
    np.testing.assert_array_equal(out.to_numpy(dtype=np.float32), m.labels())


def test_twin_count_pos_neg_v2_script(tmp_path):
    """count_pos_neg_V2.py's live per-class pos/neg printout vs
    positive_counts() and the dataset_stats CLI."""
    rng = np.random.default_rng(9)
    df = _stats_csv(rng)
    csv_name = TEST_IMG_PREFIX + "test_labels.csv"
    df.to_csv(tmp_path / csv_name, index=False)

    g = run_script("CSV_reformatting/count_pos_neg_V2.py", tmp_path)

    ref_df = g["df"]
    m = ChexpertManifest.from_csv(tmp_path / csv_name)
    pos = m.positive_counts()
    for j, c in enumerate(CLASS_NAMES):
        assert int(np.sum(ref_df[c])) == int(pos[j])
    # the CLI prints the same numbers (count_pos_neg_V2.py:50-51 schema)
    from incremental_multimodal_medical_learning_ii_tpu.cli import dataset_stats
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        dataset_stats.main(["--csv", str(tmp_path / csv_name)])
    lines = [ln for ln in buf.getvalue().splitlines()
             if ln.split(" ")[0] in {c.split(" ")[0] for c in CLASS_NAMES}]
    for j, c in enumerate(CLASS_NAMES):
        fields = lines[j][len(c):].split()
        assert int(fields[0]) == int(np.sum(ref_df[c]))
        assert int(fields[2]) == len(ref_df) - int(np.sum(ref_df[c]))


def test_twin_count_patterns_script(tmp_path):
    """count_pos_neg_in_csv.py's live pattern-frequency counts vs
    label_pattern_counts()."""
    rng = np.random.default_rng(10)
    df = _stats_csv(rng)
    df.to_csv(tmp_path / (TEST_IMG_PREFIX + "train_visualCheXbert.csv"), index=False)

    g = run_script("CSV_reformatting/count_pos_neg_in_csv.py", tmp_path)

    ref_counts = g["counts"]  # pd.Series keyed by ''.join(astype(str)) per row
    m = ChexpertManifest(df)
    fw = {
        "".join(str(v) for v in pat): cnt
        for pat, cnt in m.label_pattern_counts().items()
    }
    assert fw == ref_counts.to_dict()


# ----------------------------------------------------------------------
# The extraction driver and the author's parity harness (slow: real
# vendored ResNet-50 forwards at the committed 512 px on CPU)
# ----------------------------------------------------------------------
@pytest.fixture(scope="module")
def vendored_r50():
    return make_vendored_image_model(seed=11, model_type="resnet50")


def _write_images_and_csv(tmp_path, prefix: str, csv_name: str, rng, n=4):
    shapes = [(40, 64), (64, 40), (33, 47), (52, 44), (36, 36), (48, 32)][:n]
    rows = []
    for i, (h, w) in enumerate(shapes):
        name = f"img_{i}.png"
        Image.fromarray((rng.random((h, w)) * 255).astype(np.uint8), mode="L").save(
            tmp_path / (prefix + name)
        )
        rows.append({
            "Path": name,
            "Atelectasis": float(i % 2),
            "Cardiomegaly": float((i >> 1) % 2),
            "Consolidation": 0.0,
            "Edema": 1.0,
            "Pleural Effusion": float(i % 3 == 0),
        })
    pd.DataFrame(rows).to_csv(tmp_path / (prefix + csv_name), index=False)
    return len(rows)


@pytest.mark.slow
def test_twin_chexpert_get_embedding_script(vendored_r50, tmp_path):
    """chexpert-get-embedding.py AS COMMITTED (batch 1, size 512, the real
    vendored get_biovil_resnet loading the committed checkpoint path, the
    5000-batch checkpoint cadence, final-.pt save) vs the framework's
    cli.extract_embeddings consuming the SAME checkpoint file and CSV —
    the script's .pt artifact then loads through load_torch_pt."""
    model, _ = vendored_r50
    torch.save(model.state_dict(), tmp_path / RESNET_PT)
    rng = np.random.default_rng(11)
    n = _write_images_and_csv(tmp_path, TEST_IMG_PREFIX, "test_labels.csv", rng)

    out_name = "new_embeddingDataset\\test\\embeddings_dataset_final.pt"
    mkflat_parent(tmp_path, out_name)
    run_script("chexpert-get-embedding.py", tmp_path)

    # <5000 batches: exactly one artifact, the final checkpoint
    assert (tmp_path / out_name).exists()
    assert not (tmp_path / "new_embeddingDataset\\test\\embeddings_dataset_5000.pt").exists()
    ref = EmbeddingDataset.load_torch_pt(tmp_path / out_name)
    assert len(ref) == n

    from incremental_multimodal_medical_learning_ii_tpu.cli import extract_embeddings

    out_dir = tmp_path / "fw_out"
    extract_embeddings.main([
        "--csv", str(tmp_path / (TEST_IMG_PREFIX + "test_labels.csv")),
        "--img-dir", str(tmp_path) + "/" + TEST_IMG_PREFIX,
        "--biovil-checkpoint", str(tmp_path / RESNET_PT),
        "--out-dir", str(out_dir),
        "--batch-size", "2", "--fp32", "--host-preprocess",
    ])
    fw = EmbeddingDataset.load(out_dir / "dataset.npz")
    np.testing.assert_array_equal(fw.labels, ref.labels)
    np.testing.assert_allclose(fw.embeddings, ref.embeddings, atol=5e-5)


@pytest.mark.slow
def test_twin_test_first_emb_script(vendored_r50, tmp_path):
    """test_first_emb.py (the reference's OWN embedding parity harness,
    component #21) executed for real: its cached-.pt accumulation loop and
    its DataRetrieval re-extraction loop, vs the framework's
    cli.verify_embeddings building blocks on the same artifacts."""
    import jax.numpy as jnp

    from incremental_multimodal_medical_learning_ii_tpu.cli.verify_embeddings import (
        verify,
    )
    from incremental_multimodal_medical_learning_ii_tpu.engine.extract import (
        extract_embeddings as engine_extract,
        manifest_image_iterator,
    )
    from incremental_multimodal_medical_learning_ii_tpu.models.convert import (
        load_biovil_image_checkpoint,
    )

    load_reference_trainer_module()  # `from Trainer import Trainer`
    _install_driver_stubs()  # playsound + the unused text.utils import
    model, _ = vendored_r50
    torch.save(model.state_dict(), tmp_path / RESNET_PT)
    rng = np.random.default_rng(12)
    n = _write_images_and_csv(
        tmp_path, TRAIN_IMG_PREFIX, "train_visualCheXbert_fixed.csv", rng
    )
    # the cached dataset the script diffs against (random: the harness
    # itself never asserts, it only collects — we compare the collections)
    cx = rng.normal(size=(n, 128)).astype(np.float32)
    cy = (rng.random((n, 5)) < 0.4).astype(np.float32)
    cached_pt = (
        "embeddingDataset\\train\\512-chex-not-normalize\\"
        "embeddings_dataset_final_old.pt"
    )
    torch.save(
        torch.utils.data.TensorDataset(torch.from_numpy(cx), torch.from_numpy(cy)),
        tmp_path / cached_pt,
    )

    g = run_script("test_first_emb.py", tmp_path)

    ref_cached = g["images_list_1"].numpy()
    ref_cached_labels = g["labels_list_1"].numpy()
    ref_recomputed = g["images_list_2"].numpy()
    ref_recomputed_labels = g["labels_list_2"].numpy()
    np.testing.assert_array_equal(ref_cached, cx)  # loader loop is order-preserving

    # framework: same cached artifact through load_torch_pt ...
    fw_cached = EmbeddingDataset.load_torch_pt(tmp_path / cached_pt)
    np.testing.assert_array_equal(fw_cached.embeddings, ref_cached)
    np.testing.assert_array_equal(fw_cached.labels, ref_cached_labels)

    # ... and same re-extraction through the engine
    params = load_biovil_image_checkpoint(str(tmp_path / RESNET_PT))
    manifest = ChexpertManifest.from_csv(
        tmp_path / (TRAIN_IMG_PREFIX + "train_visualCheXbert_fixed.csv"),
        img_dir=str(tmp_path) + "/" + TRAIN_IMG_PREFIX,
    )
    fw_recomputed = engine_extract(
        manifest_image_iterator(manifest), params, batch_size=2, size=512,
        dtype=jnp.float32, device_preprocess=False,
    )
    np.testing.assert_array_equal(fw_recomputed.labels, ref_recomputed_labels)
    np.testing.assert_allclose(
        fw_recomputed.embeddings, ref_recomputed, atol=5e-5
    )

    # the verify() report agrees with the diff the reference harness set up
    report = verify(fw_cached, fw_recomputed)
    ref_max = float(np.abs(ref_cached - ref_recomputed).max())
    assert abs(report["max_abs_diff"] - ref_max) < 1e-4
    assert report["labels_equal"] == bool(
        np.array_equal(ref_cached_labels, ref_recomputed_labels)
    )
