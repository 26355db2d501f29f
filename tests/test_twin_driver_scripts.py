"""Driver-vs-driver twins: the reference's OWN L4 scripts, executed as files.

Every other twin drives the reference through ``run_reference_*`` loops that
*mirror* the three ``__main__`` blocks — a misreading of the driver glue
itself (constant flow, threshold placement, ``model_copy`` guards,
``last_batch`` threading, val/test cadence, the final ``save()``) could
still hide there.  These tests close that: ``runpy`` executes
``ZERO_JOINT_BOUNDS.py`` / ``DATA_INCREMENTAL.py`` / ``CLASS_INCREMENTAL.py``
AS COMMITTED (seed 27, bs 6144, lr 1e-4, 10 epochs, 20 parts, MORE_LABELS,
``except Exception`` swallows and all), while the framework side runs its
OWN CLI drivers (``cli/zero_joint_bounds.py`` etc.) end-to-end — argparse,
config construction, bundle/bank loading from disk, protocols.

Patch boundary on the reference side (see
``reference_twin.run_reference_driver_script``): ``Trainer._preprocessing``
(the torch.load of the author's local ``embeddingDataset/*.pt`` — replaced
with synthetic loaders at the committed batch sizes), ``SummaryWriter``
(recorder; the REAL run-name construction still executes and is compared
against the framework config's ``run_name()``), and the ``playsound`` /
``health_multimodal.text.utils`` imports.  Everything else — the real
``preprocessing*`` bodies (Trainer.py:256-523), the real splitters
(:1187-1271), prompt creation, training, eval, save — is reference code.

Because the committed batch sizes (6144 train / 1024 eval) exceed the
synthetic row counts, every loader yields a single batch and all compared
streams are permutation-invariant — the reference's reshuffling samplers
and the framework's ``--no-shuffle`` order see identical batches.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import reference_twin as rt  # noqa: E402
from reference_twin import (  # noqa: E402
    assert_stream_match,
    load_reference_trainer_module,
    max_param_diff,
    patched_protocols,
    run_reference_driver_script,
    stream,
    torch_adapter_params,
)

from incremental_multimodal_medical_learning_ii_tpu.cli import (  # noqa: E402
    class_incremental,
    data_incremental,
    zero_joint_bounds,
)
from incremental_multimodal_medical_learning_ii_tpu.data.store import (  # noqa: E402
    EmbeddingDataset,
)

pytestmark = pytest.mark.slow

N_TRAIN, N_VAL, N_TEST = 200, 160, 176
LOSS_ATOL = 5e-6
METRIC_ATOL = 1e-3
PARAM_ATOL = 1e-5
METRIC_TAGS = [
    f"{vt}/{m}"
    for vt in ("val", "test")
    for m in ("Accuracy", "F1-macro score", "F1-weighted score",
              "AUROC-macro", "AUROC-weighted")
]


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(42)

    def block(n):
        x = rng.normal(size=(n, 128)).astype(np.float32)
        y = (rng.random((n, 5)) < 0.4).astype(np.float32)
        return x, y

    tx, ty = block(N_TRAIN)
    vx, vy = block(N_VAL)
    sx, sy = block(N_TEST)
    for y in (vy, sy):
        assert (y.sum(0) > 0).all() and (y.sum(0) < len(y)).all()
    return {"train_x": tx, "train_y": ty, "val_x": vx, "val_y": vy,
            "test_x": sx, "test_y": sy}


@pytest.fixture(scope="module")
def ref_mod():
    return load_reference_trainer_module()


@pytest.fixture(scope="module")
def data_dir(data, tmp_path_factory):
    """train/val/test .npz bundle for the framework CLI's --data-dir."""
    d = tmp_path_factory.mktemp("driver_twin_data")
    for split in ("train", "val", "test"):
        EmbeddingDataset(data[f"{split}_x"], data[f"{split}_y"]).save(
            d / f"{split}.npz")
    return d


def cli_args(tmp_path, data_dir):
    # --seed 123 aligns the CLI's synthetic prompt encoder with the twin
    # harness's shared fake_encode (both synthetic_encode_fn(seed=123))
    return ["--data-dir", str(data_dir), "--seed", "123", "--no-shuffle",
            "--mesh-devices", "1", "--log-dir", str(tmp_path / "fw_runs")]


def compare(ref_rec, fw_rec, monitors=()):
    for tag in ("train/Loss", "val/Loss"):
        assert_stream_match(ref_rec.scalars, fw_rec.scalars, tag, atol=LOSS_ATOL)
    for tag in METRIC_TAGS:
        assert_stream_match(ref_rec.scalars, fw_rec.scalars, tag, atol=METRIC_ATOL)
    for tag, atol in monitors:
        assert_stream_match(ref_rec.scalars, fw_rec.scalars, tag, atol=atol)


def assert_run_name_matches(w_path: str, fw_rec):
    """The reference's executed run-name string (captured at its real
    SummaryWriter construction) vs the framework config's run_name() —
    leaf-for-leaf (the folder roots differ by the author's rotating
    NUOVI_RISULTATI* prefixes, which folder_name covers)."""
    assert fw_rec.cfgs, "framework CLI never built a config"
    ref_leaf = w_path.rstrip("/").split("/")[-1]
    fw_leaf = fw_rec.cfgs[-1].run_name().split("/")[-1]
    assert ref_leaf == fw_leaf


def assert_saved_adapters_match_framework(rec, fw_params):
    """The driver's final ``trainer.save()`` wrote whole-module .pt files
    into the recorder's log_dir (Trainer.py:1644-1648); load them back and
    compare against the FRAMEWORK's final params — save-path parity on top
    of stream parity."""
    for name, key in (("image_adapter.pt", "image"), ("text_adapter.pt", "text")):
        loaded = torch.load(f"{rec.log_dir}/{name}", weights_only=False)
        saved = torch_adapter_params(loaded)
        diff = max_param_diff({key: saved}, {key: fw_params[key]})
        assert diff < PARAM_ATOL, f"{name}: saved params diverge ({diff:.2e})"


def test_twin_driver_zero_joint_bounds(ref_mod, data, data_dir, tmp_path):
    """ZERO_JOINT_BOUNDS.py as committed (joint bound: 10 epochs, bs 6144,
    lr 1e-4, mean prompts, double mlp, Adam) vs the framework's
    cli.zero_joint_bounds with default flags."""
    rt.configure_reference(ref_mod)  # the committed Trainer.py:41-57 globals
    ref_rec, g, init_params, w_path = run_reference_driver_script(
        "ZERO_JOINT_BOUNDS.py", data, tmp_path)
    assert len(stream(ref_rec.scalars, "train/Loss")) == 10  # 10 ep x 1 batch

    with patched_protocols(init_params) as fw_rec:
        zero_joint_bounds.main(cli_args(tmp_path, data_dir))

    compare(ref_rec, fw_rec)
    assert_run_name_matches(w_path, fw_rec)
    fw_params = fw_rec.trainers[-1].params
    final_ref = rt.reference_final_params(g["trainer"], shared=False)
    assert max_param_diff(final_ref, fw_params) < PARAM_ATOL
    assert_saved_adapters_match_framework(ref_rec, fw_params)


def test_twin_driver_data_incremental(ref_mod, data, data_dir, tmp_path):
    """DATA_INCREMENTAL.py as committed: 20 contiguous parts x 10 epochs,
    frontal views, CONTINUAL_LEARNING=None (threshold_scheduling=True but
    silent without CL) — the real split_dataloader_data_incremental
    executes, parts are freed after use, val/test after every part."""
    rt.configure_reference(ref_mod)
    ref_rec, g, init_params, w_path = run_reference_driver_script(
        "DATA_INCREMENTAL.py", data, tmp_path)
    assert len(stream(ref_rec.scalars, "train/Loss")) == 20 * 10
    assert len(stream(ref_rec.scalars, "test/AUROC-macro")) == 20
    # CL is None: the scheduling flag alone must not emit threshold scalars
    assert not stream(ref_rec.scalars, "monitor-resets/threshold-scheduling")

    with patched_protocols(init_params) as fw_rec:
        data_incremental.main(cli_args(tmp_path, data_dir))

    compare(ref_rec, fw_rec)
    assert_run_name_matches(w_path, fw_rec)
    fw_params = fw_rec.trainers[-1].params
    final_ref = rt.reference_final_params(g["trainer"], shared=False)
    assert max_param_diff(final_ref, fw_params) < PARAM_ATOL
    assert_saved_adapters_match_framework(ref_rec, fw_params)


def test_twin_driver_class_incremental(ref_mod, data, data_dir, tmp_path):
    """CLASS_INCREMENTAL.py as committed: class-pos-neg, MORE_LABELS=True,
    5 tasks x 10 epochs, identity tasks_order — the real
    concat_to_tensor_dataloader + contiguous splitter execute, and
    last_batch threads through train_class_more_labels_incremental."""
    rt.configure_reference(ref_mod)
    ref_rec, g, init_params, w_path = run_reference_driver_script(
        "CLASS_INCREMENTAL.py", data, tmp_path)
    assert len(stream(ref_rec.scalars, "train/Loss")) == 5 * 10
    assert len(stream(ref_rec.scalars, "test/AUROC-macro")) == 5

    with patched_protocols(init_params) as fw_rec:
        class_incremental.main(cli_args(tmp_path, data_dir))

    compare(ref_rec, fw_rec)
    assert_run_name_matches(w_path, fw_rec)
    fw_params = fw_rec.trainers[-1].params
    final_ref = rt.reference_final_params(g["trainer"], shared=False)
    assert max_param_diff(final_ref, fw_params) < PARAM_ATOL
    assert_saved_adapters_match_framework(ref_rec, fw_params)
