"""Torch-free weight bundles: pytree<->npz round-trip and the
convert_weights CLI against a REAL reference adapter checkpoint."""

from pathlib import Path

import numpy as np
import pytest

from incremental_multimodal_medical_learning_ii_tpu.utils.serialization import (
    load_params_npz,
    save_params_npz,
)


def _trees_equal(a, b):
    if isinstance(a, dict):
        assert isinstance(b, dict) and set(a) == set(b), (a, b)
        for k in a:
            _trees_equal(a[k], b[k])
    elif isinstance(a, (list, tuple)):
        assert isinstance(b, list) and len(a) == len(b)
        for x, y in zip(a, b):
            _trees_equal(x, y)
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_roundtrip_nested_tree_with_lists_and_meta(tmp_path):
    tree = {
        "encoder": {
            "conv1": {"kernel": np.arange(12.0).reshape(3, 4)},
            "layer1": [
                {"w": np.ones((2, 2), np.float32), "b": np.zeros(2)},
                {"w": np.full((2, 2), 3.0), "b": np.ones(2)},
            ],
        },
        "bias": np.float32(2.5),
    }
    path = tmp_path / "weights.npz"
    save_params_npz(path, tree, meta={"dims": {"hidden_size": 32}})
    loaded, meta = load_params_npz(path)
    _trees_equal(tree, loaded)
    assert isinstance(loaded["encoder"]["layer1"], list)
    assert meta == {"dims": {"hidden_size": 32}}


@pytest.mark.slow  # full-trunk roundtrip ~6s CPU
def test_roundtrip_resnet_params(tmp_path):
    import jax

    from incremental_multimodal_medical_learning_ii_tpu.models.resnet import (
        init_resnet50,
    )

    params = init_resnet50(jax.random.PRNGKey(0))
    path = tmp_path / "resnet.npz"
    save_params_npz(path, params)
    loaded, meta = load_params_npz(path)
    assert meta is None
    _trees_equal(jax.tree.map(np.asarray, params), loaded)
    # layer lists come back as lists in the exact block order
    assert isinstance(loaded["layer3"], list) and len(loaded["layer3"]) == 6


def test_rejects_slash_in_key(tmp_path):
    with pytest.raises(ValueError, match="'/'"):
        save_params_npz(tmp_path / "x.npz", {"a/b": np.zeros(1)})


def test_rejects_unroundtrippable_trees(tmp_path):
    """Trees that would silently corrupt on load are rejected at save."""
    with pytest.raises(ValueError, match="digit-string"):
        save_params_npz(tmp_path / "a.npz", {"heads": {"0": np.zeros(1)}})
    with pytest.raises(ValueError, match="reserved"):
        save_params_npz(tmp_path / "b.npz", {"__meta_json__": np.zeros(1)})
    with pytest.raises(ValueError, match="empty dict"):
        save_params_npz(tmp_path / "c.npz", {"a": np.zeros(1), "extra": {}})
    with pytest.raises(ValueError, match="empty list"):
        save_params_npz(tmp_path / "d.npz", {"a": np.zeros(1), "xs": []})


REF = Path("/root/reference")


@pytest.mark.skipif(
    not (REF / "NUOVI_RISULTATI").exists(), reason="reference mirror not mounted"
)
def test_convert_weights_cli_real_adapter(tmp_path, capsys):
    """Convert a REAL trained reference adapter to npz; the npz-loaded
    params must byte-match the torch-unpickled conversion."""
    import jax

    from incremental_multimodal_medical_learning_ii_tpu.cli.convert_weights import main
    from incremental_multimodal_medical_learning_ii_tpu.models.convert import (
        load_reference_adapter,
    )

    candidates = sorted(REF.glob("NUOVI_RISULTATI*/zero-and-joint/*/image_adapter.pt"))
    if not candidates:
        pytest.skip("no adapter checkpoints in the mirror")
    src = candidates[0]
    main(["--reference-image-adapter", str(src), "--out-dir", str(tmp_path)])
    assert "image_adapter.npz" in capsys.readouterr().out
    loaded, _ = load_params_npz(tmp_path / "image_adapter.npz")
    direct = jax.tree.map(np.asarray, load_reference_adapter(str(src)))
    _trees_equal(direct, loaded)


@pytest.mark.slow
def test_classifier_from_npz_bundle_matches_torch_path(tmp_path, rng):
    """End-to-end: torch checkpoint -> convert_weights npz -> classifier
    built with --biovil-npz produces the same scores as the torch-loaded
    path (the torch-free serving deployment flow)."""
    import sys

    import torch

    sys.path.insert(0, "tests")
    from torch_biovil_fixture import TorchBioViLImage

    torch.manual_seed(0)
    ckpt = tmp_path / "biovil.pt"
    torch.save(TorchBioViLImage().state_dict(), ckpt)

    from incremental_multimodal_medical_learning_ii_tpu.cli.classify import (
        add_classifier_args,
        build_classifier,
    )
    from incremental_multimodal_medical_learning_ii_tpu.cli.convert_weights import (
        main as convert_main,
    )

    convert_main(["--biovil-checkpoint", str(ckpt), "--out-dir", str(tmp_path)])

    import argparse

    img = (rng.random((100, 90)) * 255).astype(np.uint8)

    def classify_with(extra):
        p = argparse.ArgumentParser()
        add_classifier_args(p)
        args = p.parse_args(extra + ["--batch-size", "1", "--size", "64",
                                     "--pad-to", "128"])
        clf = build_classifier(args)
        scores, _ = clf.predict_arrays([img])
        return scores

    ref = classify_with(["--biovil-checkpoint", str(ckpt)])
    out = classify_with(["--biovil-npz", str(tmp_path / "biovil_image.npz")])
    np.testing.assert_allclose(out, ref, atol=1e-6)
