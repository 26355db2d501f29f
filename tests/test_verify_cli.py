import numpy as np
import pandas as pd
import torch
from PIL import Image


import pytest

pytestmark = pytest.mark.slow


def test_verify_embeddings_cli(tmp_path, capsys, rng):
    import sys

    sys.path.insert(0, "tests")
    from torch_biovil_fixture import TorchBioViLImage

    torch.manual_seed(2)
    model = TorchBioViLImage()
    ckpt = tmp_path / "biovil.pt"
    torch.save(model.state_dict(), ckpt)

    rows = []
    for i in range(4):
        name = f"img_{i}.png"
        Image.fromarray((rng.random((120, 100)) * 255).astype(np.uint8), "L").save(tmp_path / name)
        rows.append({"Path": name, "Atelectasis": 1, "Cardiomegaly": 0,
                     "Consolidation": 0, "Edema": 1, "Pleural Effusion": 0})
    csv = tmp_path / "labels.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)

    # produce the "cached" dataset with the framework itself (fp32, 512/512)
    import jax.numpy as jnp

    from incremental_multimodal_medical_learning_ii_tpu.data.manifest import ChexpertManifest
    from incremental_multimodal_medical_learning_ii_tpu.engine.extract import (
        extract_embeddings,
        manifest_image_iterator,
    )
    from incremental_multimodal_medical_learning_ii_tpu.models.convert import (
        load_biovil_image_checkpoint,
    )

    params = load_biovil_image_checkpoint(ckpt)
    manifest = ChexpertManifest.from_csv(csv, img_dir=str(tmp_path) + "/")
    ds = extract_embeddings(
        manifest_image_iterator(manifest), params, batch_size=2, dtype=jnp.float32
    )
    cached = tmp_path / "cached.npz"
    ds.save(cached)

    from incremental_multimodal_medical_learning_ii_tpu.cli.verify_embeddings import main

    main([
        "--csv", str(csv), "--img-dir", str(tmp_path) + "/",
        "--biovil-checkpoint", str(ckpt), "--cached", str(cached),
        "--batch-size", "2",
    ])
    out = capsys.readouterr().out
    assert "max_abs_diff" in out
    max_diff = float([l for l in out.splitlines() if l.startswith("max_abs_diff")][0].split(":")[1])
    # same pipeline recomputed: parity at fp32 determinism level (the
    # reference's own torch-vs-torch tolerance was 3.1e-7)
    assert max_diff < 1e-5
    assert "labels_equal: True" in out
