"""Extraction pipeline: device-preprocess vs host-preprocess parity, shard
checkpointing, manifest iteration, mesh sharding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from incremental_multimodal_medical_learning_ii_tpu.data.manifest import ChexpertManifest
from incremental_multimodal_medical_learning_ii_tpu.data.store import ShardedEmbeddingStore
from incremental_multimodal_medical_learning_ii_tpu.engine.extract import (
    extract_embeddings,
    manifest_image_iterator,
)
from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
    init_biovil_image_model,
)


@pytest.fixture(scope="module")
def image_params():
    return init_biovil_image_model(jax.random.PRNGKey(0))


def _images(n, rng, h=100, w=80):
    for i in range(n):
        img = (rng.random((h + i % 3, w)) * 255).astype(np.uint8)
        label = (rng.random(5) < 0.5).astype(np.float32)
        yield img, label


def test_extract_device_vs_host_parity(image_params, rng):
    imgs = list(_images(5, rng))
    ds_dev = extract_embeddings(
        iter(imgs), image_params, batch_size=2, size=64, pad_to=128,
        dtype=jnp.float32, device_preprocess=True,
    )
    ds_host = extract_embeddings(
        iter(imgs), image_params, batch_size=2, size=64, pad_to=128,
        dtype=jnp.float32, device_preprocess=False,
    )
    assert ds_dev.embeddings.shape == (5, 128)
    np.testing.assert_array_equal(ds_dev.labels, ds_host.labels)
    # preprocess paths differ by <=1 uint8 level per pixel; embeddings close
    cos = np.sum(ds_dev.embeddings * ds_host.embeddings, axis=1) / (
        np.linalg.norm(ds_dev.embeddings, axis=1) * np.linalg.norm(ds_host.embeddings, axis=1)
    )
    assert cos.min() > 0.999


def test_extract_shard_checkpoints(image_params, rng, tmp_path):
    store = ShardedEmbeddingStore(tmp_path)
    imgs = list(_images(7, rng))
    ds = extract_embeddings(
        iter(imgs), image_params, store=store, batch_size=2, size=64, pad_to=128,
        dtype=jnp.float32, checkpoint_interval=4,
    )
    assert len(ds) == 7
    paths = store.shard_paths()
    assert len(paths) >= 2  # one mid-run checkpoint + final
    glued = store.glue()
    np.testing.assert_allclose(glued.embeddings, ds.embeddings, atol=1e-6)


def test_extract_on_mesh(image_params, rng):
    from incremental_multimodal_medical_learning_ii_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(8)
    imgs = list(_images(8, rng))
    ds = extract_embeddings(
        iter(imgs), image_params, batch_size=8, size=64, pad_to=128,
        dtype=jnp.float32, mesh=mesh,
    )
    ds_single = extract_embeddings(
        iter(imgs), image_params, batch_size=8, size=64, pad_to=128, dtype=jnp.float32,
    )
    # sharded conv/reduce ordering differs slightly from single-device
    np.testing.assert_allclose(ds.embeddings, ds_single.embeddings, rtol=1e-4, atol=1e-3)


def test_manifest_iteration(tmp_path, rng):
    import pandas as pd
    from PIL import Image

    rows = []
    for i in range(3):
        name = f"img_{i}.png"
        Image.fromarray((rng.random((40, 30)) * 255).astype(np.uint8), "L").save(tmp_path / name)
        rows.append({"Path": name, "Atelectasis": i % 2, "Cardiomegaly": 0,
                     "Consolidation": 1, "Edema": 0, "Pleural Effusion": 1})
    csv = tmp_path / "labels.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)

    manifest = ChexpertManifest.from_csv(csv, img_dir=str(tmp_path) + "/")
    assert len(manifest) == 3
    items = list(manifest_image_iterator(manifest))
    assert items[0][0].shape == (40, 30)
    np.testing.assert_array_equal(items[1][1], [1, 0, 1, 0, 1])

    # process-pool decode path preserves order and content
    pooled = list(manifest_image_iterator(manifest, workers=2))
    for (a, la), (b, lb) in zip(items, pooled):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(la, lb)


def test_manifest_utilities(tmp_path):
    import pandas as pd

    df = pd.DataFrame({
        "Path": ["a_frontal.jpg", "b_lateral.jpg", "c_frontal.jpg"],
        "Atelectasis": [1.0, None, 0.0], "Cardiomegaly": [0.0, 1.0, 0.0],
        "Consolidation": [0.0, 0.0, 0.0], "Edema": [0.0, 0.0, 0.0],
        "Pleural Effusion": [0.0, 1.0, 0.0],
    })
    m = ChexpertManifest(df)
    assert len(m.dropna_labels()) == 2
    assert len(m.filter_frontal()) == 2
    # after NA drop: a has positives, c is all-negative -> only a survives
    assert len(m.dropna_labels().remove_all_negative()) == 1
    counts = m.dropna_labels().label_pattern_counts()
    assert counts[(1, 0, 0, 0, 0)] == 1
    head, tail = m.split(2)
    assert len(head) == 2 and len(tail) == 1
