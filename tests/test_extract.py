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


@pytest.mark.slow
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


def test_fold_grayscale_conv1_exact(image_params, rng):
    """conv1 folded over identical channels == the 3-channel forward
    (ExpandChannels feeds 3 copies of one plane, DataRetrieval.py:27-40)."""
    from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
        biovil_image_forward,
        fold_grayscale_conv1,
    )

    gray = jnp.asarray(rng.random((2, 64, 64, 1)), jnp.float32)
    full = biovil_image_forward(image_params, jnp.broadcast_to(gray, (2, 64, 64, 3)))
    folded_params = fold_grayscale_conv1(image_params)
    assert folded_params["encoder"]["conv1"]["kernel"].shape[2] == 1
    folded = biovil_image_forward(folded_params, gray)
    np.testing.assert_allclose(
        folded.projected_global_embedding, full.projected_global_embedding,
        rtol=1e-3, atol=1e-4,  # fp32 accumulation-order only; same scale as torch-parity tol
    )
    # idempotent on already-folded params
    again = fold_grayscale_conv1(folded_params)
    assert again["encoder"]["conv1"]["kernel"].shape[2] == 1


def test_space_to_depth_stem_kernel_exact(rng):
    """Kernel-level check (fast tier): the rearranged 4x4-s1 stem conv over
    2x2 space-to-depth input equals the 7x7-s2 conv on the raw input."""
    from incremental_multimodal_medical_learning_ii_tpu.models.resnet import (
        conv2d,
        space_to_depth_stem_kernel,
        stem_conv_apply,
    )

    k = jnp.asarray(rng.normal(size=(7, 7, 1, 8)), jnp.float32)
    x = jnp.asarray(rng.random((2, 16, 16, 1)), jnp.float32)
    ref = conv2d(x, k, 2, 3)
    out = stem_conv_apply({"kernel": space_to_depth_stem_kernel(k)}, x)
    assert out.shape == ref.shape == (2, 8, 8, 8)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_space_to_depth_stem_exact(image_params, rng):
    """The 4x4-s1 space-to-depth stem reformulation covers the same 49 taps
    as the 7x7-s2 conv (models/resnet.py::space_to_depth_stem_kernel) —
    bit-identical in bf16, accumulation-order-only drift in fp32; works on
    both the grayscale-folded and 3-channel kernels."""
    from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
        biovil_image_forward,
        fold_grayscale_conv1,
        space_to_depth_stem,
    )

    gray_params = fold_grayscale_conv1(image_params)
    s2d_params = space_to_depth_stem(gray_params)
    assert s2d_params["encoder"]["conv1"]["kernel"].shape[:3] == (4, 4, 4)
    gray = jnp.asarray(rng.random((2, 64, 64, 1)), jnp.float32)
    base = biovil_image_forward(gray_params, gray, dtype=jnp.bfloat16)
    s2d = biovil_image_forward(s2d_params, gray, dtype=jnp.bfloat16)
    np.testing.assert_array_equal(  # same taps, bf16 rounds identically
        s2d.projected_global_embedding, base.projected_global_embedding
    )
    base32 = biovil_image_forward(gray_params, gray)
    s2d32 = biovil_image_forward(s2d_params, gray)
    np.testing.assert_allclose(
        s2d32.projected_global_embedding, base32.projected_global_embedding,
        rtol=1e-3, atol=2e-4,
    )
    # 3-channel kernel path + idempotence
    s2d3 = space_to_depth_stem(image_params)
    assert s2d3["encoder"]["conv1"]["kernel"].shape[:3] == (4, 4, 12)
    assert space_to_depth_stem(s2d3) is s2d3
    rgb = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    np.testing.assert_allclose(
        biovil_image_forward(s2d3, rgb).projected_global_embedding,
        biovil_image_forward(image_params, rgb).projected_global_embedding,
        rtol=1e-3, atol=2e-4,
    )


@pytest.mark.slow
def test_extract_grayscale_conv1_parity(image_params, rng):
    """The grayscale fast path returns the same embeddings as the 3-channel
    device path, on both the shared-size and per-image preprocess branches."""
    imgs_mixed = list(_images(5, rng))  # heterogeneous sizes -> per-image plan
    imgs_same = [(im[:100, :80], lb) for im, lb in _images(4, rng)]  # shared plan
    for imgs in (imgs_mixed, imgs_same):
        ds_gray = extract_embeddings(
            iter(imgs), image_params, batch_size=2, size=64, pad_to=128,
            dtype=jnp.float32, grayscale_conv1=True,
        )
        ds_full = extract_embeddings(
            iter(imgs), image_params, batch_size=2, size=64, pad_to=128,
            dtype=jnp.float32, grayscale_conv1=False,
        )
        np.testing.assert_allclose(
            ds_gray.embeddings, ds_full.embeddings, rtol=1e-3, atol=1e-4
        )
        np.testing.assert_array_equal(ds_gray.labels, ds_full.labels)


@pytest.mark.slow
def test_extract_readback_window_equivalence(image_params, rng):
    """Windowed batched readback (readback_interval>1) returns bit-identical
    results to the per-batch sync loop, including the padded final batch."""
    imgs = list(_images(7, rng))
    ds_1 = extract_embeddings(
        iter(imgs), image_params, batch_size=2, size=64, pad_to=128,
        dtype=jnp.float32, readback_interval=1,
    )
    for interval in (3, 16):
        stats = {}
        ds_k = extract_embeddings(
            iter(imgs), image_params, batch_size=2, size=64, pad_to=128,
            dtype=jnp.float32, readback_interval=interval, stats=stats,
        )
        np.testing.assert_array_equal(ds_k.embeddings, ds_1.embeddings)
        np.testing.assert_array_equal(ds_k.labels, ds_1.labels)
        assert stats["batches"] == 4


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


@pytest.mark.slow
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

    # a batch size the mesh cannot shard must fail up front with a clear
    # message, not at the first device_put mid-run
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not divisible by the mesh"):
        extract_embeddings(
            iter(imgs), image_params, batch_size=6, size=64, pad_to=128,
            dtype=jnp.float32, mesh=mesh,
        )


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

    # start= offset (extraction resume) skips without decoding
    tail = list(manifest_image_iterator(manifest, start=2))
    assert len(tail) == 1
    np.testing.assert_array_equal(tail[0][0], items[2][0])
    np.testing.assert_array_equal(tail[0][1], items[2][1])


def test_decode_pool_never_forks(tmp_path, rng, monkeypatch):
    """The decode pool must use a fresh-process start method (forkserver or
    spawn): a fork()ed child inherits the parent's JAX thread locks mid-state
    — the documented multiprocessing-after-jax deadlock."""
    import multiprocessing
    from PIL import Image
    import pandas as pd

    Image.fromarray((rng.random((20, 15)) * 255).astype(np.uint8), "L").save(
        tmp_path / "img.png"
    )
    pd.DataFrame([{"Path": "img.png", "Atelectasis": 1, "Cardiomegaly": 0,
                   "Consolidation": 0, "Edema": 0, "Pleural Effusion": 0}]).to_csv(
        tmp_path / "labels.csv", index=False)
    manifest = ChexpertManifest.from_csv(tmp_path / "labels.csv",
                                         img_dir=str(tmp_path) + "/")

    seen = []
    real_get_context = multiprocessing.get_context

    def recording_get_context(method=None):
        seen.append(method)
        return real_get_context(method)

    monkeypatch.setattr(multiprocessing, "get_context", recording_get_context)
    items = list(manifest_image_iterator(manifest, workers=1))
    assert len(items) == 1
    assert seen and all(m in ("forkserver", "spawn") for m in seen), seen


def test_decode_worker_import_surface_is_jax_free():
    """data/images.py is what decode workers import (forkserver/spawn pay it
    per server/worker): its import chain must stay numpy/PIL-only. Run with
    -S so the host's sitecustomize (which pre-imports jax everywhere) does
    not mask a regression; site-packages is re-added manually."""
    import pathlib
    import subprocess
    import sys
    import sysconfig

    repo = pathlib.Path(__file__).resolve().parents[1]
    code = (
        "import sys, site; "
        f"site.addsitedir({sysconfig.get_paths()['purelib']!r}); "
        f"sys.path.insert(0, {str(repo)!r}); "
        "import incremental_multimodal_medical_learning_ii_tpu.data.images; "
        "leaked = [m for m in sys.modules if m == 'jax' or m.startswith('jax.') or m == 'jaxlib']; "
        "assert not leaked, leaked; "
        "print('jax-free')"
    )
    out = subprocess.run([sys.executable, "-S", "-c", code],
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "jax-free" in out.stdout


class _FlakyResult:
    """Wraps a device array; np.asarray raises N times before succeeding —
    simulates the tunnel's transient readback failures."""

    def __init__(self, arr, fail_counter):
        self._arr = arr
        self._fail = fail_counter

    def __array__(self, dtype=None, copy=None):
        if self._fail["readback"] > 0:
            self._fail["readback"] -= 1
            raise RuntimeError("injected transient readback error")
        return np.asarray(self._arr, dtype=dtype)


@pytest.mark.slow
def test_extract_retries_transient_errors(image_params, rng, monkeypatch):
    """One injected dispatch failure and one injected readback failure must
    not kill the run (VERDICT r1: BENCH_r01 died on a single transient
    FAILED_PRECONDITION); results must equal the clean run's."""
    import incremental_multimodal_medical_learning_ii_tpu.engine.extract as ex

    imgs = list(_images(5, rng, h=100, w=80))
    clean = extract_embeddings(
        iter(imgs), image_params, batch_size=2, size=64, pad_to=128,
        dtype=jnp.float32, device_preprocess=False,
    )

    fail = {"dispatch": 1, "readback": 1}
    real_make = ex.make_encode_preprocessed_fn

    def flaky_make(dtype=jnp.bfloat16, **kw):
        real = real_make(dtype=dtype, **kw)

        def fn(p, images):
            if fail["dispatch"] > 0:
                fail["dispatch"] -= 1
                raise RuntimeError("injected transient dispatch error")
            return _FlakyResult(real(p, images), fail)

        return fn

    monkeypatch.setattr(ex, "make_encode_preprocessed_fn", flaky_make)
    stats = {}
    ds = extract_embeddings(
        iter(imgs), image_params, batch_size=2, size=64, pad_to=128,
        dtype=jnp.float32, device_preprocess=False,
        retries=2, retry_backoff_s=0.0, stats=stats,
    )
    assert fail == {"dispatch": 0, "readback": 0}  # both faults were hit
    # 1 re-dispatched batch (dispatch fault) + the whole 3-batch readback
    # window re-dispatched (readback fault invalidates dispatched buffers)
    assert stats["retried_batches"] == 4
    np.testing.assert_allclose(ds.embeddings, clean.embeddings, atol=1e-6)
    np.testing.assert_array_equal(ds.labels, clean.labels)


def test_extract_retries_exhausted_raises(image_params, rng, monkeypatch):
    import incremental_multimodal_medical_learning_ii_tpu.engine.extract as ex

    def broken_make(dtype=jnp.bfloat16, **kw):
        def fn(p, images):
            raise RuntimeError("permanently broken backend")

        return fn

    monkeypatch.setattr(ex, "make_encode_preprocessed_fn", broken_make)
    with pytest.raises(RuntimeError, match="permanently broken"):
        extract_embeddings(
            iter(list(_images(3, rng))), image_params, batch_size=2, size=64,
            pad_to=128, dtype=jnp.float32, device_preprocess=False,
            retries=1, retry_backoff_s=0.0,
        )


@pytest.mark.slow
def test_extract_resume_skips_done_shards(image_params, rng, tmp_path):
    """Crash/restart: a second run with resume=True extracts exactly the
    tail and returns the full dataset (the reference loses all progress on
    restart despite its shard checkpoints)."""
    store = ShardedEmbeddingStore(tmp_path)
    imgs = list(_images(7, rng))

    # "crashed" first run: only the first 4 images made it to a shard
    extract_embeddings(
        iter(imgs[:4]), image_params, store=store, batch_size=2, size=64,
        pad_to=128, dtype=jnp.float32, checkpoint_interval=4,
    )
    assert store.total_rows() == 4

    consumed = []

    def images_from(skip):
        consumed.append(skip)
        return iter(imgs[skip:])

    ds = extract_embeddings(
        images_from, image_params, store=ShardedEmbeddingStore(tmp_path),
        batch_size=2, size=64, pad_to=128, dtype=jnp.float32,
        checkpoint_interval=4, resume=True,
    )
    assert consumed == [4]  # skipped images never re-decoded
    assert len(ds) == 7
    full = extract_embeddings(
        iter(imgs), image_params, batch_size=2, size=64, pad_to=128,
        dtype=jnp.float32,
    )
    np.testing.assert_allclose(ds.embeddings, full.embeddings, atol=1e-6)
    np.testing.assert_array_equal(ds.labels, full.labels)
    # and the store itself is now complete + contiguous
    assert ShardedEmbeddingStore(tmp_path).total_rows() == 7


@pytest.mark.slow
def test_extract_resume_plain_iterable_and_empty_store(image_params, rng, tmp_path):
    imgs = list(_images(5, rng))
    # resume on an empty store is a plain full run; plain iterables work too
    ds = extract_embeddings(
        iter(imgs), image_params, store=ShardedEmbeddingStore(tmp_path),
        batch_size=2, size=64, pad_to=128, dtype=jnp.float32, resume=True,
    )
    assert len(ds) == 5
    with pytest.raises(ValueError, match="requires a store"):
        extract_embeddings(
            iter(imgs), image_params, batch_size=2, size=64, pad_to=128,
            dtype=jnp.float32, resume=True,
        )


def test_store_total_rows_rejects_gaps(tmp_path):
    store = ShardedEmbeddingStore(tmp_path)
    store.write_shard(0, np.zeros((3, 128), np.float32), np.zeros((3, 5), np.float32))
    store.write_shard(5, np.zeros((2, 128), np.float32), np.zeros((2, 5), np.float32))
    with pytest.raises(ValueError, match="non-contiguous"):
        store.total_rows()


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


def test_extract_rejects_readback_interval_zero(image_params):
    from incremental_multimodal_medical_learning_ii_tpu.engine.extract import (
        extract_embeddings,
    )

    with pytest.raises(ValueError, match="readback_interval"):
        extract_embeddings(iter([]), image_params, readback_interval=0)


def test_int8_and_fused_layer1_are_mutually_exclusive(image_params):
    import jax.numpy as jnp

    from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
        biovil_image_forward,
    )

    with pytest.raises(ValueError, match="int8"):
        biovil_image_forward(
            image_params, jnp.zeros((1, 64, 64, 3)), int8=True, fused_layer1=True
        )
