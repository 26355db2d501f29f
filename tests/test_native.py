"""Native C++ embedding-store runtime: build, roundtrip, batcher parity."""

import numpy as np
import pytest

from incremental_multimodal_medical_learning_ii_tpu.data.native import (
    NativeEmbeddingStore,
    native_available,
)
from incremental_multimodal_medical_learning_ii_tpu.data.store import synthetic_dataset

pytestmark = pytest.mark.skipif(not native_available(), reason="no g++ toolchain")


def test_roundtrip(tmp_path):
    ds = synthetic_dataset(100, seed=1)
    store = NativeEmbeddingStore.write(tmp_path / "train.embstore", ds)
    assert store.n == 100 and store.emb_dim == 128 and store.n_labels == 5
    back = store.to_dataset()
    np.testing.assert_array_equal(back.embeddings, ds.embeddings)
    np.testing.assert_array_equal(back.labels, ds.labels)
    store.close()


def test_gather(tmp_path):
    ds = synthetic_dataset(50, seed=2)
    store = NativeEmbeddingStore.write(tmp_path / "g.embstore", ds)
    idx = np.array([3, 7, 7, 49, 0], np.uint64)
    embs, labels = store.gather(idx)
    np.testing.assert_array_equal(embs, ds.embeddings[idx.astype(int)])
    np.testing.assert_array_equal(labels, ds.labels[idx.astype(int)])
    store.close()


def test_batcher_covers_epoch_with_padding(tmp_path):
    ds = synthetic_dataset(37, seed=3)
    store = NativeEmbeddingStore.write(tmp_path / "b.embstore", ds)
    batches = list(store.iterate_batches(8, shuffle=False))
    assert len(batches) == 5
    valid_total = int(sum(b[2].sum() for b in batches))
    assert valid_total == 37
    # unshuffled: batches reproduce dataset order exactly
    got = np.concatenate([b[0][b[2] > 0] for b in batches])
    np.testing.assert_array_equal(got, ds.embeddings)
    # padded rows zeroed
    last = batches[-1]
    assert np.all(last[0][last[2] == 0] == 0)
    store.close()


def test_batcher_shuffle_deterministic(tmp_path):
    ds = synthetic_dataset(64, seed=4)
    store = NativeEmbeddingStore.write(tmp_path / "s.embstore", ds)
    a = [b[0].copy() for b in store.iterate_batches(16, shuffle=True, seed=5)]
    b_ = [b[0].copy() for b in store.iterate_batches(16, shuffle=True, seed=5)]
    for x, y in zip(a, b_):
        np.testing.assert_array_equal(x, y)
    # a shuffle happened (not identity order) and is a permutation
    flat = np.concatenate(a)
    assert not np.array_equal(flat, ds.embeddings)
    np.testing.assert_allclose(
        np.sort(flat[:, 0]), np.sort(ds.embeddings[:, 0]), atol=0
    )
    store.close()


def test_batcher_abandoned_mid_epoch_and_reuse(tmp_path):
    """Breaking out of the iterator must join the prefetch thread cleanly,
    and the store must serve many subsequent epochs."""
    ds = synthetic_dataset(64, seed=7)
    store = NativeEmbeddingStore.write(tmp_path / "a.embstore", ds)
    for _ in range(10):
        for i, batch in enumerate(store.iterate_batches(8, shuffle=True, seed=1)):
            if i == 2:
                break  # abandon mid-epoch
    # full epochs still work afterwards
    total = sum(int(b[2].sum()) for b in store.iterate_batches(8, shuffle=False))
    assert total == 64
    store.close()


def test_batcher_pad_multiple(tmp_path):
    ds = synthetic_dataset(10, seed=6)
    store = NativeEmbeddingStore.write(tmp_path / "p.embstore", ds)
    batches = list(store.iterate_batches(6, shuffle=False, pad_multiple=8))
    assert all(b[0].shape[0] == 8 for b in batches)
    store.close()


def test_truncated_store_rejected(tmp_path):
    """A crash/disk-full mid-write leaves a valid header promising more rows
    than the payload holds; open must fail cleanly, not SIGBUS later."""
    from incremental_multimodal_medical_learning_ii_tpu.runtime import load_library

    lib = load_library()
    if lib is None:
        pytest.skip("no native toolchain")
    from incremental_multimodal_medical_learning_ii_tpu.data.native import (
        NativeEmbeddingStore,
    )

    path = tmp_path / "store.embstore"
    NativeEmbeddingStore.write(path, synthetic_dataset(64, seed=0)).close()
    data = path.read_bytes()
    truncated = tmp_path / "trunc.embstore"
    truncated.write_bytes(data[: len(data) // 2])  # header intact, payload cut
    assert lib.embstore_open(str(truncated).encode()) in (None, 0)
    assert lib.embstore_open(str(path).encode()) not in (None, 0)  # intact OK


def test_gather_bounds_checked(tmp_path):
    """Negative / out-of-range indices raise IndexError on the native path
    (a negative index would wrap through the uint64 cast into a wild read;
    the numpy fallback raises — both paths must agree)."""
    ds = synthetic_dataset(10, seed=4)
    store = NativeEmbeddingStore.write(tmp_path / "b.embstore", ds)
    with pytest.raises(IndexError, match="-1"):
        store.gather(np.array([0, -1]))
    with pytest.raises(IndexError, match="10"):
        store.gather(np.array([10]))
    embs, _ = store.gather(np.array([], np.int64))  # empty is fine
    assert embs.shape == (0, 128)
    store.close()


def test_cross_backend_open(tmp_path):
    """A store persisted by the .npz fallback (no-toolchain host) opens on
    a host WITH the native lib, and serves identical data."""
    ds = synthetic_dataset(20, seed=5)
    ds.save(tmp_path / "x.npz")  # what write() does when load_library() is None
    store = NativeEmbeddingStore(tmp_path / "x.embstore")
    assert store.n == 20
    back = store.to_dataset()
    np.testing.assert_array_equal(back.embeddings, ds.embeddings)
    batches = list(store.iterate_batches(8, shuffle=False))
    assert len(batches) == 3


def test_write_is_atomic(tmp_path):
    """embstore_write goes through tmp + rename: no *.tmp residue and the
    destination only ever holds a complete store."""
    ds = synthetic_dataset(15, seed=6)
    store = NativeEmbeddingStore.write(tmp_path / "a.embstore", ds)
    store.close()
    assert not list(tmp_path.glob("*.tmp"))
    assert NativeEmbeddingStore(tmp_path / "a.embstore").n == 15


def test_batcher_c_abi_restart_mid_epoch(tmp_path):
    """The C ABI's restart contract: batcher_start_epoch on the SAME batcher
    abandoned mid-epoch must join the live prefetch worker BEFORE resetting
    order/cursor (the worker reads them inside fill(); resetting first is a
    use-after-free race) and then serve a complete epoch."""
    import ctypes

    ds = synthetic_dataset(64, seed=3)
    store = NativeEmbeddingStore.write(tmp_path / "c.embstore", ds)
    if store._handle is None:
        pytest.skip("native library unavailable")
    lib, padded = store._lib, 8
    b = lib.batcher_create(store._handle, 8, padded, 1, 5)
    fp = ctypes.POINTER(ctypes.c_float)
    embs = np.empty((padded, store.emb_dim), np.float32)
    labels = np.empty((padded, store.n_labels), np.float32)
    mask = np.empty(padded, np.float32)

    def next_valid():
        return lib.batcher_next(
            b, embs.ctypes.data_as(fp), labels.ctypes.data_as(fp),
            mask.ctypes.data_as(fp),
        )

    try:
        for _ in range(50):  # hammer the restart path
            lib.batcher_start_epoch(b)
            assert next_valid() == 8  # worker live, slot freed -> fill() races restart
        lib.batcher_start_epoch(b)
        total = 0
        while True:
            v = next_valid()
            if v == 0:
                break
            total += v
        assert total == 64
    finally:
        lib.batcher_destroy(b)
        store.close()
