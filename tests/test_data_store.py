import numpy as np
import pytest

from incremental_multimodal_medical_learning_ii_tpu.data.store import (
    EmbeddingDataset,
    ShardedEmbeddingStore,
    count_positive_labels,
    filter_multiclass,
    filter_sani_malati,
    iterate_batches,
    split_by_label,
    split_contiguous,
    synthetic_dataset,
)


def test_split_contiguous_ceil_sizes():
    ds = synthetic_dataset(103)
    parts = split_contiguous(ds, 4)  # ceil(103/4) = 26
    assert [len(p) for p in parts] == [26, 26, 26, 25]
    np.testing.assert_array_equal(parts[0].embeddings, ds.embeddings[:26])
    np.testing.assert_array_equal(parts[3].embeddings, ds.embeddings[78:])


def test_split_by_label_with_intersection():
    labels = np.array([[1, 1, 0, 0, 0], [0, 1, 0, 0, 0], [0, 0, 0, 0, 0]], np.float32)
    ds = EmbeddingDataset(np.zeros((3, 128), np.float32), labels)
    tasks = split_by_label(ds)
    assert len(tasks[0]) == 1
    assert len(tasks[1]) == 2  # sample 0 appears in both task 0 and task 1
    assert len(tasks[2]) == 0


def test_iterate_batches_pads_final_batch():
    ds = synthetic_dataset(10)
    batches = list(iterate_batches(ds, 4, shuffle=False))
    assert len(batches) == 3
    embs, labels, mask = batches[-1]
    assert embs.shape == (4, 128) and labels.shape == (4, 5)
    np.testing.assert_array_equal(mask, [1, 1, 0, 0])
    assert np.all(embs[2:] == 0)


def test_iterate_batches_shuffle_deterministic():
    ds = synthetic_dataset(32)
    a = list(iterate_batches(ds, 8, shuffle=True, rng=np.random.default_rng(3)))
    b = list(iterate_batches(ds, 8, shuffle=True, rng=np.random.default_rng(3)))
    np.testing.assert_array_equal(a[0][0], b[0][0])
    c = list(iterate_batches(ds, 8, shuffle=True, rng=np.random.default_rng(4)))
    assert not np.array_equal(a[0][0], c[0][0])


def test_iterate_batches_explicit_order():
    """``order`` overrides the shuffle (the twin harness injects the
    reference DataLoader's exact row order through this parameter)."""
    ds = synthetic_dataset(10)
    order = np.array([9, 3, 0, 1, 2, 4, 5, 6, 7, 8])
    batches = list(iterate_batches(ds, 4, shuffle=True, order=order))
    np.testing.assert_array_equal(batches[0][0], ds.embeddings[order[:4]])
    np.testing.assert_array_equal(batches[0][1], ds.labels[order[:4]])
    # final partial batch still zero-padded with the mask
    np.testing.assert_array_equal(batches[-1][2], [1, 1, 0, 0])
    np.testing.assert_array_equal(batches[-1][0][:2], ds.embeddings[order[8:]])
    with pytest.raises(ValueError, match="order has 3 entries"):
        list(iterate_batches(ds, 4, shuffle=True, order=np.arange(3)))


def test_epoch_permutation_real_rows_padding_tail():
    """Device-side fused-epoch row order: the n_real real rows are a
    permutation, padding indices stay at the tail (identical batch
    composition to the per-batch path for a given permutation)."""
    import jax

    from incremental_multimodal_medical_learning_ii_tpu.engine.steps import (
        epoch_permutation,
    )

    p = np.asarray(epoch_permutation(jax.random.PRNGKey(0), 10, 16))
    assert p.shape == (16,) and p.dtype == np.int32
    assert sorted(p[:10]) == list(range(10))  # real rows: a permutation
    np.testing.assert_array_equal(p[10:], np.arange(10, 16))  # padding tail
    assert not np.array_equal(p[:10], np.arange(10))  # actually shuffled
    # no padding: degenerate n_pad == n_real
    q = np.asarray(epoch_permutation(jax.random.PRNGKey(1), 8, 8))
    assert sorted(q) == list(range(8))


def test_sharded_store_roundtrip(tmp_path):
    store = ShardedEmbeddingStore(tmp_path / "shards")
    e1 = np.random.rand(5, 128).astype(np.float32)
    l1 = np.random.rand(5, 5).astype(np.float32)
    e2 = np.random.rand(3, 128).astype(np.float32)
    l2 = np.random.rand(3, 5).astype(np.float32)
    store.write_shard(0, e1, l1)
    store.write_shard(5, e2, l2)
    glued = store.glue()
    assert len(glued) == 8
    np.testing.assert_array_equal(glued.embeddings[:5], e1)
    np.testing.assert_array_equal(glued.embeddings[5:], e2)


def test_npz_roundtrip(tmp_path):
    ds = synthetic_dataset(7)
    ds.save(tmp_path / "ds.npz")
    back = EmbeddingDataset.load(tmp_path / "ds.npz")
    np.testing.assert_array_equal(back.embeddings, ds.embeddings)


def test_torch_pt_migration(tmp_path):
    torch = pytest.importorskip("torch")
    from torch.utils.data import TensorDataset

    embs = torch.rand(6, 128)
    labels = torch.rand(6, 5)
    torch.save(TensorDataset(embs, labels), tmp_path / "ref.pt")
    ds = EmbeddingDataset.load_torch_pt(tmp_path / "ref.pt")
    np.testing.assert_allclose(ds.embeddings, embs.numpy())


def test_filters_take_first_n_in_order():
    eye = np.eye(5, dtype=np.float32)
    labels = np.concatenate([np.tile(eye[0], (3, 1)), np.tile(eye[1], (2, 1))])
    ds = EmbeddingDataset(np.arange(5)[:, None].repeat(128, 1).astype(np.float32), labels)
    out = filter_multiclass(ds, per_class=2)
    # first two class-0 rows and both class-1 rows, in dataset order
    np.testing.assert_array_equal(out.embeddings[:, 0], [0, 1, 3, 4])


def test_filter_sani_malati():
    labels = np.array(
        [[0] * 5, [1] * 5, [1, 0, 0, 0, 0], [0] * 5, [1] * 5], np.float32
    )
    ds = EmbeddingDataset(np.zeros((5, 128), np.float32), labels)
    out = filter_sani_malati(ds, per_group=1)
    assert len(out) == 2


def test_count_positive_labels():
    ds = synthetic_dataset(50, seed=1)
    np.testing.assert_array_equal(count_positive_labels(ds), ds.labels.sum(0))


def test_empty_subsets_are_legal():
    """Contiguous-split tails and no-match filters must yield EMPTY datasets
    (torch Subset semantics), not IndexError from a float64 empty index."""
    ds = synthetic_dataset(101, seed=0)
    parts = split_contiguous(ds, 20)  # size=ceil(101/20)=6 -> tail parts empty
    assert len(parts) == 20
    assert sum(len(p) for p in parts) == 101
    assert len(parts[-1]) == 0
    empty = ds.subset([])
    assert len(empty) == 0
    # no-match filter: all-zero labels -> no single-positive rows
    zeros = synthetic_dataset(8, seed=1)
    zeros.labels[:] = 0
    assert len(filter_multiclass(zeros, per_class=3)) == 0
