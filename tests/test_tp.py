"""Tensor-parallel CXR-BERT over a (data, model) mesh: numerics must match
the single-device forward, and the partitioned program must contain real
cross-device reductions (i.e. the params are genuinely sharded, not
silently replicated)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incremental_multimodal_medical_learning_ii_tpu.models.cxr_bert import (
    get_projected_text_embeddings,
    init_cxr_bert,
    tiny_bert_dims,
)
from incremental_multimodal_medical_learning_ii_tpu.parallel.tp import (
    bert_tp_specs,
    check_tp_divisibility,
    create_mesh_2d,
    make_tp_text_encode,
    shard_bert_tp,
)


def _inputs(rng, dims, batch=8, seq=12):
    ids = rng.integers(0, dims.vocab_size, size=(batch, seq)).astype(np.int32)
    mask = np.ones((batch, seq), np.int32)
    mask[:, seq - 3 :] = 0  # padded tail exercises the additive bias
    return jnp.asarray(ids), jnp.asarray(mask)


@pytest.mark.parametrize(
    "data,model",
    [
        # the mixed 2x4 mesh is the costliest SPMD compile (~7s CPU): slow tier
        pytest.param(2, 4, marks=pytest.mark.slow),
        (1, 8),
        (8, 1),
    ],
)
def test_tp_matches_single_device(rng, data, model):
    dims = tiny_bert_dims(num_heads=8, intermediate_size=64, hidden_size=32)
    params = init_cxr_bert(jax.random.PRNGKey(0), dims)
    ids, mask = _inputs(rng, dims)
    ref = np.asarray(get_projected_text_embeddings(params, ids, mask, dims, normalize=True))

    mesh = create_mesh_2d(data, model)
    sharded = shard_bert_tp(params, mesh, dims)
    out = np.asarray(make_tp_text_encode(dims, mesh)(sharded, ids, mask))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_tp_composes_with_bf16(rng):
    """TP sharding + the bf16 layer stack produce directions matching the
    fp32 single-device forward."""
    dims = tiny_bert_dims(num_heads=8, intermediate_size=64, hidden_size=32)
    params = init_cxr_bert(jax.random.PRNGKey(0), dims)
    ids, mask = _inputs(rng, dims)
    ref = np.asarray(get_projected_text_embeddings(params, ids, mask, dims, normalize=True))
    mesh = create_mesh_2d(2, 4)
    sharded = shard_bert_tp(params, mesh, dims)
    out = np.asarray(
        make_tp_text_encode(dims, mesh, dtype=jnp.bfloat16)(sharded, ids, mask)
    )
    cos = np.sum(out * ref, axis=-1)
    assert cos.min() > 0.995, cos.min()


def test_tp_program_contains_all_reduce(rng):
    """With the model axis >1 the row-parallel projections must reduce
    partial sums across devices — assert the collective exists in the
    compiled SPMD program."""
    dims = tiny_bert_dims(num_heads=8, intermediate_size=64, hidden_size=32)
    params = init_cxr_bert(jax.random.PRNGKey(0), dims)
    ids, mask = _inputs(rng, dims)
    mesh = create_mesh_2d(2, 4)
    sharded = shard_bert_tp(params, mesh, dims)
    encode = make_tp_text_encode(dims, mesh)
    hlo = encode.lower(sharded, ids, mask).compile().as_text()
    assert "all-reduce" in hlo, "TP program has no cross-device reduction"
    # and the kernels really live sharded on device
    qk = sharded["layers"][0]["q"]["kernel"]
    assert not qk.sharding.is_fully_replicated


@pytest.mark.slow
def test_tp_bert_base_dims(rng):
    """Production CXR-BERT dims (768 hidden, 12 heads, 64-dim heads) over a
    4-way model axis: 3 heads per device, uneven vs the lane width — the
    case GSPMD must partition without silent replication."""
    from incremental_multimodal_medical_learning_ii_tpu.models.cxr_bert import BertDims

    dims = BertDims(num_layers=2)  # full width, shallow depth for CPU time
    params = init_cxr_bert(jax.random.PRNGKey(4), dims)
    ids, mask = _inputs(rng, dims, batch=4, seq=16)
    ref = np.asarray(get_projected_text_embeddings(params, ids, mask, dims, normalize=True))
    mesh = create_mesh_2d(2, 4)
    sharded = shard_bert_tp(params, mesh, dims)
    encode = make_tp_text_encode(dims, mesh)
    hlo = encode.lower(sharded, ids, mask).compile().as_text()
    assert "all-reduce" in hlo
    out = np.asarray(encode(sharded, ids, mask))
    np.testing.assert_allclose(out, ref, atol=5e-5, rtol=5e-5)


def test_tp_sharded_params_match_structure():
    dims = tiny_bert_dims(num_heads=8)
    params = init_cxr_bert(jax.random.PRNGKey(1), dims)
    specs = bert_tp_specs(params)
    jax.tree.map(  # same treedef -> zips without error
        lambda x, s: None, params, specs,
        is_leaf=lambda x: hasattr(x, "ndim") or not isinstance(x, (dict, list)),
    )


def test_tp_divisibility_guard():
    dims = tiny_bert_dims(num_heads=6)
    with pytest.raises(ValueError, match="num_heads"):
        check_tp_divisibility(dims, 4)
    dims = tiny_bert_dims(num_heads=8, intermediate_size=60)
    with pytest.raises(ValueError, match="intermediate"):
        check_tp_divisibility(dims, 8)
