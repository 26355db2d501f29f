"""Pipeline-parallel text tower vs the single-device path (8-device CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from incremental_multimodal_medical_learning_ii_tpu.models.cxr_bert import (
    get_projected_text_embeddings,
    init_cxr_bert,
    tiny_bert_dims,
)
from incremental_multimodal_medical_learning_ii_tpu.parallel.pp import (
    check_pp_shapes,
    create_mesh_pp,
    make_pp_text_encode,
    stack_layer_params,
)


def _ref(params, ids, mask, dims):
    return np.asarray(
        get_projected_text_embeddings(
            params, jnp.asarray(ids), jnp.asarray(mask), dims, normalize=True
        )
    )


def _inputs(rng, dims, b, s):
    ids = rng.integers(0, dims.vocab_size, size=(b, s)).astype(np.int32)
    mask = np.ones((b, s), np.int32)
    mask[0, s // 2:] = 0
    if b > 2:
        mask[2, s - 3:] = 0
    return ids, mask


def test_pp_matches_single_device(rng):
    dims = tiny_bert_dims(num_layers=4)
    params = init_cxr_bert(jax.random.PRNGKey(0), dims)
    ids, mask = _inputs(rng, dims, 8, 16)
    mesh = create_mesh_pp(1, 4)  # 4 stages x 1 layer... (4 layers / 4 pipe)
    encode = make_pp_text_encode(dims, mesh, n_microbatches=4)
    out = np.asarray(encode(params, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(out, _ref(params, ids, mask, dims), atol=2e-5)


@pytest.mark.slow
def test_pp_composes_with_data_parallel(rng):
    dims = tiny_bert_dims(num_layers=4)
    params = init_cxr_bert(jax.random.PRNGKey(1), dims)
    ids, mask = _inputs(rng, dims, 8, 16)
    mesh = create_mesh_pp(2, 4)  # batch sharded 2-way, 4 pipeline stages
    encode = make_pp_text_encode(dims, mesh, n_microbatches=2)
    out = np.asarray(encode(params, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(out, _ref(params, ids, mask, dims), atol=2e-5)


def test_pp_single_microbatch(rng):
    """M=1: pure sequential hand-off through the stages (max bubble)."""
    dims = tiny_bert_dims(num_layers=2)
    params = init_cxr_bert(jax.random.PRNGKey(2), dims)
    ids, mask = _inputs(rng, dims, 4, 12)
    mesh = create_mesh_pp(1, 2)
    encode = make_pp_text_encode(dims, mesh, n_microbatches=1)
    out = np.asarray(encode(params, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(out, _ref(params, ids, mask, dims), atol=2e-5)


@pytest.mark.slow
def test_pp_bf16_runs(rng):
    dims = tiny_bert_dims(num_layers=4)
    params = init_cxr_bert(jax.random.PRNGKey(3), dims)
    ids, mask = _inputs(rng, dims, 4, 16)
    mesh = create_mesh_pp(1, 4)
    encode = make_pp_text_encode(dims, mesh, n_microbatches=2, dtype=jnp.bfloat16)
    out = np.asarray(encode(params, jnp.asarray(ids), jnp.asarray(mask)))
    ref = _ref(params, ids, mask, dims)
    cos = (out * ref).sum(-1) / np.maximum(
        np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1), 1e-12
    )
    assert cos.min() > 0.999


@pytest.mark.slow
def test_pp_encode_grad_matches_dense(rng):
    """Autodiff through the pipeline schedule (scan + ppermute + psum all
    have transpose rules; the predicated fill/drain writes route cotangents
    only to the microbatch that actually contributed) — pp is
    training-capable, not inference-only."""
    import jax.flatten_util

    dims = tiny_bert_dims(num_layers=2)
    params = init_cxr_bert(jax.random.PRNGKey(22), dims)
    b, s = 4, 12
    ids = jnp.asarray(rng.integers(0, dims.vocab_size, size=(b, s)).astype(np.int32))
    mask = jnp.asarray(np.ones((b, s), np.int32))

    def loss_dense(p):
        out = get_projected_text_embeddings(p, ids, mask, dims, normalize=True)
        return jnp.sum(out * out[::-1])

    mesh = create_mesh_pp(1, 2)
    encode = make_pp_text_encode(dims, mesh, n_microbatches=2, normalize=True)

    def loss_pp(p):
        out = encode(p, ids, mask)
        return jnp.sum(out * out[::-1])

    g_dense = jax.grad(loss_dense)(params)
    g_pp = jax.grad(loss_pp)(params)
    flat_d, _ = jax.flatten_util.ravel_pytree(g_dense)
    flat_p, _ = jax.flatten_util.ravel_pytree(g_pp)
    scale = float(jnp.max(jnp.abs(flat_d))) + 1e-12
    np.testing.assert_allclose(
        np.asarray(flat_p) / scale, np.asarray(flat_d) / scale, atol=5e-5
    )


def test_pp_shape_guards():
    dims = tiny_bert_dims(num_layers=4)
    mesh = create_mesh_pp(2, 4)
    with pytest.raises(ValueError, match="num_layers"):
        check_pp_shapes(tiny_bert_dims(num_layers=3), 8, 2, mesh)
    with pytest.raises(ValueError, match="not divisible by data"):
        check_pp_shapes(dims, 7, 1, mesh)
    with pytest.raises(ValueError, match="n_microbatches"):
        check_pp_shapes(dims, 8, 3, mesh)


def test_stack_layer_params_shape():
    dims = tiny_bert_dims(num_layers=4)
    params = init_cxr_bert(jax.random.PRNGKey(4), dims)
    stacked = stack_layer_params(params)
    assert stacked["q"]["kernel"].shape == (4, dims.hidden_size, dims.hidden_size)
    np.testing.assert_array_equal(
        np.asarray(stacked["ffn_in"]["kernel"][2]),
        np.asarray(params["layers"][2]["ffn_in"]["kernel"]),
    )
