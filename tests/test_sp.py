"""Sequence-parallel (ring-attention) text tower vs the single-device path.

Runs on the conftest-forced 8-device CPU mesh; the same shard_map program
compiles unchanged for a TPU mesh (the dryrun exercises it too).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from incremental_multimodal_medical_learning_ii_tpu.models.cxr_bert import (
    bert_encode,
    get_projected_text_embeddings,
    init_cxr_bert,
    tiny_bert_dims,
)
from incremental_multimodal_medical_learning_ii_tpu.ops.ring_attention import (
    ring_attention,
)
from incremental_multimodal_medical_learning_ii_tpu.parallel.sp import (
    check_sp_shapes,
    create_mesh_sp,
    make_sp_text_encode,
    pad_tokens_for_sp,
)


def _dense_reference(q, k, v, valid):
    """Unsharded softmax(QK^T/sqrt(d))V with additive masking."""
    hd = q.shape[-1]
    scores = np.einsum("bnqd,bnkd->bnqk", q, k) / np.sqrt(hd)
    scores = np.where(valid[:, None, None, :], scores, -1e30)
    scores -= scores.max(axis=-1, keepdims=True)
    p = np.exp(scores)
    p = np.where(valid[:, None, None, :], p, 0.0)
    return np.einsum("bnqk,bnkd->bnqd", p / p.sum(axis=-1, keepdims=True), v)


def _run_ring(q, k, v, valid, n_seq):
    """Shard the sequence over an n_seq-device mesh and run the ring op."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = create_mesh_sp(1, n_seq)
    hd = q.shape[-1]

    def local(q_l, k_l, v_l, valid_l):
        return ring_attention(q_l, k_l, v_l, valid_l, "seq", n_seq,
                              sm_scale=1.0 / float(np.sqrt(hd)))

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, "seq", None),) * 3 + (P(None, "seq"),),
        out_specs=P(None, None, "seq", None),
        check_vma=False,
    )
    return np.asarray(jax.jit(fn)(q, k, v, valid.astype(np.int32)))


def test_ring_attention_matches_dense(rng):
    b, nh, s, hd = 2, 3, 32, 8
    q, k, v = (rng.standard_normal((b, nh, s, hd)).astype(np.float32) for _ in range(3))
    valid = np.ones((b, s), bool)
    valid[1, 20:] = False  # padding crosses a chunk boundary (chunks of 4)
    out = _run_ring(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), valid, 8)
    ref = _dense_reference(q, k, v, valid)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_ring_attention_fully_masked_chunks(rng):
    """kv chunks that are 100% padding must contribute exactly zero."""
    b, nh, s, hd = 1, 2, 32, 8
    q, k, v = (rng.standard_normal((b, nh, s, hd)).astype(np.float32) for _ in range(3))
    valid = np.zeros((b, s), bool)
    valid[0, :5] = True  # chunks 2..7 (of 4 tokens each) are all-padding
    out = _run_ring(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), valid, 8)
    ref = _dense_reference(q, k, v, valid)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_sp_text_encode_matches_single_device(rng):
    dims = tiny_bert_dims()
    params = init_cxr_bert(jax.random.PRNGKey(3), dims)
    b, s = 4, 32
    ids = rng.integers(0, dims.vocab_size, size=(b, s)).astype(np.int32)
    mask = np.ones((b, s), np.int32)
    mask[0, 10:] = 0
    mask[2, 29:] = 0

    ref = np.asarray(
        get_projected_text_embeddings(
            params, jnp.asarray(ids), jnp.asarray(mask), dims, normalize=True
        )
    )

    mesh = create_mesh_sp(2, 4)
    encode = make_sp_text_encode(dims, mesh, normalize=True)
    out = np.asarray(encode(params, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_sp_hidden_positions_match(rng):
    """Per-token hidden states (not just CLS) must agree — catches
    position-embedding offset bugs on non-zero shards."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    import functools

    from incremental_multimodal_medical_learning_ii_tpu.ops.ring_attention import (
        ring_attention_core,
    )

    dims = tiny_bert_dims()
    params = init_cxr_bert(jax.random.PRNGKey(5), dims)
    b, s = 2, 24
    ids = rng.integers(0, dims.vocab_size, size=(b, s)).astype(np.int32)
    mask = np.ones((b, s), np.int32)
    mask[1, 17:] = 0

    ref = np.asarray(bert_encode(params, jnp.asarray(ids), jnp.asarray(mask), dims))

    n_seq = 8
    mesh = create_mesh_sp(1, n_seq)
    ids_p, mask_p = pad_tokens_for_sp(ids, mask, n_seq)  # 24 -> 24 (divisible)
    core = functools.partial(ring_attention_core, axis_name="seq", n_shards=n_seq)

    def local(p, i_l, m_l):
        off = jax.lax.axis_index("seq").astype(jnp.int32) * i_l.shape[1]
        return bert_encode(p, i_l, m_l, dims, attention_core=core,
                           position_offset=off)

    hidden = jax.jit(
        shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(None, "seq"), P(None, "seq")),
            out_specs=P(None, "seq", None), check_vma=False,
        )
    )(params, jnp.asarray(ids_p), jnp.asarray(mask_p))
    got = np.asarray(hidden)[:, :s]
    np.testing.assert_allclose(got[mask == 1], ref[mask == 1], atol=2e-5)


@pytest.mark.slow
def test_sp_bf16_runs(rng):
    dims = tiny_bert_dims()
    params = init_cxr_bert(jax.random.PRNGKey(7), dims)
    b, s = 2, 16
    ids = rng.integers(0, dims.vocab_size, size=(b, s)).astype(np.int32)
    mask = np.ones((b, s), np.int32)
    mesh = create_mesh_sp(2, 4)
    encode = make_sp_text_encode(dims, mesh, normalize=True, dtype=jnp.bfloat16)
    out = np.asarray(encode(params, jnp.asarray(ids), jnp.asarray(mask)))
    ref = np.asarray(
        get_projected_text_embeddings(
            params, jnp.asarray(ids), jnp.asarray(mask), dims, normalize=True,
            dtype=jnp.bfloat16,
        )
    )
    # bf16 ring reduction order differs from the dense path; cosine check
    cos = (out * ref).sum(-1) / (
        np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1)
    )
    assert cos.min() > 0.999


@pytest.mark.slow
def test_sp_encode_grad_matches_dense(rng):
    """Autodiff through the ring (scan + ppermute have transpose rules):
    param gradients of the sharded encode match the single-device path —
    sp is training-capable, not inference-only."""
    import jax.flatten_util

    dims = tiny_bert_dims()
    params = init_cxr_bert(jax.random.PRNGKey(21), dims)
    b, s = 2, 16
    ids = jnp.asarray(rng.integers(0, dims.vocab_size, size=(b, s)).astype(np.int32))
    mask = np.ones((b, s), np.int32)
    mask[1, 11:] = 0
    mask = jnp.asarray(mask)

    def loss_dense(p):
        out = get_projected_text_embeddings(p, ids, mask, dims, normalize=True)
        return jnp.sum(out * out[::-1])

    mesh = create_mesh_sp(1, 4)
    encode = make_sp_text_encode(dims, mesh, normalize=True)

    def loss_sp(p):
        out = encode(p, ids, mask)
        return jnp.sum(out * out[::-1])

    g_dense = jax.grad(loss_dense)(params)
    g_sp = jax.grad(loss_sp)(params)
    flat_d, _ = jax.flatten_util.ravel_pytree(g_dense)
    flat_s, _ = jax.flatten_util.ravel_pytree(g_sp)
    scale = float(jnp.max(jnp.abs(flat_d))) + 1e-12
    np.testing.assert_allclose(
        np.asarray(flat_s) / scale, np.asarray(flat_d) / scale, atol=5e-5
    )


def test_pad_tokens_and_shape_checks():
    ids = np.ones((2, 30), np.int32)
    mask = np.ones((2, 30), np.int32)
    ids_p, mask_p = pad_tokens_for_sp(ids, mask, 8)
    assert ids_p.shape == (2, 32) and mask_p.shape == (2, 32)
    assert (mask_p[:, 30:] == 0).all()

    dims = tiny_bert_dims()
    mesh = create_mesh_sp(2, 4)
    with pytest.raises(ValueError, match="not divisible by seq"):
        check_sp_shapes(dims, 4, 30, mesh)
    with pytest.raises(ValueError, match="not divisible by data"):
        check_sp_shapes(dims, 3, 32, mesh)
    with pytest.raises(ValueError, match="max_position_embeddings"):
        check_sp_shapes(dims, 4, dims.max_position_embeddings + 4, mesh)


@pytest.mark.parametrize(
    "partition",
    ["sp",
     pytest.param("tp", marks=pytest.mark.slow),
     pytest.param("pp", marks=pytest.mark.slow)],
)
def test_text_engine_parallel_partitions(partition, tmp_path):
    """The user-facing TextInferenceEngine drives all three text-tower
    partitions with automatic batch/seq padding: 3 prompts on a mesh whose
    divisibility requirements need padding, vs the single-device path."""
    from incremental_multimodal_medical_learning_ii_tpu.text.engine import (
        TextInferenceEngine,
    )
    from incremental_multimodal_medical_learning_ii_tpu.text.tokenizer import (
        PromptTokenizer,
        write_test_vocab,
    )
    from incremental_multimodal_medical_learning_ii_tpu.parallel.sp import (
        create_mesh_sp,
    )
    from incremental_multimodal_medical_learning_ii_tpu.parallel.pp import (
        create_mesh_pp,
    )
    from incremental_multimodal_medical_learning_ii_tpu.parallel.tp import (
        create_mesh_2d,
    )

    vocab = write_test_vocab(tmp_path / "vocab.txt")
    tokenizer = PromptTokenizer(vocab, max_allowed_input_length=64)
    n_layers = 4 if partition == "pp" else 2
    dims = tiny_bert_dims(
        vocab_size=tokenizer.tokenizer.vocab_size, max_position_embeddings=64,
        num_heads=4, num_layers=n_layers,
    )
    params = init_cxr_bert(jax.random.PRNGKey(13), dims)
    prompts = [
        "Findings suggesting Edema",
        "No evidence of Atelectasis",
        "Pleural Effusion seen",
    ]
    single = TextInferenceEngine(params, dims, tokenizer)
    ref = single.get_embeddings_from_prompt(prompts, normalize=True)

    if partition == "tp":
        mesh = create_mesh_2d(2, 4)
    elif partition == "sp":
        mesh = create_mesh_sp(2, 4)
    else:
        mesh = create_mesh_pp(2, 4)
    eng = TextInferenceEngine(
        params, dims, tokenizer, mesh=mesh, partition=partition,
        n_microbatches=2,
    )
    out = eng.get_embeddings_from_prompt(prompts, normalize=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=3e-5)


@pytest.mark.slow
def test_text_engine_tp_sharded_params_serve_all_methods(tmp_path):
    """With partition='tp' the engine holds TP-sharded params; the
    single-device-written methods (MLM fill, pairwise sims) must keep
    working — GSPMD compiles them against the sharded operands."""
    from incremental_multimodal_medical_learning_ii_tpu.parallel.tp import (
        create_mesh_2d,
    )
    from incremental_multimodal_medical_learning_ii_tpu.text.engine import (
        TextInferenceEngine,
    )
    from incremental_multimodal_medical_learning_ii_tpu.text.tokenizer import (
        PromptTokenizer,
        write_test_vocab,
    )

    vocab = write_test_vocab(tmp_path / "vocab.txt")
    tok = PromptTokenizer(vocab, max_allowed_input_length=64)
    dims = tiny_bert_dims(vocab_size=tok.tokenizer.vocab_size, num_heads=4)
    params = init_cxr_bert(jax.random.PRNGKey(0), dims)
    ref = TextInferenceEngine(params, dims, tok)
    eng = TextInferenceEngine(params, dims, tok, mesh=create_mesh_2d(2, 4),
                              partition="tp")
    prompts = ["Findings suggesting [MASK]"]
    assert eng.predict_masked_tokens(prompts) == ref.predict_masked_tokens(prompts)
    np.testing.assert_allclose(
        eng.get_pairwise_similarities(["No Edema"], ["No Edema"]),
        ref.get_pairwise_similarities(["No Edema"], ["No Edema"]),
        atol=3e-5,
    )


def test_text_engine_rejects_unknown_partition(tmp_path):
    from incremental_multimodal_medical_learning_ii_tpu.text.engine import (
        TextInferenceEngine,
    )
    from incremental_multimodal_medical_learning_ii_tpu.text.tokenizer import (
        PromptTokenizer,
        write_test_vocab,
    )

    vocab = write_test_vocab(tmp_path / "vocab.txt")
    tokenizer = PromptTokenizer(vocab, max_allowed_input_length=64)
    dims = tiny_bert_dims(vocab_size=tokenizer.tokenizer.vocab_size)
    params = init_cxr_bert(jax.random.PRNGKey(0), dims)
    with pytest.raises(ValueError, match="unknown partition"):
        TextInferenceEngine(
            params, dims, tokenizer, mesh=create_mesh_sp(2, 4), partition="zz"
        )


def test_position_offset_default_bit_identical(rng):
    """position_offset=0 (the default) must not change the original path."""
    dims = tiny_bert_dims()
    params = init_cxr_bert(jax.random.PRNGKey(11), dims)
    ids = rng.integers(0, dims.vocab_size, size=(2, 12)).astype(np.int32)
    mask = np.ones((2, 12), np.int32)
    a = np.asarray(bert_encode(params, jnp.asarray(ids), jnp.asarray(mask), dims))
    b = np.asarray(
        bert_encode(params, jnp.asarray(ids), jnp.asarray(mask), dims,
                    position_offset=jnp.int32(0))
    )
    np.testing.assert_array_equal(a, b)
