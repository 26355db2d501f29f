"""bf16 fast path for the text tower: same design as the image encoders'
``dtype`` knob — fp32 is the parity default, bf16 is opt-in speed; softmax
and LayerNorm moments always accumulate in fp32."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incremental_multimodal_medical_learning_ii_tpu.models.cxr_bert import (
    bert_encode,
    get_projected_text_embeddings,
    init_cxr_bert,
    tiny_bert_dims,
)


def _setup(rng, batch=4, seq=16):
    dims = tiny_bert_dims(num_heads=4, hidden_size=64, intermediate_size=128)
    params = init_cxr_bert(jax.random.PRNGKey(3), dims)
    ids = jnp.asarray(rng.integers(0, dims.vocab_size, size=(batch, seq)), jnp.int32)
    mask = jnp.asarray(
        (np.arange(seq)[None, :] < rng.integers(seq // 2, seq + 1, size=(batch, 1))).astype(np.int32)
    )
    return dims, params, ids, mask


@pytest.mark.slow
def test_bf16_encode_close_to_fp32(rng):
    dims, params, ids, mask = _setup(rng)
    ref = np.asarray(bert_encode(params, ids, mask, dims))
    out = np.asarray(
        bert_encode(params, ids, mask, dims, dtype=jnp.bfloat16), np.float32
    )
    assert out.dtype == np.float32  # cast for comparison; device dtype below
    dev = bert_encode(params, ids, mask, dims, dtype=jnp.bfloat16)
    assert dev.dtype == jnp.bfloat16
    a, b = ref.ravel().astype(np.float64), out.ravel().astype(np.float64)
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999, cos


@pytest.mark.slow  # second full BERT compile in this module (~10s CPU)
def test_bf16_projected_embeddings_fp32_head(rng):
    """The projection head + normalisation stay fp32 even on the bf16 path,
    and the directions agree with the fp32 stack."""
    dims, params, ids, mask = _setup(rng)
    ref = np.asarray(
        get_projected_text_embeddings(params, ids, mask, dims, normalize=True)
    )
    out = get_projected_text_embeddings(
        params, ids, mask, dims, normalize=True, dtype=jnp.bfloat16
    )
    assert out.dtype == jnp.float32
    out = np.asarray(out)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)
    cos = np.sum(out * ref, axis=-1)  # both unit-norm: per-row cosine
    assert cos.min() > 0.995, cos.min()


def test_fp32_path_bit_identical_after_knob(rng):
    """The dtype plumbing must not perturb the fp32 parity path: LayerNorm's
    fp32-internal accumulation and the kernel .astype are no-ops on fp32."""
    dims, params, ids, mask = _setup(rng)
    a = np.asarray(bert_encode(params, ids, mask, dims))
    b = np.asarray(bert_encode(params, ids, mask, dims, dtype=jnp.float32))
    np.testing.assert_array_equal(a, b)


def test_fuse_qkv_bit_identical(rng):
    """fuse_qkv concatenates the Q/K/V kernels into one matmul; each output
    column of a matmul is an independent dot over the same contraction
    axis, so the fused path must be BIT-identical (fp32 and bf16).  The
    knob is default-off — measured a ~1.5% loss on v5e (cxr_bert.py
    comment) — but must stay correct for dispatch-bound backends."""
    dims, params, ids, mask = _setup(rng, batch=3, seq=9)
    for dtype in (jnp.float32, jnp.bfloat16):
        a = np.asarray(
            bert_encode(params, ids, mask, dims, dtype=dtype, fuse_qkv=False),
            np.float32,
        )
        b = np.asarray(
            bert_encode(params, ids, mask, dims, dtype=dtype, fuse_qkv=True),
            np.float32,
        )
        np.testing.assert_array_equal(a, b)
