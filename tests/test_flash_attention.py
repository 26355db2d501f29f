"""Optional Pallas flash-attention path for CXR-BERT (TPU-only kernel)."""

import numpy as np
import pytest

import jax


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


@pytest.mark.skipif(not _on_tpu(), reason="pallas flash attention needs a TPU backend")
def test_flash_attention_matches_naive():
    import jax.numpy as jnp

    from incremental_multimodal_medical_learning_ii_tpu.models.cxr_bert import (
        BertDims,
        bert_encode,
        init_cxr_bert,
    )

    dims = BertDims(
        vocab_size=1000, hidden_size=512, num_layers=2, num_heads=4,
        intermediate_size=1024, max_position_embeddings=512, projection_size=128,
    )
    params = init_cxr_bert(jax.random.PRNGKey(0), dims)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 1000, size=(4, 256)).astype(np.int32))
    mask = np.ones((4, 256), np.int32)
    mask[1, 200:] = 0
    ref = np.asarray(bert_encode(params, ids, jnp.asarray(mask), dims))
    fl = np.asarray(bert_encode(params, ids, jnp.asarray(mask), dims, use_flash_attention=True))
    np.testing.assert_allclose(fl[mask == 1], ref[mask == 1], atol=5e-4)
