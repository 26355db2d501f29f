"""Pallas fused cosine kernel vs the jnp reference (interpret mode on CPU;
the real-TPU parity run is part of the bench harness)."""

import jax.numpy as jnp
import numpy as np
import pytest

from incremental_multimodal_medical_learning_ii_tpu.ops.cosine import pairwise_cosine
from incremental_multimodal_medical_learning_ii_tpu.ops.pallas_cosine import (
    pallas_pairwise_cosine,
)


@pytest.mark.parametrize("shape", [(64, 10), (513, 14), (100, 128)])
def test_pallas_cosine_matches_reference(rng, shape):
    b, t = shape
    x = rng.normal(size=(b, 128)).astype(np.float32)
    tt = rng.normal(size=(t, 128)).astype(np.float32)
    ref = np.asarray(pairwise_cosine(jnp.asarray(x), jnp.asarray(tt)))
    got = np.asarray(
        pallas_pairwise_cosine(jnp.asarray(x), jnp.asarray(tt), block_b=128, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.slow
def test_pallas_cosine_unaligned_dim(rng):
    # D not a multiple of 128 exercises the zero-pad path
    x = rng.normal(size=(32, 100)).astype(np.float32)
    t = rng.normal(size=(7, 100)).astype(np.float32)
    ref = np.asarray(pairwise_cosine(jnp.asarray(x), jnp.asarray(t)))
    got = np.asarray(
        pallas_pairwise_cosine(jnp.asarray(x), jnp.asarray(t), block_b=64, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.slow
def test_pallas_cosine_sharded_on_mesh(rng):
    """shard_map'ed kernel over an 8-device mesh (interpret mode on CPU)."""
    from incremental_multimodal_medical_learning_ii_tpu.ops.pallas_cosine import (
        pallas_pairwise_cosine_sharded,
    )
    from incremental_multimodal_medical_learning_ii_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(8)
    x = rng.normal(size=(512, 128)).astype(np.float32)
    t = rng.normal(size=(10, 128)).astype(np.float32)
    ref = np.asarray(pairwise_cosine(jnp.asarray(x), jnp.asarray(t)))
    got = np.asarray(
        pallas_pairwise_cosine_sharded(
            mesh, jnp.asarray(x), jnp.asarray(t), block_b=64, interpret=True
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_pallas_cosine_real_kernel_on_tpu(rng):
    """Compiled (non-interpret) kernel parity; runs only on TPU backends."""
    import jax

    if jax.default_backend() == "cpu":
        pytest.skip("compiled pallas kernel needs a TPU backend")
    x = rng.normal(size=(1000, 128)).astype(np.float32)
    t = rng.normal(size=(10, 128)).astype(np.float32)
    ref = np.asarray(pairwise_cosine(jnp.asarray(x), jnp.asarray(t)))
    got = np.asarray(pallas_pairwise_cosine(jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.slow
def test_scorer_pallas_flag_matches_reference(rng):
    from incremental_multimodal_medical_learning_ii_tpu.objectives.scorer import (
        PromptBank,
        score_embeddings,
    )
    from incremental_multimodal_medical_learning_ii_tpu.utils.config import PromptMode

    # interpret-mode pallas inside the scorer: route through a monkeypatched
    # _pairwise is overkill — on CPU the flag stays off in the engine, so
    # here we call the scorer directly with use_pallas and interpret via env.
    # Instead validate the jnp path equivalence of the two code shapes.
    c, p, d = 5, 4, 128
    bank = PromptBank(
        pos=jnp.asarray(rng.normal(size=(c, p, d)).astype(np.float32)),
        neg=jnp.asarray(rng.normal(size=(c, p, d)).astype(np.float32)),
        pos_count=jnp.full(c, p, jnp.int32),
        neg_count=jnp.full(c, p, jnp.int32),
    )
    x = jnp.asarray(rng.normal(size=(16, d)).astype(np.float32))
    a = score_embeddings(x, bank, PromptMode.MEAN, True, False, use_pallas=False)
    np.testing.assert_allclose(np.asarray(a.logits), np.asarray(a.pos_sim - a.neg_sim), atol=1e-6)
    # the pallas branch itself (interpreter off-TPU) must match the jnp path
    b = score_embeddings(x, bank, PromptMode.MEAN, True, False, use_pallas=True)
    np.testing.assert_allclose(np.asarray(b.scores), np.asarray(a.scores), atol=1e-5)
    np.testing.assert_allclose(np.asarray(b.logits), np.asarray(a.logits), atol=1e-5)
