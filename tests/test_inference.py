"""Serving classifier: raw images -> scores, consistent with the offline
extraction + scorer path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from incremental_multimodal_medical_learning_ii_tpu.data.store import EmbeddingDataset
from incremental_multimodal_medical_learning_ii_tpu.engine.extract import extract_embeddings
from incremental_multimodal_medical_learning_ii_tpu.inference import ChexpertClassifier
from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
    init_biovil_image_model,
)
from incremental_multimodal_medical_learning_ii_tpu.objectives.scorer import (
    PromptBank,
    score_embeddings,
)
from incremental_multimodal_medical_learning_ii_tpu.utils.config import PromptMode


def _bank(rng, c=5, p=4, d=128):
    pos = rng.normal(size=(c, p, d)).astype(np.float32)
    neg = rng.normal(size=(c, p, d)).astype(np.float32)
    cnt = jnp.full(c, p, jnp.int32)
    return PromptBank(jnp.asarray(pos), jnp.asarray(neg), cnt, cnt)


@pytest.mark.slow
def test_classifier_matches_offline_pipeline(rng):
    params = init_biovil_image_model(jax.random.PRNGKey(0))
    bank = _bank(rng)
    images = [(rng.random((100, 80)) * 255).astype(np.uint8) for _ in range(5)]

    clf = ChexpertClassifier(
        params, bank, batch_size=2, size=64, pad_to=128, dtype=jnp.float32
    )
    scores, preds = clf.predict_arrays(images)
    assert scores.shape == (5, 5) and preds.shape == (5, 5)

    # offline path: extraction then scorer
    ds = extract_embeddings(
        iter((im, np.zeros(5, np.float32)) for im in images),
        params, batch_size=2, size=64, pad_to=128, dtype=jnp.float32,
    )
    out = score_embeddings(
        jnp.asarray(ds.embeddings), bank, PromptMode.MEAN, True, False
    )
    np.testing.assert_allclose(scores, np.asarray(out.scores), atol=1e-5)
    np.testing.assert_array_equal(preds, np.asarray(out.preds))


@pytest.mark.slow
def test_classifier_with_trained_adapters(rng):
    from incremental_multimodal_medical_learning_ii_tpu.utils.config import joint_config

    cfg = joint_config(batch_size=32, epochs=1)
    params = init_biovil_image_model(jax.random.PRNGKey(0))
    bank = _bank(rng)
    from incremental_multimodal_medical_learning_ii_tpu.models.adapters import AdapterPair

    pair = AdapterPair(cfg.adapter, cfg.shared, cfg.image_adapter, cfg.text_adapter)
    adapter_params = pair.init(jax.random.PRNGKey(3))
    clf = ChexpertClassifier(
        params, bank, cfg=cfg, adapter_params=adapter_params,
        batch_size=4, size=64, pad_to=128, dtype=jnp.float32,
    )
    images = [(rng.random((90, 70)) * 255).astype(np.uint8) for _ in range(3)]
    scores, _ = clf.predict_arrays(images)
    assert scores.shape == (3, 5)
    assert np.all((0 <= scores) & (scores <= 1))


def test_classifier_retries_transient_errors(rng, monkeypatch):
    """A transient backend error during a serving dispatch is retried with
    re-dispatch (the extraction loop's policy) instead of failing the
    request."""
    import jax
    import jax.numpy as jnp

    from incremental_multimodal_medical_learning_ii_tpu.inference import ChexpertClassifier
    from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
        init_biovil_image_model,
    )
    from incremental_multimodal_medical_learning_ii_tpu.text.bank import (
        build_prompt_bank,
        synthetic_encode_fn,
    )
    from incremental_multimodal_medical_learning_ii_tpu.text.prompts import create_prompts
    from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
        CHEXPERT_COMPETITION_TASKS,
    )

    bank = build_prompt_bank(
        synthetic_encode_fn(), create_prompts(CHEXPERT_COMPETITION_TASKS),
        CHEXPERT_COMPETITION_TASKS,
    )
    clf = ChexpertClassifier(
        init_biovil_image_model(jax.random.PRNGKey(0)), bank,
        batch_size=2, size=64, pad_to=128, dtype=jnp.float32,
        retries=2, retry_backoff_s=0.0,
    )
    imgs = [(rng.random((70, 60)) * 255).astype(np.uint8) for _ in range(2)]
    clean_scores, clean_preds = clf.predict_arrays(imgs)

    real_fn = clf._fn
    fail = {"n": 1}

    def flaky_fn(*args):
        if fail["n"] > 0:
            fail["n"] -= 1
            raise RuntimeError("injected transient backend error")
        return real_fn(*args)

    clf._fn = flaky_fn
    scores, preds = clf.predict_arrays(imgs)
    assert fail["n"] == 0
    np.testing.assert_allclose(scores, clean_scores, atol=1e-6)
    np.testing.assert_array_equal(preds, clean_preds)

    clf._fn = lambda *a: (_ for _ in ()).throw(RuntimeError("permanently down"))
    with pytest.raises(RuntimeError, match="permanently down"):
        clf.predict_arrays(imgs)
