"""Twin-run parity for the vendored text engine's non-embedding methods.

The joint/class-inc twins (test_twin_run.py) already execute the vendored
tokenize->CXR-BERT->projection path as ground truth for prompt embeddings;
these tests twin the REMAINING vendored TextInferenceEngine surface —
``get_pairwise_similarities`` (inference_engine.py:72-82), MLM
``predict_masked_tokens`` (:84-119), the special-token rejection
(text/data/io.py:53-58, [MASK] exempt) and the max-length guard
(inference_engine.py:43-46) — against the framework engine over identical
weights (reference_twin.make_paired_text_engines).
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_twin import (  # noqa: E402
    make_paired_text_engines,
    make_real_text_engine,
)


@pytest.fixture(scope="module")
def engines(tmp_path_factory):
    return make_paired_text_engines(tmp_path_factory.mktemp("text_twin"), seed=5)


def test_twin_pairwise_similarities(engines):
    ref, fw = engines
    set1 = ["there is edema", "no evidence of edema!", "pleural effusion"]
    set2 = ["findings suggesting edema", "no edema.", "small pleural effusion"]
    ref_sims = ref.get_pairwise_similarities(set1, set2).numpy()
    fw_sims = np.asarray(fw.get_pairwise_similarities(set1, set2))
    assert ref_sims.shape == fw_sims.shape == (3,)
    np.testing.assert_allclose(fw_sims, ref_sims, atol=3e-5)


def test_twin_predict_masked_tokens(engines):
    """Top-1 MLM fill at every [MASK] position — token STRINGS equal, which
    requires logits argmax parity through the full MaskedLM head."""
    ref, fw = engines
    prompts = [
        "no evidence of [MASK]",
        "there is [MASK] pleural effusion",
        "findings suggesting [MASK] and [MASK]",
        "there is no edema",  # no mask -> empty list
    ]
    ref_out = ref.predict_masked_tokens(prompts)
    fw_out = fw.predict_masked_tokens(prompts)
    assert ref_out == fw_out
    assert ref_out[3] == []
    assert len(ref_out[2]) == 2


def test_twin_special_token_rejection(engines):
    """[MASK] is exempt but every other special token raises (io.py:53-58);
    both sides must agree — including that the check runs on the JOINED
    prompt string, so a special token in ANY prompt rejects the batch."""
    ref, fw = engines
    for bad in (["hello [SEP] world"], ["fine prompt", "[CLS] sneaky"],
                ["[PAD] oops"], ["[UNK] text"]):
        with pytest.raises(ValueError):
            ref.get_embeddings_from_prompt(bad, verbose=False)
        with pytest.raises(ValueError):
            fw.get_embeddings_from_prompt(bad, normalize=True)
    # [MASK] passes both
    ref.get_embeddings_from_prompt(["there is [MASK]"], verbose=False)
    fw.get_embeddings_from_prompt(["there is [MASK]"], normalize=True)


def test_twin_max_length_guard(tmp_path):
    """Sequences longer than max_position_embeddings raise on both sides
    (vendored engine guard inference_engine.py:43-46; framework tokenizer
    guard text/tokenizer.py:60-67)."""
    from incremental_multimodal_medical_learning_ii_tpu.models.convert import (
        convert_cxr_bert_state_dict,
    )
    from incremental_multimodal_medical_learning_ii_tpu.text.engine import (
        TextInferenceEngine as FwEngine,
    )
    from incremental_multimodal_medical_learning_ii_tpu.text.tokenizer import (
        PromptTokenizer,
        write_test_vocab,
    )

    vocab = write_test_vocab(tmp_path / "vocab.txt")
    ref = make_real_text_engine(vocab, seed=5, max_pos=8)
    params, dims = convert_cxr_bert_state_dict(
        ref.model.state_dict(), num_heads=ref.model.config.num_attention_heads
    )
    fw = FwEngine(params, dims, PromptTokenizer(vocab, max_allowed_input_length=8))
    long_prompt = ["edema " * 20]
    with pytest.raises(ValueError):
        ref.get_embeddings_from_prompt(long_prompt, verbose=False)
    with pytest.raises(ValueError):
        fw.get_embeddings_from_prompt(long_prompt)
    short = ["there is edema"]
    ref_emb = ref.get_embeddings_from_prompt(short, verbose=False).numpy()
    fw_emb = np.asarray(fw.get_embeddings_from_prompt(short, normalize=True))
    np.testing.assert_allclose(fw_emb, ref_emb, atol=3e-5)


def test_twin_rstrip_punctuation_convention(engines):
    """Trailing '!?.' is stripped before tokenization (io.py:41) — prompts
    differing only in terminal punctuation embed IDENTICALLY on both sides,
    while interior punctuation does not."""
    ref, fw = engines
    a = ref.get_embeddings_from_prompt(["there is edema"], verbose=False).numpy()
    b = ref.get_embeddings_from_prompt(["there is edema!?."], verbose=False).numpy()
    np.testing.assert_array_equal(a, b)
    fa = np.asarray(fw.get_embeddings_from_prompt(["there is edema"], normalize=True))
    fb = np.asarray(fw.get_embeddings_from_prompt(["there is edema!?."], normalize=True))
    np.testing.assert_array_equal(fa, fb)
    np.testing.assert_allclose(fa, a, atol=3e-5)
