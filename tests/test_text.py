"""Tokenizer, prompt banks, and the text inference engine."""

import jax
import numpy as np
import pytest

from incremental_multimodal_medical_learning_ii_tpu.models.cxr_bert import (
    init_cxr_bert,
    tiny_bert_dims,
)
from incremental_multimodal_medical_learning_ii_tpu.text.bank import (
    build_prompt_bank,
    synthetic_encode_fn,
)
from incremental_multimodal_medical_learning_ii_tpu.text.engine import TextInferenceEngine
from incremental_multimodal_medical_learning_ii_tpu.text.prompts import (
    basic_prompts,
    compositional_candidates,
    compositional_prompts,
    create_prompts,
    template_prompts,
)
from incremental_multimodal_medical_learning_ii_tpu.text.tokenizer import (
    PromptTokenizer,
    write_test_vocab,
)
from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
    CHEXPERT_COMPETITION_TASKS as TASKS,
)


# ----------------------------------------------------------------------
# Prompt banks
# ----------------------------------------------------------------------
def test_basic_prompts():
    p = basic_prompts(TASKS)
    assert p["Edema"]["positive"] == ["Findings suggesting Edema"]
    assert p["Edema"]["negative"] == ["No evidence of Edema"]


def test_template_prompts_four_each():
    p = template_prompts(TASKS)
    for c in TASKS:
        assert len(p[c]["positive"]) == 4
        assert len(p[c]["negative"]) == 4
        assert f"There is no {c}" in p[c]["negative"]


def test_compositional_candidates_counts():
    # reference products: Atelectasis 3*7*10=210, Cardiomegaly 15, Edema 18,
    # Consolidation 4*6*8=192, Pleural Effusion 6*3*3=54
    assert len(compositional_candidates("Atelectasis")) == 210
    assert len(compositional_candidates("Cardiomegaly")) == 15
    assert len(compositional_candidates("Consolidation")) == 192
    assert len(compositional_candidates("Edema")) == 18
    assert len(compositional_candidates("Pleural Effusion")) == 54


def test_pleural_effusion_field_order():
    # severity, location, subtype composition order for this class
    cands = compositional_candidates("Pleural Effusion")
    assert "small left bilateral pleural effusion" in cands


def test_compositional_prompts_sampling_deterministic():
    a = compositional_prompts(seed=27)
    b = compositional_prompts(seed=27)
    assert a == b
    c = compositional_prompts(seed=28)
    assert a != c
    for cls in a:
        assert len(a[cls]["positive"]) == 10
        assert len(a[cls]["negative"]) == 4


def test_create_prompts_dispatch():
    assert len(create_prompts(TASKS, single_prompt=True)["Edema"]["positive"]) == 1
    assert len(create_prompts(TASKS)["Edema"]["positive"]) == 4
    new = create_prompts(TASKS, new_prompts=True)
    assert len(new["Edema"]["positive"]) == 10
    only_pos = create_prompts(TASKS, new_prompts=True, train_logit_diff=False)
    assert "negative" not in only_pos["Edema"]


def test_build_prompt_bank_padding():
    prompts = create_prompts(TASKS, new_prompts=True)  # 10 pos / 4 neg
    bank = build_prompt_bank(synthetic_encode_fn(), prompts, TASKS)
    assert bank.pos.shape == (5, 10, 128)
    assert int(bank.pos_count[0]) == 10
    assert int(bank.neg_count[0]) == 4
    # padding rows are zero
    assert np.all(np.asarray(bank.neg)[:, 4:, :] == 0)


def test_prompt_bank_save_load(tmp_path):
    from incremental_multimodal_medical_learning_ii_tpu.text.bank import (
        load_prompt_bank,
        save_prompt_bank,
    )

    prompts = create_prompts(TASKS)
    bank = build_prompt_bank(synthetic_encode_fn(), prompts, TASKS)
    save_prompt_bank(tmp_path / "bank.npz", bank)
    back = load_prompt_bank(tmp_path / "bank.npz")
    np.testing.assert_array_equal(np.asarray(back.pos), np.asarray(bank.pos))
    np.testing.assert_array_equal(np.asarray(back.neg_count), np.asarray(bank.neg_count))


def test_build_prompt_bank_pos_only_mirrors():
    prompts = create_prompts(TASKS)
    bank = build_prompt_bank(synthetic_encode_fn(), prompts, TASKS, train_logit_diff=False)
    np.testing.assert_array_equal(np.asarray(bank.pos), np.asarray(bank.neg))


def test_build_prompt_bank_encodes_each_prompt_once():
    """The bank build must hit the encoder once per UNIQUE prompt — with
    train_logit_diff=False the mirrored negative side is gathered, not
    re-encoded (through a real CXR-BERT the duplicate forward is the most
    expensive part of the build)."""
    prompts = create_prompts(TASKS)
    inner = synthetic_encode_fn()
    seen: list = []

    def counting(texts):
        seen.extend(texts)
        return inner(texts)

    bank = build_prompt_bank(counting, prompts, TASKS, train_logit_diff=False)
    n_pos = sum(len(prompts[c]["positive"]) for c in TASKS)
    assert len(seen) == len(set(seen)) == n_pos
    np.testing.assert_array_equal(np.asarray(bank.pos), np.asarray(bank.neg))

    # with negatives: still no duplicate encodes, same bank as before
    seen.clear()
    bank2 = build_prompt_bank(counting, prompts, TASKS, train_logit_diff=True)
    assert len(seen) == len(set(seen))
    np.testing.assert_array_equal(np.asarray(bank2.pos), np.asarray(bank.pos))


# ----------------------------------------------------------------------
# Tokenizer + engine
# ----------------------------------------------------------------------
@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    vocab = write_test_vocab(tmp_path_factory.mktemp("vocab") / "vocab.txt")
    return PromptTokenizer(vocab, max_allowed_input_length=64)


def test_tokenizer_strips_trailing_punctuation(tokenizer):
    ids1, _ = tokenizer.tokenize_prompts("Findings suggesting Edema...")
    ids2, _ = tokenizer.tokenize_prompts("Findings suggesting Edema")
    np.testing.assert_array_equal(ids1, ids2)


def test_tokenizer_rejects_special_tokens(tokenizer):
    with pytest.raises(ValueError):
        tokenizer.tokenize_prompts("hello [SEP] world")
    # [MASK] is allowed
    ids, _ = tokenizer.tokenize_prompts("no evidence of [MASK]")
    assert tokenizer.mask_token_id in ids


def test_tokenizer_pads_longest(tokenizer):
    ids, mask = tokenizer.tokenize_prompts(["there is no edema", "no edema"])
    assert ids.shape == mask.shape
    assert mask[1].sum() < mask[0].sum()


def test_tokenizer_max_length_guard(tokenizer):
    try:  # module-scoped fixture: restore even if the assertion path changes
        tokenizer.max_allowed_input_length = 4
        with pytest.raises(ValueError):
            tokenizer.tokenize_prompts("this prompt is definitely longer than four tokens")
    finally:
        tokenizer.max_allowed_input_length = 64


@pytest.mark.slow
def test_text_engine_embeddings_and_sims(tokenizer):
    dims = tiny_bert_dims(vocab_size=tokenizer.tokenizer.vocab_size, max_position_embeddings=64)
    params = init_cxr_bert(jax.random.PRNGKey(0), dims)
    engine = TextInferenceEngine(params, dims, tokenizer)
    embs = engine.get_embeddings_from_prompt(["there is no edema", "findings suggesting edema"])
    assert embs.shape == (2, dims.projection_size)
    normed = engine.get_embeddings_from_prompt(["there is no edema"], normalize=True)
    np.testing.assert_allclose(np.linalg.norm(normed, axis=-1), 1.0, atol=1e-5)
    sims = engine.get_pairwise_similarities(
        ["there is no edema"], ["findings suggesting edema"]
    )
    assert sims.shape == (1,)
    assert -1.0001 <= sims[0] <= 1.0001


@pytest.mark.slow
def test_text_engine_mlm_fill(tokenizer):
    dims = tiny_bert_dims(vocab_size=tokenizer.tokenizer.vocab_size, max_position_embeddings=64)
    params = init_cxr_bert(jax.random.PRNGKey(1), dims)
    engine = TextInferenceEngine(params, dims, tokenizer)
    out = engine.predict_masked_tokens(["no evidence of [MASK]", "there is no edema"])
    assert len(out) == 2
    assert len(out[0]) == 1  # one [MASK]
    assert out[1] == []


def test_synthetic_encode_fn_cross_process_deterministic():
    """The synthetic encoder must NOT depend on Python's per-process string
    hash salt: an adapter trained against a bank in one process is served
    against a bank rebuilt in another."""
    import subprocess
    import sys

    code = (
        "from incremental_multimodal_medical_learning_ii_tpu.text.bank import "
        "synthetic_encode_fn; import numpy as np; "
        "print(np.round(synthetic_encode_fn(0)(['hello'])[0, :3], 6).tolist())"
    )
    outs = {
        subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            cwd="/root/repo", check=True,
        ).stdout.strip()
        for _ in range(2)
    }
    assert len(outs) == 1, outs


def test_pairwise_similarities_diag_semantics(tokenizer):
    """torch.diag semantics: min(N1, N2) similarities, no broadcast error."""
    import jax

    from incremental_multimodal_medical_learning_ii_tpu.models.cxr_bert import (
        init_cxr_bert,
        tiny_bert_dims,
    )
    from incremental_multimodal_medical_learning_ii_tpu.text.engine import (
        TextInferenceEngine,
    )

    dims = tiny_bert_dims(vocab_size=tokenizer.tokenizer.vocab_size)
    eng = TextInferenceEngine(init_cxr_bert(jax.random.PRNGKey(0), dims), dims, tokenizer)
    sims = eng.get_pairwise_similarities(
        ["there is edema", "no edema"], ["no edema", "there is edema", "edema"]
    )
    assert sims.shape == (2,)
    assert np.all(np.abs(sims) <= 1.0 + 1e-5)


def test_engine_never_raises_tokenizer_cap(tokenizer):
    """A tighter caller-configured prompt-length budget must survive engine
    construction; only the model's hard position cap may LOWER it."""
    from incremental_multimodal_medical_learning_ii_tpu.models.cxr_bert import (
        init_cxr_bert,
        tiny_bert_dims,
    )
    import jax

    dims = tiny_bert_dims(vocab_size=tokenizer.tokenizer.vocab_size,
                          max_position_embeddings=512)
    params = init_cxr_bert(jax.random.PRNGKey(0), dims)
    tokenizer.max_allowed_input_length = 7
    TextInferenceEngine(params, dims, tokenizer)
    assert tokenizer.max_allowed_input_length == 7  # budget kept
    tokenizer.max_allowed_input_length = 10_000
    TextInferenceEngine(params, dims, tokenizer)
    assert tokenizer.max_allowed_input_length == 512  # hard cap enforced
    tokenizer.max_allowed_input_length = 64  # restore the fixture's value
