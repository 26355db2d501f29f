"""End-to-end zero-shot parity: raw images + prompts -> scores, torch vs JAX.

The torch side re-implements the reference's zero-shot math independently
(PIL pipeline -> frozen image model -> prompt-mean cosine scores,
``ZERO_JOINT_BOUNDS`` with epochs=0); the JAX side runs this framework's
actual production path (extraction engine -> prompt bank -> eval step).
This is the round-trip analog of the reference's own parity harness
(``test_first_emb.py``) extended across the whole pipeline.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from PIL import Image

import jax

from torch_biovil_fixture import TorchBioViLImage, randomize_bn_stats

from incremental_multimodal_medical_learning_ii_tpu.engine.extract import extract_embeddings
from incremental_multimodal_medical_learning_ii_tpu.models.convert import (
    compare_params,
    convert_biovil_image_state_dict,
    convert_cxr_bert_state_dict,
    encoder_output_dim,
)
from incremental_multimodal_medical_learning_ii_tpu.objectives.scorer import score_embeddings
from incremental_multimodal_medical_learning_ii_tpu.text.bank import build_prompt_bank
from incremental_multimodal_medical_learning_ii_tpu.text.engine import TextInferenceEngine
from incremental_multimodal_medical_learning_ii_tpu.text.prompts import template_prompts
from incremental_multimodal_medical_learning_ii_tpu.text.tokenizer import (
    PromptTokenizer,
    write_test_vocab,
)
from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
    CHEXPERT_COMPETITION_TASKS as TASKS,
    PromptMode,
)

import jax.numpy as jnp

SIZE = 64  # small geometry to keep the CPU run fast


def _torch_preprocess(img_u8: np.ndarray) -> torch.Tensor:
    """Independent torch/PIL re-implementation of the reference pipeline
    (ToPILImage -> Resize(S) -> CenterCrop(S) -> ToTensor -> ExpandChannels)."""
    pil = Image.fromarray(img_u8, "L")
    h, w = img_u8.shape
    if h <= w:
        oh, ow = SIZE, int(SIZE * w / h)  # torchvision truncates the long edge
    else:
        oh, ow = int(SIZE * h / w), SIZE
    pil = pil.resize((ow, oh), Image.BILINEAR)
    arr = np.asarray(pil)
    top = int(round((oh - SIZE) / 2.0))
    left = int(round((ow - SIZE) / 2.0))
    arr = arr[top : top + SIZE, left : left + SIZE]
    t = torch.tensor(arr, dtype=torch.float32) / 255.0
    return t[None].repeat(3, 1, 1)  # (3, S, S)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    torch.manual_seed(11)
    image_model = TorchBioViLImage()
    randomize_bn_stats(image_model, seed=5)
    image_model.eval()

    vocab = write_test_vocab(tmp_path_factory.mktemp("v") / "vocab.txt")
    tokenizer = PromptTokenizer(vocab)

    from incremental_multimodal_medical_learning_ii_tpu.models.cxr_bert import tiny_bert_dims

    dims = tiny_bert_dims(
        vocab_size=tokenizer.tokenizer.vocab_size,
        max_position_embeddings=64,
        projection_size=128,
    )
    from test_models import _hf_bert_with_projection, _state_dict_with_projection

    bert, proj = _hf_bert_with_projection(dims, seed=3)
    bert_params, _ = convert_cxr_bert_state_dict(
        _state_dict_with_projection(bert, proj), num_heads=dims.num_heads
    )

    rng = np.random.default_rng(13)
    images = [(rng.random((90 + i, 70)) * 255).astype(np.uint8) for i in range(6)]
    labels = (rng.random((6, 5)) < 0.4).astype(np.float32)
    return image_model, bert, proj, bert_params, dims, tokenizer, images, labels


def _torch_zero_shot_scores(image_model, bert, proj, tokenizer, images):
    """Reference math: raw cached embeddings, prompt means AFTER (identity)
    adapter, cosine, score=(pos+1)/2."""
    with torch.no_grad():
        batch = torch.stack([_torch_preprocess(im) for im in images])
        img_embs, _ = image_model(batch)  # (B, 128) raw

        prompts = template_prompts(TASKS)
        scores = torch.zeros(len(images), 5)
        for i, cls in enumerate(TASKS):
            def embed(texts):
                ids, mask = tokenizer.tokenize_prompts(texts)
                hidden = bert.bert(
                    input_ids=torch.tensor(ids, dtype=torch.long),
                    attention_mask=torch.tensor(mask, dtype=torch.long),
                ).last_hidden_state
                h = proj.dense_to_hidden(hidden[:, 0, :])
                h = F.gelu(h)
                h = proj.LayerNorm(h)
                return proj.dense_to_output(h)

            pos = embed(prompts[cls]["positive"]).mean(dim=0, keepdim=True)
            neg = embed(prompts[cls]["negative"]).mean(dim=0, keepdim=True)
            pos_sim = F.cosine_similarity(img_embs, pos)
            scores[:, i] = (pos_sim + 1) / 2
        return scores.numpy()


@pytest.mark.slow
def test_zero_shot_pipeline_parity(setup):
    image_model, bert, proj, bert_params, dims, tokenizer, images, labels = setup
    expected = _torch_zero_shot_scores(image_model, bert, proj, tokenizer, images)

    # --- framework path ---
    jax_image_params = convert_biovil_image_state_dict(image_model.state_dict())
    ds = extract_embeddings(
        iter(zip(images, labels)),
        jax_image_params,
        batch_size=3,
        size=SIZE,
        pad_to=128,
        dtype=jnp.float32,
        device_preprocess=False,  # PIL host path: bit-identical preprocessing
    )
    text_engine = TextInferenceEngine(bert_params, dims, tokenizer)
    bank = build_prompt_bank(
        text_engine.encode_fn(normalize=False), template_prompts(TASKS), TASKS
    )
    out = score_embeddings(
        jnp.asarray(ds.embeddings), bank, PromptMode.MEAN,
        train_logit_diff=True, pred_logit_diff=False,
    )
    np.testing.assert_allclose(np.asarray(out.scores), expected, atol=2e-4)


@pytest.mark.slow
def test_zero_shot_pipeline_parity_device_preprocess(setup):
    """Same pipeline with the fused device preprocess: the matmul resize
    differs from PIL's fixed-point path by <=1 uint8 level per pixel, which
    bounds the cosine-score drift."""
    image_model, bert, proj, bert_params, dims, tokenizer, images, labels = setup
    expected = _torch_zero_shot_scores(image_model, bert, proj, tokenizer, images)

    jax_image_params = convert_biovil_image_state_dict(image_model.state_dict())
    ds = extract_embeddings(
        iter(zip(images, labels)),
        jax_image_params,
        batch_size=3,
        size=SIZE,
        pad_to=128,
        dtype=jnp.float32,
        device_preprocess=True,
    )
    text_engine = TextInferenceEngine(bert_params, dims, tokenizer)
    bank = build_prompt_bank(
        text_engine.encode_fn(normalize=False), template_prompts(TASKS), TASKS
    )
    out = score_embeddings(
        jnp.asarray(ds.embeddings), bank, PromptMode.MEAN,
        train_logit_diff=True, pred_logit_diff=False,
    )
    np.testing.assert_allclose(np.asarray(out.scores), expected, atol=5e-3)


def test_compare_params_utility():
    a = {"x": jnp.ones((2, 2)), "y": jnp.zeros(3)}
    b = {"x": jnp.ones((2, 2)), "y": jnp.zeros(3)}
    assert compare_params(a, b, verbose=False) == []
    b["y"] = jnp.ones(3)
    assert compare_params(a, b, verbose=False) == ["['y']"]


@pytest.mark.slow
def test_encoder_output_dim_probe():
    from incremental_multimodal_medical_learning_ii_tpu.models.resnet import (
        init_resnet50,
        resnet50_forward,
    )

    params = init_resnet50(jax.random.PRNGKey(0))
    assert encoder_output_dim(resnet50_forward, params) == 2048
