"""Numerical parity of the JAX towers + converters against torch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
    biovil_image_forward,
    get_patchwise_projected_embeddings,
    init_biovil_image_model,
)
from incremental_multimodal_medical_learning_ii_tpu.models.convert import (
    convert_biovil_image_state_dict,
    convert_cxr_bert_state_dict,
)
from incremental_multimodal_medical_learning_ii_tpu.models.cxr_bert import (
    BertDims,
    bert_encode,
    get_projected_text_embeddings,
    init_cxr_bert,
    mlm_logits,
    tiny_bert_dims,
)

from torch_biovil_fixture import TorchBioViLImage, randomize_bn_stats


# ----------------------------------------------------------------------
# Image tower
# ----------------------------------------------------------------------
@pytest.fixture(scope="module")
def torch_biovil():
    torch.manual_seed(27)
    model = TorchBioViLImage()
    randomize_bn_stats(model, seed=3)
    model.eval()
    return model


@pytest.mark.slow
def test_biovil_image_parity(torch_biovil):
    params = convert_biovil_image_state_dict(torch_biovil.state_dict())
    x = np.random.default_rng(0).random((2, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        t_global, t_patch = torch_biovil(torch.tensor(x))
    out = biovil_image_forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out.projected_global_embedding), t_global.numpy(), atol=2e-4
    )
    # patch grid: ours NHWC vs torch NCHW
    np.testing.assert_allclose(
        np.asarray(out.projected_patch_embeddings),
        t_patch.numpy().transpose(0, 2, 3, 1),
        atol=2e-4,
    )


@pytest.mark.slow
def test_biovil_patchwise_normalized(torch_biovil):
    params = convert_biovil_image_state_dict(torch_biovil.state_dict())
    x = np.random.default_rng(1).random((1, 3, 96, 96)).astype(np.float32)
    patches = get_patchwise_projected_embeddings(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), normalize=True
    )
    norms = np.linalg.norm(np.asarray(patches), axis=-1)
    np.testing.assert_allclose(norms, np.ones_like(norms), atol=1e-5)


@pytest.mark.slow
def test_resnet18_parity():
    from torch_biovil_fixture import ResNet18Trunk, randomize_bn_stats

    from incremental_multimodal_medical_learning_ii_tpu.models.convert import (
        convert_resnet18_state_dict,
    )
    from incremental_multimodal_medical_learning_ii_tpu.models.resnet import (
        init_resnet18,
        resnet18_forward,
    )

    torch.manual_seed(1)
    trunk = ResNet18Trunk()
    randomize_bn_stats(trunk, seed=7)
    trunk.eval()
    params = convert_resnet18_state_dict(trunk.state_dict())
    x = np.random.default_rng(3).random((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        expected = trunk(torch.tensor(x)).numpy()
    got = np.asarray(resnet18_forward(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, expected.transpose(0, 2, 3, 1), atol=2e-4)

    # random init shape check
    p2 = init_resnet18(jax.random.PRNGKey(0))
    out = resnet18_forward(p2, jnp.ones((1, 64, 64, 3)))
    assert out.shape == (1, 2, 2, 512)


@pytest.mark.slow
def test_biovil_random_init_shapes():
    params = init_biovil_image_model(jax.random.PRNGKey(0))
    x = jnp.ones((1, 64, 64, 3))
    out = biovil_image_forward(params, x)
    assert out.projected_global_embedding.shape == (1, 128)
    assert out.projected_patch_embeddings.shape == (1, 2, 2, 128)
    assert out.img_embedding.shape == (1, 2048)


@pytest.mark.slow
def test_biovil_bf16_compute_close_to_fp32(torch_biovil):
    params = convert_biovil_image_state_dict(torch_biovil.state_dict())
    x = jnp.asarray(np.random.default_rng(2).random((1, 3, 96, 96)).astype(np.float32).transpose(0, 2, 3, 1))
    f32 = biovil_image_forward(params, x, dtype=jnp.float32).projected_global_embedding
    bf16 = biovil_image_forward(params, x, dtype=jnp.bfloat16).projected_global_embedding
    # bf16 trunk compute: embeddings agree to ~1e-2 in cosine terms
    cos = float(
        jnp.sum(f32 * bf16) / (jnp.linalg.norm(f32) * jnp.linalg.norm(bf16))
    )
    assert cos > 0.999


# ----------------------------------------------------------------------
# Text tower
# ----------------------------------------------------------------------
def _hf_bert_with_projection(dims: BertDims, seed=0):
    from transformers import BertConfig, BertForMaskedLM

    torch.manual_seed(seed)
    config = BertConfig(
        vocab_size=dims.vocab_size,
        hidden_size=dims.hidden_size,
        num_hidden_layers=dims.num_layers,
        num_attention_heads=dims.num_heads,
        intermediate_size=dims.intermediate_size,
        max_position_embeddings=dims.max_position_embeddings,
        type_vocab_size=dims.type_vocab_size,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    model = BertForMaskedLM(config)
    model.eval()

    proj = torch.nn.Module()
    proj.dense_to_hidden = torch.nn.Linear(dims.hidden_size, dims.projection_size)
    proj.LayerNorm = torch.nn.LayerNorm(dims.projection_size, eps=1e-12)
    proj.dense_to_output = torch.nn.Linear(dims.projection_size, dims.projection_size)
    return model, proj


def _state_dict_with_projection(model, proj):
    sd = {k: v for k, v in model.state_dict().items()}
    for k, v in proj.state_dict().items():
        sd["cls_projection_head." + k] = v
    return sd


@pytest.mark.slow
def test_cxr_bert_encoder_parity():
    dims = tiny_bert_dims()
    model, proj = _hf_bert_with_projection(dims)
    params, inferred = convert_cxr_bert_state_dict(
        _state_dict_with_projection(model, proj), num_heads=dims.num_heads
    )
    assert inferred.vocab_size == dims.vocab_size
    assert inferred.num_layers == dims.num_layers

    rng = np.random.default_rng(5)
    ids = rng.integers(0, dims.vocab_size, size=(3, 10)).astype(np.int32)
    mask = np.ones((3, 10), np.int32)
    mask[1, 7:] = 0  # padded prompt
    mask[2, 4:] = 0

    with torch.no_grad():
        hf_out = model.bert(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state.numpy()
    ours = np.asarray(bert_encode(params, jnp.asarray(ids), jnp.asarray(mask), dims))
    np.testing.assert_allclose(ours, hf_out, atol=2e-5)


@pytest.mark.slow
def test_cxr_bert_projected_embedding_parity():
    dims = tiny_bert_dims()
    model, proj = _hf_bert_with_projection(dims, seed=1)
    params, _ = convert_cxr_bert_state_dict(
        _state_dict_with_projection(model, proj), num_heads=dims.num_heads
    )
    rng = np.random.default_rng(6)
    ids = rng.integers(0, dims.vocab_size, size=(4, 8)).astype(np.int32)
    mask = np.ones((4, 8), np.int32)
    mask[0, 5:] = 0

    with torch.no_grad():
        hidden = model.bert(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state
        cls = hidden[:, 0, :]
        h = proj.dense_to_hidden(cls)
        h = torch.nn.functional.gelu(h)
        h = proj.LayerNorm(h)
        expected = proj.dense_to_output(h).numpy()

    ours = np.asarray(
        get_projected_text_embeddings(params, jnp.asarray(ids), jnp.asarray(mask), dims)
    )
    np.testing.assert_allclose(ours, expected, atol=2e-5)

    # normalised variant
    ours_n = np.asarray(
        get_projected_text_embeddings(
            params, jnp.asarray(ids), jnp.asarray(mask), dims, normalize=True
        )
    )
    np.testing.assert_allclose(np.linalg.norm(ours_n, axis=-1), 1.0, atol=1e-5)


@pytest.mark.slow
def test_mlm_logits_parity():
    dims = tiny_bert_dims()
    model, proj = _hf_bert_with_projection(dims, seed=2)
    params, _ = convert_cxr_bert_state_dict(
        _state_dict_with_projection(model, proj), num_heads=dims.num_heads
    )
    rng = np.random.default_rng(7)
    ids = rng.integers(0, dims.vocab_size, size=(2, 6)).astype(np.int32)
    mask = np.ones((2, 6), np.int32)
    with torch.no_grad():
        expected = model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).logits.numpy()
    hidden = bert_encode(params, jnp.asarray(ids), jnp.asarray(mask), dims)
    ours = np.asarray(mlm_logits(params, hidden))
    np.testing.assert_allclose(ours, expected, atol=3e-5)


@pytest.mark.slow
def test_random_init_runs():
    dims = tiny_bert_dims()
    params = init_cxr_bert(jax.random.PRNGKey(0), dims)
    ids = jnp.zeros((2, 5), jnp.int32)
    mask = jnp.ones((2, 5), jnp.int32)
    out = get_projected_text_embeddings(params, ids, mask, dims)
    assert out.shape == (2, dims.projection_size)


# ----------------------------------------------------------------------
# HF snapshot directory loading (health_multimodal/text/utils.py:16-25)
# ----------------------------------------------------------------------
def _write_snapshot(tmp_path, dims, model, proj, weights_format="bin"):
    import json

    cfg = {
        "vocab_size": dims.vocab_size,
        "hidden_size": dims.hidden_size,
        "num_hidden_layers": dims.num_layers,
        "num_attention_heads": dims.num_heads,
        "intermediate_size": dims.intermediate_size,
        "max_position_embeddings": dims.max_position_embeddings,
        "type_vocab_size": dims.type_vocab_size,
        "projection_size": dims.projection_size,
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg))
    sd = _state_dict_with_projection(model, proj)
    if weights_format == "safetensors":
        from safetensors.numpy import save_file

        save_file(
            {k: v.detach().numpy() for k, v in sd.items()},
            str(tmp_path / "model.safetensors"),
        )
    else:
        torch.save(sd, tmp_path / "pytorch_model.bin")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"tok{i}" for i in range(dims.vocab_size - 5)
    ]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab) + "\n")
    return sd


@pytest.mark.parametrize(
    "weights_format",
    [
        # the torch-pickle roundtrip is the pricier variant (~8s): slow tier
        pytest.param("bin", marks=pytest.mark.slow),
        "safetensors",
    ],
)
def test_cxr_bert_snapshot_loading(tmp_path, weights_format):
    """config.json drives the dims — in particular num_attention_heads=4
    with hidden=32, which the old head-dim-64 heuristic would get wrong —
    and the loaded params match transformers at fp32 tolerance."""
    from incremental_multimodal_medical_learning_ii_tpu.models.convert import (
        load_cxr_bert_snapshot,
    )

    dims = tiny_bert_dims()  # hidden 32, heads 4 -> hidden//64 guess would be 1
    model, proj = _hf_bert_with_projection(dims)
    _write_snapshot(tmp_path, dims, model, proj, weights_format)

    params, loaded_dims, tokenizer = load_cxr_bert_snapshot(tmp_path)
    assert loaded_dims == dims
    assert loaded_dims.num_heads == 4
    assert tokenizer is not None
    assert tokenizer.max_allowed_input_length == dims.max_position_embeddings

    rng = np.random.default_rng(3)
    ids = rng.integers(0, dims.vocab_size, size=(2, 9)).astype(np.int32)
    mask = np.ones((2, 9), np.int32)
    mask[1, 5:] = 0
    with torch.no_grad():
        hf_out = model.bert(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state.numpy()
    ours = np.asarray(
        bert_encode(params, jnp.asarray(ids), jnp.asarray(mask), loaded_dims)
    )
    np.testing.assert_allclose(ours, hf_out, atol=2e-5)


def test_cxr_bert_snapshot_rejects_lying_config(tmp_path):
    import json

    from incremental_multimodal_medical_learning_ii_tpu.models.convert import (
        load_cxr_bert_snapshot,
    )

    dims = tiny_bert_dims()
    model, proj = _hf_bert_with_projection(dims)
    _write_snapshot(tmp_path, dims, model, proj)
    cfg = json.loads((tmp_path / "config.json").read_text())
    cfg["hidden_size"] = 64  # contradicts the 32-wide tensors
    (tmp_path / "config.json").write_text(json.dumps(cfg))
    with pytest.raises(ValueError, match="hidden_size"):
        load_cxr_bert_snapshot(tmp_path)


def test_cxr_bert_snapshot_missing_weights(tmp_path):
    import json

    from incremental_multimodal_medical_learning_ii_tpu.models.convert import (
        load_cxr_bert_snapshot,
    )

    (tmp_path / "config.json").write_text(json.dumps({"num_attention_heads": 4}))
    with pytest.raises(FileNotFoundError, match="model.safetensors"):
        load_cxr_bert_snapshot(tmp_path)


def test_cxr_bert_snapshot_honors_tokenizer_config(tmp_path):
    """tokenizer_config.json options (here do_lower_case=false, as the
    reference's CXRBertTokenizer.from_pretrained would apply them) must
    reach the tokenizer — ignoring the file silently tokenizes every
    prompt differently from the reference."""
    import json

    from incremental_multimodal_medical_learning_ii_tpu.models.convert import (
        load_cxr_bert_snapshot,
    )

    dims = tiny_bert_dims()
    model, proj = _hf_bert_with_projection(dims)
    _write_snapshot(tmp_path, dims, model, proj, "safetensors")
    # give the vocab a cased token so the case policy is observable
    vocab_path = tmp_path / "vocab.txt"
    vocab = vocab_path.read_text().splitlines()
    vocab[5] = "Tok0"
    vocab_path.write_text("\n".join(vocab) + "\n")
    (tmp_path / "tokenizer_config.json").write_text(json.dumps(
        {"do_lower_case": False,
         "mask_token": {"content": "[MASK]"},  # AddedToken-dict form
         "model_max_length": 512}              # non-BertTokenizer key: ignored
    ))

    _, _, tok = load_cxr_bert_snapshot(tmp_path)
    ids_cased, _ = tok.tokenize_prompts(["Tok0"])
    assert 5 in ids_cased[0]  # cased token survives

    (tmp_path / "tokenizer_config.json").write_text(json.dumps({"do_lower_case": True}))
    _, _, tok_lower = load_cxr_bert_snapshot(tmp_path)
    ids_lower, _ = tok_lower.tokenize_prompts(["Tok0"])
    assert 5 not in ids_lower[0]  # lower-cased away from the cased entry
