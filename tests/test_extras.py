"""Dilated convs, multitask heads, LR schedule, analysis CLI, VLP engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incremental_multimodal_medical_learning_ii_tpu.models.heads import (
    init_multitask_head,
    multitask_head_forward,
)
from incremental_multimodal_medical_learning_ii_tpu.models.resnet import (
    init_resnet50,
    resnet50_forward,
)


@pytest.mark.slow
def test_dilated_layer4_keeps_resolution():
    params = init_resnet50(jax.random.PRNGKey(0))
    x = jnp.ones((1, 64, 64, 3))
    normal = resnet50_forward(params, x)
    dilated = resnet50_forward(params, x, replace_stride_with_dilation=(False, False, True))
    assert normal.shape == (1, 2, 2, 2048)
    assert dilated.shape == (1, 4, 4, 2048)  # layer4 stride removed


@pytest.mark.slow
def test_multitask_head_shapes():
    params = init_multitask_head(jax.random.PRNGKey(0), 2048, num_classes=3, num_tasks=4)
    out = multitask_head_forward(params, jnp.ones((2, 2048)))
    assert out.shape == (2, 3, 4)
    params_h = init_multitask_head(
        jax.random.PRNGKey(1), 2048, num_classes=2, num_tasks=3, hidden_dim=64
    )
    out = multitask_head_forward(params_h, jnp.ones((5, 2048)))
    assert out.shape == (5, 2, 3)


def test_multitask_head_linear_matches_torch(rng):
    import torch

    params = init_multitask_head(jax.random.PRNGKey(2), 16, num_classes=3, num_tasks=2)
    x = rng.normal(size=(4, 16)).astype(np.float32)
    got = np.asarray(multitask_head_forward(params, jnp.asarray(x)))
    for t in range(2):
        lin = torch.nn.Linear(16, 3)
        with torch.no_grad():
            lin.weight.copy_(torch.tensor(np.asarray(params["w"][t]).T))
            lin.bias.copy_(torch.tensor(np.asarray(params["b"][t])))
        expected = lin(torch.tensor(x)).detach().numpy()
        np.testing.assert_allclose(got[:, :, t], expected, atol=1e-5)


def test_exponential_lr_schedule():
    from incremental_multimodal_medical_learning_ii_tpu.engine.steps import lr_schedule_fn
    from incremental_multimodal_medical_learning_ii_tpu.utils.config import joint_config

    cfg = joint_config(lr=0.1, lr_schedule="exponential", lr_gamma=0.9)
    fn = lr_schedule_fn(cfg)
    assert float(fn(0)) == pytest.approx(0.1)
    assert float(fn(2)) == pytest.approx(0.1 * 0.9**2)
    flat = lr_schedule_fn(joint_config(lr=0.1))
    assert flat(100) == 0.1


@pytest.mark.slow
def test_training_with_lr_schedule_runs(tmp_path):
    from incremental_multimodal_medical_learning_ii_tpu.data.store import synthetic_dataset
    from incremental_multimodal_medical_learning_ii_tpu.engine.trainer import Trainer
    from incremental_multimodal_medical_learning_ii_tpu.evaluation.tb import TBWriter
    from incremental_multimodal_medical_learning_ii_tpu.text.bank import (
        build_prompt_bank,
        synthetic_encode_fn,
    )
    from incremental_multimodal_medical_learning_ii_tpu.text.prompts import create_prompts
    from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
        CHEXPERT_COMPETITION_TASKS,
        joint_config,
    )

    cfg = joint_config(batch_size=64, epochs=1, lr_schedule="exponential", lr_gamma=0.99)
    bank = build_prompt_bank(
        synthetic_encode_fn(), create_prompts(CHEXPERT_COMPETITION_TASKS),
        CHEXPERT_COMPETITION_TASKS,
    )
    writer = TBWriter(str(tmp_path))
    trainer = Trainer(cfg, bank, writer)
    trainer.train(synthetic_dataset(128), epoch=1)
    writer.close()

    from tensorboard.backend.event_processing.event_accumulator import EventAccumulator

    acc = EventAccumulator(str(tmp_path))
    acc.Reload()
    assert "train/LR" in acc.Tags()["scalars"]


def test_analyze_prompts_cli(tmp_path):
    from incremental_multimodal_medical_learning_ii_tpu.cli.analyze_prompts import main

    main(["--out-dir", str(tmp_path)])
    assert (tmp_path / "cosine_similarity_heat_map.png").exists()
    assert (tmp_path / "pca_multiple_prompts.png").exists()
    assert (tmp_path / "tsne_multiple_prompts.png").exists()


def test_analyze_prompts_partition_requires_checkpoint(tmp_path):
    from incremental_multimodal_medical_learning_ii_tpu.cli.analyze_prompts import main

    with pytest.raises(SystemExit, match="partition needs"):
        main(["--out-dir", str(tmp_path), "--partition", "sp"])


@pytest.mark.slow
def test_build_bank_rejects_mismatched_projection(tmp_path):
    """A text checkpoint that projects outside the 128-d joint space must
    fail with a clear message, not the bank's raw shape assertion."""
    import argparse

    import torch

    from incremental_multimodal_medical_learning_ii_tpu.cli import common
    from incremental_multimodal_medical_learning_ii_tpu.models.cxr_bert import (
        tiny_bert_dims,
    )
    from incremental_multimodal_medical_learning_ii_tpu.text.tokenizer import (
        write_test_vocab,
    )
    from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
        ExperimentConfig,
    )
    from test_models import _hf_bert_with_projection, _state_dict_with_projection

    vocab = write_test_vocab(tmp_path / "vocab.txt")
    model, proj = _hf_bert_with_projection(tiny_bert_dims(vocab_size=1000))
    ckpt = tmp_path / "tiny.pt"
    torch.save(_state_dict_with_projection(model, proj), ckpt)
    args = argparse.Namespace(
        cxr_bert_snapshot=None, cxr_bert_checkpoint=str(ckpt),
        cxr_bert_vocab=str(vocab),
    )
    cfg = ExperimentConfig(mode="joint", epochs=1)
    with pytest.raises(SystemExit, match="joint space is 128-d"):
        common.build_bank(args, cfg)


@pytest.mark.slow
def test_analyze_prompts_cli_partitioned(tmp_path):
    """--partition sp drives the real multi-device text encode end-to-end
    through the CLI: tiny torch CXR-BERT checkpoint -> converter -> ring
    attention over a (2 data x 4 seq) mesh -> figures."""
    import torch

    from incremental_multimodal_medical_learning_ii_tpu.cli.analyze_prompts import main
    from incremental_multimodal_medical_learning_ii_tpu.models.cxr_bert import (
        tiny_bert_dims,
    )
    from incremental_multimodal_medical_learning_ii_tpu.text.tokenizer import (
        PromptTokenizer,
        write_test_vocab,
    )
    from test_models import _hf_bert_with_projection, _state_dict_with_projection

    vocab = write_test_vocab(tmp_path / "vocab.txt")
    n_vocab = PromptTokenizer(vocab).tokenizer.vocab_size
    dims = tiny_bert_dims(vocab_size=n_vocab, max_position_embeddings=64)
    model, proj = _hf_bert_with_projection(dims)
    ckpt = tmp_path / "cxr_bert.pt"
    torch.save(_state_dict_with_projection(model, proj), ckpt)

    out = tmp_path / "plots"
    main([
        "--out-dir", str(out),
        "--cxr-bert-checkpoint", str(ckpt), "--cxr-bert-vocab", str(vocab),
        "--cxr-bert-num-heads", str(dims.num_heads),  # tiny dims defeat the
        # hidden//64 heuristic; real CXR-BERT needs no flag
        "--partition", "sp", "--partition-size", "4",
    ])
    assert (out / "cosine_similarity_heat_map.png").exists()
    assert (out / "pca_multiple_prompts.png").exists()
    assert (out / "tsne_multiple_prompts.png").exists()
    # numeric sp-vs-dense parity of the underlying embeddings is pinned by
    # tests/test_sp.py; this test pins the CLI wiring end-to-end


@pytest.mark.slow
def test_vlp_similarity_engine(tmp_path, rng):
    from PIL import Image

    from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
        init_biovil_image_model,
    )
    from incremental_multimodal_medical_learning_ii_tpu.models.cxr_bert import (
        init_cxr_bert,
        tiny_bert_dims,
    )
    from incremental_multimodal_medical_learning_ii_tpu.text.engine import TextInferenceEngine
    from incremental_multimodal_medical_learning_ii_tpu.text.tokenizer import (
        PromptTokenizer,
        write_test_vocab,
    )
    from incremental_multimodal_medical_learning_ii_tpu.vlp.engine import (
        ImageTextInferenceEngine,
        plot_phrase_grounding_similarity_map,
    )

    img_path = tmp_path / "cxr.png"
    Image.fromarray((rng.random((200, 160)) * 255).astype(np.uint8), "L").save(img_path)

    vocab = write_test_vocab(tmp_path / "vocab.txt")
    dims = tiny_bert_dims(
        vocab_size=PromptTokenizer(vocab).tokenizer.vocab_size,
        max_position_embeddings=64, projection_size=128,
    )
    text_engine = TextInferenceEngine(
        init_cxr_bert(jax.random.PRNGKey(0), dims), dims, PromptTokenizer(vocab)
    )
    image_params = init_biovil_image_model(jax.random.PRNGKey(1))
    engine = ImageTextInferenceEngine(image_params, text_engine, resize_size=128, crop_size=96)

    score = engine.get_similarity_score_from_raw_data(img_path, ["findings suggesting edema"])
    assert -1.0001 <= score <= 1.0001

    sim_map = engine.get_similarity_map_from_raw_data(img_path, "findings suggesting edema")
    assert sim_map.shape == (200, 160)
    # NaN padding outside the crop, finite inside
    assert np.isnan(sim_map[0, 0])
    assert np.isfinite(sim_map[100, 80])

    fig = plot_phrase_grounding_similarity_map(img_path, sim_map)
    assert fig is not None

    # single-pass variant: one load + one text encode, same outputs
    score1, map1 = engine.get_score_and_map_from_raw_data(
        img_path, "findings suggesting edema"
    )
    np.testing.assert_allclose(
        score1,
        engine.get_similarity_score_from_raw_data(img_path, "findings suggesting edema"),
        atol=1e-6,
    )
    np.testing.assert_allclose(map1, sim_map, atol=1e-6)


@pytest.mark.slow
def test_image_inference_engine(tmp_path, rng):
    from PIL import Image

    from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
        init_biovil_image_model,
    )
    from incremental_multimodal_medical_learning_ii_tpu.models.image_engine import (
        ImageInferenceEngine,
    )

    img_path = tmp_path / "cxr.png"
    Image.fromarray((rng.random((150, 120)) * 255).astype(np.uint8), "L").save(img_path)
    engine = ImageInferenceEngine(
        init_biovil_image_model(jax.random.PRNGKey(0)), resize_size=128, crop_size=96
    )
    emb = engine.get_projected_global_embedding(img_path)
    assert emb.shape == (128,)
    np.testing.assert_allclose(np.linalg.norm(emb), 1.0, atol=1e-5)
    patches, (w, h) = engine.get_projected_patch_embeddings(img_path)
    assert (w, h) == (120, 150)
    assert patches.shape == (3, 3, 128)
