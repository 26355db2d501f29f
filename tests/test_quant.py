"""Int8 PTQ path (ops/quant.py): quantized conv error bounds, full-trunk
embedding fidelity, and the opt-in extraction wiring."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
    biovil_image_forward,
    init_biovil_image_model,
    quantize_biovil_int8,
)
from incremental_multimodal_medical_learning_ii_tpu.models.resnet import conv_apply
from incremental_multimodal_medical_learning_ii_tpu.ops.quant import (
    conv_apply_int8,
    quantize_conv_int8,
    quantize_resnet_int8,
)


@pytest.fixture(scope="module")
def image_params():
    return init_biovil_image_model(jax.random.PRNGKey(0))


def _cosine(a, b):
    return np.sum(a * b, axis=-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )


def test_quantize_conv_int8_roundtrip(rng):
    k = jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32))
    q = quantize_conv_int8({"kernel": k})
    assert q["kernel_q"].dtype == jnp.int8
    assert q["w_scale"].shape == (16,)
    assert "kernel" not in q
    # dequantized kernel within half a quantization step per weight
    deq = q["kernel_q"].astype(jnp.float32) * q["w_scale"]
    step = np.asarray(q["w_scale"])
    assert np.max(np.abs(np.asarray(deq - k)) / step) <= 0.5 + 1e-6


@pytest.mark.slow  # int8 trunk is opt-in; conv sweep ~6s CPU
def test_conv_apply_int8_matches_float(rng):
    k = jnp.asarray(rng.normal(size=(3, 3, 4, 32)).astype(np.float32) * 0.1)
    p = {"kernel": k}
    pq = quantize_conv_int8(p)
    x = jnp.asarray(rng.random((2, 16, 16, 4)).astype(np.float32))
    ref = conv_apply(p, x, 1, 1)
    out = conv_apply_int8(pq, x, 1, 1)
    # symmetric 8-bit weights+activations: ~0.5% relative error on a conv
    err = np.linalg.norm(np.asarray(out - ref)) / np.linalg.norm(np.asarray(ref))
    assert err < 0.02, err
    # strided/dilated variants execute too
    assert conv_apply_int8(pq, x, 2, 1).shape == (2, 8, 8, 32)


@pytest.mark.slow  # full-trunk quantization walk (~7s)
def test_quantize_resnet_walks_blocks(image_params):
    enc_q = quantize_resnet_int8(image_params["encoder"])
    assert enc_q["conv1"]["kernel_q"].dtype == jnp.int8
    blk = enc_q["layer3"][0]
    assert blk["conv2"]["kernel_q"].dtype == jnp.int8
    assert blk["downsample_conv"]["kernel_q"].dtype == jnp.int8
    # BN statistics untouched
    np.testing.assert_array_equal(blk["bn1"]["mean"], image_params["encoder"]["layer3"][0]["bn1"]["mean"])


@pytest.mark.slow
def test_biovil_int8_embedding_fidelity(image_params, rng):
    images = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    ref = biovil_image_forward(image_params, images).projected_global_embedding
    pq = quantize_biovil_int8(image_params)
    out = biovil_image_forward(pq, images, int8=True).projected_global_embedding
    cos = _cosine(np.asarray(out), np.asarray(ref))
    assert cos.min() > 0.99, cos


@pytest.mark.slow
def test_extract_int8_end_to_end(image_params, rng):
    from incremental_multimodal_medical_learning_ii_tpu.engine.extract import (
        extract_embeddings,
    )

    imgs = [
        ((rng.random((100, 80)) * 255).astype(np.uint8), (rng.random(5) < 0.5).astype(np.float32))
        for _ in range(3)
    ]
    ds_fp = extract_embeddings(iter(imgs), image_params, batch_size=2, size=64,
                               pad_to=128, dtype=jnp.float32)
    ds_q = extract_embeddings(iter(imgs), image_params, batch_size=2, size=64,
                              pad_to=128, dtype=jnp.float32, int8=True)
    assert ds_q.embeddings.shape == (3, 128)
    cos = _cosine(ds_q.embeddings, ds_fp.embeddings)
    assert cos.min() > 0.99, cos
    np.testing.assert_array_equal(ds_q.labels, ds_fp.labels)


def test_quantize_refuses_s2d_stem(image_params):
    """int8 quantization strips the float 'kernel' key stem_conv_apply
    dispatches the s2d path on — must refuse, not fail deep inside XLA."""
    from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
        quantize_biovil_int8,
        space_to_depth_stem,
    )

    with pytest.raises(ValueError, match="space-to-depth"):
        quantize_biovil_int8(space_to_depth_stem(image_params))
