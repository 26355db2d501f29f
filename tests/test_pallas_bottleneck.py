"""Fused bottleneck-layer pallas kernel vs the stock XLA block chain."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from incremental_multimodal_medical_learning_ii_tpu.models.resnet import (
    _bottleneck_forward,
    _init_bottleneck,
)
from incremental_multimodal_medical_learning_ii_tpu.ops.pallas_bottleneck import (
    fold_bottleneck_layer,
    fused_bottleneck_layer,
)


def _layer1_params(key, cin=64, width=64, n_blocks=3):
    keys = jax.random.split(key, n_blocks)
    layer = []
    c = cin
    for bi in range(n_blocks):
        layer.append(_init_bottleneck(keys[bi], c, width, stride=1))
        c = width * 4
    return layer


def _xla_layer(layer, x):
    out = x
    for block in layer:
        out = _bottleneck_forward(block, out, stride=1)
    return out


@pytest.mark.parametrize(
    "h,w,rows",
    [
        (32, 32, 16),
        # the larger interpret-mode run costs ~10s on this 1-vCPU host
        pytest.param(64, 48, 32, marks=pytest.mark.slow),
    ],
)
def test_fused_layer_matches_xla(rng, h, w, rows):
    layer = _layer1_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.normal(size=(2, h, w, 64)).astype(np.float32)) * 0.5
    ref = np.asarray(_xla_layer(layer, x))  # fp32 XLA truth
    folded = fold_bottleneck_layer(layer)
    out = np.asarray(
        fused_bottleneck_layer(x, folded, rows_per_tile=rows, interpret=True),
        dtype=np.float32,
    )
    assert out.shape == ref.shape == (2, h, w, 256)
    # kernel computes in bf16 with fp32 accumulation; BN folded into weights
    denom = np.maximum(np.abs(ref), 1.0)
    rel = np.abs(out - ref) / denom
    assert rel.max() < 0.06, rel.max()
    cos = np.sum(out * ref) / (np.linalg.norm(out) * np.linalg.norm(ref))
    assert cos > 0.9999


@pytest.mark.slow
def test_biovil_forward_fused_layer1_matches(rng):
    """fused_layer1=True through the FULL BioViL forward (auto-interpret on
    CPU) matches the stock bf16 forward."""
    from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
        biovil_image_forward,
        init_biovil_image_model,
    )

    params = init_biovil_image_model(jax.random.PRNGKey(2))
    imgs = jnp.asarray(rng.uniform(size=(1, 96, 96, 3)).astype(np.float32))
    ref = biovil_image_forward(params, imgs, dtype=jnp.bfloat16)
    out = biovil_image_forward(params, imgs, dtype=jnp.bfloat16, fused_layer1=True)
    a = np.asarray(ref.projected_global_embedding, np.float64).ravel()
    b = np.asarray(out.projected_global_embedding, np.float64).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999, cos


def test_fused_layer_rejects_bad_tile(rng):
    layer = _layer1_params(jax.random.PRNGKey(1))
    folded = fold_bottleneck_layer(layer)
    x = jnp.zeros((1, 48, 32, 64), jnp.float32)
    with pytest.raises(ValueError, match="divisible"):
        fused_bottleneck_layer(x, folded, rows_per_tile=32, interpret=True)


def test_fused_layer1_requires_bf16(rng):
    from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
        biovil_image_forward,
        init_biovil_image_model,
    )

    params = init_biovil_image_model(jax.random.PRNGKey(5))
    with pytest.raises(ValueError, match="bfloat16"):
        biovil_image_forward(params, jnp.zeros((1, 96, 96, 3)), fused_layer1=True)
