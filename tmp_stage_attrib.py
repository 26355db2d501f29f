"""Attribute the ~131 ms/256-batch device-side forward across ResNet stages.

Chained-scan methodology: each program runs preprocess + the forward
truncated after stage S, K times sequenced through an accumulator; the
long-minus-short difference isolates device time; stage cost = successive
differences between truncation levels.
"""
import time

import numpy as np

from incremental_multimodal_medical_learning_ii_tpu.utils.compile_cache import enable

enable()

import jax
import jax.numpy as jnp

from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
    _projector_forward,
    fold_grayscale_conv1,
    init_biovil_image_model,
)
from incremental_multimodal_medical_learning_ii_tpu.models.resnet import (
    _bottleneck_forward,
    batch_norm_inference,
    conv_apply,
    max_pool_3x3_s2,
)
from incremental_multimodal_medical_learning_ii_tpu.ops.preprocess import (
    SharedSizePreprocessPlan,
    preprocess_device_shared,
)

rng = np.random.default_rng(0)
params = fold_grayscale_conv1(init_biovil_image_model(jax.random.PRNGKey(0)))
BATCH = 256
plan = SharedSizePreprocessPlan(390, 320, size=512, crop=512)
n_slabs = 4
raw_all = jnp.asarray(rng.integers(0, 256, size=(n_slabs, BATCH, 390, 320), dtype=np.uint8))
w_h = jnp.asarray(plan.w_h)
w_w = jnp.asarray(plan.w_w)
DT = jnp.bfloat16


def truncated_forward(p, imgs, upto):
    """upto: 0=preprocess only, 1=+stem, 2..5=+layer1..4, 6=+projector."""
    x = imgs.astype(DT)
    if upto == 0:
        return x.astype(jnp.float32).sum()
    enc = p["encoder"]
    x = conv_apply(enc["conv1"], x, 2, 3)
    x = jax.nn.relu(batch_norm_inference(x, enc["bn1"]))
    x = max_pool_3x3_s2(x)
    if upto == 1:
        return x.astype(jnp.float32).sum()
    for li in range(4):
        stride = 1 if li == 0 else 2
        for bi, block in enumerate(enc[f"layer{li + 1}"]):
            x = _bottleneck_forward(block, x, stride if bi == 0 else 1)
        if upto == 2 + li:
            return x.astype(jnp.float32).sum()
    proj = _projector_forward(p["projector"], x)
    return jnp.mean(proj.astype(jnp.float32), axis=(1, 2)).sum()


def make_loop(k, upto):
    @jax.jit
    def loop(raw_, w_h_, w_w_, p):
        def body(acc, i):
            wh = w_h_ + 0.0 * acc
            imgs = preprocess_device_shared(raw_[i % n_slabs], wh, w_w_, channels=1)
            return acc + truncated_forward(p, imgs, upto), None

        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(k))
        return acc

    return loop


K_LONG, K_SHORT = 24, 4
names = ["preprocess", "stem(conv1+pool)", "layer1", "layer2", "layer3", "layer4", "projector+pool"]
cum = []
for upto in range(7):
    times = {}
    for k in (K_SHORT, K_LONG):
        loop = make_loop(k, upto)
        float(np.asarray(loop(raw_all, w_h, w_w, params)))
        best = float("inf")
        for r in range(3):
            raw_t = jnp.bitwise_xor(raw_all, np.uint8(r + 1))
            t0 = time.perf_counter()
            float(np.asarray(loop(raw_t, w_h, w_w, params)))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    per_batch = (times[K_LONG] - times[K_SHORT]) / (K_LONG - K_SHORT)
    cum.append(per_batch)
    stage_ms = (cum[upto] - (cum[upto - 1] if upto else 0.0)) * 1e3
    print(
        f"upto {names[upto]:18s}: cumulative {per_batch * 1e3:7.1f} ms/batch   stage {stage_ms:7.1f} ms",
        flush=True,
    )
