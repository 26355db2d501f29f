"""The canonical device-side extraction encode benchmark.

One definition of the chained-scan encode loop (fused device preprocess +
BioViL forward, iterations sequenced through an accumulator) shared by
``bench.py`` and ``bench_all.py`` — their two
``*device_images_per_sec_per_chip`` numbers are only comparable (and only
share the persistent compile cache) while the traced program stays
bit-identical, which a single definition guarantees.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from incremental_multimodal_medical_learning_ii_tpu.utils.chained_timing import (
    rate_or_none,
    time_chained,
)


def device_encode_rate(
    params,
    *,
    batch: int = 256,
    img_h: int = 390,
    img_w: int = 320,
    size: int = 512,
    crop: int = 512,
    channels: int = 1,
    int8: bool = False,
    fused_layer1: bool = False,
    k_short: int = 4,
    k_long: int = 24,
    n_slabs: int = 4,
    seed: int = 0,
) -> Optional[float]:
    """imgs/sec/chip for the fused preprocess+encode, or None on an invalid
    sample (see utils/chained_timing).  ``params`` must already match
    ``channels`` (grayscale-folded for channels=1) and ``int8``."""
    import jax
    import jax.numpy as jnp

    from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
        biovil_image_forward,
    )
    from incremental_multimodal_medical_learning_ii_tpu.ops.preprocess import (
        SharedSizePreprocessPlan,
        preprocess_device_shared,
    )

    rng = np.random.default_rng(seed)
    plan = SharedSizePreprocessPlan(img_h, img_w, size=size, crop=crop)
    raw_all = jnp.asarray(
        rng.integers(0, 256, size=(n_slabs, batch, img_h, img_w), dtype=np.uint8)
    )
    w_h = jnp.asarray(plan.w_h)
    w_w = jnp.asarray(plan.w_w)

    def make_encode_loop(k):
        @jax.jit
        def loop(raw_, w_h_, w_w_, p):
            def body(acc, i):
                wh = w_h_ + 0.0 * acc  # chain: forces sequential execution
                imgs = preprocess_device_shared(raw_[i % n_slabs], wh, w_w_, channels=channels)
                emb = biovil_image_forward(
                    p, imgs, dtype=jnp.bfloat16, int8=int8, fused_layer1=fused_layer1
                ).projected_global_embedding
                return acc + emb.sum(), None
            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(k))
            return acc
        return loop

    per_batch = time_chained(
        make_encode_loop,
        lambda r: (jnp.bitwise_xor(raw_all, np.uint8(r + 1)), w_h, w_w, params),
        k_short=k_short, k_long=k_long,
    )
    return rate_or_none(per_batch, batch)
