"""The canonical device-encode benchmark loop (utils/device_bench.py) must
run end-to-end off-TPU too — bench.py and bench_all.py both depend on it."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_device_encode_rate_smoke():
    from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
        fold_grayscale_conv1,
        init_biovil_image_model,
    )
    from incremental_multimodal_medical_learning_ii_tpu.utils.device_bench import (
        device_encode_rate,
    )

    params = fold_grayscale_conv1(init_biovil_image_model(jax.random.PRNGKey(0)))
    rate = device_encode_rate(
        params, batch=2, img_h=40, img_w=36, size=32, crop=32,
        channels=1, k_short=1, k_long=3, n_slabs=2,
    )
    # CPU timing is noisy but the rate must be a positive float or an
    # honestly-None invalid sample — never a clamped absurdity
    assert rate is None or (isinstance(rate, float) and 0 < rate < 1e9)
