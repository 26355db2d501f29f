"""Gaussian-smoothing parity with scipy (the reference smooths its
phrase-grounding similarity map with scipy.ndimage.gaussian_filter,
sigma=1.5, vlp/inference_engine.py:108-112)."""

import numpy as np
import pytest
import jax.numpy as jnp
from scipy import ndimage

from incremental_multimodal_medical_learning_ii_tpu.vlp.engine import gaussian_smooth_2d


def test_gaussian_smooth_matches_scipy(rng):
    grid = rng.normal(size=(15, 15)).astype(np.float32)
    expected = ndimage.gaussian_filter(grid, sigma=(1.5, 1.5), order=0)
    got = np.asarray(gaussian_smooth_2d(jnp.asarray(grid), sigma=1.5))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_gaussian_smooth_small_grid(rng):
    # patch grids are tiny (e.g. 16x16 for a 512 input); boundary handling
    # dominates there, so exact-parity matters
    grid = rng.normal(size=(4, 6)).astype(np.float32)
    expected = ndimage.gaussian_filter(grid, sigma=(1.5, 1.5), order=0)
    got = np.asarray(gaussian_smooth_2d(jnp.asarray(grid), sigma=1.5))
    np.testing.assert_allclose(got, expected, atol=1e-5)


@pytest.mark.slow
def test_nearest_interpolation_matches_torch(rng):
    """torch F.interpolate(mode='nearest') parity (the reference's map
    upsampling, vlp/inference_engine.py:139-144): jax.image.resize's
    half-pixel-center nearest picks different pixels at non-integer scales."""
    import torch
    import torch.nn.functional as F

    from incremental_multimodal_medical_learning_ii_tpu.vlp.engine import _interpolate

    for out in (468, 433, 299, 97):
        g = rng.normal(size=(15, 15)).astype(np.float32)
        ours = _interpolate(g, (out, out), "nearest")
        ref = F.interpolate(
            torch.tensor(g)[None, None], size=(out, out), mode="nearest"
        )[0, 0].numpy()
        np.testing.assert_array_equal(ours, ref)


@pytest.mark.fast
def test_convert_similarity_negative_margin_crops_like_reference():
    """crop_size larger than an image side (negative pad margins) must CROP
    the upsized map exactly like the reference's negative F.pad — not crash
    or wrap the slice (vlp/inference_engine.py:145-147)."""
    import math

    import torch
    import torch.nn.functional as F

    from incremental_multimodal_medical_learning_ii_tpu.vlp.engine import (
        convert_similarity_to_image_size,
    )

    grid = np.arange(15 * 15, dtype=np.float32).reshape(15, 15)
    for (w, h, resize, crop) in [
        (100, 200, None, 120),   # width < crop <= height
        (90, 80, None, 120),     # both sides smaller than crop
        (100, 200, 512, 480),    # the BioViL geometry, normal positive pad
        (300, 200, 256, 480),    # resize-scaled target larger than both
    ]:
        got = convert_similarity_to_image_size(grid, w, h, resize, crop,
                                               interpolation="nearest")
        smallest = min(w, h)
        target = int(crop * smallest / resize) if resize is not None else crop
        up = F.interpolate(
            torch.from_numpy(grid).reshape(1, 1, 15, 15),
            size=(target, target), mode="nearest",
        )
        mw, mh = w - target, h - target
        ref = F.pad(
            up[0, 0],
            (math.floor(mw / 2), math.ceil(mw / 2),
             math.floor(mh / 2), math.ceil(mh / 2)),
            value=float("nan"),
        ).numpy()
        assert got.shape == (h, w) == ref.shape
        np.testing.assert_array_equal(np.isnan(got), np.isnan(ref))
        np.testing.assert_allclose(
            np.nan_to_num(got), np.nan_to_num(ref), atol=0, rtol=0
        )
