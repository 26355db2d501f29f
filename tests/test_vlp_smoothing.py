"""Gaussian-smoothing parity with scipy (the reference smooths its
phrase-grounding similarity map with scipy.ndimage.gaussian_filter,
sigma=1.5, vlp/inference_engine.py:108-112)."""

import numpy as np
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
