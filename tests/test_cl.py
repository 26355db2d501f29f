"""Weight-reset (myCL/profCL) parity against a torch re-implementation of
the reference's per-tensor loop (Trainer.py:1556-1587)."""

import jax.numpy as jnp
import numpy as np
import torch

from incremental_multimodal_medical_learning_ii_tpu.engine.cl import weight_reset


def torch_reference_reset(params, snaps, threshold):
    n_reset, n_updated = 0, 0
    out = []
    for p, s in zip(params, snaps):
        p = torch.tensor(p.copy())
        s = torch.tensor(s)
        diff = torch.abs(p - s)
        to_reset = diff.min() + threshold * (diff.max() - diff.min())
        mask = diff < to_reset
        n_reset += int(mask.sum())
        n_updated += int((~mask).sum())
        p[mask] = s[mask]
        out.append(p.numpy())
    return out, n_reset, n_updated


def test_weight_reset_matches_torch(rng):
    shapes = [(128, 256), (256,), (256, 128), (128,)]
    snaps = [rng.normal(size=s).astype(np.float32) for s in shapes]
    params = [s + 0.01 * rng.normal(size=s.shape).astype(np.float32) for s in snaps]

    expected, exp_reset, exp_updated = torch_reference_reset(params, snaps, 0.5)
    got, n_reset, n_updated = weight_reset(
        [jnp.asarray(p) for p in params], [jnp.asarray(s) for s in snaps], 0.5
    )
    for g, e in zip(got, expected):
        np.testing.assert_allclose(np.asarray(g), e, atol=1e-7)
    assert int(n_reset) == exp_reset
    assert int(n_updated) == exp_updated


def test_weight_reset_threshold_zero_resets_nothing(rng):
    snaps = [rng.normal(size=(8, 8)).astype(np.float32)]
    params = [snaps[0] + rng.normal(size=(8, 8)).astype(np.float32)]
    got, n_reset, _ = weight_reset([jnp.asarray(params[0])], [jnp.asarray(snaps[0])], 0.0)
    # cutoff = min, strict inequality -> nothing resets
    assert int(n_reset) == 0
    np.testing.assert_array_equal(np.asarray(got[0]), params[0])


def test_weight_reset_threshold_above_one_resets_everything(rng):
    snaps = [rng.normal(size=(8, 8)).astype(np.float32)]
    params = [snaps[0] + rng.normal(size=(8, 8)).astype(np.float32)]
    got, n_reset, n_updated = weight_reset(
        [jnp.asarray(params[0])], [jnp.asarray(snaps[0])], 1.5
    )
    assert int(n_reset) == 64 and int(n_updated) == 0
    np.testing.assert_array_equal(np.asarray(got[0]), snaps[0])


def test_double_application_counts_both_passes(rng):
    """SHARED mode applies the reset twice (reference aliases one module as
    both adapters); counts accumulate over both passes."""
    snaps = {"k": jnp.asarray(rng.normal(size=(16, 16)).astype(np.float32))}
    params = {"k": snaps["k"] + jnp.asarray(rng.normal(size=(16, 16)).astype(np.float32))}
    _, n1, u1 = weight_reset(params, snaps, 0.5, applications=1)
    _, n2, u2 = weight_reset(params, snaps, 0.5, applications=2)
    assert int(n2) >= int(n1)
    assert int(n2 + u2) == 2 * 16 * 16
