"""PIL-parity tests for the preprocessing ops and resize matrices."""

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from incremental_multimodal_medical_learning_ii_tpu.ops.preprocess import (
    DevicePreprocessPlan,
    center_crop_bounds,
    expand_channels,
    preprocess_device,
    preprocess_host,
    remap_to_uint8,
)
from incremental_multimodal_medical_learning_ii_tpu.ops.resize import (
    matmul_resize,
    resize_matrix,
    resize_shape_for_smaller_edge,
)


def _rand_img(rng, h, w):
    return (rng.random((h, w)) * 255).astype(np.uint8)


def test_resize_shape_smaller_edge():
    assert resize_shape_for_smaller_edge(200, 160, 96) == (120, 96)
    assert resize_shape_for_smaller_edge(160, 200, 96) == (96, 120)
    assert resize_shape_for_smaller_edge(96, 96, 96) == (96, 96)


@pytest.mark.parametrize("hw", [(200, 160), (97, 303), (64, 64), (50, 70)])
def test_matmul_resize_matches_pil(rng, hw):
    h, w = hw
    img = _rand_img(rng, h, w)
    out_h, out_w = resize_shape_for_smaller_edge(h, w, 96)
    pil = np.asarray(Image.fromarray(img, "L").resize((out_w, out_h), Image.BILINEAR))
    ours = np.asarray(
        matmul_resize(jnp.asarray(img), jnp.asarray(resize_matrix(h, out_h)),
                      jnp.asarray(resize_matrix(w, out_w)))
    )
    # PIL's uint8 path uses fixed-point coefficients and per-pass rounding;
    # agreement within 1 uint8 level is the achievable parity.
    assert np.abs(ours - pil.astype(np.float32)).max() <= 1.0
    assert np.abs(ours - pil.astype(np.float32)).mean() < 0.35


def test_center_crop_bounds_torchvision_rounding():
    assert center_crop_bounds(120, 96, 96) == (12, 0)
    assert center_crop_bounds(97, 96, 96) == (0, 0)  # round(0.5) == 0 (banker's)
    assert center_crop_bounds(99, 96, 96) == (2, 0)


def test_preprocess_host_shapes_and_range(rng):
    img = _rand_img(rng, 200, 160)
    out = preprocess_host(img, size=96)
    assert out.shape == (96, 96, 3)
    assert out.dtype == np.float32
    assert 0 <= out.min() and out.max() <= 1
    # all three channels identical (ExpandChannels semantics)
    np.testing.assert_array_equal(out[..., 0], out[..., 1])


def test_device_preprocess_matches_host(rng):
    imgs = [_rand_img(rng, 200, 160), _rand_img(rng, 120, 300), _rand_img(rng, 96, 96)]
    plan = DevicePreprocessPlan(size=96, pad_to=320)
    raw, w_h, w_w = plan.prepare(imgs)
    device_out = np.asarray(preprocess_device(jnp.asarray(raw), jnp.asarray(w_h), jnp.asarray(w_w)))
    for i, img in enumerate(imgs):
        host_out = preprocess_host(img, size=96)
        # device path re-derives PIL's math in float; <=1 uint8 level apart
        assert np.abs(device_out[i] - host_out).max() <= (1.0 / 255.0) + 1e-6


def test_device_preprocess_crop_smaller_than_resize(rng):
    """resize 128 / crop 96 (the vendored engine's 512/480 geometry)."""
    img = _rand_img(rng, 200, 160)
    plan = DevicePreprocessPlan(size=128, crop=96, pad_to=256)
    raw, w_h, w_w = plan.prepare([img])
    device_out = np.asarray(preprocess_device(jnp.asarray(raw), jnp.asarray(w_h), jnp.asarray(w_w)))
    host_out = preprocess_host(img, size=128, crop=96)
    assert np.abs(device_out[0] - host_out).max() <= (1.0 / 255.0) + 1e-6


def test_remap_to_uint8_minmax():
    arr = np.array([[10.0, 20.0], [30.0, 50.0]])
    out = remap_to_uint8(arr)
    assert out.min() == 0 and out.max() == 255
    assert out.dtype == np.uint8


def test_remap_to_uint8_percentiles_validation():
    arr = np.random.rand(10, 10)
    with pytest.raises(ValueError):
        remap_to_uint8(arr, (90, 10))
    with pytest.raises(ValueError):
        remap_to_uint8(arr, (0, 101))
    out = remap_to_uint8(arr, (5, 95))
    assert out.max() == 255


def test_expand_channels_validation():
    with pytest.raises(ValueError):
        expand_channels(jnp.ones((4, 4, 2)))
    out = expand_channels(jnp.ones((4, 4, 1)))
    assert out.shape == (4, 4, 3)


def test_resize_shape_truncates_like_torchvision():
    """torchvision computes the long edge with int() truncation, not round
    (PIL path ``oh = int(size * h / w)``): 320x451 at 512 -> 721, not 722."""
    assert resize_shape_for_smaller_edge(320, 451, 512) == (512, 721)
    assert resize_shape_for_smaller_edge(451, 320, 512) == (721, 512)


def test_device_preprocess_pad_path_matches_host(rng):
    """crop LARGER than the resized edge (torchvision pads by
    floor((crop-out)/2)): the device matrices must place content at the
    same offset as preprocess_host — out=89 vs crop=96 is the
    crop-out == 3 (mod 4) case where banker's rounding is one pixel off."""
    # h=200,w=206 at size=89 -> out=(89, 91); crop 96 pads both dims
    img = _rand_img(rng, 200, 206)
    plan = DevicePreprocessPlan(size=89, crop=96, pad_to=256)
    raw, w_h, w_w = plan.prepare([img])
    device_out = np.asarray(preprocess_device(jnp.asarray(raw), jnp.asarray(w_h), jnp.asarray(w_w)))
    host_out = preprocess_host(img, size=89, crop=96)
    assert np.abs(device_out[0] - host_out).max() <= (1.0 / 255.0) + 1e-6


def test_prepare_deduped_matches_dense(rng):
    """The deduped path gathers per-image matrices from U unique pairs and
    must produce the identical preprocessed batch; U reflects the distinct
    shapes, not the batch size."""
    from incremental_multimodal_medical_learning_ii_tpu.ops.preprocess import (
        preprocess_device_indexed,
    )

    imgs = [
        _rand_img(rng, 200, 160), _rand_img(rng, 120, 300),
        _rand_img(rng, 200, 160), _rand_img(rng, 120, 300),
        _rand_img(rng, 200, 160),
    ]
    plan = DevicePreprocessPlan(size=96, pad_to=320)
    raw_d, w_h, w_w = plan.prepare(imgs)
    dense = np.asarray(preprocess_device(jnp.asarray(raw_d), jnp.asarray(w_h), jnp.asarray(w_w)))
    raw, uw_h, uw_w, idx = plan.prepare_deduped(imgs)
    assert uw_h.shape[0] == 2  # two distinct shapes -> U=2 (padded pow2)
    assert list(idx) == [0, 1, 0, 1, 0]
    indexed = np.asarray(preprocess_device_indexed(
        jnp.asarray(raw), jnp.asarray(uw_h), jnp.asarray(uw_w), jnp.asarray(idx)
    ))
    np.testing.assert_array_equal(indexed, dense)


@pytest.mark.slow
def test_matmul_resize_matches_pil_randomized_sweep(rng):
    """Broad randomized geometry sweep of the <=1-uint8-level PIL parity
    claim: 60 random (h, w) pairs across extreme aspect ratios, up/down
    scaling, odd sizes, and both target sizes the pipelines use.  The four
    fixed shapes above are the fast regression anchor; this is the
    distribution-level evidence for the claim."""
    sizes = [96, 512]
    for trial in range(60):
        h = int(rng.integers(33, 700))
        w = int(rng.integers(33, 700))
        size = sizes[trial % 2]
        img = _rand_img(rng, h, w)
        out_h, out_w = resize_shape_for_smaller_edge(h, w, size)
        pil = np.asarray(Image.fromarray(img, "L").resize((out_w, out_h), Image.BILINEAR))
        ours = np.asarray(
            matmul_resize(jnp.asarray(img), jnp.asarray(resize_matrix(h, out_h)),
                          jnp.asarray(resize_matrix(w, out_w)))
        )
        err = np.abs(ours - pil.astype(np.float32))
        assert err.max() <= 1.0, (h, w, size, float(err.max()))
        assert err.mean() < 0.35, (h, w, size, float(err.mean()))
