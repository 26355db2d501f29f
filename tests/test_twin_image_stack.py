"""Twin-run parity for the reference's vendored IMAGE stack.

The Trainer twins (test_twin_run.py) execute ``/root/reference/Trainer.py``
itself; these tests do the same for the vendored image library — the
reference's OWN ``health_multimodal/image/model/{model,resnet,modules}.py``,
``data/{transforms,io}.py``, ``inference_engine.py`` and
``DataRetrieval.py`` execute as ground truth (see
``reference_twin.load_vendored_image_modules``), with only torchvision's
*primitives* substituted by the functional stub in
``tests/torchvision_stub.py``.  Before this, every image-side parity test
compared against a torch *re-implementation* (tests/torch_biovil_fixture.py);
a shared misreading of the vendored forward (patch-mean placement,
dilation semantics, the get_encoder_output_dim probe, the transforms
geometry) could hide.  Here it cannot.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from reference_twin import (  # noqa: E402
    load_vendored_image_modules,
    make_vendored_image_model,
)

from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (  # noqa: E402
    biovil_image_forward,
)
from incremental_multimodal_medical_learning_ii_tpu.models.convert import (  # noqa: E402
    convert_biovil_image_state_dict,
    convert_resnet18_state_dict,
    encoder_output_dim,
)
from incremental_multimodal_medical_learning_ii_tpu.models.resnet import (  # noqa: E402
    resnet18_forward,
    resnet50_forward,
)


@pytest.fixture(scope="module")
def vendored_r50():
    model, mods = make_vendored_image_model(seed=11, model_type="resnet50")
    return model, mods


@pytest.fixture(scope="module")
def fw_params(vendored_r50):
    model, _ = vendored_r50
    return convert_biovil_image_state_dict(model.state_dict())


def _rand_nchw(rng, b=2, h=64, w=64):
    return torch.from_numpy(rng.normal(size=(b, 3, h, w)).astype(np.float32))


def test_twin_vendored_image_model_forward(vendored_r50, fw_params, rng):
    """The vendored ImageModel.forward (model.py:141-154: trunk -> 1x1-conv
    MLP projector -> mean over patch grid, author-modified to return only
    projected_global_embedding) vs the framework's biovil_image_forward."""
    model, _ = vendored_r50
    x = _rand_nchw(rng)
    with torch.no_grad():
        ref_global = model(x).numpy()
        patch, pooled = model.encoder(x, return_patch_embeddings=True)
        ref_patches = model.projector(patch).numpy()
    out = biovil_image_forward(fw_params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out.projected_global_embedding), ref_global, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.projected_patch_embeddings).transpose(0, 3, 1, 2),
        ref_patches,
        atol=5e-5,
    )
    # ImageEncoder's adaptive-avg-pool side output (model.py:197-205)
    np.testing.assert_allclose(
        np.asarray(out.img_embedding), pooled.numpy(), atol=5e-5
    )


def test_twin_vendored_dilation(vendored_r50, fw_params, rng):
    """reload_encoder_with_dilation (model.py:207-227, default
    (False, False, True)) executes the vendored state-dict-preserving
    encoder swap; the framework's replace_stride_with_dilation must match
    on the patch grid (same spatial resolution AND values)."""
    model, _ = vendored_r50
    import copy

    dilated = copy.deepcopy(model)
    dilated.encoder.reload_encoder_with_dilation()
    dilated.eval()
    x = _rand_nchw(rng, b=1)
    with torch.no_grad():
        ref_patch, _ = dilated.encoder(x, return_patch_embeddings=True)
    fw = resnet50_forward(
        fw_params["encoder"],
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        replace_stride_with_dilation=(False, False, True),
    )
    fw = np.asarray(fw).transpose(0, 3, 1, 2)
    assert fw.shape == tuple(ref_patch.shape)  # 2x the non-dilated grid
    np.testing.assert_allclose(fw, ref_patch.numpy(), atol=5e-4)


def test_twin_vendored_resnet18_trunk(rng):
    """The vendored resnet18 path (resnet.py:63-71, BasicBlock) through the
    reference's own ImageEncoder vs the framework's resnet18_forward."""
    model, _ = make_vendored_image_model(seed=12, model_type="resnet18")
    x = _rand_nchw(rng, b=2, h=48, w=48)
    with torch.no_grad():
        ref_patch, ref_pooled = model.encoder(x, return_patch_embeddings=True)
    params = convert_resnet18_state_dict(model.state_dict(), prefix="encoder.encoder.")
    fw = np.asarray(
        resnet18_forward(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(fw, ref_patch.numpy(), atol=5e-5)
    np.testing.assert_allclose(
        fw.mean(axis=(2, 3)), ref_pooled.numpy(), atol=5e-5
    )


def test_twin_encoder_output_dim(vendored_r50, fw_params):
    """get_encoder_output_dim (model.py:231-247: dummy (1,3,32,32) forward
    under restored training mode) vs the framework's probe."""
    model, mods = vendored_r50
    ref_dim = mods["model"].get_encoder_output_dim(model.encoder)

    def fw_forward(params, x):
        feats = resnet50_forward(params, x)
        return jnp.mean(feats, axis=(1, 2))  # adaptive_avg_pool2d (1,1)

    assert ref_dim == encoder_output_dim(fw_forward, fw_params["encoder"]) == 2048


@pytest.mark.parametrize(
    "h,w,resize,crop",
    [
        (40, 64, 32, 28), (64, 40, 32, 28), (33, 47, 32, 28), (47, 33, 32, 28),
        (32, 48, 32, 28), (28, 28, 32, 28), (20, 30, 32, 28),
        # crop > resize: the pad-before-crop path.  (47, 40) resizes to
        # (37, 32) — an ODD pad difference on both axes, which separates
        # torchvision's floor-top/ceil-bottom pad from a round()-centered
        # out-of-bounds crop (they differ by 1px there)
        (47, 40, 32, 40), (40, 47, 32, 40), (49, 40, 32, 40), (20, 30, 32, 40),
    ],
)
def test_twin_vendored_transforms_geometry(h, w, resize, crop):
    """create_chest_xray_transform_for_inference (data/transforms.py:28-38:
    Resize -> CenterCrop -> ToTensor -> ExpandChannels) executed with the
    functional PIL primitives vs the framework's preprocess_host — exact
    equality, including the pad-when-smaller crop cases."""
    from incremental_multimodal_medical_learning_ii_tpu.ops.preprocess import (
        preprocess_host,
    )

    mods = load_vendored_image_modules()
    transform = mods["transforms"].create_chest_xray_transform_for_inference(
        resize=resize, center_crop_size=crop
    )
    assert mods["transforms"].infer_resize_params(transform.transforms) == (resize, crop)
    rng = np.random.default_rng(h * 100 + w)
    raw = (rng.random((h, w)) * 255).astype(np.uint8)
    from PIL import Image

    ref = transform(Image.fromarray(raw, mode="L")).numpy()  # (3, crop, crop)
    fw = preprocess_host(raw, size=resize, crop=crop)  # (crop, crop, 3)
    np.testing.assert_array_equal(fw.transpose(2, 0, 1), ref)


def test_twin_vendored_load_image(tmp_path):
    """The vendored load_image (data/io.py:49-71: skimage read -> min-max
    remap_to_uint8 -> PIL 'L') vs the framework's data/images.load_image."""
    from PIL import Image

    from incremental_multimodal_medical_learning_ii_tpu.data.images import load_image

    mods = load_vendored_image_modules()
    rng = np.random.default_rng(5)
    raw = (rng.random((37, 53)) * 200 + 20).astype(np.uint8)
    path = tmp_path / "cxr.png"
    Image.fromarray(raw, mode="L").save(path)
    ref = np.asarray(mods["io"].load_image(path))
    fw = load_image(path)
    np.testing.assert_array_equal(fw, ref)
    # the remap stretches min->0, max->255 (io.py:27-46)
    assert ref.min() == 0 and ref.max() == 255


def test_twin_remap_to_uint8_percentiles():
    """remap_to_uint8 with and without percentile clipping (io.py:16-46) —
    direct randomized twin of the pure helper."""
    from incremental_multimodal_medical_learning_ii_tpu.ops.preprocess import (
        remap_to_uint8,
    )

    mods = load_vendored_image_modules()
    rng = np.random.default_rng(6)
    for percentiles in (None, (1.0, 99.0), (5.0, 95.0)):
        arr = rng.normal(size=(41, 29)).astype(np.float32) * 100
        ref = mods["io"].remap_to_uint8(arr.copy(), percentiles)
        fw = remap_to_uint8(arr.copy(), percentiles)
        np.testing.assert_array_equal(fw, ref)
    for bad in ((1.0,), (99.0, 1.0), (-1.0, 50.0), (0.0, 101.0)):
        with pytest.raises(ValueError):
            mods["io"].remap_to_uint8(arr.copy(), bad)
        with pytest.raises(ValueError):
            remap_to_uint8(arr.copy(), bad)


def test_pin_vendored_inference_engine_breakage(vendored_r50, tmp_path):
    """PINS REFERENCE BEHAVIOR: the author modified ImageModel.forward to
    return a bare tensor (model.py:141-154 'MODIFICA ENORME'), so the
    vendored ImageInferenceEngine's get_projected_global_embedding
    (inference_engine.py:69-87, '.projected_global_embedding' on a tensor)
    and get_projected_patch_embeddings (:59-67 via
    get_patchwise_projected_embeddings, model.py:160-175) BOTH crash with
    AttributeError in the reference as committed.  The framework's
    models/image_engine.py restores the upstream hi-ml contract instead —
    verified against the vendored model below."""
    from PIL import Image

    model, mods = vendored_r50
    transform = mods["transforms"].create_chest_xray_transform_for_inference(
        resize=32, center_crop_size=28
    )
    engine = mods["engine"].ImageInferenceEngine(image_model=model, transform=transform)
    assert (engine.resize_size, engine.crop_size) == (32, 28)
    rng = np.random.default_rng(7)
    path = tmp_path / "cxr.png"
    Image.fromarray((rng.random((40, 56)) * 255).astype(np.uint8), mode="L").save(path)
    with pytest.raises(AttributeError):
        engine.get_projected_global_embedding(path)
    with pytest.raises(AttributeError):
        engine.get_projected_patch_embeddings(path)


def test_twin_image_engine_global_embedding(vendored_r50, fw_params, tmp_path):
    """The framework ImageInferenceEngine vs the upstream contract computed
    manually THROUGH the vendored stack: load_image -> vendored transform
    -> vendored ImageModel forward -> L2 normalize (what
    inference_engine.py:69-87 would return had the author's forward
    modification not broken it)."""
    from PIL import Image

    from incremental_multimodal_medical_learning_ii_tpu.models.image_engine import (
        ImageInferenceEngine as FwEngine,
    )

    model, mods = vendored_r50
    transform = mods["transforms"].create_chest_xray_transform_for_inference(
        resize=32, center_crop_size=28
    )
    rng = np.random.default_rng(8)
    path = tmp_path / "cxr.png"
    Image.fromarray((rng.random((44, 36)) * 255).astype(np.uint8), mode="L").save(path)
    with torch.no_grad():
        x = transform(mods["io"].load_image(path)).unsqueeze(0)
        emb = model(x)[0]
        ref = (emb / emb.norm(p=2)).numpy()
    fw_engine = FwEngine(fw_params, resize_size=32, crop_size=28)
    fw = fw_engine.get_projected_global_embedding(path)
    np.testing.assert_allclose(fw, ref, atol=5e-6)


@pytest.mark.slow
def test_twin_extraction_datapath(vendored_r50, fw_params, tmp_path):
    """Full L2 extraction twin: the reference's OWN DataRetrieval
    (CustomDataset CSV indexing, get_bio_vil_pipeline ToPILImage->Resize->
    CenterCrop->ToTensor->ExpandChannels, DataRetrieval.py:70-96,175-180)
    + the chexpert-get-embedding.py no_grad accumulation loop (:68-113)
    vs the framework's extract_embeddings on the same CSV manifest —
    embeddings AND labels, host and device preprocess paths."""
    import importlib
    import sys

    import matplotlib
    import pandas as pd
    from PIL import Image

    matplotlib.use("Agg")
    from reference_twin import REF_DIR, _install_stubs

    from incremental_multimodal_medical_learning_ii_tpu.data.manifest import (
        ChexpertManifest,
    )
    from incremental_multimodal_medical_learning_ii_tpu.engine.extract import (
        extract_embeddings,
        manifest_image_iterator,
    )

    model, mods = vendored_r50
    _install_stubs()
    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)
    dr = importlib.import_module("DataRetrieval")

    rng = np.random.default_rng(9)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rows = []
    for i, (h, w) in enumerate([(40, 64), (64, 40), (33, 47), (48, 32), (36, 36), (52, 44)]):
        name = f"img_{i}.png"
        Image.fromarray((rng.random((h, w)) * 255).astype(np.uint8), mode="L").save(
            img_dir / name
        )
        rows.append(
            {
                "Path": name,
                "Atelectasis": float(i % 2),
                "Cardiomegaly": float((i >> 1) % 2),
                "Consolidation": 0.0,
                "Edema": 1.0,
                "Pleural Effusion": float(i % 3 == 0),
            }
        )
    csv = tmp_path / "manifest.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)

    # ---- reference side: DataRetrieval loader + no_grad accumulate ----
    retrieval = dr.DataRetrieval(
        "chexpert", str(csv), str(img_dir) + "/", batch_size=1, size=32, num_workers=0
    )
    ref_embs, ref_labels = [], []
    with torch.no_grad():
        for images, labels in retrieval.loader:
            ref_embs.append(model(images).numpy())
            ref_labels.append(labels.numpy())
    ref_embs = np.concatenate(ref_embs)
    ref_labels = np.concatenate(ref_labels)

    # ---- framework side ----
    manifest = ChexpertManifest.from_csv(csv, img_dir=str(img_dir) + "/")
    ds_host = extract_embeddings(
        manifest_image_iterator(manifest), fw_params, batch_size=2, size=32,
        pad_to=64, dtype=jnp.float32, device_preprocess=False,
    )
    np.testing.assert_array_equal(ds_host.labels, ref_labels)
    np.testing.assert_allclose(ds_host.embeddings, ref_embs, atol=5e-5)

    ds_dev = extract_embeddings(
        manifest_image_iterator(manifest), fw_params, batch_size=2, size=32,
        pad_to=64, dtype=jnp.float32, device_preprocess=True,
    )
    np.testing.assert_array_equal(ds_dev.labels, ref_labels)
    # device resize agrees with PIL to <=1 uint8 level per pixel
    cos = np.sum(ds_dev.embeddings * ref_embs, axis=1) / (
        np.linalg.norm(ds_dev.embeddings, axis=1) * np.linalg.norm(ref_embs, axis=1)
    )
    assert cos.min() > 0.999
