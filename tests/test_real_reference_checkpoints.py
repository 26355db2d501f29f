"""Migration of the REAL trained adapter checkpoints shipped in the
reference mirror (``NUOVI_RISULTATI*/**/{image,text}_adapter.pt``, saved by
``Trainer.save``, Trainer.py:1643-1648) — not synthetic stand-ins.

Each sampled checkpoint is unpickled twice: once by torch executing the
original module, once through :func:`load_reference_adapter` into this
framework's pytree adapters; the adapted embeddings must agree to fp32
tolerance.  One real image adapter also goes through the serving
classifier end-to-end.

Skips only if the reference mirror is absent.
"""

from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from incremental_multimodal_medical_learning_ii_tpu.models.adapters import (
    linear_adapter_apply,
    mlp_adapter_apply,
)
from incremental_multimodal_medical_learning_ii_tpu.models.convert import (
    load_reference_adapter,
)

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not (REF / "NUOVI_RISULTATI").exists(), reason="reference mirror not mounted"
)

# one run dir per reference configuration axis: mlp double, dense, SHARED
MLP_DOUBLE = (
    "NUOVI_RISULTATI-2/zero-and-joint/"
    "joint-train-loss-standard-opt-adam-lr-0.0001-bs6144-ep10-chex-mean-prompt-all-mlp-double-adapter"
)
DENSE_SHARED = (
    "NUOVI_RISULTATI/data-incremental-20-parts/"
    "fine-tuning-data-inc-loss-standard-opt-adam-lr-0.0001-bs6144-ep10-parts20-chex-mean-prompt-all-dense-SHARED-adapter"
)
MLP_SHARED = (
    "NUOVI_RISULTATI/stuff/"
    "gradient-clipping-class-pos-loss-standard-opt-adam-lr-0.0001-bs6144-ep10-chex-mean-prompt-all-mlp-SHARED-adapter-profCL-ratio-0.01"
)


def _torch_forward(path: Path, x: np.ndarray) -> np.ndarray:
    """Ground truth: unpickle the reference module and run it with torch,
    under the scoped ``models``-stub the framework loader also uses."""
    import torch

    from incremental_multimodal_medical_learning_ii_tpu.models.convert import (
        reference_models_stub,
    )

    with reference_models_stub():
        module = torch.load(str(path), map_location="cpu", weights_only=False)
    module.eval()
    with torch.no_grad():
        return module(torch.tensor(x)).numpy()


def _our_forward(path: Path, x: np.ndarray) -> np.ndarray:
    params = load_reference_adapter(str(path))
    apply = mlp_adapter_apply if "dense2" in params else linear_adapter_apply
    return np.asarray(apply(params, jnp.asarray(x)))


@pytest.mark.parametrize(
    "run_dir,fname,expect_mlp",
    [
        (MLP_DOUBLE, "image_adapter.pt", True),
        (MLP_DOUBLE, "text_adapter.pt", True),
        (DENSE_SHARED, "image_adapter.pt", False),
        (DENSE_SHARED, "text_adapter.pt", False),
        (MLP_SHARED, "image_adapter.pt", True),
    ],
)
def test_real_checkpoint_parity(run_dir, fname, expect_mlp, rng):
    path = REF / run_dir / fname
    if not path.exists():
        pytest.skip(f"{path} not in mirror")
    params = load_reference_adapter(str(path))
    assert ("dense2" in params) == expect_mlp
    x = rng.normal(size=(16, 128)).astype(np.float32)
    np.testing.assert_allclose(
        _our_forward(path, x), _torch_forward(path, x), atol=1e-5
    )


def test_real_checkpoints_broad_sample(rng):
    """Every Nth adapter checkpoint in the mirror must migrate and match
    torch — catches layout variants the handpicked runs above miss."""
    paths = sorted(REF.glob("NUOVI_RISULTATI*/**/*_adapter.pt"))
    assert len(paths) > 100, f"expected the 150+ checkpoints, found {len(paths)}"
    x = rng.normal(size=(8, 128)).astype(np.float32)
    for path in paths[::15]:
        np.testing.assert_allclose(
            _our_forward(path, x), _torch_forward(path, x), atol=1e-5,
            err_msg=str(path),
        )


def test_shared_run_saved_identical_modules():
    """A SHARED run points image_adapter and text_adapter at the same
    module (``Trainer.py:134-137``); its two saved files must carry
    identical weights — validates our shared-adapter wiring assumption."""
    d = REF / MLP_SHARED
    if not d.exists():
        pytest.skip("SHARED run not in mirror")
    a = load_reference_adapter(str(d / "image_adapter.pt"))
    b = load_reference_adapter(str(d / "text_adapter.pt"))
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    for va, vb in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


@pytest.mark.slow
def test_real_adapter_through_serving_classifier(rng):
    """A real trained image adapter drives the end-to-end serving path:
    raw images -> BioViL forward -> REAL adapter -> prompt-cosine scores
    must equal scoring the adapted embeddings directly."""
    from incremental_multimodal_medical_learning_ii_tpu.inference import (
        ChexpertClassifier,
    )
    from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
        biovil_image_forward,
        init_biovil_image_model,
    )
    from incremental_multimodal_medical_learning_ii_tpu.objectives.scorer import (
        PromptBank,
        score_embeddings,
    )
    from incremental_multimodal_medical_learning_ii_tpu.ops.preprocess import (
        preprocess_host,
    )
    from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
        ExperimentConfig,
    )

    path = REF / MLP_DOUBLE / "image_adapter.pt"
    if not path.exists():
        pytest.skip(f"{path} not in mirror")
    adapter = load_reference_adapter(str(path))
    image_params = init_biovil_image_model(jax.random.PRNGKey(0))
    c, p, d = 5, 3, 128
    bank = PromptBank(
        pos=jnp.asarray(rng.normal(size=(c, p, d)).astype(np.float32)),
        neg=jnp.asarray(rng.normal(size=(c, p, d)).astype(np.float32)),
        pos_count=jnp.full(c, p, jnp.int32),
        neg_count=jnp.full(c, p, jnp.int32),
    )
    cfg = ExperimentConfig(adapter="mlp", text_adapter=False, epochs=1)
    clf = ChexpertClassifier(
        image_params, bank, cfg=cfg, adapter_params={"image": adapter},
        batch_size=2, size=64, pad_to=128, dtype=jnp.float32,
    )
    imgs = [
        (rng.random((70, 60)) * 255).astype(np.uint8),
        (rng.random((70, 60)) * 255).astype(np.uint8),
    ]
    scores, preds = clf.predict_arrays(imgs)
    assert scores.shape == (2, 5) and preds.shape == (2, 5)

    # reference math: embed -> REAL adapter -> cosine scores
    pre = np.stack([preprocess_host(im, size=64, crop=64) for im in imgs])
    embs = biovil_image_forward(
        image_params, jnp.asarray(pre), dtype=jnp.float32
    ).projected_global_embedding
    adapted = mlp_adapter_apply(adapter, embs)
    out = score_embeddings(
        adapted, bank, cfg.prompt_mode, cfg.train_logit_diff, cfg.pred_logit_diff
    )
    np.testing.assert_allclose(scores, np.asarray(out.scores), atol=1e-4)
