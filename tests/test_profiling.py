import pytest
import jax
import jax.numpy as jnp
import numpy as np

from incremental_multimodal_medical_learning_ii_tpu.utils.profiling import annotate, maybe_trace


@pytest.mark.slow
def test_maybe_trace_writes_a_trace(tmp_path):
    with maybe_trace(str(tmp_path)):
        with annotate("smoke"):
            jnp.sum(jnp.ones((64, 64)) * 2).block_until_ready()
    files = list(tmp_path.rglob("*"))
    assert any(f.is_file() for f in files), "no trace files written"


def test_maybe_trace_none_is_noop():
    with maybe_trace(None):
        pass


@pytest.mark.slow
def test_extraction_trace_hook(tmp_path, rng):
    from incremental_multimodal_medical_learning_ii_tpu.engine.extract import (
        extract_embeddings,
    )
    from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
        init_biovil_image_model,
    )

    params = init_biovil_image_model(jax.random.PRNGKey(0))
    imgs = [((rng.random((70, 60)) * 255).astype(np.uint8), np.zeros(5, np.float32))
            for _ in range(2)]
    ds = extract_embeddings(
        iter(imgs), params, batch_size=2, size=64, pad_to=128,
        dtype=jnp.float32, trace_dir=str(tmp_path / "trace"),
    )
    assert len(ds) == 2
    assert any(f.is_file() for f in (tmp_path / "trace").rglob("*"))


@pytest.mark.slow
def test_train_protocol_trace_hook(tmp_path):
    """SURVEY section-5 tracing on the TRAIN path: run_zero_joint with
    trace_dir captures a device trace spanning the train/eval loop (the
    round-3 verdict's 'train path has no profiler hook' gap)."""
    from incremental_multimodal_medical_learning_ii_tpu.data.store import (
        synthetic_dataset,
    )
    from incremental_multimodal_medical_learning_ii_tpu.engine.protocols import (
        DataBundle,
        run_zero_joint,
    )
    from incremental_multimodal_medical_learning_ii_tpu.text.bank import (
        build_prompt_bank,
        synthetic_encode_fn,
    )
    from incremental_multimodal_medical_learning_ii_tpu.text.prompts import (
        template_prompts,
    )
    from incremental_multimodal_medical_learning_ii_tpu.utils.config import (
        CHEXPERT_COMPETITION_TASKS,
        ExperimentConfig,
    )

    bundle = DataBundle(
        train=synthetic_dataset(96, seed=1),
        val=synthetic_dataset(64, seed=2),
        test=synthetic_dataset(64, seed=3),
    )
    bank = build_prompt_bank(
        synthetic_encode_fn(), template_prompts(CHEXPERT_COMPETITION_TASKS),
        CHEXPERT_COMPETITION_TASKS,
    )
    cfg = ExperimentConfig(mode="joint", epochs=1, batch_size=32,
                           eval_batch_size=32, plot_figures="off")
    run_zero_joint(cfg, bundle, bank, log_dir=None,
                   trace_dir=str(tmp_path / "trace"))
    assert any(f.is_file() for f in (tmp_path / "trace").rglob("*"))
