"""Small utility coverage: compile cache wiring, gated image loaders."""

from pathlib import Path

import numpy as np
import pytest


def test_compile_cache_enable(tmp_path, monkeypatch):
    import jax

    from incremental_multimodal_medical_learning_ii_tpu.utils.compile_cache import (
        enable,
        host_fingerprint,
    )

    # On the CPU backend enable() must NO-OP: executing a deserialised
    # XLA:CPU AOT cache entry aborts the process (reproduced 2026-08-19 —
    # the fused-run SPMD program passed on the cache miss and SIGABRT'd
    # on the next hit, same machine and build).  The suite runs on the
    # CPU backend, so this exercises the real guard.
    before = jax.config.jax_compilation_cache_dir
    enable(str(tmp_path / "cpu_cache"))
    assert jax.config.jax_compilation_cache_dir == before
    assert not (tmp_path / "cpu_cache").exists()

    # On an accelerator backend entries land under a per-host-CPU
    # subdirectory, so a migrated host never executes another machine's
    # AOT results.
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    fp = host_fingerprint()
    assert fp == host_fingerprint()  # stable within a host
    assert fp.startswith("host-") and len(fp) == len("host-") + 12
    cache_dir = tmp_path / "xla_cache"
    enable(str(cache_dir))
    expected = cache_dir / fp
    assert expected.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(expected)
    # idempotent and re-targetable
    enable(str(cache_dir))
    assert jax.config.jax_compilation_cache_dir == str(expected)
    # restore for the rest of the suite (the CPU guard makes this a no-op
    # everywhere else, but be explicit)
    jax.config.update("jax_compilation_cache_dir", before)


def test_load_image_dispatch_and_gating(tmp_path, rng):
    """JPEG/PNG load + grayscale; DICOM/NIfTI raise a clear ImportError when
    their optional deps are absent (they are not in this image); unknown
    suffixes raise ValueError (health_multimodal/image/data/io.py:16-71)."""
    from PIL import Image

    from incremental_multimodal_medical_learning_ii_tpu.data.images import load_image

    rgb = (rng.random((20, 16, 3)) * 255).astype(np.uint8)
    p = tmp_path / "x.png"
    Image.fromarray(rgb).save(p)
    out = load_image(p)
    assert out.shape == (20, 16) and out.dtype == np.uint8

    (tmp_path / "x.dcm").write_bytes(b"")
    (tmp_path / "x.nii").write_bytes(b"")
    try:
        import pydicom  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="pydicom"):
            load_image(tmp_path / "x.dcm")
    try:
        import SimpleITK  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="SimpleITK"):
            load_image(tmp_path / "x.nii")

    (tmp_path / "x.bmp").write_bytes(b"")
    with pytest.raises(ValueError, match="not supported"):
        load_image(tmp_path / "x.bmp")


def test_percentile_remap_on_load(tmp_path, rng):
    from incremental_multimodal_medical_learning_ii_tpu.data.images import load_image

    from PIL import Image

    gray = (rng.random((12, 10)) * 255).astype(np.uint8)
    p = tmp_path / "g.png"
    Image.fromarray(gray, "L").save(p)
    out = load_image(p, percentiles=(5.0, 95.0))
    assert out.dtype == np.uint8
    assert out.min() == 0 and out.max() == 255  # clipped + rescaled
