"""Persistent XLA compilation cache.

TPU compiles of the fused-epoch scan can take minutes on a remote-compile
terminal; caching them on disk makes every run after the first start in
milliseconds.  Call :func:`enable` early (the CLIs and bench do)."""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT = os.environ.get(
    "IMML_COMPILE_CACHE", str(Path.home() / ".cache" / "imml_tpu_xla_cache")
)


def enable(cache_dir: str | None = None) -> None:
    import jax

    path = Path(cache_dir or _DEFAULT)
    try:
        path.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:
        # best-effort optimization: an unwritable cache dir (read-only HOME)
        # or an older jax must never take down a CLI/bench at startup — but
        # on a host where each lost cache hit costs a 4-6 minute remote
        # compile, a SILENT disable is undiagnosable; say so once
        import sys

        print(
            f"[warn] persistent compile cache disabled "
            f"({type(e).__name__}: {e}); compiles will not be cached",
            file=sys.stderr,
        )
