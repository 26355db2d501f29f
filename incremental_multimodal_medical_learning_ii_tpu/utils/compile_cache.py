"""Persistent XLA compilation cache.

TPU compiles of the fused-epoch scan can take minutes on a remote-compile
terminal; caching them on disk makes every run after the first start in
milliseconds.  Call :func:`enable` early (the CLIs and bench do).

Entries live under a per-host-CPU subdirectory (:func:`host_fingerprint`).
XLA:CPU persists AOT executables specialised to the *compiling* machine's
CPU features and will load them on a different machine anyway (logging
"could lead to execution errors such as SIGILL") — measured on 2026-08-19,
when this host was migrated between sessions and cache hits from the old
machine SIGABRT'd the process mid-``device_get``.  Fingerprinting the
directory makes a migrated host start a fresh, safe cache while the old
machine's entries stay reusable if it ever comes back.
"""

from __future__ import annotations

import hashlib
import os
import platform
from pathlib import Path

_DEFAULT = os.environ.get(
    "IMML_COMPILE_CACHE", str(Path.home() / ".cache" / "imml_tpu_xla_cache")
)


def host_fingerprint() -> str:
    """A stable id of this host's CPU instruction-set surface: the sorted
    /proc/cpuinfo feature flags (plus the machine arch), hashed.  Two
    machines that agree on this can safely execute each other's XLA:CPU
    AOT results; nothing else about the host matters for that."""
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        flags = platform.processor()
    digest = hashlib.sha256(f"{platform.machine()}|{flags}".encode()).hexdigest()
    return f"host-{digest[:12]}"


def enable(cache_dir: str | None = None) -> None:
    import jax

    path = Path(cache_dir or _DEFAULT) / host_fingerprint()
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
