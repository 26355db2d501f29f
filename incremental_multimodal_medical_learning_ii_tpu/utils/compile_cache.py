"""Persistent XLA compilation cache.

TPU compiles of the fused-epoch scan can take minutes on a remote-compile
terminal; caching them on disk makes every run after the first start in
milliseconds.  Call :func:`enable` early (the CLIs and bench do).

Persistence is for ACCELERATOR backends only.  XLA:CPU serialises
AOT-compiled machine code, and executing a deserialised entry can abort
the process outright — measured on 2026-08-19 on this host: a migrated
VM first hit the old machine's entries (XLA loads them regardless,
logging "could lead to execution errors such as SIGILL") and SIGABRT'd;
then, even with same-machine entries, the fused-run SPMD program
reproducibly passed on the cache miss and aborted on the next hit.  CPU
compiles are local and cheap; the minutes-long compiles this cache exists
for all go through the remote TPU terminal.  :func:`enable` therefore
no-ops on the CPU backend.

Entries additionally live under a per-host-CPU subdirectory
(:func:`host_fingerprint`) so that if a host migration changes the
instruction set, each machine keeps its own entry set.
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

    try:
        backend = jax.default_backend()
    except Exception:  # no backend at all: nothing to cache for
        return
    if backend == "cpu":
        # XLA:CPU persists AOT-compiled machine code, and EXECUTING a
        # deserialized entry can abort the process — reproduced on this
        # host 2026-08-19: the fused-run SPMD program passes on a cache
        # miss (compile + write) and SIGABRTs mid-device_get on the very
        # next hit, even with the entry written by the same machine/build.
        # This cache exists for the remote-compile TPU terminal (minutes
        # per fresh compile); CPU compiles are local and cheap — skip
        # persistence rather than risk the process.
        return
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
