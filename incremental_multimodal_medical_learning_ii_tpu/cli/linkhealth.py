"""Accelerator link health probe.

Every throughput number on a tunneled / remote-compiled accelerator is a
sample of link health as much as of the code (bench.py's samples swing
~100x on this host; the remote-compile terminal has measured full-outage
phases where even a trivial fresh compile stalls for minutes while cached
programs keep executing).  This CLI measures the three independent legs
and prints ONE JSON line, so a bad benchmark run can be attributed in
seconds:

* ``rtt_ms``       — dispatch + readback round-trip of a tiny op (median
                     of ``--samples``); the per-sync cost that makes
                     per-batch ``.item()``-style code slow here.
* ``upload_mb_per_s`` — host->device bandwidth (MiB/s) for a
                     ``--upload-mb`` uint8 buffer (fresh buffer each
                     sample: the axon backend memoizes identical
                     (executable, buffers) executions, so reused buffers
                     measure nothing).
* ``compile_s``    — wall time of ONE fresh trivial compile
                     (urandom-salted odd shape so no program cache —
                     in-process, persistent, or remote-terminal — can
                     serve it).  A compile that returns but takes longer
                     than ``--compile-slow-s`` still flags
                     ``degraded-compile``: the outage phases documented
                     on this host have a slow-but-alive onset.

Every probe runs in its OWN subprocess under a deadline — during a
compile-terminal outage even the tiny warmup jits stall, and a probe that
hangs on the condition it diagnoses is useless.  Timed-out legs report
``null``; exit code is always 0; the ``verdict`` field says ``ok`` /
``slow-sync`` / ``degraded-compile``.  The rtt/upload probe serves its two
warmup programs from the persistent compile cache, so once one healthy run
has seeded the cache, execution health stays measurable even while the
compile terminal is down (cache-hit programs keep executing there); the
compile probe never touches the cache.

``--platform cpu`` pins the jax platform inside every subprocess via
``jax.config`` (the env var alone is overridden by this host's
sitecustomize TPU plugin registration).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_PRELUDE = """
import os, time, json
import numpy as np
import jax
plat = os.environ.get("IMML_LINKHEALTH_PLATFORM")
if plat:
    jax.config.update("jax_platforms", plat)
cache = os.environ.get("IMML_LH_CACHE")
if cache:
    # rtt/upload probe only: with its two tiny warmup programs served from
    # the persistent cache, execution health stays measurable DURING a
    # compile-terminal outage (cache-hit programs keep running there); the
    # min-compile-time floor is zeroed so even these sub-second programs
    # persist after one healthy run.
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
import jax.numpy as jnp


def median(xs):
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else 0.5 * (xs[n // 2 - 1] + xs[n // 2])
"""

_RTT_UPLOAD = _PRELUDE + """
samples = int(os.environ["IMML_LH_SAMPLES"])
mb = int(os.environ["IMML_LH_UPLOAD_MB"])

# RTT: tiny dispatch + DATA readback (the only trustworthy sync on this
# backend; block_until_ready is unreliable here).  Fresh values each call
# defeat the backend's (executable, buffers) memoization.
fn = jax.jit(lambda a: a.sum())
float(fn(jnp.zeros(8, jnp.float32)))  # compile outside the timed region
rtt = []
for i in range(samples):
    x = np.full(8, float(i), np.float32)
    t0 = time.perf_counter()
    float(fn(jnp.asarray(x)))
    rtt.append((time.perf_counter() - t0) * 1e3)

# Upload bandwidth: a 1-element readback makes the transfer observable
# without paying a large download.
n = mb * 1024 * 1024
up = jax.jit(lambda a: a[:1].astype(jnp.float32).sum())
float(up(jnp.zeros(n, jnp.uint8)))
rng = np.random.default_rng(0)
rates = []
for _ in range(max(3, samples // 2)):
    buf = rng.integers(0, 256, size=n, dtype=np.uint8)
    t0 = time.perf_counter()
    float(up(jnp.asarray(buf)))
    rates.append(mb / (time.perf_counter() - t0))

print(json.dumps({"backend": jax.default_backend(),
                  "rtt_ms": median(rtt), "upload_mb_per_s": median(rates)}))
"""

_COMPILE = _PRELUDE + """
# urandom-salted odd shape: ~1M distinct programs, so neither the in-process
# jit cache, a persistent JAX_COMPILATION_CACHE_DIR, nor the remote compile
# terminal's program cache can serve a repeat invocation (a pid salt mod a
# small constant collides within a handful of runs)
salt = int.from_bytes(os.urandom(4), "little")
m, n = 31 + salt % 997, 53 + (salt // 997) % 991
x = jnp.asarray(np.random.default_rng(1).random((m, n)).astype(np.float32))
t0 = time.time()
float(jax.jit(lambda a: (a @ a.T).sum())(x))
print(json.dumps({"compile_s": time.time() - t0}))
"""


def _run_probe(code: str, timeout_s: float, env_extra: dict):
    """Run one probe subprocess; returns (parsed dict, error string)."""
    env = dict(os.environ)
    env.update({k: str(v) for k, v in env_extra.items()})
    try:
        res = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s, env=env,
        )
    except subprocess.TimeoutExpired:
        return None, "timeout"
    if res.returncode != 0:
        return None, (res.stderr or "probe subprocess failed").strip()[-200:]
    try:
        return json.loads(res.stdout.strip().splitlines()[-1]), None
    except Exception:
        return None, f"unparseable probe output: {res.stdout[-200:]!r}"


def quick_probe(timeout_s: float = 45.0, samples: int = 3, upload_mb: int = 4,
                platform: str | None = None) -> dict:
    """One bounded rtt/upload probe for embedding in other reports
    (bench.py attaches this to its JSON so a bad throughput number carries
    its own link attribution).  Returns ``{"rtt_ms", "upload_mb_per_s"}``
    or ``{"probe_error": ...}``; never raises, never exceeds ~timeout_s.
    No compile probe — a fresh compile is too expensive for a side-channel."""
    from incremental_multimodal_medical_learning_ii_tpu.utils.compile_cache import (
        _DEFAULT as _cache_dir,
    )

    env_extra = {"IMML_LH_SAMPLES": samples, "IMML_LH_UPLOAD_MB": upload_mb,
                 "IMML_LH_CACHE": _cache_dir}
    if platform:
        env_extra["IMML_LINKHEALTH_PLATFORM"] = platform
    base, err = _run_probe(_RTT_UPLOAD, timeout_s, env_extra)
    if base is None:
        return {"probe_error": err}
    return {"rtt_ms": round(base["rtt_ms"], 2),
            "upload_mb_per_s": round(base["upload_mb_per_s"], 1)}


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--samples", type=int, default=5)
    p.add_argument("--upload-mb", type=int, default=8)
    p.add_argument("--probe-timeout", type=float, default=120.0,
                   help="deadline for the rtt/upload probe subprocess "
                   "(includes its two tiny warmup compiles)")
    p.add_argument("--compile-timeout", type=float, default=120.0)
    p.add_argument("--compile-slow-s", type=float, default=30.0,
                   help="a fresh trivial compile slower than this is "
                   "verdict degraded-compile even if it finishes (healthy "
                   "baseline is seconds; outage onset is slow-but-alive)")
    p.add_argument("--skip-compile", action="store_true",
                   help="skip the fresh-compile probe (it costs a real "
                   "compile on healthy links)")
    p.add_argument("--platform", default=None,
                   help="pin the jax platform (e.g. cpu) inside the probes")
    args = p.parse_args(argv)

    env_extra = {"IMML_LH_SAMPLES": args.samples, "IMML_LH_UPLOAD_MB": args.upload_mb}
    if args.platform:
        env_extra["IMML_LINKHEALTH_PLATFORM"] = args.platform

    from incremental_multimodal_medical_learning_ii_tpu.utils.compile_cache import (
        _DEFAULT as _CACHE_DIR,
    )

    # cache the rtt/upload probe's warmup programs (so they execute during a
    # compile outage once a healthy run has seeded the cache) but NEVER the
    # compile probe — its whole point is a fresh compile
    base, base_err = _run_probe(
        _RTT_UPLOAD, args.probe_timeout, {**env_extra, "IMML_LH_CACHE": _CACHE_DIR}
    )
    compile_s = compile_err = None
    if not args.skip_compile:
        comp, compile_err = _run_probe(_COMPILE, args.compile_timeout, env_extra)
        if comp is not None:
            compile_s = comp["compile_s"]

    if base is None:
        # cannot even build/execute the tiny programs: the compile path is
        # down (or the platform is unreachable) — everything else is moot
        verdict = "degraded-compile"
    elif compile_err is not None and not args.skip_compile:
        verdict = "degraded-compile"
    elif compile_s is not None and compile_s > args.compile_slow_s:
        # slow-but-under-deadline: still compile-bound for real workloads
        verdict = "degraded-compile"
    elif base["rtt_ms"] > 20.0:
        # >20ms per sync: per-batch readbacks will dominate; batch them
        # (engine/trainer.py defers metric readbacks to one device_get per
        # epoch for exactly this reason)
        verdict = "slow-sync"
    else:
        verdict = "ok"

    line = {
        "backend": None if base is None else base["backend"],
        "rtt_ms": None if base is None else round(base["rtt_ms"], 2),
        "upload_mb_per_s": None if base is None else round(base["upload_mb_per_s"], 1),
        "compile_s": None if compile_s is None else round(compile_s, 2),
        "verdict": verdict,
    }
    if base_err is not None:
        line["probe_error"] = base_err
    if compile_err is not None:
        line["compile_error"] = compile_err
    print(json.dumps(line))


if __name__ == "__main__":
    main()
