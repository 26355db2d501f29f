"""Headline benchmark: CheXpert embedding-extraction throughput (imgs/sec/chip).

Measures the framework's REAL extraction loop (`engine/extract.py`:
host-prefetched raw uint8 batches -> fused on-device preprocess + BioViL
ResNet-50 bf16 -> per-batch embedding readback) on synthetic CheXpert-small
geometry images — exactly what a user's extraction run executes, including
every host<->device transfer and synchronization.

Methodology notes (hard-won on this tunneled-TPU host, see CLAUDE.md):
* this backend memoizes identical (executable, input) executions — every
  batch has unique content;
* `block_until_ready` on async dispatches is not a reliable completion
  barrier here — the extraction loop's per-batch `np.asarray` readback is
  the only trustworthy synchronization, and it is also what the real
  pipeline does;
* the link has multi-minute degradation phases (same code measures 100x
  apart), so we sample rounds within a time budget and report best AND
  median plus the dispatch-vs-readback wall-time split, so a bad number is
  attributable to link phase rather than code;
* transient backend errors (FAILED_PRECONDITION through the tunnel) are
  retried per batch inside the extraction loop and per round here — a link
  hiccup must never produce a failed benchmark (BENCH_r01.json was rc=1 for
  exactly that reason).

Baseline: the reference is a batch-size-1 torch-CPU loop with PIL
preprocessing (``chexpert-get-embedding.py:49,68-99``; no throughput is
recorded anywhere in the reference).  Measured on this host with identical
model FLOPs and pipeline: **1.509 imgs/sec**.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Always exits 0 unless the framework itself is broken (a link that stays
down for the whole budget reports value 0.0 with the failure count).

Supervision: the measurement runs in a CHILD process under a hard
deadline.  The internal deadline can only fire between operations — a
single in-flight readback through a dead link blocks in a C call for
arbitrarily long (measured: the first warm-up readback hung >9 min during
the 2026-08-17 compile-terminal outage), and a bench that dies to an
external timeout records nothing.  The child prints a PRELIMINARY
wall-only report before the optional device/link stages and the enriched
final one after; the parent forwards the LAST report (so a hang in an
optional stage still delivers the collected wall samples) or, if the
child produced none, a value-0 line with the bounded link probe for
attribution.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

TORCH_CPU_BASELINE_IMGS_PER_SEC = 1.509  # measured 2026-08-16 on this host

# CheXpert-v1.0-small frontal geometry
IMG_H, IMG_W = 390, 320
# batch 512 measured ~15% faster than 256 per image on this link (4.4 vs
# 4.6 ms/img; 1024 collapses under transfer pressure: 9+ ms/img)
BATCH = 512
IMAGES_PER_ROUND = 2048
SIZE, CROP = 512, 512

# FLOPs of ONE image through the fused preprocess + grayscale-folded BioViL
# ResNet-50 forward at 512x512, from XLA cost analysis of the exact jitted
# program (jit(preprocess+forward).lower().compile().cost_analysis(),
# 2026-08-17; conv flops counted as 2xMACs — torchvision/fvcore-style "4.1
# GFLOPs ResNet-50" counts MACs, i.e. HALF this convention).
FLOPS_PER_IMAGE = 4.317e10
# Peak dense bf16 per v5e chip; override for other TPU generations.
PEAK_FLOPS_PER_CHIP = float(os.environ.get("IMML_PEAK_FLOPS", 197e12))
MIN_ROUNDS = 2
MAX_ROUNDS = 12
MAX_FAILURES = 6
TIME_BUDGET_S = 180.0
WARMUP_ATTEMPTS = 5
# Overall deadline: in a dead link phase every stage crawls (a 64 MB batch
# upload can take 5+ minutes at 2 MB/s), and the driver's run must ALWAYS
# end with the JSON line — past the deadline remaining stages are skipped,
# never the report.  One in-flight operation may still overshoot it.
DEADLINE_S = float(os.environ.get("IMML_BENCH_DEADLINE", 540.0))


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _supervise() -> int:
    """Run the measurement in a child; ALWAYS print one JSON line.

    The child gets DEADLINE_S for its own graceful skipping; the parent
    grants +120s of grace for one overshooting in-flight op, then kills it
    and reports a value-0 line with link attribution."""
    env = dict(os.environ, IMML_BENCH_CHILD="1")
    hard = DEADLINE_S + 120.0
    out, reason = None, None
    try:
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.PIPE, timeout=hard, text=True,
        )
        out = res.stdout
        if res.returncode != 0:
            reason = f"child exited rc={res.returncode}"
    except subprocess.TimeoutExpired as e:
        out = e.stdout if isinstance(e.stdout, str) else (
            e.stdout.decode() if e.stdout else None
        )
        reason = f"child killed after {hard:.0f}s (in-flight op never returned)"
    for line in (out or "").strip().splitlines()[::-1]:
        try:
            parsed = json.loads(line)
        except ValueError:
            continue
        # the child prints a PRELIMINARY wall-only report before the
        # optional device/link stages and the final enriched one after —
        # forward the LAST real report line, so a hang in an optional stage
        # still delivers the collected wall samples.  Require the metric
        # dict shape: a stray JSON-parseable fragment on stdout (a bare
        # number from a library) must not become the benchmark artifact.
        if not (isinstance(parsed, dict) and "metric" in parsed):
            continue
        print(line)
        if reason:
            _log(f"[bench] note: {reason} after reporting")
        return 0
    _log(f"[bench] {reason or 'child produced no report'}; emitting failure line")
    link = None
    try:
        from incremental_multimodal_medical_learning_ii_tpu.cli.linkhealth import (
            quick_probe,
        )

        link = quick_probe(timeout_s=45.0)
    except Exception as e:  # noqa: BLE001
        _log(f"[bench] link probe skipped: {type(e).__name__}: {e}")
    print(json.dumps({
        "metric": "chexpert_extraction_images_per_sec_per_chip",
        "value": 0.0, "unit": "images/sec", "vs_baseline": 0.0,
        "failure": reason or "no report", "link": link,
    }))
    return 0


def main() -> None:
    from incremental_multimodal_medical_learning_ii_tpu.utils.compile_cache import enable

    enable()

    import jax
    import jax.numpy as jnp

    from incremental_multimodal_medical_learning_ii_tpu.engine.extract import (
        extract_embeddings,
    )
    from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
        init_biovil_image_model,
    )

    params = init_biovil_image_model(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    def images(n):
        for _ in range(n):
            yield (
                rng.integers(0, 256, size=(IMG_H, IMG_W), dtype=np.uint8),
                np.zeros(5, np.float32),
            )

    def run(n):
        stats: dict = {}
        t0 = time.perf_counter()
        ds = extract_embeddings(
            images(n), params, batch_size=BATCH, size=SIZE, crop=CROP,
            dtype=jnp.bfloat16, retries=3, stats=stats,
        )
        dt = time.perf_counter() - t0
        assert len(ds) == n
        return n / dt, stats

    bench_t0 = time.perf_counter()

    def past_deadline(stage: str) -> bool:
        if time.perf_counter() - bench_t0 > DEADLINE_S:
            _log(f"[bench] deadline ({DEADLINE_S:.0f}s) passed; skipping {stage}")
            return True
        return False

    # Warm-up: compile + prime the pipeline. Retried because the very first
    # readback through the tunnel is the most hiccup-prone operation.
    for attempt in range(WARMUP_ATTEMPTS):
        try:
            run(BATCH)
            break
        except Exception as e:  # noqa: BLE001 - backend errors are opaque
            _log(f"[bench] warm-up attempt {attempt + 1} failed: {type(e).__name__}: {e}")
            if attempt == WARMUP_ATTEMPTS - 1:
                # the sampling loop still runs and can succeed if the link
                # recovers — don't burn deadline on a final pointless sleep
                _log("[bench] warm-up never succeeded; sampling anyway")
                break
            if past_deadline("remaining warm-up attempts"):
                break
            time.sleep(2.0 * (attempt + 1))

    samples: list = []
    dispatch_ms: list = []
    readback_ms: list = []
    retried = 0
    failures = 0
    start = time.perf_counter()
    # Hard wall: even when MIN_ROUNDS isn't reached (link down mid-run),
    # never spin past 2x the budget — report whatever was collected.
    while len(samples) < MIN_ROUNDS or (
        len(samples) < MAX_ROUNDS and time.perf_counter() - start < TIME_BUDGET_S
    ):
        if time.perf_counter() - bench_t0 > DEADLINE_S and samples:
            _log("[bench] deadline passed mid-sampling; reporting collected samples")
            break
        if failures >= MAX_FAILURES or time.perf_counter() - start > 2 * TIME_BUDGET_S:
            _log(f"[bench] giving up after {failures} failures / "
                 f"{time.perf_counter() - start:.0f}s with {len(samples)} sample(s)")
            break
        try:
            rate, stats = run(IMAGES_PER_ROUND)
        except Exception as e:  # noqa: BLE001 - keep sampling through hiccups
            failures += 1
            _log(f"[bench] round failed ({failures}): {type(e).__name__}: {e}")
            time.sleep(2.0 * failures)
            continue
        samples.append(rate)
        n_b = max(stats.get("batches", 1), 1)
        dispatch_ms.append(1e3 * stats.get("dispatch_s", 0.0) / n_b)
        readback_ms.append(1e3 * stats.get("readback_s", 0.0) / n_b)
        retried += stats.get("retried_batches", 0)

    best = max(samples) if samples else 0.0
    median = float(np.median(samples)) if samples else 0.0

    def mfu(rate):
        if not rate:
            return None
        return round(rate * FLOPS_PER_IMAGE / PEAK_FLOPS_PER_CHIP, 4)

    base_report = {
        "metric": "chexpert_extraction_images_per_sec_per_chip",
        "value": round(best, 2),
        "unit": "images/sec",
        "vs_baseline": round(best / TORCH_CPU_BASELINE_IMGS_PER_SEC, 2),
        "batch": BATCH,
        "samples": [round(s, 2) for s in samples],
        "median": round(median, 2),
        "dispatch_ms_per_batch": [round(x, 1) for x in dispatch_ms],
        "readback_ms_per_batch": [round(x, 1) for x in readback_ms],
        "retried_batches": retried,
        "failed_rounds": failures,
        "flops_per_image": FLOPS_PER_IMAGE,
        # wall MFU is tunnel-capped; device MFU is the chip's truth
        "mfu_wall": mfu(best),
    }
    # PRELIMINARY report before the optional device/link stages: if one of
    # them hangs in a C call past the supervisor's grace (measured >9 min
    # during a compile-terminal outage), the parent still forwards the
    # collected wall samples instead of a value-0 failure line (it takes
    # the LAST report printed).
    print(json.dumps({**base_report, "preliminary": True}), flush=True)

    # Device-side truth: the same fused preprocess+encode timed INSIDE one
    # jitted chained lax.scan (long-minus-short difference cancels dispatch
    # and readback) — the chip's real throughput, vs the tunnel-capped wall
    # number above.  Measured at the SAME batch as the wall loop (so the two
    # numbers in this JSON are apples-to-apples) AND at the historical
    # batch-256 shape (so round-over-round BENCH_r*.json stay comparable;
    # its program is also in the shared persistent compile cache).
    # Each soft-fails to None independently.
    device_rate = device_rate_256 = None
    if os.environ.get("IMML_BENCH_DEVICE", "1") != "0":
        def _try_device(b):
            if past_deadline(f"device-side measurement (batch {b})"):
                return None
            try:
                return _device_side_rate(batch=b)
            except Exception as e:  # noqa: BLE001
                _log(f"[bench] device-side (batch {b}) skipped: {type(e).__name__}: {e}")
                return None

        device_rate = _try_device(BATCH)
        device_rate_256 = _try_device(256)

    # Link attribution IN the artifact: a throughput number on this host is
    # a sample of link health as much as of the code, so the report carries
    # its own rtt/upload probe (bounded; no compile probe).
    link = None
    if not past_deadline("link probe"):
        try:
            from incremental_multimodal_medical_learning_ii_tpu.cli.linkhealth import (
                quick_probe,
            )

            link = quick_probe(timeout_s=45.0)
        except Exception as e:  # noqa: BLE001 - attribution must never fail the bench
            _log(f"[bench] link probe skipped: {type(e).__name__}: {e}")

    print(
        json.dumps(
            {
                **base_report,
                "device_images_per_sec_per_chip": (
                    round(device_rate, 1) if device_rate else None
                ),
                "device_batch": BATCH,
                "mfu_device": mfu(device_rate),
                "device_images_per_sec_per_chip_b256": (
                    round(device_rate_256, 1) if device_rate_256 else None
                ),
                "mfu_device_b256": mfu(device_rate_256),
                "link": link,
            }
        ),
        flush=True,
    )


def _device_side_rate(batch: int = 256) -> float:
    """Chained-scan device-only encode throughput (imgs/sec/chip) via the
    canonical shared loop (utils/device_bench.py — same program as
    bench_all.py's `extraction_device_images_per_sec_per_chip`, so the
    persistent compile cache is shared and the numbers are comparable)."""
    import jax

    from incremental_multimodal_medical_learning_ii_tpu.models.biovil_image import (
        fold_grayscale_conv1,
        init_biovil_image_model,
    )
    from incremental_multimodal_medical_learning_ii_tpu.utils.device_bench import (
        device_encode_rate,
    )

    params = fold_grayscale_conv1(init_biovil_image_model(jax.random.PRNGKey(0)))
    return device_encode_rate(
        params, batch=batch, img_h=IMG_H, img_w=IMG_W, size=SIZE, crop=CROP,
        channels=1,
    )


if __name__ == "__main__":
    if os.environ.get("IMML_BENCH_CHILD") == "1":
        main()
    else:
        sys.exit(_supervise())
