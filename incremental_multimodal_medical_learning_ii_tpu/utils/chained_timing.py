"""Chained-scan device timing: the ONE trustworthy way to time kernels on
this class of host (see CLAUDE.md / docs/DESIGN.md).

Methodology: per-call dispatch latency through a tunneled TPU link is
milliseconds — far above sub-millisecond kernels — so host-side timing
loops measure the link, not the device.  Instead the workload is run K
times INSIDE one jitted ``lax.scan``/``fori_loop`` (iterations chained
through an accumulator that perturbs the next input, so XLA cannot
parallelise or CSE them), and per-iteration cost is the difference between
a long and a short scan, cancelling dispatch + readback overhead.  Fresh
input buffers every repeat defeat backend memoization; min-over-repeats is
used because jitter only ever adds time; the only synchronization is a
data readback (``np.asarray``), because ``block_until_ready`` is not a
reliable barrier on this backend.
"""

from __future__ import annotations

import time
from typing import Callable, Optional, Sequence, Tuple

import numpy as np


def time_chained(
    loop_factory: Callable[[int], Callable],
    args_for_repeat: Callable[[int], Sequence],
    k_short: int,
    k_long: int,
    repeats: int = 3,
) -> Optional[float]:
    """Per-iteration seconds via long-minus-short chained scans.

    ``loop_factory(k)`` returns a jitted callable running the workload k
    times; ``args_for_repeat(r)`` returns its argument tuple for repeat r
    (r=-1 for the compile/warm call) — vary at least one buffer per repeat.

    Returns ``None`` when the long scan measured no slower than the short
    one: on links with multi-minute degradation phases that means the two
    scans straddled a phase change and the sample is invalid — callers must
    report it as missing, never clamp it into an absurd rate.
    """
    if repeats < 1:
        raise ValueError(f"repeats must be >= 1, got {repeats}")
    if k_long <= k_short:
        raise ValueError(f"k_long ({k_long}) must exceed k_short ({k_short})")
    loops = {}
    for k in (k_short, k_long):
        loops[k] = loop_factory(k)
        float(np.asarray(loops[k](*args_for_repeat(-1))))  # compile + warm
    # INTERLEAVE the repeats (short, long, short, long, ...): timing all
    # shorts before all longs leaves a one-sided hole — a link phase change
    # between the two blocks inflates the long-minus-short difference and
    # only the deflation direction is caught by the diff<=0 guard below.
    # Interleaved, both mins can come from the same link phase.
    times = {k_short: float("inf"), k_long: float("inf")}
    for r in range(repeats):
        args = args_for_repeat(r)
        for k in (k_short, k_long):
            t0 = time.perf_counter()
            float(np.asarray(loops[k](*args)))  # readback = the only real barrier
            times[k] = min(times[k], time.perf_counter() - t0)
    diff = times[k_long] - times[k_short]
    if diff <= 0:
        return None
    return diff / (k_long - k_short)


def rate_or_none(
    per_iter_s: Optional[float], items_per_iter: float
) -> Optional[float]:
    """items/sec from a per-iteration time, propagating invalid samples."""
    if per_iter_s is None or per_iter_s <= 0:
        return None
    return items_per_iter / per_iter_s
