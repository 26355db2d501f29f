"""Retry-with-exponential-backoff for device dispatches.

One policy for every site that survives tunnel hiccups (extraction
dispatch, extraction readback, serving dispatch): JAX backend errors
surface as opaque ``XlaRuntimeError``/``JaxRuntimeError`` with no
reliable transient-vs-deterministic discriminator, so the policy retries
*any* exception a bounded number of times — a deterministic error costs
``retries`` extra attempts and then surfaces unchanged.  Keeping the loop
here means a methodology fix (backoff shape, error filtering when the
backend grows typed errors) lands everywhere at once.
"""

from __future__ import annotations

import time
from typing import Callable, Optional, TypeVar

T = TypeVar("T")


def retry_call(
    fn: Callable[[], T],
    retries: int,
    backoff_s: float,
    on_retry: Optional[Callable[[int, BaseException], None]] = None,
) -> T:
    """Run ``fn``; on exception retry up to ``retries`` times, sleeping
    ``backoff_s * 2**attempt`` between attempts.  ``on_retry(attempt, exc)``
    runs before each sleep (stat counting, buffer re-dispatch)."""
    for attempt in range(retries + 1):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - backend errors are opaque
            if attempt >= retries:
                raise
            if on_retry is not None:
                on_retry(attempt, e)
            time.sleep(backoff_s * (2 ** attempt))
    raise AssertionError("unreachable")
