"""Profiling hooks.

The reference has no tracing at all (only tqdm bars, SURVEY.md section 5);
here every long-running pass can capture a ``jax.profiler`` trace viewable
in TensorBoard/Perfetto/XProf.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str]) -> Iterator[None]:
    """Capture a device trace into ``trace_dir`` when given, else no-op."""
    if trace_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in the trace timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)
