"""The shared chained-scan timing harness: invalid samples (long scan no
slower than short) must propagate as None, never clamp to absurd rates."""

import numpy as np

from incremental_multimodal_medical_learning_ii_tpu.utils.chained_timing import (
    rate_or_none,
    time_chained,
)


def test_time_chained_measures_positive_difference(monkeypatch):
    t = {"now": 0.0}

    def fake_perf():
        return t["now"]

    import incremental_multimodal_medical_learning_ii_tpu.utils.chained_timing as ct
    monkeypatch.setattr(ct.time, "perf_counter", fake_perf)

    def factory(k):
        def loop():
            t["now"] += 0.01 * k  # each iteration costs 10 ms
            return np.zeros(())
        return loop

    per = ct.time_chained(factory, lambda r: (), k_short=2, k_long=8, repeats=1)
    assert per is not None
    np.testing.assert_allclose(per, 0.01, rtol=1e-6)
    assert rate_or_none(per, 100.0) == 100.0 / per


def test_time_chained_invalid_when_long_not_slower(monkeypatch):
    t = {"now": 0.0}
    import incremental_multimodal_medical_learning_ii_tpu.utils.chained_timing as ct
    monkeypatch.setattr(ct.time, "perf_counter", lambda: t["now"])

    costs = {2: 5.0, 8: 0.5}  # degraded phase during the short scan

    def factory(k):
        def loop():
            t["now"] += costs[k]
            return np.zeros(())
        return loop

    assert ct.time_chained(factory, lambda r: (), k_short=2, k_long=8, repeats=1) is None
    assert rate_or_none(None, 100.0) is None
