"""Link-health probe CLI: JSON contract and timeout behavior."""

import json

import pytest


def _run(argv, capsys):
    from incremental_multimodal_medical_learning_ii_tpu.cli.linkhealth import main

    main(argv)
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


@pytest.mark.slow
def test_linkhealth_ok_on_cpu(capsys):
    line = _run(
        ["--samples", "3", "--upload-mb", "1", "--platform", "cpu",
         "--probe-timeout", "120", "--compile-timeout", "120"],
        capsys,
    )
    assert line["backend"] == "cpu"
    assert line["verdict"] in ("ok", "slow-sync")  # CI boxes can be slow
    assert line["rtt_ms"] > 0 and line["upload_mb_per_s"] > 0
    assert line["compile_s"] > 0


@pytest.mark.slow
def test_linkhealth_slow_compile_is_degraded(capsys):
    """A fresh compile that finishes but exceeds --compile-slow-s must flag
    degraded-compile: the documented outage phases have a slow-but-alive
    onset where everything returns, just minutes late."""
    line = _run(
        ["--samples", "3", "--upload-mb", "1", "--platform", "cpu",
         "--probe-timeout", "120", "--compile-timeout", "120",
         "--compile-slow-s", "0.0"],
        capsys,
    )
    assert line["compile_s"] is not None and line["compile_s"] > 0
    assert line["verdict"] == "degraded-compile"


@pytest.mark.slow
def test_linkhealth_degraded_on_timeout(capsys):
    """A probe deadline of ~0 simulates a stalled compile terminal: every
    leg must report null and the verdict degraded — the probe never hangs
    on the condition it diagnoses."""
    line = _run(
        ["--samples", "3", "--upload-mb", "1", "--platform", "cpu",
         "--probe-timeout", "0.01", "--compile-timeout", "0.01"],
        capsys,
    )
    assert line["verdict"] == "degraded-compile"
    assert line["rtt_ms"] is None and line["compile_s"] is None
    assert line["probe_error"] == "timeout"


@pytest.mark.slow
def test_linkhealth_skip_compile(capsys):
    line = _run(
        ["--samples", "3", "--upload-mb", "1", "--platform", "cpu",
         "--probe-timeout", "120", "--skip-compile"],
        capsys,
    )
    assert line["compile_s"] is None
    assert "compile_error" not in line
    assert line["verdict"] in ("ok", "slow-sync")


@pytest.mark.slow
def test_quick_probe_embeddable(capsys):
    """quick_probe (the bench.py side-channel) returns rtt/upload on a
    healthy backend, a bounded probe_error on a stalled one, and never
    raises or prints."""
    from incremental_multimodal_medical_learning_ii_tpu.cli.linkhealth import (
        quick_probe,
    )

    ok = quick_probe(timeout_s=120, samples=3, upload_mb=1, platform="cpu")
    assert ok["rtt_ms"] > 0 and ok["upload_mb_per_s"] > 0
    dead = quick_probe(timeout_s=0.01, platform="cpu")
    assert dead == {"probe_error": "timeout"}
    assert capsys.readouterr().out == ""
