"""bench.py's supervised execution: the driver must ALWAYS get one JSON
line, even when the child hangs in an in-flight readback (measured >9 min
during the 2026-08-17 outage) or dies — the parent forwards the child's
report verbatim or emits a value-0 failure line with link attribution."""

import json
import subprocess

import pytest

import bench


def _patch_probe(monkeypatch):
    from incremental_multimodal_medical_learning_ii_tpu.cli import linkhealth

    monkeypatch.setattr(
        linkhealth, "quick_probe", lambda **kw: {"probe_error": "timeout"}
    )


@pytest.mark.fast
def test_supervisor_forwards_child_report(monkeypatch, capsys):
    line = json.dumps({"metric": "m", "value": 123.0, "unit": "images/sec"})

    def fake_run(*a, **kw):
        return subprocess.CompletedProcess(a, 0, stdout="noise\n" + line + "\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._supervise() == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out == [line]


@pytest.mark.fast
def test_supervisor_reports_on_hang(monkeypatch, capsys):
    def fake_run(*a, **kw):
        raise subprocess.TimeoutExpired(cmd=a, timeout=kw["timeout"], output=b"")

    monkeypatch.setattr(subprocess, "run", fake_run)
    _patch_probe(monkeypatch)
    assert bench._supervise() == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["metric"] == "chexpert_extraction_images_per_sec_per_chip"
    assert line["value"] == 0.0 and "killed" in line["failure"]
    assert line["link"] == {"probe_error": "timeout"}


@pytest.mark.fast
def test_supervisor_reports_on_child_crash(monkeypatch, capsys):
    def fake_run(*a, **kw):
        return subprocess.CompletedProcess(a, 1, stdout="Traceback ...\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    _patch_probe(monkeypatch)
    assert bench._supervise() == 0
    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["value"] == 0.0 and "rc=1" in line["failure"]


@pytest.mark.fast
def test_supervisor_forwards_report_even_if_child_then_hung(monkeypatch, capsys):
    """A child that printed its JSON but never exited (stuck TPU teardown)
    still delivers the real number."""
    line = json.dumps({"metric": "m", "value": 9.0, "unit": "images/sec"})

    def fake_run(*a, **kw):
        raise subprocess.TimeoutExpired(
            cmd=a, timeout=kw["timeout"], output=(line + "\n").encode()
        )

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._supervise() == 0
    assert capsys.readouterr().out.strip() == line


@pytest.mark.fast
def test_supervisor_prefers_last_report_and_ignores_stray_json(monkeypatch, capsys):
    """The child prints a preliminary wall-only report before the optional
    device/link stages and the enriched one after: the parent must forward
    the LAST metric dict — and a stray JSON-parseable fragment (a bare
    number from a library) must never become the artifact."""
    prelim = json.dumps({"metric": "m", "value": 5.0, "preliminary": True})
    final = json.dumps({"metric": "m", "value": 5.0, "mfu_device": 0.43})

    def fake_run(*a, **kw):
        return subprocess.CompletedProcess(
            a, 0, stdout=prelim + "\n" + final + "\n0\n[]\n"
        )

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._supervise() == 0
    assert capsys.readouterr().out.strip() == final

    # hang AFTER the preliminary line: the wall samples still land
    def fake_hang(*a, **kw):
        raise subprocess.TimeoutExpired(
            cmd=a, timeout=kw["timeout"], output=(prelim + "\n").encode()
        )

    monkeypatch.setattr(subprocess, "run", fake_hang)
    assert bench._supervise() == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["preliminary"]


@pytest.mark.slow
def test_bench_child_flow_end_to_end(monkeypatch, capsys):
    """The child-side measurement flow (warm-up -> sampling -> PRELIMINARY
    report -> link probe -> final report) with the extraction loop stubbed:
    exactly two metric lines, preliminary first, final enriched with the
    link field, consistent values."""
    from incremental_multimodal_medical_learning_ii_tpu.engine import extract
    from incremental_multimodal_medical_learning_ii_tpu.cli import linkhealth

    class FakeDS:
        def __init__(self, n):
            self._n = n

        def __len__(self):
            return self._n

    def fake_extract(images, params, **kw):
        imgs = list(images)
        stats = kw.get("stats")
        if stats is not None:
            stats.update({"batches": 4, "dispatch_s": 0.01, "readback_s": 0.02,
                          "retried_batches": 1})
        return FakeDS(len(imgs))

    monkeypatch.setattr(extract, "extract_embeddings", fake_extract)
    monkeypatch.setattr(
        linkhealth, "quick_probe",
        lambda **kw: {"rtt_ms": 3.0, "upload_mb_per_s": 50.0},
    )
    monkeypatch.setenv("IMML_BENCH_DEVICE", "0")  # skip the chained-scan stage

    import bench

    bench.main()
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 2
    prelim, final = lines
    assert prelim.get("preliminary") is True and "link" not in prelim
    assert "preliminary" not in final
    assert final["link"] == {"rtt_ms": 3.0, "upload_mb_per_s": 50.0}
    assert final["value"] == prelim["value"] > 0
    assert final["retried_batches"] == prelim["retried_batches"] > 0
    assert final["device_images_per_sec_per_chip"] is None  # stage skipped
    assert len(final["samples"]) >= 2
