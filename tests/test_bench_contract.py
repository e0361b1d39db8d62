"""The driver contract for bench.py: exactly ONE JSON line on stdout, even
when the remote TPU claim is wedged (which manifests as an infinite HANG in
device_put, not an exception — round-3/4 postmortem)."""

import json

import pytest


def test_contact_probe_detects_hang(monkeypatch):
    """A device_put that never returns must surface as ChipUnavailableError
    within the bounded join, not hang the process."""
    import bench

    def hang(*a, **k):
        import time

        time.sleep(60.0)

    monkeypatch.setattr(bench.jax, "device_put", hang)
    with pytest.raises(bench.ChipUnavailableError, match="UNAVAILABLE"):
        bench._require_chip_contact(0.5)


def test_contact_probe_passes_on_live_backend():
    import bench

    bench._require_chip_contact(30.0)  # CPU backend in tests — instant


def test_contact_probe_reraises_probe_exception(monkeypatch):
    import bench

    def boom(*a, **k):
        raise RuntimeError("UNAVAILABLE: socket closed")

    monkeypatch.setattr(bench.jax, "device_put", boom)
    with pytest.raises(RuntimeError, match="socket closed"):
        bench._require_chip_contact(5.0)


def test_retry_wrapper_emits_one_json_error_line(monkeypatch, capsys):
    """All-attempts-failed must print exactly one machine-readable line and
    return rc=1 (the round-3 artifact was a 40-line traceback)."""
    import bench

    monkeypatch.setenv("IPOKE_BENCH_RETRIES", "2")
    calls = {"n": 0}

    def failing_main():
        calls["n"] += 1
        raise RuntimeError("UNAVAILABLE: claim wedged")

    monkeypatch.setattr(bench, "main", failing_main)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    rc = bench._main_with_retries()
    assert rc == 1
    assert calls["n"] == 2  # UNAVAILABLE errors are retried
    out_lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(out_lines) == 1
    rec = json.loads(out_lines[0])
    assert rec["value"] is None
    assert rec["transient_backend_outage"] is True
    assert "UNAVAILABLE" in rec["error"]


def test_retry_wrapper_does_not_retry_hard_errors(monkeypatch, capsys):
    import bench

    monkeypatch.setenv("IPOKE_BENCH_RETRIES", "3")
    calls = {"n": 0}

    def failing_main():
        calls["n"] += 1
        raise ValueError("shape mismatch")  # a bug, not an outage

    monkeypatch.setattr(bench, "main", failing_main)
    rc = bench._main_with_retries()
    assert rc == 1
    assert calls["n"] == 1
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["transient_backend_outage"] is False
