"""Unit tests for bench.py's diagnosability machinery (round-5
restructure, VERDICT r4 item 1): the per-attempt chain log and the
per-phase timers must record every outcome so a null showcase field in
the driver artifact is diagnosable from the artifact alone."""

import json

import bench


def test_attempt_chain_logs_every_outcome():
    """ok / skipped_budget / crash outcomes all land in the log with
    their elapsed time; the first success short-circuits the chain."""
    log = []
    attempts = (("huge", 1e9),      # must skip: cost exceeds any budget
                ("bad", 1.0),       # runs, child exits nonzero
                ("good", 1.0),      # runs, prints the payload
                ("never", 1.0))     # unreachable after the success

    def make_prog(config):
        if config == "bad":
            return "import sys; sys.exit(3)"
        return ("import json; print('H8JSON ' + json.dumps("
                "{'energy': -1.0, 'config': %r}))" % config)

    out = bench._run_attempt_chain(attempts, make_prog, budget_s=60.0,
                                   log=log)
    assert out == {"energy": -1.0, "config": "good"}
    assert [e["config"] for e in log] == ["huge", "bad", "good"]
    assert log[0]["outcome"].startswith("skipped_budget")
    assert log[0]["elapsed_s"] == 0.0
    assert log[1]["outcome"].startswith("rc=") or log[1]["outcome"]
    assert log[2]["outcome"] == "ok"
    assert log[2]["elapsed_s"] >= 0.0
    # every entry is JSON-serializable (it goes straight into the
    # artifact line)
    json.dumps(log)


def test_attempt_chain_dry_returns_none_with_full_log():
    log = []
    out = bench._run_attempt_chain((("a", 1e9), ("b", 1e9)),
                                   lambda c: "print('nothing')",
                                   budget_s=10.0, log=log)
    assert out is None
    assert len(log) == 2
    assert all(e["outcome"].startswith("skipped_budget") for e in log)


def test_attempt_chain_reserves_fallback_budget(monkeypatch):
    """A big first attempt's subprocess timeout must leave the cheapest
    remaining fallback runnable: the round-5 validation run showed the
    N=32 attempt consuming the whole chain budget mid-compile and every
    fallback skipping with `have -0s` (null artifact field).  The chain
    now caps each attempt at (budget left − min remaining cost)."""
    import subprocess
    seen = []

    def fake_run(cmd, capture_output, text, timeout):
        seen.append(timeout)
        if len(seen) == 1:        # the flagship overruns its estimate
            raise subprocess.TimeoutExpired(cmd, timeout)
        class R:
            returncode = 0
            stderr = ""
            stdout = "H8JSON " + json.dumps({"energy": -2.0})
        return R()

    monkeypatch.setattr(subprocess, "run", fake_run)
    log = []
    out = bench._run_attempt_chain(
        (("32", 420.0), ("28", 220.0), ("24", 80.0), ("20", 80.0)),
        lambda c: "unused", budget_s=460.0, log=log)
    # flagship got budget − min(220, 80, 80) = 380, not the full 460
    assert 379.0 < seen[0] <= 380.0
    assert log[0]["outcome"] == "Timeout"
    # a fallback still ran and landed the number
    assert out == {"energy": -2.0}
    assert log[-1]["outcome"] == "ok"


def test_phase_timer_records_on_exception():
    bench.RESULTS["per_phase_s"].pop("boom", None)
    try:
        with bench._phase("boom"):
            raise RuntimeError("x")
    except RuntimeError:
        pass
    assert "boom" in bench.RESULTS["per_phase_s"]
    assert bench.RESULTS["per_phase_s"]["boom"] >= 0.0
