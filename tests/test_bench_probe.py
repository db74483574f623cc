"""bench.py backend probe: fail fast when the TPU tunnel is down.

The probe runs device discovery in a throwaway subprocess under a
timeout (a dead axon tunnel hangs backend init ~20 min); these tests pin
the exit codes without touching any real backend.
"""

import subprocess

import pytest

import bench


def test_probe_times_out_exits_2(monkeypatch):
    def hang(*a, **kw):
        raise subprocess.TimeoutExpired(cmd=a[0], timeout=kw["timeout"])

    monkeypatch.setattr(bench.subprocess, "run", hang)
    with pytest.raises(SystemExit) as e:
        bench._probe_backend(timeout_s=1.0)
    assert e.value.code == 2


def test_probe_subprocess_failure_exits_2(monkeypatch):
    def fail(*a, **kw):
        raise subprocess.CalledProcessError(returncode=3, cmd=a[0])

    monkeypatch.setattr(bench.subprocess, "run", fail)
    with pytest.raises(SystemExit) as e:
        bench._probe_backend(timeout_s=1.0)
    assert e.value.code == 2


def test_probe_passes_through_on_success(monkeypatch):
    calls = []
    monkeypatch.setattr(bench.subprocess, "run",
                        lambda *a, **kw: calls.append(a))
    bench._probe_backend(timeout_s=1.0)  # no exception
    assert len(calls) == 1


# ---------------------------------------------------------------------------
# Tunnel-stall guard (bench.stall_guard_retry)
# ---------------------------------------------------------------------------

def _no_sleep(_s):
    pass


def test_stall_guard_first_run_writes_sidecar(tmp_path):
    sidecar = str(tmp_path / "best.json")
    value, degraded = bench.stall_guard_retry(
        lambda: 5000.0, sidecar=sidecar, sleep=_no_sleep)
    assert (value, degraded) == (5000.0, False)
    assert bench._read_best(sidecar) == 5000.0


def test_stall_guard_retries_through_stall(tmp_path):
    sidecar = str(tmp_path / "best.json")
    bench._write_best(5945.0, sidecar)
    # stalled window, stalled window, recovered window
    seq = iter([259.0, 280.0, 5900.0])
    slept = []
    value, degraded = bench.stall_guard_retry(
        lambda: next(seq), sidecar=sidecar, sleep=slept.append)
    assert value == 5900.0 and not degraded
    assert slept == [30, 30]
    # a recovered-but-not-record run must not lower the recorded best
    assert bench._read_best(sidecar) == 5945.0


def test_stall_guard_flags_persistent_degradation(tmp_path):
    sidecar = str(tmp_path / "best.json")
    bench._write_best(5945.0, sidecar)
    value, degraded = bench.stall_guard_retry(
        lambda: 259.0, sidecar=sidecar, sleep=_no_sleep)
    assert value == 259.0 and degraded
    # degraded runs never overwrite the healthy best
    assert bench._read_best(sidecar) == 5945.0


def test_stall_guard_new_record_updates_sidecar(tmp_path):
    sidecar = str(tmp_path / "best.json")
    bench._write_best(5000.0, sidecar)
    value, degraded = bench.stall_guard_retry(
        lambda: 6100.0, sidecar=sidecar, sleep=_no_sleep)
    assert (value, degraded) == (6100.0, False)
    assert bench._read_best(sidecar) == 6100.0


def test_stall_guard_small_variance_not_flagged(tmp_path):
    sidecar = str(tmp_path / "best.json")
    bench._write_best(5945.0, sidecar)
    calls = []
    value, degraded = bench.stall_guard_retry(
        lambda: calls.append(1) or 5600.0, sidecar=sidecar, sleep=_no_sleep)
    assert (value, degraded) == (5600.0, False)
    assert len(calls) == 1          # no retry for ordinary chip variance


def test_stall_guard_first_run_during_stall_not_recorded(tmp_path):
    """No sidecar yet + tunnel stalled: the guard must still flag the run
    (seeded from _HEALTHY_FLOOR) and must NOT record the stalled value as
    the healthy best — otherwise later stalled runs compare against a
    stalled baseline and are never flagged (advisor r4)."""
    sidecar = str(tmp_path / "best.json")
    slept = []
    value, degraded = bench.stall_guard_retry(
        lambda: 259.0, sidecar=sidecar, sleep=slept.append)
    assert value == 259.0 and degraded
    assert slept == [30, 30]                   # floor-seeded retries ran
    assert bench._read_best(sidecar) is None   # nothing recorded


def test_stall_guard_retried_record_not_persisted(tmp_path):
    """A run that needed retries never writes the sidecar, even when the
    recovered value would be a record — retried windows ran on a flaky
    tunnel and are not trusted as the healthy baseline."""
    sidecar = str(tmp_path / "best.json")
    bench._write_best(5000.0, sidecar)
    seq = iter([259.0, 6100.0])
    value, degraded = bench.stall_guard_retry(
        lambda: next(seq), sidecar=sidecar, sleep=_no_sleep)
    assert value == 6100.0 and not degraded
    assert bench._read_best(sidecar) == 5000.0


def test_read_best_corrupt_sidecar(tmp_path):
    p = tmp_path / "best.json"
    p.write_text("{not json")
    assert bench._read_best(str(p)) is None
    p.write_text('{"img_per_s": null}')
    assert bench._read_best(str(p)) is None
