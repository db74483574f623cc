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
