"""Profiling subsystem tests."""

import time

import numpy as np

from posenet_tpu.profiling import StageTimer, device_time_report, trace


def test_stage_timer():
    t = StageTimer()
    with t.stage('a'):
        time.sleep(0.02)
    with t.stage('b'):
        time.sleep(0.01)
    with t.stage('a'):
        time.sleep(0.02)
    assert t.counts['a'] == 2 and t.counts['b'] == 1
    assert t.totals['a'] > t.totals['b']
    rep = t.report()
    assert 'a' in rep and 'ms/call' in rep


def test_trace_and_report(tmp_path):
    import jax
    import jax.numpy as jnp

    logdir = str(tmp_path / 'trace')
    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((256, 256))
    f(x)  # compile outside the trace
    with trace(logdir):
        np.asarray(f(x))
    report = device_time_report(logdir)
    assert isinstance(report, str) and len(report) > 0
