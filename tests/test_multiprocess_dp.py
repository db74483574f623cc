"""REAL 2-process distributed data parallelism (SURVEY.md §2.3 comm row).

Every other mesh test runs single-process over 8 virtual devices; this one
actually rendezvouses TWO OS processes through a jax.distributed
coordinator (CPU backend, 4 forced host devices each -> one 8-device global
mesh), runs one compiled DP train step whose gradient all-reduce crosses
the process boundary, and asserts the result matches the single-process
8-device step bit-for-tolerance. This exercises initialize_distributed's
happy path (posenet_tpu/parallel/mesh.py:22-75) — the one path a pod takes
that the error-taxonomy tests cannot cover.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO_ROOT, 'tests', 'dp_worker.py')


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def _run_workers(tmp_path, nprocs: int, n_local: int, global_batch: int,
                 timeout: int = 240):
    """Spawn `nprocs` dp_worker processes (each with `n_local` forced host
    devices) through one coordinator; return their parsed JSON results."""
    port = _free_port()
    coord = f'127.0.0.1:{port}'

    env = dict(os.environ)
    env['XLA_FLAGS'] = f'--xla_force_host_platform_device_count={n_local}'
    env.pop('JAX_PLATFORMS', None)  # the worker sets the config API itself
    env['PYTHONPATH'] = REPO_ROOT

    procs, outs = [], []
    for pid in range(nprocs):
        out_path = str(tmp_path / f'worker_{pid}.json')
        outs.append(out_path)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, coord, str(pid), str(nprocs), out_path,
             str(n_local), str(global_batch)],
            env=env, cwd=REPO_ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    results = []
    try:
        for p, out_path in zip(procs, outs):
            try:
                stdout, _ = p.communicate(timeout=timeout)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.fail('distributed worker timed out (coordinator '
                            'rendezvous or cross-process collective hung)')
            assert p.returncode == 0, f'worker failed:\n{stdout}'
            with open(out_path) as f:
                results.append(json.load(f))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return results


def _single_process_step(global_batch: int):
    """The unsharded single-jit step on the TRUE (unpadded) batch — the
    oracle every distributed configuration must reproduce."""
    import jax
    import jax.numpy as jnp

    from posenet_tpu.config import ModelConfig, TrainConfig
    from posenet_tpu.models import mobilenet_v1
    from posenet_tpu.training import train_step as ts

    model_cfg = ModelConfig(model_id=50, output_stride=16)
    train_cfg = TrainConfig(model_id=50)
    params = mobilenet_v1.init_params(jax.random.PRNGKey(1), model_cfg)
    state, tx = ts.init_train_state(params, train_cfg)
    rng = np.random.RandomState(1)
    batch = {
        'image': jnp.asarray(rng.uniform(-1, 1, (global_batch, 33, 33, 3)),
                             jnp.float32),
        'keypoints': jnp.asarray(rng.uniform(0, 2, (global_batch, 3, 17, 2)),
                                 jnp.float32),
    }
    new_state, metrics = ts.make_train_step(tx, model_cfg, train_cfg)(
        state, batch)
    fingerprint = float(np.sum(np.abs(np.asarray(
        new_state.params['heads']['heatmap']['w']))))
    return float(metrics['loss']), fingerprint


def test_two_process_dp_step_matches_single_process(tmp_path):
    # Timeout guarding lives in communicate(timeout=...) — the
    # pytest-timeout plugin is not available in this environment.
    # NOTE this test deliberately runs two concurrent XLA:CPU processes on
    # the single-core box (a rendezvous cannot be serialized); the worker
    # model is tiny (m50, 33x33 inputs) to keep both compiles small, and
    # the timeout bounds the worst-case stall.
    results = _run_workers(tmp_path, nprocs=2, n_local=4, global_batch=8)

    assert [r['process'] for r in results] == [0, 1]
    assert all(r['n_devices'] == 8 for r in results)

    # Both processes computed the SAME replicated loss and update — the
    # all-reduce actually synchronized them.
    assert results[0]['loss'] == pytest.approx(results[1]['loss'], rel=1e-6)
    assert results[0]['fingerprint'] == pytest.approx(
        results[1]['fingerprint'], rel=1e-6)

    # And the 2-process global step equals the single-process 8-device step
    # on the same deterministic batch (mean-preserving all-reduce).
    loss, fingerprint = _single_process_step(8)
    assert results[0]['loss'] == pytest.approx(loss, rel=1e-5)
    assert results[0]['fingerprint'] == pytest.approx(fingerprint, rel=1e-5)


def test_four_process_uneven_batch_matches_single_process(tmp_path):
    """4 processes x 2 virtual devices, UNEVEN global batch (r4 verdict
    task 7): 10 images over 8 global devices — the workers pad to 16 with
    zero-weight wrap items (train_step.pad_batch_to), the step's weighted
    mean makes the padded global step EXACTLY the true 10-item step, and
    the grad all-reduce crosses three process boundaries. Must agree
    across all four processes and with the single-process UNPADDED step."""
    results = _run_workers(tmp_path, nprocs=4, n_local=2, global_batch=10,
                           timeout=420)

    assert [r['process'] for r in results] == [0, 1, 2, 3]
    assert all(r['n_devices'] == 8 for r in results)
    for r in results[1:]:
        assert r['loss'] == pytest.approx(results[0]['loss'], rel=1e-6)
        assert r['fingerprint'] == pytest.approx(results[0]['fingerprint'],
                                                 rel=1e-6)

    loss, fingerprint = _single_process_step(10)
    assert results[0]['loss'] == pytest.approx(loss, rel=1e-5)
    assert results[0]['fingerprint'] == pytest.approx(fingerprint, rel=1e-5)
