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


def test_two_process_dp_step_matches_single_process(tmp_path):
    # Timeout guarding lives in communicate(timeout=...) below — the
    # pytest-timeout plugin is not available in this environment.
    # NOTE this is the one test that deliberately runs two concurrent
    # XLA:CPU processes on the single-core box (a rendezvous cannot be
    # serialized); the worker model is tiny (m50, 33x33 inputs) to keep
    # both compiles small, and the timeout bounds the worst-case stall.
    port = _free_port()
    coord = f'127.0.0.1:{port}'

    env = dict(os.environ)
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
    env.pop('JAX_PLATFORMS', None)  # the worker sets the config API itself
    env['PYTHONPATH'] = REPO_ROOT

    procs, outs = [], []
    for pid in range(2):
        out_path = str(tmp_path / f'worker_{pid}.json')
        outs.append(out_path)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, coord, str(pid), '2', out_path],
            env=env, cwd=REPO_ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    results = []
    try:
        for p, out_path in zip(procs, outs):
            try:
                stdout, _ = p.communicate(timeout=240)
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

    assert [r['process'] for r in results] == [0, 1]
    assert all(r['n_devices'] == 8 for r in results)

    # Both processes computed the SAME replicated loss and update — the
    # all-reduce actually synchronized them.
    assert results[0]['loss'] == pytest.approx(results[1]['loss'], rel=1e-6)
    assert results[0]['fingerprint'] == pytest.approx(
        results[1]['fingerprint'], rel=1e-6)

    # And the 2-process global step equals the single-process 8-device step
    # on the same deterministic batch (mean-preserving all-reduce).
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
        'image': jnp.asarray(rng.uniform(-1, 1, (8, 33, 33, 3)), jnp.float32),
        'keypoints': jnp.asarray(rng.uniform(0, 2, (8, 3, 17, 2)),
                                 jnp.float32),
    }
    new_state, metrics = ts.make_train_step(tx, model_cfg, train_cfg)(
        state, batch)
    fingerprint = float(np.sum(np.abs(np.asarray(
        new_state.params['heads']['heatmap']['w']))))

    assert results[0]['loss'] == pytest.approx(float(metrics['loss']),
                                               rel=1e-5)
    assert results[0]['fingerprint'] == pytest.approx(fingerprint, rel=1e-5)
