"""Worker process for the REAL multi-process distributed DP tests
(tests/test_multiprocess_dp.py).

Each worker joins a jax.distributed coordinator (CPU backend, argv-chosen
forced host devices per process), builds the GLOBAL data-parallel mesh, runs
ONE compiled DP train step on a deterministic global batch (padded with
zero-weight items when it does not divide the device count), and writes its
replicated loss + a post-update parameter fingerprint to a JSON file. The
parent test asserts both processes agree with each other AND with the
single-process 8-device step — the multi-host happy path the rest of the
suite could never exercise (SURVEY.md §2.3 comm row).

Not a test module itself (no test_ prefix): pytest must not collect it.
"""

import json
import os
import sys


def main():
    coord, pid, nprocs, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    # Optional: local device count (must match the parent's XLA_FLAGS
    # --xla_force_host_platform_device_count) and the TRUE global batch
    # size. A batch that does not divide the global device count is padded
    # with zero-weight wrap items (train_step.pad_batch_to) — the 4-process
    # test drives exactly that path.
    n_local = int(sys.argv[5]) if len(sys.argv) > 5 else 4
    global_batch = int(sys.argv[6]) if len(sys.argv) > 6 else 8

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)

    import jax

    # CPU backend (the env var is overridden by the axon plugin; the config
    # API is authoritative) and cross-process CPU collectives via gloo —
    # both must be set before the backend initializes.
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except (AttributeError, ValueError):
        pass  # older/newer jax: default implementation handles it

    from posenet_tpu.parallel import mesh as mesh_lib

    idx = mesh_lib.initialize_distributed(
        coordinator_address=coord, num_processes=nprocs, process_id=pid)
    assert idx == pid, (idx, pid)
    assert jax.process_count() == nprocs, jax.process_count()

    import numpy as np

    from posenet_tpu.config import ModelConfig, TrainConfig
    from posenet_tpu.models import mobilenet_v1
    from posenet_tpu.training import train_step as ts

    devs = jax.devices()
    assert len(devs) == n_local * nprocs, devs
    n_global_devs = len(devs)
    mesh = mesh_lib.make_mesh()  # global mesh over all processes' devices

    model_cfg = ModelConfig(model_id=50, output_stride=16)
    train_cfg = TrainConfig(model_id=50)
    # Deterministic init: all processes derive identical params from the
    # same PRNG key (required — DP state is replicated by construction).
    params = mobilenet_v1.init_params(jax.random.PRNGKey(1), model_cfg)
    state, tx = ts.init_train_state(params, train_cfg)

    rng = np.random.RandomState(1)
    images = rng.uniform(-1, 1, (global_batch, 33, 33, 3)).astype(np.float32)
    kps = rng.uniform(0, 2, (global_batch, 3, 17, 2)).astype(np.float32)
    host_batch = {'image': images, 'keypoints': kps}
    # Uneven global batch: pad to mesh-divisible with zero-weight items —
    # the step's weighted mean makes the result EXACTLY the true batch's.
    pad_to = -(-global_batch // n_global_devs) * n_global_devs
    host_batch = ts._step_batch(ts.pad_batch_to(host_batch, pad_to))

    data = mesh_lib.data_sharding(mesh)
    repl = mesh_lib.replicated_sharding(mesh)

    def globalize(host_value, sharding):
        arr = np.asarray(host_value)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda i: arr[i])

    batch = {k: globalize(v, data) for k, v in host_batch.items()}
    state = jax.tree.map(lambda x: globalize(x, repl), state)

    step = ts.make_train_step(tx, model_cfg, train_cfg, mesh=mesh)
    new_state, metrics = step(state, batch)

    # Fully-replicated outputs are addressable on every process.
    loss = float(metrics['loss'])
    fingerprint = float(np.sum(np.abs(np.asarray(
        new_state.params['heads']['heatmap']['w'].addressable_data(0)))))

    with open(out_path, 'w') as f:
        json.dump({'process': idx, 'n_devices': len(devs), 'loss': loss,
                   'fingerprint': fingerprint}, f)


if __name__ == '__main__':
    main()
