"""Device mesh helpers for SPMD data parallelism.

The reference is strictly single-device (SURVEY.md §2.3: `.cuda()` only, no
torch.distributed anywhere). The TPU-native scaling layer uses
`jax.sharding.Mesh` + NamedSharding: the batch is sharded over a 'data'
axis, params are replicated, and XLA inserts the gradient all-reduce over
ICI — no hand-written collectives at this model scale (BASELINE config 5:
DP fine-tune across 8 chips).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
    """Multi-host entry point: join a multi-process JAX runtime so
    `jax.devices()` spans every host's chips and `make_mesh()` builds a
    global mesh (gradient all-reduce rides ICI within a slice, DCN across
    slices — SURVEY.md §2.3/§5 comm-layer plan).

    On TPU pods the arguments are auto-detected from the environment;
    elsewhere pass coordinator/process explicitly. Idempotent: calling in a
    single-process job (or twice) is a no-op. Returns the process index.
    """
    # NOTE: do NOT probe jax.process_count() here first — it initializes
    # the XLA backend, after which jax.distributed.initialize() always
    # raises ("must be called before any JAX calls ..."), which previously
    # made this function silently fall back to single-process on pods.
    # Guard idempotence via the public is_initialized() (jax>=0.4.26);
    # on older jax without it, fall through and let initialize() raise
    # into the handled no-backend path below.
    if getattr(jax.distributed, 'is_initialized', lambda: False)():
        return jax.process_index()  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    except (ValueError, RuntimeError) as e:
        # jax < 0.4.26 has no is_initialized(); a repeat call on an
        # already-initialized runtime lands here instead of the guard
        # above. Honor the idempotence contract (and return the REAL
        # process index, not 0) rather than re-raising or misreporting.
        if 'already' in str(e).lower() or 'once' in str(e).lower():
            return jax.process_index()
        # Explicitly-requested multi-process setup must not be swallowed.
        if coordinator_address is not None or num_processes not in (None, 1):
            raise
        if isinstance(e, RuntimeError) and 'before' in str(e).lower():
            # The XLA backend was already initialized, so auto-detection
            # never ran — on a real pod every host would now silently
            # train its own full copy. A plain single-process dev run with
            # no pod env raises ValueError('coordinator_address should be
            # defined') instead, so type+substring separates the two (the
            # message wording is pinned by a subprocess regression test in
            # tests/test_training.py so a jax upgrade surfaces a reword
            # instead of silently disabling this warning).
            print('WARNING: initialize_distributed() was called after the '
                  'JAX backend was initialized; multi-host auto-detection '
                  'was skipped. If this is a multi-host job, call it before '
                  'any JAX computation or pass coordinator args explicitly.')
        # Single-process run with no coordinator configured (no pod env
        # to auto-detect, or the backend was already up): stay local.
        # process_index() is safe to call here — we return immediately,
        # so initializing the backend no longer matters.
        return jax.process_index()
    return jax.process_index()


def make_mesh(num_devices: Optional[int] = None,
              devices=None) -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices.

    In a multi-host job (after `initialize_distributed`), `jax.devices()`
    is the global device list, so the same call produces a cross-host DP
    mesh; each process feeds only its addressable shard of the batch."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data mesh axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place every leaf of a batch pytree with its leading axis sharded."""
    s = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(pytree, mesh: Mesh):
    s = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), pytree)
