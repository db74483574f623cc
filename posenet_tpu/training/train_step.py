"""Jitted training step: loss -> grad -> masked Adam update, data-parallel.

Replaces the reference's host-driven loop body (reference train.py:647-815:
per-item Python loss assembly, `backward()`, `optimizer.step()`) with one
compiled XLA program per step. Heads-only fine-tuning uses an optax
gradient mask instead of `requires_grad` mutation (reference
train.py:620-634); the reference's B3 bug (train path reading the forward
displacement tensor as backward) cannot occur here because heads are
addressed by name.

Data parallelism: `make_train_step(..., mesh=...)` jits with the batch
sharded over the mesh's 'data' axis and params replicated; XLA emits the
gradient psum over ICI automatically (BASELINE config 5).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from posenet_tpu.config import ModelConfig, TrainConfig
from posenet_tpu.models import mobilenet_v1
from posenet_tpu.parallel import mesh as mesh_lib
from posenet_tpu.training.loss import batched_loss

HEAD_NAMES = ('heatmap', 'offset', 'displacement_fwd', 'displacement_bwd')


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def trainable_mask(params, heads_only: bool = True):
    """Pytree of bools: which leaves receive updates. Heads-only mirrors the
    reference's freeze-backbone/unfreeze-heads scheme."""
    if not heads_only:
        return jax.tree.map(lambda _: True, params)
    return {
        'backbone': jax.tree.map(lambda _: False, params['backbone']),
        'heads': jax.tree.map(lambda _: True, params['heads']),
    }


def make_optimizer(cfg: TrainConfig, params) -> optax.GradientTransformation:
    tx = optax.adam(cfg.learning_rate)
    mask = trainable_mask(params, cfg.heads_only)
    return optax.masked(tx, mask)


def loss_fn(params, batch: Dict[str, jax.Array], model_cfg: ModelConfig,
            train_cfg: TrainConfig, reduce: bool = True
            ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """batch: {'image': (B,H,W,3) float in [-1,1], 'keypoints': (B,P,17,2),
    optionally 'weights': (B,) per-item loss weights (1 real / 0 padding —
    see pad_batch_to)}.

    reduce=False returns per-item (B,) metric vectors instead of batch
    means (metrics['loss'] is then a vector — gradient callers must keep
    the default). The ONE copy of the forward+loss wiring: train, eval,
    and per-item eval all route through here so they cannot drift."""
    out = mobilenet_v1.forward(params, batch['image'], model_cfg,
                               stop_trunk_gradient=train_cfg.heads_only)
    metrics = batched_loss(
        out['heatmap_logits'], out['offset'], batch['keypoints'],
        model_cfg.output_stride,
        heatmap_weight=train_cfg.heatmap_loss_weight,
        offset_weight=train_cfg.offset_loss_weight, reduce=False)
    if not reduce:
        return metrics['loss'], metrics
    w = batch.get('weights')
    if w is None:
        metrics = jax.tree.map(jnp.mean, metrics)
    else:
        # Weighted mean over REAL items only: with {0,1} weights this is
        # exactly the unpadded batch's mean, so gradients through a padded
        # batch are bit-for-semantics those of the true batch.
        denom = jnp.sum(w)
        metrics = jax.tree.map(lambda v: jnp.sum(v * w) / denom, metrics)
    return metrics['loss'], metrics


def train_step(state: TrainState, batch, tx, model_cfg: ModelConfig,
               train_cfg: TrainConfig):
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (_, metrics), grads = grad_fn(state.params, batch, model_cfg, train_cfg)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), metrics


def eval_step(params, batch, model_cfg: ModelConfig, train_cfg: TrainConfig):
    _, metrics = loss_fn(params, batch, model_cfg, train_cfg)
    return metrics


def eval_step_per_item(params, batch, model_cfg: ModelConfig,
                       train_cfg: TrainConfig):
    """Per-item (B,) metric vectors — no batch mean. trainer.evaluate()
    slices off wrap-padding duplicates and weights partial batches by their
    true size, so the reported eval loss is an exact per-image mean."""
    _, metrics = loss_fn(params, batch, model_cfg, train_cfg, reduce=False)
    return metrics


def init_train_state(params, cfg: TrainConfig) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = make_optimizer(cfg, params)
    return TrainState(params, tx.init(params), jnp.int32(0)), tx


_STEP_KEYS = ('image', 'keypoints')


def _step_batch(batch):
    """Project a dataset batch onto the keys the compiled step consumes.

    iter_batches yields extra host-side entries ('filenames',
    'offset_vectors') whose pytree structure would fail the mesh-compiled
    step's in_shardings; filtering here makes the step robust to the
    documented batch format instead of requiring every caller to slice.
    'weights' is synthesized (all-ones) when absent so padded and unpadded
    batches share ONE pytree structure — and therefore one compiled
    program and one in_shardings spec."""
    import numpy as np

    out = {k: batch[k] for k in _STEP_KEYS}
    w = batch.get('weights')
    out['weights'] = (np.ones(out['image'].shape[0], np.float32)
                      if w is None else w)
    return out


def pad_batch_to(batch, n: int):
    """Pad a short batch up to `n` items with a 'weights' vector zeroing
    the pads. The step's weighted-mean loss then equals the TRUE batch's
    mean exactly, so mesh-sharded training/eval consume epoch remainders
    (reference DataLoader drop_last=False semantics) at one compiled
    shape instead of dropping data. Pads WRAP real items rather than
    zero-filling: an all-sentinel zero sample could produce NaN metrics
    that 0-weight multiplication cannot cancel (0 * nan = nan)."""
    import numpy as np

    b = int(batch['image'].shape[0])
    if b > n:
        raise ValueError(f'batch of {b} cannot be padded down to {n}')
    out = dict(batch)
    if b < n:
        idx = np.resize(np.arange(b), n)
        out['image'] = np.asarray(batch['image'])[idx]
        out['keypoints'] = np.asarray(batch['keypoints'])[idx]
    out['weights'] = (np.arange(n) < b).astype(np.float32)
    return out


def make_train_step(tx, model_cfg: ModelConfig, train_cfg: TrainConfig,
                    mesh: Optional[jax.sharding.Mesh] = None):
    """Compile the step. With a mesh: batch sharded over 'data', state
    replicated — the canonical DP layout. Accepts any batch dict carrying
    at least 'image'/'keypoints' (extra keys are dropped host-side)."""
    if model_cfg.compute_dtype != jnp.float32 and not train_cfg.heads_only:
        raise ValueError(
            "mixed-precision training (compute_dtype=bfloat16) requires "
            "heads_only=True: full fine-tuning would contract f32 cotangents "
            "against bf16 trunk weights in every conv gradient")
    fn = functools.partial(train_step, tx=tx, model_cfg=model_cfg,
                           train_cfg=train_cfg)
    if mesh is None:
        jfn = jax.jit(fn)
        return lambda state, batch: jfn(state, _step_batch(batch))
    repl = mesh_lib.replicated_sharding(mesh)
    data = mesh_lib.data_sharding(mesh)
    jfn = jax.jit(
        fn,
        in_shardings=(repl, {'image': data, 'keypoints': data,
                             'weights': data}),
        out_shardings=(repl, repl),
    )
    return lambda state, batch: jfn(state, _step_batch(batch))


def make_eval_step(model_cfg: ModelConfig, train_cfg: TrainConfig,
                   mesh: Optional[jax.sharding.Mesh] = None,
                   per_item: bool = False):
    """`per_item=True` returns (B,) metric vectors instead of batch means
    (outputs stay batch-sharded under a mesh; the host fetch gathers)."""
    fn = functools.partial(eval_step_per_item if per_item else eval_step,
                           model_cfg=model_cfg, train_cfg=train_cfg)
    if mesh is None:
        jfn = jax.jit(fn)
        return lambda params, batch: jfn(params, _step_batch(batch))
    repl = mesh_lib.replicated_sharding(mesh)
    data = mesh_lib.data_sharding(mesh)
    jfn = jax.jit(fn,
                  in_shardings=(repl, {'image': data, 'keypoints': data,
                                       'weights': data}),
                  out_shardings=data if per_item else repl)
    return lambda params, batch: jfn(params, _step_batch(batch))
