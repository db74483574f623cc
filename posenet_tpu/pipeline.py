"""Fused end-to-end inference pipeline: normalize -> backbone -> decode.

The reference's per-frame flow crosses the device boundary twice — upload
the preprocessed frame, then sync all four head tensors back to the host for
the Python decode loop (reference image_demo.py:34-48, decode_multi.py:78-97
— SURVEY.md §3.2 calls this sync the throughput ceiling). Here the entire
frame lifecycle is ONE compiled XLA program: the host ships uint8 pixels,
the device returns (P,17,2) pose buffers. Nothing else moves.

Batched by construction; `sharding` spreads the batch across a
`jax.sharding.Mesh` data axis for multi-chip serving (each chip decodes its
shard; no cross-chip communication is needed for inference).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from posenet_tpu.config import DecodeConfig, ModelConfig
from posenet_tpu.decode import DecodedPoses, decode_batch
from posenet_tpu.models import mobilenet_v1
from posenet_tpu.models.model_factory import PoseNet


def _infer(params, frames_u8, cfg: ModelConfig, decode_cfg: DecodeConfig):
    """(B, H, W, 3) uint8 RGB frames -> DecodedPoses (B, P, ...)."""
    x = frames_u8.astype(cfg.compute_dtype) * (2.0 / 255.0) - 1.0
    heads = mobilenet_v1.forward(params, x, cfg)
    # decode_batch routes the tree walk through the pallas one-hot MXU
    # kernel on TPU (decode_cfg.use_pallas controls it explicitly).
    return decode_batch(
        heads['heatmap'], heads['offset'], heads['displacement_fwd'],
        heads['displacement_bwd'], cfg.output_stride, decode_cfg)


@functools.partial(jax.jit, static_argnames=('cfg', 'decode_cfg'))
def infer_jit(params, frames_u8, cfg: ModelConfig, decode_cfg: DecodeConfig):
    return _infer(params, frames_u8, cfg, decode_cfg)


class PoseNetPipeline:
    """Stateful convenience wrapper around the fused jitted program.

    Usage:
        pipe = PoseNetPipeline(load_model(101, 16, allow_random_init=True))
        poses = pipe(frames_u8)   # (B, H, W, 3) uint8 RGB, H=W'=stride*n+1
    """

    def __init__(self, model: PoseNet,
                 decode_cfg: DecodeConfig = DecodeConfig(min_pose_score=0.25),
                 mesh: Optional[jax.sharding.Mesh] = None):
        self.model = model
        self.decode_cfg = decode_cfg
        self.mesh = mesh
        # Pre-cast conv kernels to the compute dtype once, so the compiled
        # program reads bf16 weights from HBM instead of converting f32
        # every call.
        model = PoseNet(
            mobilenet_v1.cast_params(model.params, model.cfg.compute_dtype),
            model.cfg)
        if mesh is not None:
            data_sharding = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec('data'))
            replicated = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec())
            self.params = jax.device_put(model.params, replicated)
            self._fn = jax.jit(
                functools.partial(_infer, cfg=model.cfg, decode_cfg=decode_cfg),
                in_shardings=(replicated, data_sharding))
        else:
            self.params = model.params
            self._fn = functools.partial(
                infer_jit, cfg=model.cfg, decode_cfg=self.decode_cfg)

    def __call__(self, frames_u8) -> DecodedPoses:
        return self._fn(self.params, jnp.asarray(frames_u8))

    def warmup(self, input_hw: Tuple[int, int], batch: int = 1):
        """Trigger compilation for a given shape."""
        dummy = jnp.zeros((batch, *input_hw, 3), jnp.uint8)
        jax.block_until_ready(self._fn(self.params, dummy))
