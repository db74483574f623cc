"""Model loading facade.

API parity with the reference factory
(/root/reference/posenet/models/model_factory.py:11-23):
`load_model(model_id, output_stride=16, model_dir='./_models')` returns a
model object with an `.output_stride` attribute that is callable on an NCHW
float tensor and yields `(heatmap, offset, displacement_fwd,
displacement_bwd)` NCHW arrays — but backed by a jit-compiled JAX forward
over an NHWC parameter pytree.

Cold start: missing checkpoint triggers tfjs download + conversion (reference
model_factory.py:13-17). In a no-network environment pass
`allow_random_init=True` (bench/tests) to fall back to random weights.
"""

from __future__ import annotations

import functools
import os
import urllib.error
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from posenet_tpu.config import MODEL_DIR, ModelConfig
from posenet_tpu.converter import tfjs2jax
from posenet_tpu.models import mobilenet_v1


class PoseNet:
    """Callable model wrapper mirroring the torch module's inference API.

    The compute path is a pure jitted function; this object only carries the
    params pytree and static config. Calls accept NCHW (like the reference,
    mobilenet_v1.py:156) or NHWC input and return the 4 head tensors in the
    same layout they were given.
    """

    def __init__(self, params: Dict[str, Any], cfg: ModelConfig):
        self.params = params
        self.cfg = cfg

    @property
    def output_stride(self) -> int:
        return self.cfg.output_stride

    @property
    def model_id(self) -> int:
        return self.cfg.model_id

    def apply(self, x_nhwc: jax.Array, precision=None) -> Dict[str, jax.Array]:
        """Native-layout forward: NHWC in, dict of NHWC heads out."""
        return mobilenet_v1.forward_jit(self.params, x_nhwc, self.cfg, precision)

    def __call__(self, x, precision=None) -> Tuple[jax.Array, ...]:
        x = jnp.asarray(x)
        if x.ndim == 3:
            x = x[None]
        nchw = x.shape[1] == 3 and x.shape[-1] != 3
        if nchw:
            x = jnp.transpose(x, (0, 2, 3, 1))
        out = self.apply(x, precision=precision)
        heads = (out['heatmap'], out['offset'],
                 out['displacement_fwd'], out['displacement_bwd'])
        if nchw:
            heads = tuple(jnp.transpose(h, (0, 3, 1, 2)) for h in heads)
        return heads


def MobileNetV1(model_id: int = 101, output_stride: int = 16, *,
                compute_dtype=jnp.float32, seed: int = 0) -> PoseNet:
    """Construct a randomly-initialized model, mirroring the reference's
    `MobileNetV1(model_id, output_stride)` (an untrained torch module,
    mobilenet_v1.py:130). Use `load_model` for checkpoint weights."""
    cfg = ModelConfig(model_id=model_id, output_stride=output_stride,
                      compute_dtype=compute_dtype)
    params = mobilenet_v1.init_params(jax.random.PRNGKey(seed), cfg)
    return PoseNet(params, cfg)


def load_model(model_id: int = 101, output_stride: int = 16,
               model_dir: str = MODEL_DIR, *,
               compute_dtype=jnp.float32,
               allow_random_init: bool = False,
               seed: int = 0) -> PoseNet:
    """Load (or download+convert, or randomly initialize) a PoseNet model."""
    cfg = ModelConfig(model_id=model_id, output_stride=output_stride,
                      compute_dtype=compute_dtype)
    checkpoint_name = mobilenet_v1.MOBILENET_V1_CHECKPOINTS[model_id]
    path = os.path.join(model_dir, checkpoint_name + '.npz')
    if not os.path.exists(path):
        try:
            print(f'Cannot find checkpoint {path}, converting from tfjs...')
            tfjs2jax.convert(model_id, model_dir)
        except (urllib.error.URLError, TimeoutError) as e:
            # Only NETWORK failures (DNS/conn errors, or a socket stall
            # raising TimeoutError mid-read — download.py's documented
            # contract) may fall back to random init; any other OSError
            # (half-populated shard cache, disk full, permissions)
            # must surface — silently benchmarking random weights with a
            # "Download failed" message would be far worse than crashing.
            if allow_random_init:
                print(f'Download failed ({e}); using random initialization.')
                params = mobilenet_v1.init_params(jax.random.PRNGKey(seed), cfg)
                return PoseNet(params, cfg)
            raise
    params = tfjs2jax.load_params_npz(path)
    return PoseNet(params, cfg)
