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

import dataclasses
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
    """(B, H, W, 3) uint8 RGB frames -> DecodedPoses (B, P, ...).

    With cfg.quantized, `params` must be the int8 pytree from
    models.quantized.quantize_params (PoseNetPipeline folds it at init)."""
    x = frames_u8.astype(cfg.compute_dtype) * (2.0 / 255.0) - 1.0
    if cfg.quantized:
        from posenet_tpu.models import quantized
        heads = quantized.forward_quantized(params, x, cfg)
    else:
        heads = mobilenet_v1.forward(params, x, cfg)
    # decode_batch routes the tree walk through the pallas one-hot MXU
    # kernel on TPU (decode_cfg.use_pallas controls it explicitly).
    return decode_batch(
        heads['heatmap'], heads['offset'], heads['displacement_fwd'],
        heads['displacement_bwd'], cfg.output_stride, decode_cfg)


def _infer_cropped(params, frames_u8, crop_r, valid_h, *, cfg: ModelConfig,
                   decode_cfg: DecodeConfig):
    """Spatial-partition variant: forward on the H-padded frame (only the
    first `valid_h` rows are real; `forward` masks the pad rows before every
    3x3 conv so the result is EXACTLY the unsharded one), then crop the head
    grids back to the true `crop_r` rows and decode."""
    x = frames_u8.astype(cfg.compute_dtype) * (2.0 / 255.0) - 1.0
    heads = mobilenet_v1.forward(params, x, cfg, valid_h=valid_h)
    return decode_batch(
        heads['heatmap'][:, :crop_r], heads['offset'][:, :crop_r],
        heads['displacement_fwd'][:, :crop_r],
        heads['displacement_bwd'][:, :crop_r],
        cfg.output_stride, decode_cfg)


def _infer_raw(params, frames_bgr_u8, target_hw, cfg: ModelConfig,
               decode_cfg: DecodeConfig):
    """(B, Hs, Ws, 3) uint8 BGR SOURCE-resolution frames -> DecodedPoses.

    Device-side preprocess fused into the same XLA program as backbone +
    decode: BGR->RGB, f32 bilinear resize to `target_hw` (antialias=False,
    matching cv2.INTER_LINEAR and preprocess_on_device), [-1,1]
    normalization. Bit-identical to preprocess_on_device -> forward ->
    decode_batch chained by hand (the test asserts it); numerics differ
    from the HOST cv2-resize path at the resize-kernel level, so parity
    work stays on the host path. Coordinates come back at `target_hw`
    resolution — same scale contract as the host path."""
    x = frames_bgr_u8[..., ::-1].astype(jnp.float32)
    x = jax.image.resize(x, (x.shape[0], *target_hw, 3), method='bilinear',
                         antialias=False)
    x = x * (2.0 / 255.0) - 1.0
    heads = mobilenet_v1.forward(params, x, cfg)
    return decode_batch(
        heads['heatmap'], heads['offset'], heads['displacement_fwd'],
        heads['displacement_bwd'], cfg.output_stride, decode_cfg)


@functools.partial(jax.jit, static_argnames=('cfg', 'decode_cfg'))
def infer_jit(params, frames_u8, cfg: ModelConfig, decode_cfg: DecodeConfig):
    return _infer(params, frames_u8, cfg, decode_cfg)


@functools.partial(jax.jit,
                   static_argnames=('target_hw', 'cfg', 'decode_cfg'))
def infer_raw_jit(params, frames_bgr_u8, target_hw, cfg: ModelConfig,
                  decode_cfg: DecodeConfig):
    return _infer_raw(params, frames_bgr_u8, target_hw, cfg, decode_cfg)


class PoseNetPipeline:
    """Stateful convenience wrapper around the fused jitted program.

    Usage:
        pipe = PoseNetPipeline(load_model(101, 16, allow_random_init=True))
        poses = pipe(frames_u8)   # (B, H, W, 3) uint8 RGB, H=W'=stride*n+1
    """

    def __init__(self, model: PoseNet,
                 decode_cfg: DecodeConfig = DecodeConfig(min_pose_score=0.25),
                 mesh: Optional[jax.sharding.Mesh] = None,
                 partition: str = 'data',
                 device_resize_to: Optional[Tuple[int, int]] = None):
        """Args:
          mesh: optional device mesh with a 'data' axis.
          partition: how to spread work over the mesh —
            'data': batch axis sharded (throughput serving; no cross-chip
              traffic). Runs per-shard under shard_map so each chip keeps
              the pallas decode kernel; uneven batches are zero-padded to
              the mesh multiple and the pad rows sliced off the outputs.
            'spatial': image HEIGHT sharded — the sequence-parallel analog
              for CNNs (SURVEY.md §2.3: spatial extent plays the role of
              context length). XLA GSPMD inserts the conv halo exchanges
              over ICI automatically; use for single-image latency when one
              frame must be computed by many chips.
          device_resize_to: (th, tw) stride-valid processing resolution.
            When set, __call__ takes SOURCE-resolution uint8 BGR frames
            and the fused program does BGR->RGB + bilinear resize +
            normalize on DEVICE (_infer_raw) — for hosts where cv2 resize
            is the bottleneck. Decoded coordinates are at (th, tw), same
            scale contract as host preprocessing. Not combinable with
            partition='spatial' (the H-shard masking assumes the input is
            already at the processing resolution).
        """
        self.model = model
        if (mesh is not None and partition == 'spatial'
                and decode_cfg.use_pallas is None):
            # Spatial partition runs ONE GSPMD program over H-sharded
            # activations, and pallas_call has no GSPMD partitioning rule:
            # the Mosaic custom call would either fail to partition or
            # force the decode to be all-gathered and replicated on every
            # chip. The XLA traversal path shards cleanly and is equally
            # reference-exact on TPU (PARITY.md), so auto resolves to it
            # here. An explicit use_pallas=True is honored (single-device
            # meshes work). The DATA partition does NOT need this: it runs
            # per-shard under shard_map (below), where each device traces
            # its own pallas_call on its local batch shard.
            decode_cfg = dataclasses.replace(decode_cfg, use_pallas=False)
        self.decode_cfg = decode_cfg
        self.mesh = mesh
        # Pre-cast conv kernels to the compute dtype once, so the compiled
        # program reads bf16 weights from HBM instead of converting f32
        # every call. In quantized mode, fold weights into the int8 layout
        # instead (models/quantized.py).
        if model.cfg.quantized:
            if partition == 'spatial' and mesh is not None:
                raise NotImplementedError(
                    "quantized + spatial partition: the int8 trunk has no "
                    "valid_h pad-row masking; use partition='data'")
            from posenet_tpu.models import quantized as _quantized
            model = PoseNet(_quantized.quantize_params(model.params),
                            model.cfg)
        else:
            model = PoseNet(
                mobilenet_v1.cast_params(model.params, model.cfg.compute_dtype),
                model.cfg)
        self._partition = partition if mesh is not None else 'data'
        self._n_shards = mesh.devices.size if mesh is not None else 1
        self._device_resize_to = device_resize_to
        if device_resize_to is not None and self._partition == 'spatial':
            raise NotImplementedError(
                "device_resize_to + spatial partition: the H-shard pad-row "
                "masking assumes input at the processing resolution; use "
                "partition='data'")
        if device_resize_to is not None and self.model.cfg.quantized:
            raise NotImplementedError(
                "device_resize_to + quantized: _infer_raw routes through "
                "the float forward, which cannot read the folded int8 "
                "pytree; resize on the host for the quantized trunk")
        if mesh is not None:
            P = jax.sharding.PartitionSpec
            if partition == 'spatial':
                in_spec = P(None, 'data', None, None)   # shard H
                # Stride-valid heights (16n+1) are never divisible by the
                # mesh; __call__ zero-pads extra bottom rows and passes the
                # true height as `valid_h` so the backbone re-zeroes pad
                # rows before every 3x3 conv (raw zero-padded input alone
                # is NOT equivalent: after layer 1 pad rows would become
                # relu6(bias) != 0 and bleed into bottom-of-image rows
                # within the receptive field). The jitted fn then crops the
                # heads back to the true grid.
                fn = functools.partial(_infer_cropped, cfg=model.cfg,
                                       decode_cfg=decode_cfg)
            else:
                in_spec = P('data')

                def make_fn(dcfg):
                    if device_resize_to is not None:
                        return functools.partial(
                            _infer_raw, target_hw=tuple(device_resize_to),
                            cfg=model.cfg, decode_cfg=dcfg)
                    return functools.partial(_infer, cfg=model.cfg,
                                             decode_cfg=dcfg)

                # Data-parallel path: shard_map runs the fused program
                # once PER DEVICE on its batch shard (inference is
                # embarrassingly parallel over the batch — zero cross-chip
                # traffic), so each shard traces its OWN pallas_call and
                # multi-chip serving keeps the Mosaic traversal kernel
                # (2.8x faster than the XLA path at large per-chip
                # batches, PARITY.md) instead of losing it to GSPMD's
                # missing custom-call partitioning rule. shard_map needs
                # the batch to divide over the mesh; __call__ zero-pads
                # uneven batches up and slices the outputs back.
                # check_vma=False: the program is a pure per-shard map
                # with zero collectives, but the varying-manual-axes
                # checker rejects the decode's while_loop (its zeros()
                # init is unvarying while the body output varies over
                # 'data'); threading pvary through decode internals would
                # couple them to shard_map for no soundness gain here.
                fn = jax.shard_map(make_fn(decode_cfg), mesh=mesh,
                                   in_specs=(P(), in_spec),
                                   out_specs=in_spec, check_vma=False)
            in_sharding = jax.sharding.NamedSharding(mesh, in_spec)
            replicated = jax.sharding.NamedSharding(mesh, P())
            self.params = jax.device_put(model.params, replicated)
            self._fn = jax.jit(
                fn, static_argnums=(2, 3) if partition == 'spatial' else (),
                in_shardings=(replicated, in_sharding),
                out_shardings=replicated if partition == 'spatial' else None)
        else:
            self.params = model.params
            if device_resize_to is not None:
                self._fn = functools.partial(
                    infer_raw_jit, target_hw=tuple(device_resize_to),
                    cfg=model.cfg, decode_cfg=self.decode_cfg)
            else:
                self._fn = functools.partial(
                    infer_jit, cfg=model.cfg, decode_cfg=self.decode_cfg)

    def __call__(self, frames_u8) -> DecodedPoses:
        """Run the fused forward+decode program on a uint8 frame batch.

        INPUT COLOR CONTRACT — it flips with `device_resize_to`:
          * default (host-preprocessed) mode: frames are **RGB** uint8 at
            the model resolution (what `preprocess.process_input`-style
            host code produces);
          * `device_resize_to=...` mode: frames are **BGR** uint8 at the
            SOURCE resolution — the fused program performs the BGR->RGB
            swap + bilinear resize + normalize on device (matching cv2
            capture output so the host touches raw frames zero times).
        Passing the wrong order raises no error but silently degrades pose
        scores; see the class docstring for the rationale.
        """
        frames = jnp.asarray(frames_u8)
        if self._partition == 'spatial':
            h = frames.shape[1]
            crop_r = (h - 1) // self.model.cfg.output_stride + 1
            pad_h = (-h) % self._n_shards
            if pad_h:
                frames = jnp.pad(frames, ((0, 0), (0, pad_h), (0, 0), (0, 0)))
            return self._fn(self.params, frames, crop_r, h)
        b = frames.shape[0]
        pad_b = (-b) % self._n_shards
        if pad_b:
            # shard_map needs batch % mesh == 0: run the padded batch and
            # slice the pose buffers back (pad frames are zeros; their
            # decode output is dropped).
            frames = jnp.pad(frames, ((0, pad_b),) + ((0, 0),) * 3)
            out = self._fn(self.params, frames)
            return jax.tree.map(lambda a: a[:b], out)
        return self._fn(self.params, frames)

    def warmup(self, input_hw: Tuple[int, int], batch: int = 1):
        """Trigger compilation for a given shape. Synchronizes via a host
        fetch of a tiny output — `block_until_ready` can return before
        completion on tunneled platforms."""
        dummy = jnp.zeros((batch, *input_hw, 3), jnp.uint8)
        np.asarray(self(dummy).pose_scores)
