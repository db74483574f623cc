"""Central configuration dataclasses.

The reference scatters its knobs across per-script argparse blocks and
hard-coded literals (reference image_demo.py:10-17, benchmark.py:9-13,
webcam_demo.py:8-14, train.py:44-52,981-993, decode_multi.py:62-63).
Here every entry point shares one typed config, while CLI flag names and
defaults stay identical to the reference for drop-in parity.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Backbone + heads configuration (reference mobilenet_v1.py:130-154)."""

    model_id: int = 101            # one of {50, 75, 100, 101}
    output_stride: int = 16        # one of {8, 16, 32}
    # Compute dtype for conv activations. float32 reproduces the reference
    # bit-for-bit (parity/tests); bfloat16 doubles MXU throughput on TPU and
    # is the production default for inference.
    compute_dtype: jnp.dtype = jnp.float32
    # Conv accumulation/output dtype; kept float32 in both modes so heatmap
    # sigmoid and offset regression stay well-conditioned.
    param_dtype: jnp.dtype = jnp.float32
    # Opt-in int8 trunk: inter-layer activations stored s8, pointwise
    # convs as s8 matmuls. ReLU6 bounds every activation to [0,6] so the
    # affine quantization is static — no calibration pass; heads and the
    # decoder always run in bf16/f32. NOTE: measured SLOWER than bf16 on
    # TPU v5e via XLA (see models/quantized.py for the autopsy) — this
    # exists for backends where int8 pays, not as the v5e fast path.
    # Requires compute_dtype=bfloat16 (parity mode is never quantized).
    quantized: bool = False
    # x-packed stem (models/packed_stem.py): computes layers 0-2 in
    # full-lane packed layouts, targeting the 4x/2x lane-padding HBM waste
    # of the C=32/64 early tensors (~9 ms of the 18 ms trunk at batch 128).
    # Correct (f32 diff vs plain prefix: 6e-8) but measured SLOWER on v5e
    # via XLA — the shifted-FMA chains do not fuse (every term is a full
    # HBM pass: whole stem 76 ms vs 11 ms plain) and every alternative
    # formulation also loses; see packed_stem.py's autopsy. Kept as an
    # opt-in tested artifact for backends with working elementwise fusion.
    packed_stem: bool = False

    def __post_init__(self):
        if self.model_id not in (50, 75, 100, 101):
            raise ValueError(f"model_id must be in {{50,75,100,101}}, got {self.model_id}")
        if self.output_stride not in (8, 16, 32):
            raise ValueError(f"output_stride must be in {{8,16,32}}, got {self.output_stride}")
        if self.quantized and self.compute_dtype == jnp.float32:
            raise ValueError(
                "quantized=True requires compute_dtype=bfloat16 (the int8 "
                "path is a production serving mode; float32 is reserved for "
                "bit-parity with the reference)")


@dataclasses.dataclass(frozen=True)
class DecodeConfig:
    """Multi-pose decoder knobs (reference decode_multi.py:61-63).

    All defaults match the reference signature. `max_candidates` is new: the
    reference iterates an unbounded, data-dependent candidate list; XLA needs
    a static bound, so we take the top-K score-ranked local maxima. K=128 is
    one MXU tile in the pallas traversal kernel and far above any observed
    candidate count for real images at the reference's 0.5 score threshold.
    """

    max_pose_detections: int = 10
    score_threshold: float = 0.5
    nms_radius: int = 20
    min_pose_score: float = 0.5
    max_candidates: int = 128
    # Tree-walk backend for batched decode: True = pallas one-hot MXU
    # kernel, False = pure-XLA gathers, None = auto (pallas on TPU).
    use_pallas: Optional[bool] = None
    # (The greedy accept runs one sequential round per ACCEPTED pose —
    # see decode._greedy_accept. A fixed-K lax.scan over candidates was
    # measured NEGATIVE on v5e before that redesign: 28.12 ms vs the
    # per-candidate while_loop's 27.03 ms fused, b128, 3 people/frame.)
    # Exact per-plane-then-merge top-k (ops.nms.top_k_candidates_two_stage)
    # instead of one global sort. Bit-identical ordering (tie proof in its
    # docstring). Measured NEGATIVE in the round-2 fused schedule (old
    # per-candidate accept loop) but POSITIVE after the rounds-per-pose
    # accept redesign: fused peaked b128 23.29 -> 22.96 ms on v5e. Default
    # ON; the flag remains for A/B measurement.
    two_stage_topk: bool = True


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Fine-tuning hyperparameters (reference train.py:981-1009)."""

    model_id: int = 101
    output_stride: int = 16
    batch_size: int = 2
    learning_rate: float = 1e-4
    num_epochs: int = 100
    heatmap_loss_weight: float = 4.0   # reference train.py:74 (4:1 combination)
    offset_loss_weight: float = 1.0
    early_stop_patience: int = 10      # reference train.py:583-585
    heads_only: bool = True            # reference freezes the backbone (train.py:620-634)
    checkpoint_dir: str = "./_train_ckpt"
    keypoint_dir: str = "./keypoints_updated"  # reference train.py:1018
    # Visual diagnostics: every `visual_every` epochs, dump predicted
    # heatmap channels + keypoint overlays for the first eval batch under
    # `output_dir` (the reference dumps EVERY item EVERY step,
    # train.py:672-716 — here off by default, 0 = never).
    output_dir: str = "./output"
    visual_every: int = 0
    # Data parallelism: number of devices in the ('data',) mesh. None = all.
    num_devices: Optional[int] = None
    seed: int = 0
    # Trunk compute dtype for the training forward pass. float32 (default)
    # matches the reference's full-precision fine-tune. bfloat16 is standard
    # mixed precision: the FROZEN trunk (heads_only) runs bf16 while master
    # params, head accumulation (mobilenet_v1.forward's f32 head epilogue),
    # the loss, and Adam state all stay float32 — only head gradients flow,
    # through one activation cast.
    compute_dtype: jnp.dtype = jnp.float32


# Default on-disk model directory (reference model_factory.py:7).
MODEL_DIR = "./_models"
