"""API-parity wrapper for multi-pose decoding.

`decode_multiple_poses` keeps the exact reference signature and return
contract (/root/reference/posenet/decode_multi.py:61-148): CHW head tensors
for one image, returns numpy `(pose_scores (P,), keypoint_scores (P,17),
keypoint_coords (P,17,2) y-x px, pose_offsets (P,17,2))` with zero-filled
unused slots. Unlike the reference — which syncs all four tensors to the
host and runs the greedy loop in Python — the work happens in one compiled
on-device program (see posenet_tpu.decode); only the final (P,...) pose
buffers cross the device boundary.

Note: the reference ships this symbol commented out of the package facade
(SURVEY.md Appendix B1); here it is exported properly.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from posenet_tpu.config import DecodeConfig
from posenet_tpu.decode import DecodedPoses, decode_batch


def _to_hwc(t) -> jnp.ndarray:
    """Accept CHW (reference layout) array-likes; return HWC jnp array."""
    a = jnp.asarray(t)
    if a.ndim == 4:  # tolerate an un-squeezed batch dim of 1, NOT a batch
        if a.shape[0] != 1:
            raise ValueError(
                f"decode_multiple_poses takes ONE image's CHW heads; got a "
                f"batch of {a.shape[0]} — use decode_batch for batched "
                f"decoding")
        a = a[0]
    return jnp.transpose(a, (1, 2, 0))


def decode_multiple_poses(
        scores, offsets, displacements_fwd, displacements_bwd, output_stride,
        max_pose_detections: int = 10, score_threshold: float = 0.5,
        nms_radius: int = 20, min_pose_score: float = 0.5,
        max_candidates: int = 128,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Drop-in replacement for the reference decoder (same defaults,
    decode_multi.py:62-63). Inputs are CHW: (17,H,W), (34,H,W), (32,H,W),
    (32,H,W)."""
    cfg = DecodeConfig(
        max_pose_detections=max_pose_detections,
        score_threshold=score_threshold,
        nms_radius=nms_radius,
        min_pose_score=min_pose_score,
        max_candidates=max_candidates,
    )
    # Route through decode_batch (leading batch axis of 1) so TPU callers
    # get the pallas traversal kernel by default. Both decode_batch routes
    # (pallas and the barrier-pinned XLA traversal) are now bit-exact to
    # the reference on TPU (PARITY.md); pallas remains the default there
    # because it is also the faster path.
    result = decode_batch(
        _to_hwc(scores)[None], _to_hwc(offsets)[None],
        _to_hwc(displacements_fwd)[None], _to_hwc(displacements_bwd)[None],
        int(output_stride), cfg)
    return (np.asarray(result.pose_scores[0]),
            np.asarray(result.keypoint_scores[0]),
            np.asarray(result.keypoint_coords[0], dtype=np.float64),
            np.asarray(result.pose_offsets[0], dtype=np.float64))


def decode_multiple_poses_batch(scores, offsets, displacements_fwd,
                                displacements_bwd, output_stride,
                                cfg: DecodeConfig = DecodeConfig()) -> DecodedPoses:
    """Batched NHWC decode (no reference equivalent): (B,H,W,C) heads in,
    (B,P,...) DecodedPoses out, device-resident."""
    return decode_batch(scores, offsets, displacements_fwd, displacements_bwd,
                        int(output_stride), cfg)
