"""Heatmap + offset aggregation loss ("Towards Accurate Multi-person Pose
Estimation in the Wild", arXiv:1701.01779).

Capability parity with the reference loss
(/root/reference/train.py:73-196): per GT pose, a binary disk target
(radius 3) around each annotated keypoint scores the heatmap via BCE, and a
disk-dilated mask gates a SmoothL1 offset regression; the two terms combine
4:1. Everything here is vectorized grid math under jit/vmap — the reference
builds targets with per-keypoint Python loops on the host
(train.py:100-124) and re-does it every step.

Documented divergences (bug fixes, SURVEY.md Appendix B):
- B4: the reference applies BCEWithLogits to already-sigmoided heatmaps
  (sigma(sigma(x))). We take the pre-sigmoid logits and use a numerically
  stable BCE-with-logits.
- B9: the reference builds offset targets with a hard-coded scale_factor=8
  while running stride 16 (train.py:553,147). We use the model's actual
  output stride.
- Offset channel packing follows the decoder/tfjs convention
  ([all-y || all-x], decode_multi.py:97) — the reference's training path
  uses an interleaved view that contradicts its own decoder
  (train.py:145).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from posenet_tpu.constants import NUM_KEYPOINTS
from posenet_tpu.decode import split_yx
from posenet_tpu.training.ground_truth import GAUSSIAN_KERNEL_SIZE

# Sentinel for missing keypoints: GT loaders pad with -1 (reference
# ground_truth_dataloop.py:371-379) and unannotated points are (0, 0).
_DISK_RADIUS = 3
# The reference thresholds the Gaussian GT heatmap at 0.1 before dilating
# (train.py:86-97); offset_targets_and_mask bakes that into its closed-form
# derivation (see its docstring) rather than materializing the Gaussian.


def keypoint_validity(keypoints: jax.Array) -> jax.Array:
    """(P, 17, 2) grid-coord keypoints -> (P, 17) bool validity.

    A keypoint is invalid when BOTH coords are sentinels (0 or -1) —
    reference train.py:113 gating.
    """
    is_sentinel = (keypoints == 0.0) | (keypoints == -1.0)
    return ~jnp.all(is_sentinel, axis=-1)


def binary_disk_targets(keypoints: jax.Array, height: int, width: int,
                        radius: int = _DISK_RADIUS) -> jax.Array:
    """(P, 17, 2) y-x grid coords -> (P, 17, H, W) binary disk targets.

    disk(k) = {cell : ||cell - round(k)||_2 <= radius}, zero for invalid
    keypoints (reference train.py:100-124, vectorized).
    """
    valid = keypoint_validity(keypoints)                       # (P, 17)
    kp = keypoints.astype(jnp.int32).astype(jnp.float32)       # truncate like int()
    yy = lax.broadcasted_iota(jnp.float32, (height, width), 0)
    xx = lax.broadcasted_iota(jnp.float32, (height, width), 1)
    ky = kp[..., 0][..., None, None]                           # (P, 17, 1, 1)
    kx = kp[..., 1][..., None, None]
    d2 = (yy - ky) ** 2 + (xx - kx) ** 2
    disks = (d2 <= radius ** 2).astype(jnp.float32)
    return disks * valid[..., None, None].astype(jnp.float32)


def offset_targets_and_mask(keypoints: jax.Array, height: int, width: int,
                            output_stride: int,
                            radius: int = _DISK_RADIUS,
                            kernel_size: int = GAUSSIAN_KERNEL_SIZE
                            ) -> Tuple[jax.Array, jax.Array]:
    """Build GT offset maps + regression mask.

    offset_map[p, k, y, x] = keypoint_image_coord - cell_image_coord, the
    exact quantity the decoder adds back at inference
    (decode.py `_traverse`; fixes reference B9 stride mismatch).
    mask = the reference's threshold->max_pool dilation of the Gaussian GT
    heatmap (train.py:86-97), in closed form without materializing the
    Gaussian. Derivation: the GT generator pastes a k x k Gaussian
    (sigma = k/10, max-normalized so the center cell is 1) at the
    TRUNCATED cell c = trunc(kp) (ground_truth_dataloop.py:111-137 uses
    int(); gaussian_heatmaps here matches). Hence
        {gauss > 0.1} = D = {u in Z^2 : ||u - c||^2 < 2 sigma^2 ln 10}
    (strict, matching `> threshold`; D always fits the k x k paste window
    since its radius 0.2146*k < k//2). The (2r+1) max-pool with padding r
    (train.py:93-95) admits cell e iff some u in D has |e - u|_inf <= r;
    minimizing ||u - c|| over that L-inf box per axis gives the exact
    closed form
        max(|ey - cy| - r, 0)^2 + max(|ex - cx| - r, 0)^2 < 2 sigma^2 ln 10.
    It agrees at image borders too: the witnessing u (the per-axis clamp
    of c into [e - r, e + r]) lies between c and e component-wise, hence
    in-grid. For (kernel_size=11, radius=3) this reproduces the previous
    hard-coded rule max(|ey|,|ex|) <= 5 minus the four (5,5) corners.

    Pass the SAME kernel_size the dataset's heatmaps were generated with
    (ground_truth.GAUSSIAN_KERNEL_SIZE by default).

    Returns:
      offsets (P, 17, H, W, 2) float32, mask (P, 17, H, W) float32.
    """
    valid = keypoint_validity(keypoints).astype(jnp.float32)
    yy = lax.broadcasted_iota(jnp.float32, (height, width), 0)
    xx = lax.broadcasted_iota(jnp.float32, (height, width), 1)
    grid = jnp.stack([yy, xx], axis=-1) * output_stride        # (H, W, 2)
    kp_img = keypoints * output_stride                         # (P, 17, 2)
    offsets = kp_img[:, :, None, None, :] - grid[None, None]   # (P,17,H,W,2)

    ey = jnp.abs(yy - jnp.trunc(keypoints[..., 0])[..., None, None])
    ex = jnp.abs(xx - jnp.trunc(keypoints[..., 1])[..., None, None])
    dy = jnp.maximum(ey - radius, 0.0)
    dx = jnp.maximum(ex - radius, 0.0)
    disk_r2 = 2.0 * (kernel_size / 10.0) ** 2 * math.log(10.0)
    mask = (dy * dy + dx * dx) < disk_r2
    mask = mask.astype(jnp.float32) * valid[..., None, None]
    return offsets, mask


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Numerically stable elementwise binary cross-entropy on logits."""
    return (jnp.maximum(logits, 0.0) - logits * targets +
            jnp.log1p(jnp.exp(-jnp.abs(logits))))


def smooth_l1(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Huber/SmoothL1 with beta=1 (torch default)."""
    d = jnp.abs(pred - target)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def heatmap_offset_loss(heatmap_logits: jax.Array, pred_offsets: jax.Array,
                        keypoints: jax.Array, output_stride: int,
                        heatmap_weight: float = 4.0,
                        offset_weight: float = 1.0,
                        gaussian_kernel_size: int = GAUSSIAN_KERNEL_SIZE
                        ) -> Dict[str, jax.Array]:
    """Single-item loss.

    Args:
      heatmap_logits: (H, W, 17) pre-sigmoid head output.
      pred_offsets: (H, W, 34) packed [y||x] offsets head output.
      keypoints: (P, 17, 2) y-x GRID coordinates, sentinel-padded to P poses.
    Returns:
      dict(loss, heatmap_loss, offset_loss) — scalars. Per-pose terms are
      averaged over the number of present poses (reference train.py:189-194),
      combined (w_h*hm + w_o*off)/(w_h+w_o).
    """
    h, w, _ = heatmap_logits.shape
    pose_present = jnp.any(keypoint_validity(keypoints), axis=-1)  # (P,)
    num_people = jnp.maximum(jnp.sum(pose_present.astype(jnp.float32)), 1.0)

    # Heatmap term: mean BCE of the full 17xHxW map against each pose's disk
    # target, averaged over present poses (reference train.py:151-162,189).
    disks = binary_disk_targets(keypoints, h, w)                 # (P,17,H,W)
    logits_chw = jnp.transpose(heatmap_logits, (2, 0, 1))        # (17,H,W)
    per_pose_hm = jnp.mean(
        bce_with_logits(logits_chw[None], disks), axis=(1, 2, 3))  # (P,)
    heatmap_loss = jnp.sum(per_pose_hm * pose_present) / num_people

    # Offset term: masked SmoothL1, mean over ALL elements (the reference
    # masks both operands then takes an unmasked mean, train.py:180-184 —
    # keeping that normalization so loss magnitudes are comparable).
    off_yx = jnp.transpose(split_yx(pred_offsets, NUM_KEYPOINTS),
                           (2, 0, 1, 3))                         # (17,H,W,2)
    gt_off, mask = offset_targets_and_mask(
        keypoints, h, w, output_stride, kernel_size=gaussian_kernel_size)
    m = mask[..., None]                                          # (P,17,H,W,1)
    per_pose_off = jnp.mean(
        smooth_l1(off_yx[None] * m, gt_off * m), axis=(1, 2, 3, 4))
    offset_loss = jnp.sum(per_pose_off * pose_present) / num_people

    total = (heatmap_weight * heatmap_loss + offset_weight * offset_loss) / (
        heatmap_weight + offset_weight)
    return {'loss': total, 'heatmap_loss': heatmap_loss,
            'offset_loss': offset_loss}


def batched_loss(heatmap_logits, pred_offsets, keypoints, output_stride: int,
                 heatmap_weight: float = 4.0, offset_weight: float = 1.0,
                 gaussian_kernel_size: int = GAUSSIAN_KERNEL_SIZE,
                 reduce: bool = True):
    """vmap over the batch axis; mean-reduced unless `reduce=False` (then
    each metric is the per-item (B,) vector — the eval path uses this to
    exclude wrap-padding duplicates and weight partial batches exactly)."""
    per_item = jax.vmap(
        lambda hl, po, kp: heatmap_offset_loss(
            hl, po, kp, output_stride, heatmap_weight, offset_weight,
            gaussian_kernel_size)
    )(heatmap_logits, pred_offsets, keypoints)
    return jax.tree.map(jnp.mean, per_item) if reduce else per_item
