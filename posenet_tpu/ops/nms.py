"""Part-selection ops: local-maximum NMS + top-K candidate ranking.

Replaces the reference's `F.max_pool2d` + boolean `nonzero` + `argsort`
pipeline (reference decode_multi.py:27-34) with static-shape XLA primitives:
`lax.reduce_window` for the local-max test and `lax.top_k` over a masked,
flattened score volume for the ranked candidate list. XLA fuses the sigmoid
heatmap, window max, compare and mask into one pass over VMEM-resident data.

The reference hard-codes `padding=1` in its pooling call, which is only
correct for LOCAL_MAXIMUM_RADIUS=1 (SURVEY.md Appendix B7); here the padding
is derived from the radius.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _axis_window_max(x: jax.Array, radius: int, axis: int) -> jax.Array:
    """Sliding (2r+1) max along one axis, border-clipped — the separable
    half of a rectangular window max. Built from shifted jnp.maximum ops
    (pad with -inf, slice) instead of lax.reduce_window: reduce_window is
    unfused on TPU and measured ~30x its traffic floor (0.20 ms for the
    (128,33,33,17) NMS at radius 1, r5 profile); the shifted-max chain is
    pure elementwise and fuses into the surrounding mask computation.
    Bit-exact: float max is associative and a rectangle max separates into
    per-axis maxes; -inf padding reproduces border clipping."""
    n = x.shape[axis]
    pad_cfg = [(0, 0)] * x.ndim
    pad_cfg[axis] = (radius, radius)
    padded = jnp.pad(x, pad_cfg, constant_values=-jnp.inf)
    out = x
    for s in range(2 * radius + 1):
        if s == radius:
            continue  # the identity shift is `x` itself
        out = jnp.maximum(out, lax.slice_in_dim(padded, s, s + n, axis=axis))
    return out


def local_max_mask(scores: jax.Array, score_threshold: float,
                   radius: int) -> jax.Array:
    """Boolean mask of cells that are the maximum of their (2r+1)^2 window
    AND meet the score threshold.

    Args:
      scores: (H, W, K) heatmap (sigmoid already applied).
    Returns:
      (H, W, K) bool mask.
    """
    max_vals = _axis_window_max(_axis_window_max(scores, radius, 0),
                                radius, 1)
    return (scores == max_vals) & (scores >= score_threshold)


def _pad_candidates(top_scores, kp, ys, xs, k):
    """Pad ranked candidates to static size k with the invalid-slot
    sentinel (score -1, cell 0). Needed when the requested budget exceeds
    the masked score volume (e.g. max_candidates=128 on a 3x2 stride-32
    grid: pool = 17*6 = 102 < 128) — lax.top_k requires k <= axis size."""
    pad = k - top_scores.shape[0]
    if pad <= 0:
        return top_scores, kp, ys, xs
    return (jnp.concatenate([top_scores,
                             jnp.full((pad,), -1.0, top_scores.dtype)]),
            jnp.concatenate([kp, jnp.zeros((pad,), kp.dtype)]),
            jnp.concatenate([ys, jnp.zeros((pad,), ys.dtype)]),
            jnp.concatenate([xs, jnp.zeros((pad,), xs.dtype)]))


def top_k_candidates(scores: jax.Array, mask: jax.Array,
                     k: int) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Rank masked local maxima by score, descending, with static size k.

    To reproduce the reference's candidate ordering (global descending sort
    over the (keypoint, y, x)-major nonzero list, decode_multi.py:31-34) we
    flatten in (keypoint, y, x) order so equal scores tie-break identically.

    Returns:
      (scores (k,), keypoint_ids (k,), ys (k,), xs (k,)) — invalid slots
      (beyond the true candidate count) carry score -1.
    """
    h, w, _ = scores.shape
    # (H, W, K) -> (K, H, W) flatten: keypoint-major like the reference.
    flat = jnp.where(mask, scores, -1.0).transpose(2, 0, 1).reshape(-1)
    top_scores, top_idx = lax.top_k(flat, min(k, flat.shape[0]))
    kp = top_idx // (h * w)
    rem = top_idx % (h * w)
    ys = rem // w
    xs = rem % w
    return _pad_candidates(top_scores, kp, ys, xs, k)


# Blockwise stage-1 gate: XLA:TPU lowers lax.top_k over a wide row to a
# full variadic sort, which at config 3's s8 grid (91x161 = 14651 cells)
# costs 1.69 ms/batch4 — ~100x its traffic floor and 14% of the whole
# fused program (r5 profile). Splitting the row into cell-order blocks,
# top-k'ing each and stable-merging halves it (probe_topk_stage1.py:
# 2.60 -> 1.33 ms standalone; block sweep 512/1024/2048/4096 picked 2048).
# Only worth it when the row is much wider than a block; the flagship
# 33x33 grid (1089 cells) stays on the plain top_k.
_BLOCKWISE_TOPK_BLOCK = 2048
_BLOCKWISE_TOPK_MIN_CELLS = 2 * _BLOCKWISE_TOPK_BLOCK


def _blockwise_topk(flat: jax.Array, k: int, block: int
                    ) -> Tuple[jax.Array, jax.Array]:
    """Exact per-row top-k of flat (..., n) via cell-order blocks.

    Identical to lax.top_k(flat, k) including tie order: per-block top_k
    ties break lowest-index-first; block-major concatenation keeps every
    tie group in ascending global-cell order; the stable merge sort on the
    negated scores preserves it. The -inf pad never beats a real entry
    (real entries are masked to the -1 sentinel at worst). Verified
    bitwise vs lax.top_k on dense tie-heavy data (probe_topk_stage1.py
    --check)."""
    n = flat.shape[-1]
    nblk = -(-n // block)
    pad = nblk * block - n
    lead = flat.shape[:-1]
    padded = jnp.concatenate(
        [flat, jnp.full(lead + (pad,), -jnp.inf, flat.dtype)], axis=-1)
    blocks = padded.reshape(lead + (nblk, block))
    bv, bi = lax.top_k(blocks, min(k, block))
    base = (jnp.arange(nblk, dtype=jnp.int32) * block)[:, None]
    gi = (bi + base).reshape(lead + (-1,))
    mv = bv.reshape(lead + (-1,))
    neg_sorted, idx_sorted = lax.sort((-mv, gi), dimension=-1,
                                      is_stable=True, num_keys=1)
    return -neg_sorted[..., :k], idx_sorted[..., :k]


def top_k_candidates_two_stage(scores: jax.Array, mask: jax.Array,
                               k: int) -> Tuple[jax.Array, jax.Array,
                                                jax.Array, jax.Array]:
    """Exact two-stage variant of `top_k_candidates`: per-keypoint-plane
    top-k over H*W, then a merge top-k over the 17*k' survivors.

    Tie-order exactness vs the flat global sort: lax.top_k breaks ties
    first-position-first. The merged candidate array is plane-major (all
    plane-p survivors before plane-q>p, matching the keypoint-major flat
    order), and within a plane equal values come out of the per-plane
    top-k already in ascending-cell order — so every tie group appears in
    the merged array in exactly its flat-index order, and the merge top-k
    reproduces the global sort bit-for-bit. (A plane's k'-th value can
    only be displaced if k' >= k global winners exist in that plane, which
    per-plane k' = min(k, H*W) rules out.)

    Rationale: two sorts over 17x(H*W -> k') + (17k' -> k) beat one sort
    over 17*H*W when H*W >> k. Measured NEGATIVE in the round-2 fused
    program (interaction with the old per-candidate accept loop's
    schedule) but POSITIVE after the rounds-per-pose accept redesign
    (fused peaked b128: 23.29 -> 22.96 ms on v5e) — now the default
    (DecodeConfig.two_stage_topk=True).
    """
    h, w, n_kp = scores.shape
    kp_plane = min(k, h * w)
    flat = jnp.where(mask, scores, -1.0).transpose(2, 0, 1).reshape(n_kp, -1)
    if h * w >= _BLOCKWISE_TOPK_MIN_CELLS and kp_plane <= _BLOCKWISE_TOPK_BLOCK:
        plane_scores, plane_idx = _blockwise_topk(
            flat, kp_plane, _BLOCKWISE_TOPK_BLOCK)           # (17, k')
    else:
        plane_scores, plane_idx = lax.top_k(flat, kp_plane)  # (17, k')
    # Merge stage: a stable ascending sort on the NEGATED scores with the
    # cell and keypoint ids carried as co-sorted operands. Equivalent to
    # the previous lax.top_k(merged) + two gathers into plane_idx /
    # (// kp_plane): top_k ties break lowest-index-first, which for a
    # stable sort is exactly original (plane-major) order, so the tie
    # argument in the docstring carries over unchanged. Carrying the
    # payloads through the sort removes a (K,)-element gather that
    # measured 0.17 ms/batch128 of pure per-element gather overhead
    # (r5 profile, fusion.5).
    merged = plane_scores.reshape(-1)                        # (17*k',)
    kp_of = jnp.repeat(jnp.arange(n_kp, dtype=jnp.int32), kp_plane)
    k_out = min(k, merged.shape[0])
    neg_sorted, cell_sorted, kp_sorted = lax.sort(
        (-merged, plane_idx.reshape(-1), kp_of), dimension=0,
        is_stable=True, num_keys=1)
    top_scores = -neg_sorted[:k_out]
    kp = kp_sorted[:k_out]
    cell = cell_sorted[:k_out]
    ys = cell // w
    xs = cell % w
    return _pad_candidates(top_scores, kp, ys, xs, k)
