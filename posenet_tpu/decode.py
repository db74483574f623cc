"""On-device multi-pose decoder (PersonLab-style greedy bottom-up decoding).

Behavioral spec: reference decode pipeline
(/root/reference/posenet/decode_multi.py:61-148 and
/root/reference/posenet/decode.py:9-63,131-182) — sigmoid heatmap local-max
NMS, score-ranked part candidates, greedy skeleton growth along the 16-edge
kinematic tree with offset refinement, root NMS dedup against accepted poses,
and overlap-discounted instance scoring.

TPU-first redesign (NOT a loop translation):

- The reference decodes candidates **sequentially** — each candidate's full
  17-keypoint tree walk runs inside the greedy accept loop on the host
  (decode_multi.py:104-139), forcing a device->host sync per frame.
  Key observation: the tree walk for a candidate depends ONLY on the head
  tensors, not on which poses were accepted before it. So here **all K
  candidate poses are decoded in parallel** (vmap over the candidate axis —
  each of the 32 sequential edge steps becomes one K-wide vectorized
  gather+select), and only the cheap accept/reject scan stays sequential,
  as a `lax.fori_loop` over K with fixed-size pose buffers.
- Everything is static-shape: the reference's `nonzero` candidate list
  becomes top-K with a validity sentinel (SURVEY.md §7 "dynamic -> static").
- The whole decoder jit-compiles into the same executable as the backbone
  (see PoseNetPipeline), so a frame never leaves the device until final
  (P,17,2) coordinates.
- `jax.vmap(decode_single)` over the batch axis gives batched decode — a
  capability the reference lacks entirely (it decodes one image per call).

Numerics notes: computations run in float32 (the reference does float64
numpy on host); `jnp.round` and `np.round` both round half-to-even, and
`clip(round(x/stride))` agrees between the two for all realistic coordinate
magnitudes, so decoded coordinates match the reference to <1e-3 px (golden
tests in tests/test_decode.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from posenet_tpu.config import DecodeConfig
from posenet_tpu.constants import EDGES, LOCAL_MAXIMUM_RADIUS, NUM_EDGES, NUM_KEYPOINTS
from posenet_tpu.ops.nms import (local_max_mask, top_k_candidates,
                                 top_k_candidates_two_stage)


def _tree_levels():
    """Group the 16 kinematic edges into dependency levels.

    The tree is rooted at the nose with depth 4 (nose -> eye/shoulder ->
    ear/elbow/hip -> wrist/knee -> ankle). Within one level no edge's source
    is another's target, and edges sharing a target (elbow->shoulder and
    hip->shoulder in the backward pass) have provably disjoint fill masks —
    the backward pass only fills the unique root->nose ancestor path, so at
    most one source per level is filled for any candidate. Level-sequential
    processing is therefore EXACTLY equivalent to the reference's
    edge-sequential passes (decode.py:152-178), while letting each level's
    K x L gathers batch into a single fetch.

    Returns (bwd_levels, fwd_levels): lists of levels, each a list of
    (edge_id, source_kp, target_kp).
    """
    depth = {0: 0}
    for parent, child in EDGES.tolist():
        depth[child] = depth[parent] + 1
    bwd, fwd = {}, {}
    for edge_id, (parent, child) in enumerate(EDGES.tolist()):
        # backward: child -> parent, runs deepest-child first
        bwd.setdefault(depth[child], []).append((edge_id, child, parent))
        # forward: parent -> child, runs shallowest-parent first
        fwd.setdefault(depth[parent], []).append((edge_id, parent, child))
    bwd_levels = [bwd[d] for d in sorted(bwd, reverse=True)]
    fwd_levels = [fwd[d] for d in sorted(fwd)]
    return bwd_levels, fwd_levels


_BWD_LEVELS, _FWD_LEVELS = _tree_levels()


class DecodedPoses(NamedTuple):
    """Fixed-size decode result; unfilled slots are zero (reference
    decode_multi.py:94-100 zero-initializes the same buffers)."""

    pose_scores: jax.Array       # (P,)
    keypoint_scores: jax.Array   # (P, 17)
    keypoint_coords: jax.Array   # (P, 17, 2)  y,x image px at input resolution
    pose_offsets: jax.Array      # (P, 17, 2)  per-keypoint refinement offsets
    # Total above-threshold local maxima in the heatmap (int32 scalar, or
    # (B,) batched) — BEFORE the static top-K truncation. The decoder keeps
    # only the cfg.max_candidates best-scoring candidates (static shapes;
    # the reference's list grows unboundedly, decode_multi.py:31-34), so
    # candidate_count > max_candidates means this image decoded from a
    # TRUNCATED pool and may miss low-scoring root candidates — the
    # runtime-observable form of the PARITY.md truncation caveat. Costs
    # one reduction over the already-computed NMS mask.
    candidate_count: jax.Array = None

    def overflowed(self, max_candidates: int):
        """Bool (or (B,) bool): did the candidate pool exceed the decoder's
        static top-K budget? See `candidate_count`."""
        if self.candidate_count is None:
            raise ValueError(
                "this DecodedPoses carries no candidate_count (e.g. it was "
                "deserialized from a pre-r5 serving artifact)")
        return self.candidate_count > max_candidates


def split_yx(packed: jax.Array, n: int) -> jax.Array:
    """(H, W, 2n) channel-packed field -> (H, W, n, 2) with y-component first.

    The reference packs offset/displacement channels as [all-y || all-x]
    (decode_multi.py:89-97: `reshape(2, -1, H, W).transpose(1, 2, 3, 0)`).
    In NHWC that's simply the first n vs last n channels.
    """
    return jnp.stack([packed[..., :n], packed[..., n:2 * n]], axis=-1)


def _traverse(coord, sov_table, disp_table, edge_id, target_kp, stride, h, w):
    """One edge hop: displace from `coord` along edge `edge_id`, then refine
    at the landing cell (reference decode.py:9-63).

    Exactly TWO dynamic gathers, both contiguous row fetches: the
    displacement pair from `disp_table` (H*W, 32 = [y-block || x-block])
    at the source cell, and score+offset from `sov_table`
    (H*W, 51 = [scores || off-y || off-x]) at the target cell. The
    edge/keypoint channel is static per step, so channel extraction is a
    free static slice. (Per-index gather overhead dominates on TPU —
    fetching packed rows amortizes it; the unpacked form cost ~6 gathers
    per step and ~46 ms/batch128.)"""
    hw_max = jnp.array([h - 1, w - 1], jnp.float32)
    src_idx = jnp.clip(jnp.round(coord / stride), 0.0, hw_max).astype(jnp.int32)
    # barrier-pinned gather indices — see _traverse_all_candidates.run_level
    # for the excess-precision fused-gather hazard this prevents.
    drow = disp_table[lax.optimization_barrier(src_idx[0] * w + src_idx[1])]
    displaced = coord + jnp.stack([drow[edge_id], drow[NUM_EDGES + edge_id]])
    tgt_idx = jnp.clip(jnp.round(displaced / stride), 0.0, hw_max).astype(jnp.int32)
    trow = sov_table[lax.optimization_barrier(tgt_idx[0] * w + tgt_idx[1])]
    score = trow[target_kp]
    offset = jnp.stack([trow[NUM_KEYPOINTS + target_kp],
                        trow[2 * NUM_KEYPOINTS + target_kp]])
    image_coord = tgt_idx.astype(jnp.float32) * stride + offset
    return score, image_coord, offset


def decode_pose(root_score, root_id, root_image_coord, scores_map, offsets_yx,
                dfwd_yx, dbwd_yx, output_stride: int):
    """Grow a full 17-keypoint pose from one root candidate.

    Convenience entry point taking stacked (H, W, n, 2) field maps (the
    reference layout, decode_multi.py:89-97); the compute runs on packed
    row tables via `_decode_pose_tables`.

    Returns (keypoint_scores (17,), keypoint_coords (17,2), offsets (17,2)).
    """
    h, w, _ = scores_map.shape
    sov_table = jnp.concatenate(
        [scores_map.reshape(h * w, NUM_KEYPOINTS),
         offsets_yx[..., 0].reshape(h * w, NUM_KEYPOINTS),
         offsets_yx[..., 1].reshape(h * w, NUM_KEYPOINTS)], axis=1)
    dfwd_table = jnp.concatenate(
        [dfwd_yx[..., 0].reshape(h * w, NUM_EDGES),
         dfwd_yx[..., 1].reshape(h * w, NUM_EDGES)], axis=1)
    dbwd_table = jnp.concatenate(
        [dbwd_yx[..., 0].reshape(h * w, NUM_EDGES),
         dbwd_yx[..., 1].reshape(h * w, NUM_EDGES)], axis=1)
    return _decode_pose_tables(
        root_score, root_id, root_image_coord, sov_table, dfwd_table,
        dbwd_table, h, w, output_stride)


def _decode_pose_tables(root_score, root_id, root_image_coord, sov_table,
                        dfwd_table, dbwd_table, h, w, output_stride: int):
    """Tree walk on packed row tables (see `_traverse`).

    Walks the 16-edge tree in reversed order with backward displacements,
    then forward order with forward displacements; a keypoint is only filled
    if its source is filled (score > 0) and it is still empty (score == 0) —
    exact reference gating (decode.py:152-178). The edge loop is unrolled at
    trace time (static 32 steps); under vmap each step is one K-wide gather.
    """
    stride = jnp.float32(output_stride)

    kp_scores = jnp.zeros((NUM_KEYPOINTS,), jnp.float32)
    kp_coords = jnp.zeros((NUM_KEYPOINTS, 2), jnp.float32)
    kp_offsets = jnp.zeros((NUM_KEYPOINTS, 2), jnp.float32)
    kp_scores = kp_scores.at[root_id].set(root_score)
    kp_coords = kp_coords.at[root_id].set(root_image_coord)

    def step(carry, edge_id, source_kp, target_kp, disp_table):
        kp_scores, kp_coords, kp_offsets = carry
        fill = (kp_scores[source_kp] > 0.0) & (kp_scores[target_kp] == 0.0)
        score, coord, offset = _traverse(
            kp_coords[source_kp], sov_table, disp_table, edge_id, target_kp,
            stride, h, w)
        kp_scores = kp_scores.at[target_kp].set(
            jnp.where(fill, score, kp_scores[target_kp]))
        kp_coords = kp_coords.at[target_kp].set(
            jnp.where(fill, coord, kp_coords[target_kp]))
        kp_offsets = kp_offsets.at[target_kp].set(
            jnp.where(fill, offset, kp_offsets[target_kp]))
        return kp_scores, kp_coords, kp_offsets

    carry = (kp_scores, kp_coords, kp_offsets)
    # Backward pass: child -> parent along reversed edge order.
    for edge in reversed(range(NUM_EDGES)):
        parent, child = int(EDGES[edge, 0]), int(EDGES[edge, 1])
        carry = step(carry, edge, source_kp=child, target_kp=parent,
                     disp_table=dbwd_table)
    # Forward pass: parent -> child in edge order.
    for edge in range(NUM_EDGES):
        parent, child = int(EDGES[edge, 0]), int(EDGES[edge, 1])
        carry = step(carry, edge, source_kp=parent, target_kp=child,
                     disp_table=dfwd_table)
    return carry


def _traverse_all_candidates(cand_scores, cand_kp, root_coords, sov_table,
                             dfwd_table, dbwd_table, h, w,
                             output_stride: int):
    """Level-batched K-parallel tree walk.

    State is per-keypoint (K,) vectors (scores, y/x coords, y/x offsets);
    each of the 8 dependency levels performs exactly TWO batched row
    gathers — displacement rows at the (L*K,) stacked source cells, then
    score+offset rows at the landing cells — and distributes the columns
    statically. Numerics are identical to the reference's per-edge hops
    (decode.py:9-63): same clip(round(coord/stride)) cell math, same
    score>0 / score==0 fill gating.

    Returns (kp_scores (K,17), kp_coords (K,17,2), kp_offsets (K,17,2)).
    """
    k = cand_scores.shape[0]
    stride = jnp.float32(output_stride)

    scores_k = [jnp.where(cand_kp == j, cand_scores, 0.0)
                for j in range(NUM_KEYPOINTS)]
    coords_y = [jnp.where(cand_kp == j, root_coords[:, 0], 0.0)
                for j in range(NUM_KEYPOINTS)]
    coords_x = [jnp.where(cand_kp == j, root_coords[:, 1], 0.0)
                for j in range(NUM_KEYPOINTS)]
    offs_y = [jnp.zeros((k,), jnp.float32) for _ in range(NUM_KEYPOINTS)]
    offs_x = [jnp.zeros((k,), jnp.float32) for _ in range(NUM_KEYPOINTS)]

    def run_level(level, disp_table):
        n_edges = len(level)
        # One gather for all edges' displacement rows at the source cells.
        src_iy = jnp.concatenate(
            [jnp.clip(jnp.round(coords_y[s] / stride), 0.0, h - 1.0)
             for _, s, _ in level])
        src_ix = jnp.concatenate(
            [jnp.clip(jnp.round(coords_x[s] / stride), 0.0, w - 1.0)
             for _, s, _ in level])
        # optimization_barrier on the gather indices: with
        # --xla_allow_excess_precision (always on for this runtime)
        # XLA:TPU fuses the float clip(round(coord/stride)) index chain
        # INTO the gather and recomputes it with a different
        # contraction than the standalone value, fetching a different
        # row at knife-edge cells (~0.7% of keypoints on realistic
        # content). HW-bisected: the index tensors themselves compare
        # bitwise EQUAL to the CPU oracle; only the fused-gather rows
        # differ, and pinning the index with a barrier restores
        # bit-exactness. Cost: the int32 index is materialized (it
        # already is on the output path). This path runs on CPU and on
        # grids beyond the pallas VMEM ceiling; the pallas kernel is
        # unaffected.
        src_cells = lax.optimization_barrier(
            (src_iy * w + src_ix).astype(jnp.int32))             # (L*K,)
        drows = disp_table[src_cells]                            # (L*K, 32)

        # Displaced landing cells, then one gather for score+offset rows.
        disp_y = jnp.concatenate(
            [drows[i * k:(i + 1) * k, e] for i, (e, _, _) in enumerate(level)])
        disp_x = jnp.concatenate(
            [drows[i * k:(i + 1) * k, NUM_EDGES + e]
             for i, (e, _, _) in enumerate(level)])
        coord_y = jnp.concatenate([coords_y[s] for _, s, _ in level]) + disp_y
        coord_x = jnp.concatenate([coords_x[s] for _, s, _ in level]) + disp_x
        tgt_iy = jnp.clip(jnp.round(coord_y / stride), 0.0, h - 1.0)
        tgt_ix = jnp.clip(jnp.round(coord_x / stride), 0.0, w - 1.0)
        tgt_cells = lax.optimization_barrier(
            (tgt_iy * w + tgt_ix).astype(jnp.int32))
        trows = sov_table[tgt_cells]                             # (L*K, 51)

        for i, (e, s, t) in enumerate(level):
            sl = slice(i * k, (i + 1) * k)
            fill = (scores_k[s] > 0.0) & (scores_k[t] == 0.0)
            sc = trows[sl, t]
            oy = trows[sl, NUM_KEYPOINTS + t]
            ox = trows[sl, 2 * NUM_KEYPOINTS + t]
            scores_k[t] = jnp.where(fill, sc, scores_k[t])
            coords_y[t] = jnp.where(fill, tgt_iy[sl] * stride + oy, coords_y[t])
            coords_x[t] = jnp.where(fill, tgt_ix[sl] * stride + ox, coords_x[t])
            offs_y[t] = jnp.where(fill, oy, offs_y[t])
            offs_x[t] = jnp.where(fill, ox, offs_x[t])

    for level in _BWD_LEVELS:
        run_level(level, dbwd_table)
    for level in _FWD_LEVELS:
        run_level(level, dfwd_table)

    kp_scores = jnp.stack(scores_k, axis=1)                      # (K, 17)
    kp_coords = jnp.stack(
        [jnp.stack(coords_y, axis=1), jnp.stack(coords_x, axis=1)], axis=-1)
    kp_offsets = jnp.stack(
        [jnp.stack(offs_y, axis=1), jnp.stack(offs_x, axis=1)], axis=-1)
    return kp_scores, kp_coords, kp_offsets


def decode_single(heatmap: jax.Array, offsets: jax.Array, dfwd: jax.Array,
                  dbwd: jax.Array, output_stride: int,
                  cfg: DecodeConfig) -> DecodedPoses:
    """Decode one image's head tensors (all HWC layout) entirely on device.

    Args:
      heatmap: (H, W, 17) sigmoid scores.
      offsets: (H, W, 34) packed [y||x].
      dfwd/dbwd: (H, W, 32) packed [y||x].
    """
    (sov_table, dfwd_table, dbwd_table, cand_scores, cand_kp, root_coords,
     n_cand) = _prepare_decode(heatmap, offsets, dfwd, dbwd, output_stride,
                               cfg)
    h, w, _ = heatmap.shape

    # Decode ALL candidate poses in parallel — the traversal is independent
    # of greedy state, so the reference's per-pose sequential walk
    # (decode_multi.py:115-118) becomes K simultaneous walks, level-batched
    # (see _tree_levels: 8 levels x 2 gathers instead of 32 edge steps).
    all_scores, all_coords, all_offsets = _traverse_all_candidates(
        cand_scores, cand_kp, root_coords, sov_table, dfwd_table, dbwd_table,
        h, w, output_stride)
    # all_scores (K, 17); all_coords (K, 17, 2); all_offsets (K, 17, 2)

    return _greedy_accept(cand_scores, cand_kp, root_coords, all_scores,
                          all_coords, all_offsets,
                          cfg)._replace(candidate_count=n_cand)


def _prepare_decode(heatmap, offsets, dfwd, dbwd, output_stride: int,
                    cfg: DecodeConfig):
    """Stage 1: packed row tables + ranked candidates + refined root coords.

    Channel packing is [all-y || all-x] within each field (reference
    decode_multi.py:89-97), so the channel slices below are zero-copy views.
    """
    h, w, _ = heatmap.shape
    sov_table = jnp.concatenate(
        [heatmap.reshape(h * w, NUM_KEYPOINTS),
         offsets[..., :NUM_KEYPOINTS].reshape(h * w, NUM_KEYPOINTS),
         offsets[..., NUM_KEYPOINTS:2 * NUM_KEYPOINTS].reshape(h * w, NUM_KEYPOINTS)],
        axis=1)                                                  # (HW, 51)
    dfwd_table = dfwd.reshape(h * w, 2 * NUM_EDGES)              # (HW, 32)
    dbwd_table = dbwd.reshape(h * w, 2 * NUM_EDGES)

    # Part selection: local-max NMS + global descending top-K. The mask
    # reduction makes top-K truncation observable at runtime (see
    # DecodedPoses.candidate_count) — the mask is already materialized, so
    # the count is one extra sum.
    mask = local_max_mask(heatmap, cfg.score_threshold, LOCAL_MAXIMUM_RADIUS)
    n_cand = jnp.sum(mask, dtype=jnp.int32)
    select = (top_k_candidates_two_stage if cfg.two_stage_topk
              else top_k_candidates)
    cand_scores, cand_kp, cand_y, cand_x = select(
        heatmap, mask, cfg.max_candidates)

    # Root image coords: cell*stride + offset at the root cell
    # (decode_multi.py:109); one row fetch per candidate. The per-candidate
    # CHANNEL pick is a one-hot select-reduce over the 17 lanes, not a
    # take_along_axis: gathering 2 scalars per candidate paid ~0.35 ms of
    # per-element gather overhead per batch-128 (r5 profile, fusion.7) vs
    # ~free for the fused masked reduction. Exact: one lane selected, the
    # rest contribute literal 0.0 to the sum (and a selected -0.0 still
    # yields bit-identical root_coords through the `cell*stride +` add).
    root_rows = sov_table[cand_y * w + cand_x]                   # (K, 51)
    sel = (jnp.arange(NUM_KEYPOINTS, dtype=cand_kp.dtype)[None, :]
           == cand_kp[:, None])                                  # (K, 17)
    off_row = jnp.stack(
        [jnp.sum(jnp.where(sel, root_rows[:, NUM_KEYPOINTS:
                                          2 * NUM_KEYPOINTS], 0.0), axis=1),
         jnp.sum(jnp.where(sel, root_rows[:, 2 * NUM_KEYPOINTS:
                                          3 * NUM_KEYPOINTS], 0.0), axis=1)],
        axis=-1)
    cand_cell = jnp.stack([cand_y, cand_x], -1).astype(jnp.float32)
    root_coords = cand_cell * output_stride + off_row            # (K, 2)
    return (sov_table, dfwd_table, dbwd_table, cand_scores, cand_kp,
            root_coords, n_cand)


def _greedy_accept(cand_scores, cand_kp, root_coords, all_scores, all_coords,
                   all_offsets, cfg: DecodeConfig) -> DecodedPoses:
    """Stage 3: greedy accept over ranked candidates with fixed-size pose
    buffers — reference semantics (decode_multi.py:104-139), but ONE
    sequential round PER ACCEPTED POSE instead of one per candidate.

    Correctness of the round reformulation: the reference's per-candidate
    loop mutates state only when it ACCEPTS (skipped candidates leave the
    accepted set unchanged, decode_multi.py:111-113,128-134), and a
    candidate's eligibility is MONOTONE NON-INCREASING in the accepted
    set — adding a pose can only turn root-NMS suppression on (more
    distances in the `any`) and push the overlap-discounted instance score
    down (the overlap mask only grows; scores are sigmoid outputs > 0).
    Hence a candidate skipped at its turn stays ineligible forever, and
    the reference's next accept is always the LOWEST-indexed candidate
    eligible against the CURRENT accepted set. Each round therefore
    evaluates all K candidates against the accepted set in one vectorized
    (P, K, 17) distance block and accepts the first eligible — bit-for-bit
    the reference's result, in <= max_pose_detections + 1 sequential
    rounds. On TPU the while_loop's per-iteration overhead (~74 us —
    cond sync + program launch) dominates the tiny per-candidate body, so
    rounds-per-accept cuts the accept stage ~= (live candidates) / (P+1)
    times: measured 4.06 ms -> ~0.9 ms per batch-128 at 3 people/frame.

    Accepted poses self-suppress (their root keypoint is at distance 0
    from their own stored keypoint), so no explicit "already accepted"
    mask is needed.
    """
    P = cfg.max_pose_detections
    K = cfg.max_candidates
    r2 = jnp.float32(cfg.nms_radius ** 2)
    slot_ids = jnp.arange(P)
    cand_ids = jnp.arange(K)
    valid = cand_scores > -0.5                 # top-K sentinel is -1

    def round_body(carry):
        pose_scores, kp_scores, kp_coords, pose_offsets, count, _ = carry
        occupied = slot_ids < count            # (P,)

        # Root NMS vs every accepted pose, all candidates at once
        # (decode_multi.py:111-113): accepted poses' stored coords at each
        # candidate's root keypoint.
        root_kp_coords = jnp.take(kp_coords, cand_kp, axis=1)     # (P, K, 2)
        d2_root = jnp.sum((root_kp_coords - root_coords[None]) ** 2,
                          axis=-1)                                # (P, K)
        root_sup = jnp.any(occupied[:, None] & (d2_root <= r2), axis=0)

        # Overlap-discounted instance scores vs accepted poses
        # (decode_multi.py:14-24), all candidates at once.
        d2 = jnp.sum((kp_coords[:, None] - all_coords[None]) ** 2,
                     axis=-1)                                     # (P, K, 17)
        overlapped = jnp.any(occupied[:, None, None] & (d2 <= r2),
                             axis=0)                              # (K, 17)
        inst = jnp.sum(jnp.where(overlapped, 0.0, all_scores),
                       axis=-1) / NUM_KEYPOINTS                   # (K,)

        # The == 0.0 arm is redundant (inst >= 0 always) but mirrors the
        # reference's control flow verbatim (decode_multi.py:130) so the
        # parity argument stays line-for-line checkable.
        score_ok = (cfg.min_pose_score == 0.0) | (inst >= cfg.min_pose_score)
        eligible = valid & (~root_sup) & score_ok
        accept = jnp.any(eligible) & (count < P)
        first = jnp.argmin(jnp.where(eligible, cand_ids, K))  # lowest index

        idx = jnp.where(accept, count, P)  # P = out-of-range, write dropped
        pose_scores = pose_scores.at[idx].set(
            jnp.where(accept, inst[first], 0.0), mode='drop')
        kp_scores = kp_scores.at[idx].set(all_scores[first], mode='drop')
        kp_coords = kp_coords.at[idx].set(all_coords[first], mode='drop')
        pose_offsets = pose_offsets.at[idx].set(all_offsets[first],
                                                mode='drop')
        count = count + accept.astype(jnp.int32)
        return pose_scores, kp_scores, kp_coords, pose_offsets, count, accept

    init = (jnp.zeros((P,), jnp.float32),
            jnp.zeros((P, NUM_KEYPOINTS), jnp.float32),
            jnp.zeros((P, NUM_KEYPOINTS, 2), jnp.float32),
            jnp.zeros((P, NUM_KEYPOINTS, 2), jnp.float32),
            jnp.int32(0), jnp.bool_(True))

    def cond(carry):
        count, accepted_last = carry[4], carry[5]
        return accepted_last & (count < P)

    pose_scores, kp_scores, kp_coords, pose_offsets, _, _ = lax.while_loop(
        cond, round_body, init)
    return DecodedPoses(pose_scores, kp_scores, kp_coords, pose_offsets)


@functools.partial(jax.jit, static_argnames=('output_stride', 'cfg'))
def decode_single_jit(heatmap, offsets, dfwd, dbwd, output_stride: int,
                      cfg: DecodeConfig) -> DecodedPoses:
    return decode_single(heatmap, offsets, dfwd, dbwd, output_stride, cfg)


@functools.partial(jax.jit, static_argnames=('output_stride', 'cfg'))
def decode_batch(heatmap, offsets, dfwd, dbwd, output_stride: int,
                 cfg: DecodeConfig) -> DecodedPoses:
    """Batched decode: (B, H, W, C) heads -> (B, P, ...) poses. One XLA
    program; candidates AND batch items decode in parallel.

    On TPU the gather-bound tree walk routes through the pallas one-hot
    MXU kernel (posenet_tpu.ops.pallas.traversal); elsewhere — and when
    cfg.use_pallas is False — the pure-XLA level-batched traversal runs.
    Both paths are reference-exact on TPU: golden tests pin them on CPU,
    and the XLA path's gather indices are optimization_barrier-pinned
    (see run_level) so --xla_allow_excess_precision cannot flip
    knife-edge cells — HW-verified bitwise equal to the CPU oracle up to
    271x481 grids (tools/verify_tpu_exactness.py; pose scores within
    1 ulp from reduction order).
    """
    h, w = heatmap.shape[1], heatmap.shape[2]
    use_pallas = cfg.use_pallas
    if use_pallas is None:
        # The v2/v3 row-gather kernels hold per-target split tables
        # (H*W*690 B/image, double-buffered) in VMEM. The gate is pinned
        # to the HW-VERIFIED envelope: _VMEM_TABLE_BUDGET_LARGE =
        # 2*48000*_TABLE_BYTES_PER_CELL (traversal.py), the largest grid
        # proven exact at group=1 (160x300; stride-8 1080p's 136x241 =
        # 32.8k cells included) — deliberately NOT a round MB figure.
        # Only larger grids (e.g. stride-8 4K) fall back to XLA gathers.
        from posenet_tpu.ops.pallas.traversal import (
            _TABLE_BYTES_PER_CELL, _VMEM_TABLE_BUDGET_LARGE)
        use_pallas = (jax.default_backend() == 'tpu'
                      and 2 * h * w * _TABLE_BYTES_PER_CELL
                      <= _VMEM_TABLE_BUDGET_LARGE)
    if not use_pallas:
        return jax.vmap(
            lambda h, o, f, b: decode_single(h, o, f, b, output_stride, cfg)
        )(heatmap, offsets, dfwd, dbwd)

    from posenet_tpu.ops.pallas.traversal import traverse_all_candidates_pallas

    prep = jax.vmap(
        lambda hm, o, f, b: _prepare_decode(hm, o, f, b, output_stride, cfg))
    sov, dft, dbt, cand_scores, cand_kp, root_coords, n_cand = prep(
        heatmap, offsets, dfwd, dbwd)
    all_scores, all_coords, all_offsets = traverse_all_candidates_pallas(
        cand_scores, cand_kp, root_coords, sov, dft, dbt, h, w, output_stride,
        interpret=jax.default_backend() != 'tpu')
    return jax.vmap(
        lambda cs, ck, rc, s, c, o: _greedy_accept(cs, ck, rc, s, c, o, cfg)
    )(cand_scores, cand_kp, root_coords, all_scores, all_coords,
      all_offsets)._replace(candidate_count=n_cand)


# ---------------------------------------------------------------------------
# Single-pose decoding (reference decode.py:66-128 capability)
# ---------------------------------------------------------------------------

def decode_single_pose(heatmap: jax.Array, offsets: jax.Array,
                       dfwd: jax.Array, dbwd: jax.Array, output_stride: int,
                       score_threshold: float = 0.5) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Single-person fast path.

    Reference semantics (decode.py:66-128): per keypoint, take the
    highest-scoring local maximum above threshold; the root is the keypoint
    with the global best score; grow one pose from it. Fully vectorized —
    the reference's Python loop over nonzero indices becomes a per-channel
    argmax over the masked heatmap.

    Returns (keypoint_scores (17,), keypoint_coords (17,2), root_id).
    """
    best_scores, best_cells = build_part_with_score_single_pose(
        score_threshold, LOCAL_MAXIMUM_RADIUS, heatmap)
    best_y = best_cells[:, 0]
    best_x = best_cells[:, 1]

    root_id = jnp.argmax(best_scores)
    root_cell = jnp.stack([best_y[root_id], best_x[root_id]]).astype(jnp.float32)
    offsets_yx = split_yx(offsets, NUM_KEYPOINTS)
    # NOTE the reference's single-pose `find_root` returns the grid cell
    # without offset refinement (decode.py:126); we refine with the offset
    # like the multi-pose path for sub-cell accuracy (documented divergence).
    root_coord = root_cell * output_stride + offsets_yx[
        best_y[root_id], best_x[root_id], root_id]

    kp_scores, kp_coords, _ = decode_pose(
        best_scores[root_id], root_id, root_coord, heatmap, offsets_yx,
        split_yx(dfwd, NUM_EDGES), split_yx(dbwd, NUM_EDGES), output_stride)
    return kp_scores, kp_coords, root_id


def build_part_with_score_single_pose(score_threshold, local_max_radius,
                                      heatmap):
    """Per-keypoint best local maximum (reference
    decode.py:66-86 `build_part_with_score_torch_single_pose`, vectorized:
    the reference's Python loop over nonzero indices becomes a per-channel
    masked argmax).

    Args: heatmap (H, W, 17) sigmoid scores.
    Returns (highest_scores (17,), highest_score_indices (17, 2) y-x cells).
    """
    h, w, _ = heatmap.shape
    mask = local_max_mask(heatmap, score_threshold, local_max_radius)
    masked = jnp.where(mask, heatmap, 0.0)
    flat = masked.reshape(h * w, NUM_KEYPOINTS)
    best_idx = jnp.argmax(flat, axis=0)
    best_scores = jnp.take_along_axis(flat, best_idx[None], axis=0)[0]
    coords = jnp.stack([best_idx // w, best_idx % w], axis=-1)
    return best_scores, coords


def find_root(highest_scores, highest_score_indices):
    """Root = keypoint with the global best score (reference
    decode.py:114-128). Returns (root_score, root_id, root_cell (2,))."""
    root_id = jnp.argmax(highest_scores)
    return highest_scores[root_id], root_id, highest_score_indices[root_id]
