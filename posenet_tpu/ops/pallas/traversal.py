"""Pallas TPU kernel: K-parallel kinematic-tree traversal.

The decoder's tree walk is gather-bound in XLA: every edge hop fetches
displacement/score/offset rows at data-dependent cells, and TPU gather
throughput (~50M rows/s) caps the walk at ~20 ms/batch128 no matter how the
ops are batched. This kernel replaces each gather with **one-hot matmuls
held entirely in VMEM** so the fetches run on the MXU.

Kernel lineage (all generations ship; `version=None` auto-picks by grid):
  v1 (removed): (K, H*W) one-hot against whole split tables — 27 MXU
      passes + 139k-element one-hot per hop, ~6 ms/b128, VMEM-capped at
      ~4k cells (stride-8 720p fell back to XLA).
  v2: two-stage row-gather over per-target tables (below) — 5.5 ms/b128
      standalone, rolled fori_loop hops, 60-120 s Mosaic compiles.
  v3: same fetch, but the 32 hops unroll at trace time with STATIC
      metadata and all per-candidate vectors go K-on-lanes — 4.4 ms/b128,
      2-6 s compiles. Default for grids > ~4.3k cells.
  v4: level-batched super-hops — the depth-4 kinematic tree gives 8
      dependency levels of 2-6 independent edges; each level fetches in
      ONE block-diagonal one-hot matmul pair over level-stacked tables —
      3.96 ms/b128. Default for grids <= ~4.3k cells (its one-hot builds
      scale as L^2*H*K on the VPU, so large grids prefer v3).
All three are bit-identical to each other on hardware and to the XLA
reference-semantics path on CPU (tests parametrize every version).

The v2 design that v3/v4 build on — two-stage row-gather over per-target
tables:

1. The HOST pre-arranges per-target tables: sov (B, 17, H, W*9) — for
   target keypoint t, row y, column f*3W + split*W + x holds the bf16
   split piece of field f in [score_t, off_y_t, off_x_t] at cell (y, x);
   disp tables likewise (B, 16, H, W*6) per edge. Pure XLA transposes,
   fused (block layout: see _per_group_tables).
2. Per hop, the kernel row-gathers with a tiny (K, H) one-hot:
   rows = onehot_row @ table[t]  ->  (K, W*nf) — each output element is a
   single 1.0*bf16 product accumulated in f32, i.e. an exact copy.
3. Column select + field reduce: zero all but the candidate's column
   (lane-iota compare) and multiply by a static 0/1 group matrix
   G (W*nf, fields) on the MXU — the hi+mid+lo split pieces sum INSIDE the
   f32 matmul accumulation.

Per hop that is 5-6 MXU passes and a (K, H) one-hot instead of 27 passes
and a (K, H*W) one-hot; VMEM scales as H*W*690 bytes/image, so the
stride-8 720p grid (91x161) now fits at group=1 and no longer needs the
XLA fallback.

Exactness (bit-identical to the XLA gather path — an ulp of coordinate
noise flips clip(round(coord/stride)) at cell boundaries):
- tables are decomposed into an exact 3-way bf16 split (f32 = hi+mid+lo;
  each residual carries <= 8 significant bits, so three bf16 pieces are
  exact),
- one-hot / group-matrix operands are exactly representable in bf16
  (0.0/1.0), so every MXU product is exact in f32,
- hi, mid, lo have non-overlapping significands, so their f32 sum is exact
  under ANY accumulation order — including inside a matmul k-reduction.

The traversal walks the 16 backward then 16 forward edge hops as a
`lax.fori_loop` with edge metadata in SMEM (a rolled loop keeps Mosaic
compile time ~10x lower than unrolling 32 hop bodies), with state as
(17, K) carries. Fill gating is exact reference semantics
(score > 0 / score == 0, reference decode.py:152-178).

Measured equality (v5e, random multi-person heads, K=128): this kernel is
bit-identical to the XLA traversal ON CPU (reference semantics: every
mul/add individually f32-rounded). The XLA traversal ON TPU itself drifts
on a handful of knife-edge cells (--xla_allow_excess_precision lets XLA
contract `cell*stride + offset` into an FMA, and one ulp flips
clip(round(coord/stride))) — so on TPU hardware this kernel is MORE
faithful to the PyTorch reference than the XLA fallback it replaces.

Grid: `group` images per program; per-image tables stream HBM->VMEM
through the standard pallas block pipeline (double-buffered across grid
steps).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from posenet_tpu.constants import NUM_EDGES, NUM_KEYPOINTS

# Per-image VMEM for the split tables, bytes: 17*(W*9) + 2*16*(W*6) bf16
# columns per row = H*W*(153+192)*2. (Shared per-target layout — all kernel
# versions consume the same tables; v4 assembles its level blocks in-kernel.)
_TABLE_BYTES_PER_CELL = (NUM_KEYPOINTS * 9 + 2 * NUM_EDGES * 6) * 2
# Pipeline double-buffers input blocks; the GROUP SWEEP keeps
# 2*group*tables under this conservative cap so small/medium grids keep
# their measured-good group configs.
_VMEM_TABLE_BUDGET = 24 * 1024 * 1024
# Large-grid ceiling at group=1: v3 runs with vmem_limit_bytes=100 MB, and
# grids up to 48k cells (2x33.1 MB double-buffered tables + fetch
# intermediates) measured bit-exact on v5e HW (160x300 probe, 2026-08-17);
# stride-8 1080p (136x241 = 32.8k cells, 2x22.6 MB) sits well inside.
# Grids beyond this fall back to the XLA traversal (bit-exact on TPU too
# via barrier-pinned gather indices, see PARITY.md). The gate is pinned to
# EXACTLY the 48k-cell verified envelope — a round 68 MB admitted ~51.7k
# cells, 8% past anything measured, risking a Mosaic compile error where
# the XLA fallback would have worked.
_VMEM_TABLE_BUDGET_LARGE = 2 * 48_000 * _TABLE_BYTES_PER_CELL


def _hop_metadata():
    """(edge_id, source_kp, target_kp) int32 arrays for the 16 backward and
    16 forward hops, in the decoder's level order (decode._tree_levels)."""
    from posenet_tpu.decode import _BWD_LEVELS, _FWD_LEVELS

    def flat(levels):
        rows = [hop for level in levels for hop in level]
        arr = np.asarray(rows, dtype=np.int32)       # (16, 3): e, s, t
        return arr[:, 0], arr[:, 1], arr[:, 2]

    return flat(_BWD_LEVELS), flat(_FWD_LEVELS)


def _per_group_tables(table, h, w, n_fields, n_groups):
    """(B, H*W, n_fields*n_groups) f32 with column = n_groups*f + g  ->
    (B, n_groups, H, 3*n_fields*W) bf16 split tables in BLOCK layout:
    column = field*(3W) + split*W + x.

    The block layout keeps W (33/161) as the innermost moved axis so the
    relayout is a well-tiled XLA transpose; the original interleaved layout
    (col = x*3F + 3*split + field) transposed with F=2..3 innermost and ran
    ~3x slower. The kernel is layout-agnostic — its column map and field
    group matrix are host constants built to match.

    The exact 3-way bf16 split (x == hi + mid + lo exactly; each piece
    rounds to the bf16 grid with lax.reduce_precision, NOT an
    f32->bf16->f32 cast pair — under --xla_allow_excess_precision=true,
    set on this TPU runtime, XLA elides the round-trip cast and silently
    zeroes the mid/lo residuals) runs FIRST, in the source NHWC-like layout:
    it is elementwise, so XLA fuses it into the producer, and the big
    G-to-rows / W-to-lanes relayout then moves 2-byte bf16 pieces instead
    of 4-byte f32 — half the transpose traffic of the split-last order
    this replaced. Values are identical either way (the split is
    elementwise and the moves are pure permutations)."""
    b = table.shape[0]
    t = table.reshape(b, h, w, n_fields, n_groups)
    hi = lax.reduce_precision(t, exponent_bits=8, mantissa_bits=7)
    r = t - hi
    mid = lax.reduce_precision(r, exponent_bits=8, mantissa_bits=7)
    lo = r - mid
    s = jnp.stack([hi, mid, lo], axis=3).astype(jnp.bfloat16)
    s = jnp.transpose(s, (0, 5, 1, 4, 3, 2))         # (B, G, H, F, S, W)
    return s.reshape(b, n_groups, h, 3 * n_fields * w)


def _traversal_kernel_v3(colmap9_ref, colmap6_ref, g9t_ref, g6t_ref,
                         sov_ref, dfwd_ref, dbwd_ref, cand_scores_ref,
                         cand_kp_ref, root_y_ref, root_x_ref,
                         out_scores_ref, out_cy_ref, out_cx_ref,
                         out_oy_ref, out_ox_ref,
                         *, h: int, w: int, k: int, stride: float,
                         group: int):
    """v3 — fully static unroll, K-on-lanes.

    Two structural changes over v2 (same tables, same exact math):
    - The 32 hops are unrolled at trace time with STATIC (edge, source,
      target) metadata, so every state access is a static row slice and
      `disp_ref[g, e]` / `sov_ref[g, t]` are static indexes — no SMEM
      scalar reads, no dynamic ref indexing, and no (17, K) mask-and-reduce
      per state read/write (v2 spent most of its per-hop time there).
    - All per-candidate vectors live as (1, K) rows with K on the LANE
      axis: the one-hot is built directly as (H, K) = (iota == iy) with no
      transposes anywhere, stage-1 is tbl^T-contraction (H,W*nf)x(H,K) ->
      (W*nf, K), column select compares a (W*nf, 1) host map against the
      (1, K) column ids, and stage-2 is (nf, W*nf)x(W*nf, K) -> (nf, K).
      v2's (K, H) one-hot burned 128 sublanes x 33 lanes (95 dead lanes
      per VREG row); this layout keeps every VREG full.

    Exactness argument is identical to v2 (module docstring): every MXU
    product is 1.0/0.0 times a bf16 split piece, accumulated in f32."""
    for g in range(group):
        _traverse_one_v3(colmap9_ref, colmap6_ref, g9t_ref, g6t_ref,
                         sov_ref, dfwd_ref, dbwd_ref, cand_scores_ref,
                         cand_kp_ref, root_y_ref, root_x_ref, out_scores_ref,
                         out_cy_ref, out_cx_ref, out_oy_ref, out_ox_ref,
                         g=g, h=h, w=w, k=k, stride=stride)


def _traverse_one_v3(colmap9_ref, colmap6_ref, g9t_ref, g6t_ref,
                     sov_ref, dfwd_ref, dbwd_ref, cand_scores_ref,
                     cand_kp_ref, root_y_ref, root_x_ref,
                     out_scores_ref, out_cy_ref, out_cx_ref,
                     out_oy_ref, out_ox_ref,
                     *, g: int, h: int, w: int, k: int, stride: float):
    cand_kp = cand_kp_ref[g, :, :]                   # (1, K) int32
    cand_scores = cand_scores_ref[g, :, :]           # (1, K)
    root_y = root_y_ref[g, :, :]
    root_x = root_x_ref[g, :, :]

    col_iota = lax.broadcasted_iota(jnp.int32, (h, k), 0)
    col_of9 = colmap9_ref[:, :]                      # (W*9, 1) int32
    col_of6 = colmap6_ref[:, :]                      # (W*6, 1)
    g9t = g9t_ref[:, :]                              # (3, W*9) bf16
    g6t = g6t_ref[:, :]                              # (2, W*6)

    def fetch(tbl, col_of, gmat_t, iy, ix):
        """Exact table fetch at integer cells: (nf, K) f32.

        tbl (H, W*nf3) split table; iy/ix (1, K) int32."""
        onehot_t = (col_iota == iy).astype(jnp.bfloat16)          # (H, K)
        rows_t = lax.dot_general(                                 # (W*nf3, K)
            tbl, onehot_t, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        sel = jnp.where(col_of == ix, rows_t, 0.0
                        ).astype(jnp.bfloat16)  # exact: entries are bf16
        return lax.dot_general(                                   # (nf, K)
            gmat_t, sel, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # State: 17 separate (1, K) rows — static-indexed throughout.
    def seed(vals):
        return [jnp.where(cand_kp == j, vals, 0.0)
                for j in range(NUM_KEYPOINTS)]

    scores = seed(cand_scores)
    cy = seed(root_y)
    cx = seed(root_x)
    zero = jnp.zeros((1, k), jnp.float32)
    oy = [zero for _ in range(NUM_KEYPOINTS)]
    ox = [zero for _ in range(NUM_KEYPOINTS)]

    def hop(disp_ref, e, s, t):
        fill = (scores[s] > 0.0) & (scores[t] == 0.0)             # (1, K)
        ys, xs = cy[s], cx[s]
        src_iy = jnp.clip(jnp.round(ys / stride), 0.0, h - 1.0
                          ).astype(jnp.int32)
        src_ix = jnp.clip(jnp.round(xs / stride), 0.0, w - 1.0
                          ).astype(jnp.int32)
        dvals = fetch(disp_ref[g, e], col_of6, g6t, src_iy, src_ix)
        ny = ys + dvals[0:1, :]
        nx = xs + dvals[1:2, :]
        tgt_iy = jnp.clip(jnp.round(ny / stride), 0.0, h - 1.0)
        tgt_ix = jnp.clip(jnp.round(nx / stride), 0.0, w - 1.0)
        svals = fetch(sov_ref[g, t], col_of9, g9t,
                      tgt_iy.astype(jnp.int32), tgt_ix.astype(jnp.int32))
        sc, oyn, oxn = svals[0:1, :], svals[1:2, :], svals[2:3, :]
        scores[t] = jnp.where(fill, sc, scores[t])
        cy[t] = jnp.where(fill, tgt_iy * stride + oyn, cy[t])
        cx[t] = jnp.where(fill, tgt_ix * stride + oxn, cx[t])
        oy[t] = jnp.where(fill, oyn, oy[t])
        ox[t] = jnp.where(fill, oxn, ox[t])

    (bwd_e, bwd_s, bwd_t), (fwd_e, fwd_s, fwd_t) = _hop_metadata()
    for e, s, t in zip(bwd_e, bwd_s, bwd_t):
        hop(dbwd_ref, int(e), int(s), int(t))
    for e, s, t in zip(fwd_e, fwd_s, fwd_t):
        hop(dfwd_ref, int(e), int(s), int(t))

    out_scores_ref[g] = jnp.concatenate(scores, axis=0)           # (17, K)
    out_cy_ref[g] = jnp.concatenate(cy, axis=0)
    out_cx_ref[g] = jnp.concatenate(cx, axis=0)
    out_oy_ref[g] = jnp.concatenate(oy, axis=0)
    out_ox_ref[g] = jnp.concatenate(ox, axis=0)


def _level_metadata():
    """Levels as (edge_ids, sources, targets) tuples, bwd then fwd.

    Level-batching is exact: within a level no edge's source is another's
    target, and the backward pass fills exactly the root->nose ancestor
    path so edges sharing a target have disjoint fill masks (see
    decode._tree_levels). Evaluating all of a level's fill gates from the
    pre-level state is therefore identical to the reference's sequential
    edge order."""
    from posenet_tpu.decode import _BWD_LEVELS, _FWD_LEVELS

    def conv(levels):
        return [tuple(zip(*level)) for level in levels]

    return conv(_BWD_LEVELS), conv(_FWD_LEVELS)


def _traversal_kernel_v4(colmap9_ref, colmap6_ref, g9t_ref, g6t_ref,
                         sov_ref, dfwd_ref, dbwd_ref,
                         cand_scores_ref, cand_kp_ref, root_y_ref, root_x_ref,
                         out_scores_ref, out_cy_ref, out_cx_ref,
                         out_oy_ref, out_ox_ref,
                         *, h: int, w: int, k: int, stride: float,
                         group: int):
    """v4 — level-batched super-hops (8 instead of 32 sequential hops).

    The kinematic tree has depth 4, so each pass is 4 dependency levels of
    2-6 independent edges. A whole level fetches in ONE one-hot matmul
    pair via the block-diagonal trick: the level's per-target (or
    per-edge) tables stack along the ROW axis — level block
    (L*H, W*nf3) — and each edge j's candidates get row ids offset by
    j*H, so a single (L*H, L*K) one-hot contracts into per-edge fetches
    with zero cross-talk (off-diagonal blocks are exact 0.0 products).
    Sequential MXU dependency chain drops 4x; lane width grows to L*K
    (up to 768), which the VPU/MXU process at full tilt.

    The level blocks are assembled IN-KERNEL by concatenating static
    slices of the same shared (G, H, W*nf3) tables v3 reads — tiny VMEM
    copies (~100 KB/level). The first version instead had the host
    pre-stack per-edge copies of the sov table for both passes, which
    duplicated it 2x16/17 ways in HBM (~80 MB written + re-read per
    batch-128) and showed up as ~0.9 ms of pure relayout copies in the
    fused-program profile (tools/profile_fused.py).

    Exactness: identical argument to v2/v3 (every product is 0/1 times a
    bf16 split piece, f32 accumulation, non-overlapping significands), and
    level-batched fill gating equals sequential gating (_level_metadata)."""
    for g in range(group):
        _traverse_one_v4(colmap9_ref, colmap6_ref, g9t_ref, g6t_ref,
                         sov_ref, dfwd_ref, dbwd_ref,
                         cand_scores_ref, cand_kp_ref, root_y_ref, root_x_ref,
                         out_scores_ref, out_cy_ref, out_cx_ref,
                         out_oy_ref, out_ox_ref,
                         g=g, h=h, w=w, k=k, stride=stride)


def _traverse_one_v4(colmap9_ref, colmap6_ref, g9t_ref, g6t_ref,
                     sov_ref, dfwd_ref, dbwd_ref,
                     cand_scores_ref, cand_kp_ref, root_y_ref, root_x_ref,
                     out_scores_ref, out_cy_ref, out_cx_ref,
                     out_oy_ref, out_ox_ref,
                     *, g: int, h: int, w: int, k: int, stride: float):
    cand_kp = cand_kp_ref[g, :, :]                   # (1, K) int32
    cand_scores = cand_scores_ref[g, :, :]
    root_y = root_y_ref[g, :, :]
    root_x = root_x_ref[g, :, :]

    col_of9 = colmap9_ref[:, :]                      # (W*9, 1) int32
    col_of6 = colmap6_ref[:, :]
    g9t = g9t_ref[:, :]                              # (3, W*9) bf16
    g6t = g6t_ref[:, :]

    def fetch_level(tbl_lvl, col_of, gmat_t, iy_cat, ix_cat, L):
        """Block-diagonal level fetch: (nf, L*K) f32.

        tbl_lvl (L*H, W*nf3): rows [j*H, (j+1)*H) hold edge j's table.
        iy_cat (1, L*K) int32 already offset by j*H per segment."""
        iota = lax.broadcasted_iota(jnp.int32, (L * h, L * k), 0)
        onehot_t = (iota == iy_cat).astype(jnp.bfloat16)          # (LH, LK)
        rows_t = lax.dot_general(                                 # (Wnf3, LK)
            tbl_lvl, onehot_t, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        sel = jnp.where(col_of == ix_cat, rows_t, 0.0
                        ).astype(jnp.bfloat16)
        return lax.dot_general(                                   # (nf, LK)
            gmat_t, sel, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def seed(vals):
        return [jnp.where(cand_kp == j, vals, 0.0)
                for j in range(NUM_KEYPOINTS)]

    scores = seed(cand_scores)
    cy = seed(root_y)
    cx = seed(root_x)
    zero = jnp.zeros((1, k), jnp.float32)
    oy = [zero for _ in range(NUM_KEYPOINTS)]
    ox = [zero for _ in range(NUM_KEYPOINTS)]

    bwd_levels, fwd_levels = _level_metadata()

    def run_pass(levels, disp_ref):
        for (edges, sources, targets) in levels:
            L = len(edges)
            fills = [(scores[s] > 0.0) & (scores[t] == 0.0)
                     for s, t in zip(sources, targets)]
            # --- displacement fetch at source cells ---
            src_iy, src_ix = [], []
            for j, s in enumerate(sources):
                iy = jnp.clip(jnp.round(cy[s] / stride), 0.0, h - 1.0
                              ).astype(jnp.int32)
                ix = jnp.clip(jnp.round(cx[s] / stride), 0.0, w - 1.0
                              ).astype(jnp.int32)
                src_iy.append(iy + j * h)
                src_ix.append(ix)
            # Level block from the shared tables: static per-edge slices,
            # stacked on rows (see kernel docstring — this replaces the
            # host-side duplicated stacking).
            dlvl = jnp.concatenate([disp_ref[g, e] for e in edges],
                                   axis=0)                        # (L*H, W6)
            dvals = fetch_level(dlvl, col_of6, g6t,
                                jnp.concatenate(src_iy, axis=1),
                                jnp.concatenate(src_ix, axis=1), L)  # (2, LK)
            # --- score+offset fetch at displaced target cells ---
            tgt_iy, tgt_ix, tys, txs = [], [], [], []
            for j, s in enumerate(sources):
                ny = cy[s] + dvals[0:1, j * k:(j + 1) * k]
                nx = cx[s] + dvals[1:2, j * k:(j + 1) * k]
                ty = jnp.clip(jnp.round(ny / stride), 0.0, h - 1.0)
                tx = jnp.clip(jnp.round(nx / stride), 0.0, w - 1.0)
                tys.append(ty)
                txs.append(tx)
                tgt_iy.append(ty.astype(jnp.int32) + j * h)
                tgt_ix.append(tx.astype(jnp.int32))
            slvl = jnp.concatenate([sov_ref[g, t] for t in targets],
                                   axis=0)                        # (L*H, W9)
            svals = fetch_level(slvl, col_of9, g9t,
                                jnp.concatenate(tgt_iy, axis=1),
                                jnp.concatenate(tgt_ix, axis=1), L)  # (3, LK)
            # --- masked writes (disjoint fills within a level) ---
            for j, t in enumerate(targets):
                sl = slice(j * k, (j + 1) * k)
                sc = svals[0:1, sl]
                oyn = svals[1:2, sl]
                oxn = svals[2:3, sl]
                fill = fills[j]
                scores[t] = jnp.where(fill, sc, scores[t])
                cy[t] = jnp.where(fill, tys[j] * stride + oyn, cy[t])
                cx[t] = jnp.where(fill, txs[j] * stride + oxn, cx[t])
                oy[t] = jnp.where(fill, oyn, oy[t])
                ox[t] = jnp.where(fill, oxn, ox[t])
    run_pass(bwd_levels, dbwd_ref)
    run_pass(fwd_levels, dfwd_ref)

    out_scores_ref[g] = jnp.concatenate(scores, axis=0)           # (17, K)
    out_cy_ref[g] = jnp.concatenate(cy, axis=0)
    out_cx_ref[g] = jnp.concatenate(cx, axis=0)
    out_oy_ref[g] = jnp.concatenate(oy, axis=0)
    out_ox_ref[g] = jnp.concatenate(ox, axis=0)


def _traversal_kernel(meta_ref, colmap9_ref, colmap6_ref, g9_ref, g6_ref,
                      sov_ref, dfwd_ref, dbwd_ref, cand_scores_ref,
                      cand_kp_ref, root_y_ref, root_x_ref,
                      out_scores_ref, out_cy_ref, out_cx_ref,
                      out_oy_ref, out_ox_ref,
                      *, h: int, w: int, k: int, stride: float,
                      group: int):
    # Each program decodes `group` images (amortizes per-program pipeline
    # overhead over the grid); the per-image body is unrolled.
    for g in range(group):
        _traverse_one(meta_ref, colmap9_ref, colmap6_ref, g9_ref, g6_ref,
                      sov_ref, dfwd_ref, dbwd_ref, cand_scores_ref,
                      cand_kp_ref, root_y_ref, root_x_ref, out_scores_ref,
                      out_cy_ref, out_cx_ref, out_oy_ref, out_ox_ref,
                      g=g, h=h, w=w, k=k, stride=stride)


def _traverse_one(meta_ref, colmap9_ref, colmap6_ref, g9_ref, g6_ref,
                  sov_ref, dfwd_ref, dbwd_ref, cand_scores_ref,
                  cand_kp_ref, root_y_ref, root_x_ref,
                  out_scores_ref, out_cy_ref, out_cx_ref,
                  out_oy_ref, out_ox_ref,
                  *, g: int, h: int, w: int, k: int, stride: float):
    # meta_ref (SMEM, (6, 16) int32): rows = bwd_e, bwd_s, bwd_t, fwd_e,
    # fwd_s, fwd_t (see _hop_metadata).
    cand_kp = cand_kp_ref[g, 0, :]                  # (K,) int32
    cand_scores = cand_scores_ref[g, 0, :]          # (K,)
    root_y = root_y_ref[g, 0, :]
    root_x = root_x_ref[g, 0, :]

    row_iota = lax.broadcasted_iota(jnp.int32, (k, h), 1)
    # lane -> source-column maps and 0/1 field-group matrices, host-built
    # constants (in-kernel 2-D iota/mod builds of these miscompiled on
    # real hardware: the G matmul silently dropped the mid/lo split rows).
    col_of9 = colmap9_ref[:, :]                     # (1, W*9) int32
    col_of6 = colmap6_ref[:, :]                     # (1, W*6)
    g9 = g9_ref[:, :]                               # (W*9, 3) bf16
    g6 = g6_ref[:, :]                               # (W*6, 2) bf16

    def fetch(tbl, col_of, gmat, iy, ix):
        """Exact table fetch at integer cells (iy, ix): (K, fields) f32."""
        onehot = (row_iota == iy[:, None]).astype(jnp.bfloat16)   # (K, H)
        rows = lax.dot_general(                                    # (K, W*nf)
            onehot, tbl, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        sel = jnp.where(col_of == ix[:, None], rows, 0.0
                        ).astype(jnp.bfloat16)  # exact: entries are bf16
        return lax.dot_general(                                    # (K, nf)
            sel, gmat, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # Initial state: (17, K) planes, root rows seeded from the candidates.
    row_ids = lax.broadcasted_iota(jnp.int32, (NUM_KEYPOINTS, k), 0)
    is_root = row_ids == cand_kp[None, :]
    scores0 = jnp.where(is_root, cand_scores[None, :], 0.0)
    cy0 = jnp.where(is_root, root_y[None, :], 0.0)
    cx0 = jnp.where(is_root, root_x[None, :], 0.0)
    zeros = jnp.zeros((NUM_KEYPOINTS, k), jnp.float32)

    # Mosaic has no dynamic_slice on values; dynamic row selection on the
    # tiny (17, K) state planes is mask-and-reduce — a few VPU ops per hop.
    kp_rows = lax.broadcasted_iota(jnp.int32, (NUM_KEYPOINTS, k), 0)

    def read_row(plane, idx):
        """plane (17, K), idx scalar -> (K,)."""
        return jnp.sum(jnp.where(kp_rows == idx, plane, 0.0), axis=0)

    def write_row(plane, idx, values, mask):
        """Masked write of `values` (K,) into row idx of plane (17, K)."""
        sel = (kp_rows == idx) & mask[None, :]
        return jnp.where(sel, values[None, :], plane)

    def make_hop(disp_ref, row0):

        def hop(i, state):
            scores, cy, cx, oy, ox = state
            e = meta_ref[row0, i]
            s = meta_ref[row0 + 1, i]
            t = meta_ref[row0 + 2, i]
            sc_s = read_row(scores, s)                          # (K,)
            sc_t = read_row(scores, t)
            fill = (sc_s > 0.0) & (sc_t == 0.0)

            ys = read_row(cy, s)
            xs = read_row(cx, s)
            src_iy = jnp.clip(jnp.round(ys / stride), 0.0, h - 1.0)
            src_ix = jnp.clip(jnp.round(xs / stride), 0.0, w - 1.0)

            dvals = fetch(disp_ref[g, e], col_of6, g6,
                          src_iy.astype(jnp.int32), src_ix.astype(jnp.int32))
            ny = ys + dvals[:, 0]
            nx = xs + dvals[:, 1]
            tgt_iy = jnp.clip(jnp.round(ny / stride), 0.0, h - 1.0)
            tgt_ix = jnp.clip(jnp.round(nx / stride), 0.0, w - 1.0)

            svals = fetch(sov_ref[g, t], col_of9, g9,
                          tgt_iy.astype(jnp.int32), tgt_ix.astype(jnp.int32))
            sc = svals[:, 0]
            oyn = svals[:, 1]
            oxn = svals[:, 2]

            scores = write_row(scores, t, sc, fill)
            cy = write_row(cy, t, tgt_iy * stride + oyn, fill)
            cx = write_row(cx, t, tgt_ix * stride + oxn, fill)
            oy = write_row(oy, t, oyn, fill)
            ox = write_row(ox, t, oxn, fill)
            return scores, cy, cx, oy, ox

        return hop

    state = (scores0, cy0, cx0, zeros, zeros)
    state = lax.fori_loop(0, NUM_EDGES, make_hop(dbwd_ref, 0), state)
    state = lax.fori_loop(0, NUM_EDGES, make_hop(dfwd_ref, 3), state)
    scores, cy, cx, oy, ox = state

    out_scores_ref[g] = scores                       # (17, K)
    out_cy_ref[g] = cy
    out_cx_ref[g] = cx
    out_oy_ref[g] = oy
    out_ox_ref[g] = ox


@functools.partial(jax.jit,
                   static_argnames=('h', 'w', 'output_stride', 'interpret',
                                    'version', 'group_override'))
def traverse_all_candidates_pallas(
        cand_scores, cand_kp, root_coords, sov_table, dfwd_table, dbwd_table,
        h: int, w: int, output_stride: int, interpret: bool = False,
        version: int = None, group_override: int = None
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched pallas traversal.

    Args:
      cand_scores (B, K), cand_kp (B, K) int32, root_coords (B, K, 2),
      sov_table (B, H*W, 51), dfwd_table/dbwd_table (B, H*W, 32).
    Returns:
      (kp_scores (B, K, 17), kp_coords (B, K, 17, 2),
       kp_offsets (B, K, 17, 2)) — same contract as the XLA traversal.
    """
    b, k = cand_scores.shape

    # Host-side re-layout into per-target / per-edge split tables (fused
    # XLA transposes; the kernel consumes these directly).
    sov_t = _per_group_tables(sov_table, h, w, 3, NUM_KEYPOINTS)
    dfwd_t = _per_group_tables(dfwd_table, h, w, 2, NUM_EDGES)
    dbwd_t = _per_group_tables(dbwd_table, h, w, 2, NUM_EDGES)

    # Images per program: amortize per-program pipeline overhead while the
    # double-buffered table blocks stay inside the VMEM budget.
    if version is None:
        # v4's level-batched one-hot builds scale as L^2*H*K on the VPU:
        # measured v5e crossover vs v3 is ~4k grid cells (33x33 4.0 vs 4.4
        # ms/b128 for v4; 91x161 2.7 vs 2.2 ms/b4 for v3; ties at 46x81 /
        # 65x65).
        version = 4 if h * w <= 4300 else 3

    per_img = h * w * _TABLE_BYTES_PER_CELL
    group = 1
    # Images per program (v5e measurements, 33x33 grid): deep grids hide
    # per-program pipeline overhead, so group=2 suffices at b>=64 (g=4 is
    # slightly worse: more scoped VMEM, same speed); shallow grids need a
    # larger group to amortize (b=16: g=4 1.38 ms vs g=2 1.98 ms on v4).
    if version >= 3:
        group_cands = (2,) if b >= 64 else (4, 2)
    else:
        group_cands = (8, 4, 2)
    for cand in group_cands:
        if b % cand == 0 and 2 * cand * per_img <= _VMEM_TABLE_BUDGET:
            group = cand
            break
    if group_override is not None:
        if b % group_override != 0:
            raise ValueError(
                f"group_override={group_override} must divide batch {b}: a "
                f"non-dividing group would truncate the grid and return "
                f"uninitialized results for the trailing images")
        group = group_override

    grid = (b // group,)
    table_specs = [
        pl.BlockSpec((group, NUM_KEYPOINTS, h, w * 9), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((group, NUM_EDGES, h, w * 6), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((group, NUM_EDGES, h, w * 6), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    cand_specs = [
        pl.BlockSpec((group, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        for _ in range(4)
    ]
    out_specs = [
        pl.BlockSpec((group, NUM_KEYPOINTS, k), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(5)
    ]
    out_shape = [jax.ShapeDtypeStruct((b, NUM_KEYPOINTS, k), jnp.float32)
                 for _ in range(5)]
    cand_args = (cand_scores[:, None, :],
                 cand_kp.astype(jnp.int32)[:, None, :],
                 root_coords[..., 0][:, None, :],
                 root_coords[..., 1][:, None, :])

    if version in (3, 4):
        # v3 and v4 share everything but the kernel body: host-built
        # column maps / transposed group matrices (K-on-lanes), matching
        # _per_group_tables' block layout col = f*3W + split*W + x, and
        # the same shared per-target tables (v4 assembles its level
        # blocks from static per-edge slices in-kernel — see
        # _traversal_kernel_v4). ONE copy: the kernels' bit-exactness
        # depends on these constants matching the table layout, and a
        # future layout change edited in only one branch would silently
        # break whichever version the auto-picker selects.
        kernel = functools.partial(
            _traversal_kernel_v4 if version == 4 else _traversal_kernel_v3,
            h=h, w=w, k=k, stride=float(output_stride), group=group)
        colmap9 = jnp.asarray(np.arange(w * 9)[:, None] % w, jnp.int32)
        colmap6 = jnp.asarray(np.arange(w * 6)[:, None] % w, jnp.int32)
        g9t = jnp.asarray(
            (np.arange(3)[:, None] == np.arange(w * 9)[None, :] // (3 * w)),
            jnp.bfloat16)
        g6t = jnp.asarray(
            (np.arange(2)[:, None] == np.arange(w * 6)[None, :] // (3 * w)),
            jnp.bfloat16)
        in_specs = [
            pl.BlockSpec((w * 9, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w * 6, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, w * 9), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, w * 6), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ] + table_specs + cand_specs
        const_args = (colmap9, colmap6, g9t, g6t)
        table_args = (sov_t, dfwd_t, dbwd_t)
    else:
        kernel = functools.partial(_traversal_kernel, h=h, w=w, k=k,
                                   stride=float(output_stride), group=group)
        (bwd_e, bwd_s, bwd_t), (fwd_e, fwd_s, fwd_t) = _hop_metadata()
        meta = jnp.asarray(
            np.stack([bwd_e, bwd_s, bwd_t, fwd_e, fwd_s, fwd_t]), jnp.int32)
        # host-built lane maps / group matrices (see _traverse_one), block
        # layout col = f*3W + split*W + x (must match _per_group_tables)
        colmap9 = jnp.asarray(np.arange(w * 9)[None, :] % w, jnp.int32)
        colmap6 = jnp.asarray(np.arange(w * 6)[None, :] % w, jnp.int32)
        g9 = jnp.asarray(
            (np.arange(w * 9)[:, None] // (3 * w)) == np.arange(3)[None, :],
            jnp.bfloat16)
        g6 = jnp.asarray(
            (np.arange(w * 6)[:, None] // (3 * w)) == np.arange(2)[None, :],
            jnp.bfloat16)
        in_specs = [
            pl.BlockSpec((6, NUM_EDGES), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, w * 9), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w * 6), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w * 9, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w * 6, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ] + table_specs + cand_specs
        const_args = (meta, colmap9, colmap6, g9, g6)
        table_args = (sov_t, dfwd_t, dbwd_t)

    # v3's unrolled body keeps more fetch intermediates live than the 16 MB
    # default scoped-VMEM budget allows at group >= 4; raise the cap so the
    # group sweep isn't artificially truncated (v5e has 128 MB VMEM).
    compiler_params = None
    if version >= 3 and not interpret:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    scores, cy, cx, oy, ox = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=compiler_params,
    )(*const_args, *table_args, *cand_args)

    kp_scores = jnp.transpose(scores, (0, 2, 1))                 # (B, K, 17)
    kp_coords = jnp.stack([jnp.transpose(cy, (0, 2, 1)),
                           jnp.transpose(cx, (0, 2, 1))], axis=-1)
    kp_offsets = jnp.stack([jnp.transpose(oy, (0, 2, 1)),
                            jnp.transpose(ox, (0, 2, 1))], axis=-1)
    return kp_scores, kp_coords, kp_offsets
