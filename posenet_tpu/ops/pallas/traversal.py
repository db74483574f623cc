"""Pallas TPU kernel: K-parallel kinematic-tree traversal.

The decoder's tree walk is gather-bound in XLA: every edge hop fetches
displacement/score/offset rows at data-dependent cells, and TPU gather
throughput (~50M rows/s) caps the walk at ~20 ms/batch128 no matter how the
ops are batched. This kernel replaces each gather with a **one-hot matmul
held entirely in VMEM**: rows = onehot(cells) @ table runs on the MXU, and
the one-hot operand never touches HBM.

Exactness: gathered values must be bit-identical to real gathers (an ulp of
coordinate noise flips clip(round(coord/stride)) at cell boundaries). Two
ingredients guarantee that:
- tables are decomposed into an exact 3-way bf16 split (f32 = hi+mid+lo —
  each residual has <= 8 significant bits, so three bf16 pieces are exact),
- the one-hot lhs is exactly representable in bf16 (0.0/1.0), so the
  default-precision MXU pass accumulates exact products in f32.
The traversal itself walks the 16 backward then 16 forward edge hops as a
`lax.fori_loop` with edge metadata in constant arrays (a rolled loop keeps
Mosaic compile time ~10x lower than unrolling 32 hop bodies), with state as
(17, K) carries. Fill gating is exact reference semantics
(score > 0 / score == 0, reference decode.py:152-178); hop arithmetic is
identical to the XLA path (golden-tested against the PyTorch reference).

Grid: one program per batch image; per-image tables (H*W x 51 score+offset,
H*W x 32 displacement) stream HBM->VMEM through the standard pallas block
pipeline (double-buffered across grid steps).
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


def _hop_metadata():
    """(edge_id, source_kp, target_kp) int32 arrays for the 16 backward and
    16 forward hops, in the decoder's level order (decode._tree_levels)."""
    from posenet_tpu.decode import _BWD_LEVELS, _FWD_LEVELS

    def flat(levels):
        rows = [hop for level in levels for hop in level]
        arr = np.asarray(rows, dtype=np.int32)       # (16, 3): e, s, t
        return arr[:, 0], arr[:, 1], arr[:, 2]

    return flat(_BWD_LEVELS), flat(_FWD_LEVELS)


def _traversal_kernel(meta_ref, sov_ref, dfwd_ref, dbwd_ref, cand_scores_ref,
                      cand_kp_ref, root_y_ref, root_x_ref,
                      out_scores_ref, out_cy_ref, out_cx_ref,
                      out_oy_ref, out_ox_ref,
                      *, h: int, w: int, k: int, stride: float,
                      group: int):
    # Each program decodes `group` images (amortizes per-program pipeline
    # overhead over the grid); the per-image body is unrolled.
    for g in range(group):
        _traverse_one(meta_ref, sov_ref, dfwd_ref, dbwd_ref, cand_scores_ref,
                      cand_kp_ref, root_y_ref, root_x_ref, out_scores_ref,
                      out_cy_ref, out_cx_ref, out_oy_ref, out_ox_ref,
                      g=g, h=h, w=w, k=k, stride=stride)


def _traverse_one(meta_ref, sov_ref, dfwd_ref, dbwd_ref, cand_scores_ref,
                  cand_kp_ref, root_y_ref, root_x_ref,
                  out_scores_ref, out_cy_ref, out_cx_ref,
                  out_oy_ref, out_ox_ref,
                  *, g: int, h: int, w: int, k: int, stride: float):
    hw = h * w
    # meta_ref (SMEM, (6, 16) int32): rows = bwd_e, bwd_s, bwd_t, fwd_e,
    # fwd_s, fwd_t (see _hop_metadata).

    cand_kp = cand_kp_ref[g, 0, :]                  # (K,) int32
    cand_scores = cand_scores_ref[g, 0, :]          # (K,)
    root_y = root_y_ref[g, 0, :]
    root_x = root_x_ref[g, 0, :]

    col_ids = lax.broadcasted_iota(jnp.int32, (k, hw), 1)

    def split3(table):
        """Exact 3-way bf16 decomposition: table == hi + mid + lo in f32."""
        hi = table.astype(jnp.bfloat16)
        r = table - hi.astype(jnp.float32)
        mid = r.astype(jnp.bfloat16)
        lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.concatenate([hi, mid, lo], axis=1)

    def fetch_rows(table3, c, cells):
        """rows[i] = table[cells[i]] via one-hot MXU matmul (exact)."""
        onehot = (col_ids == cells[:, None]).astype(jnp.bfloat16)
        out3 = jax.lax.dot_general(
            onehot, table3,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return out3[:, :c] + out3[:, c:2 * c] + out3[:, 2 * c:3 * c]

    sov3 = split3(sov_ref[g])                       # (HW, 153) bf16
    dfwd3 = split3(dfwd_ref[g])                     # (HW, 96) bf16
    dbwd3 = split3(dbwd_ref[g])

    # Initial state: (17, K) planes, root rows seeded from the candidates.
    row_ids = lax.broadcasted_iota(jnp.int32, (NUM_KEYPOINTS, k), 0)
    is_root = row_ids == cand_kp[None, :]
    scores0 = jnp.where(is_root, cand_scores[None, :], 0.0)
    cy0 = jnp.where(is_root, root_y[None, :], 0.0)
    cx0 = jnp.where(is_root, root_x[None, :], 0.0)
    zeros = jnp.zeros((NUM_KEYPOINTS, k), jnp.float32)

    # Mosaic has no dynamic_slice on values; dynamic row/column selection is
    # expressed as mask-and-reduce over the tiny (17, K) / (K, c) shapes —
    # a handful of VPU ops per hop.
    kp_rows = lax.broadcasted_iota(jnp.int32, (NUM_KEYPOINTS, k), 0)
    disp_cols = lax.broadcasted_iota(jnp.int32, (k, 2 * NUM_EDGES), 1)
    sov_cols = lax.broadcasted_iota(jnp.int32, (k, 3 * NUM_KEYPOINTS), 1)

    def read_row(plane, idx):
        """plane (17, K), idx scalar -> (K,)."""
        return jnp.sum(jnp.where(kp_rows == idx, plane, 0.0), axis=0)

    def write_row(plane, idx, values, mask):
        """Masked write of `values` (K,) into row idx of plane (17, K)."""
        sel = (kp_rows == idx) & mask[None, :]
        return jnp.where(sel, values[None, :], plane)

    def read_col(rows, cols_iota, idx):
        """rows (K, c), idx scalar -> (K,)."""
        return jnp.sum(jnp.where(cols_iota == idx, rows, 0.0), axis=1)

    def make_hop(disp3, row0):

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
            src_cells = (src_iy * w + src_ix).astype(jnp.int32)

            drow = fetch_rows(disp3, 2 * NUM_EDGES, src_cells)  # (K, 32)
            ny = ys + read_col(drow, disp_cols, e)
            nx = xs + read_col(drow, disp_cols, NUM_EDGES + e)
            tgt_iy = jnp.clip(jnp.round(ny / stride), 0.0, h - 1.0)
            tgt_ix = jnp.clip(jnp.round(nx / stride), 0.0, w - 1.0)
            tgt_cells = (tgt_iy * w + tgt_ix).astype(jnp.int32)

            trow = fetch_rows(sov3, 3 * NUM_KEYPOINTS, tgt_cells)  # (K, 51)
            sc = read_col(trow, sov_cols, t)
            oyn = read_col(trow, sov_cols, NUM_KEYPOINTS + t)
            oxn = read_col(trow, sov_cols, 2 * NUM_KEYPOINTS + t)

            scores = write_row(scores, t, sc, fill)
            cy = write_row(cy, t, tgt_iy * stride + oyn, fill)
            cx = write_row(cx, t, tgt_ix * stride + oxn, fill)
            oy = write_row(oy, t, oyn, fill)
            ox = write_row(ox, t, oxn, fill)
            return scores, cy, cx, oy, ox

        return hop

    state = (scores0, cy0, cx0, zeros, zeros)
    state = lax.fori_loop(0, NUM_EDGES, make_hop(dbwd3, 0), state)
    state = lax.fori_loop(0, NUM_EDGES, make_hop(dfwd3, 3), state)
    scores, cy, cx, oy, ox = state

    out_scores_ref[g] = scores                       # (17, K)
    out_cy_ref[g] = cy
    out_cx_ref[g] = cx
    out_oy_ref[g] = oy
    out_ox_ref[g] = ox


@functools.partial(jax.jit,
                   static_argnames=('h', 'w', 'output_stride', 'interpret'))
def traverse_all_candidates_pallas(
        cand_scores, cand_kp, root_coords, sov_table, dfwd_table, dbwd_table,
        h: int, w: int, output_stride: int, interpret: bool = False
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
    hw = h * w

    # Images per program: amortizes per-program pipeline overhead while
    # keeping table VMEM (~0.8 MB/image f32 + bf16 splits) well under
    # budget. b must divide evenly; fall back to 1 otherwise.
    group = 4 if b % 4 == 0 else (2 if b % 2 == 0 else 1)

    kernel = functools.partial(_traversal_kernel, h=h, w=w, k=k,
                               stride=float(output_stride), group=group)
    (bwd_e, bwd_s, bwd_t), (fwd_e, fwd_s, fwd_t) = _hop_metadata()
    meta = jnp.asarray(
        np.stack([bwd_e, bwd_s, bwd_t, fwd_e, fwd_s, fwd_t]), jnp.int32)

    grid = (b // group,)
    in_specs = [
        pl.BlockSpec((6, NUM_EDGES), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((group, hw, 51), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((group, hw, 32), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((group, hw, 32), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((group, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((group, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((group, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((group, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((group, NUM_KEYPOINTS, k), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(5)
    ]
    out_shape = [jax.ShapeDtypeStruct((b, NUM_KEYPOINTS, k), jnp.float32)
                 for _ in range(5)]

    scores, cy, cx, oy, ox = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(meta, sov_table, dfwd_table, dbwd_table, cand_scores[:, None, :],
      cand_kp.astype(jnp.int32)[:, None, :],
      root_coords[..., 0][:, None, :], root_coords[..., 1][:, None, :])

    kp_scores = jnp.transpose(scores, (0, 2, 1))                 # (B, K, 17)
    kp_coords = jnp.stack([jnp.transpose(cy, (0, 2, 1)),
                           jnp.transpose(cx, (0, 2, 1))], axis=-1)
    kp_offsets = jnp.stack([jnp.transpose(oy, (0, 2, 1)),
                            jnp.transpose(ox, (0, 2, 1))], axis=-1)
    return kp_scores, kp_coords, kp_offsets
