"""A/B probe: stage-1 per-plane top-k over a large s8 grid.

Config 3's profile (tools/profile_fused.py --output_stride 8 --height 721
--width 1281 --batch 4) shows lax.top_k over (4, 17, 14651) lowering to a
full variadic sort (%sort.1) costing 1.69 ms/batch — 14% of the whole fused
program and ~100x the 8 MB traffic floor. Candidate fix: blockwise-exact
top-k — split each plane's cells into cell-order blocks, top-k each block,
stable-merge the survivors. Tie order is preserved by the same argument as
`top_k_candidates_two_stage`: block-major concatenation keeps ascending-cell
order inside every tie group, and the stable merge sort on negated scores
keeps it.

Usage:
  python tools/probe_topk_stage1.py --check    (CPU, tie-heavy exactness)
  timeout 590 python tools/probe_topk_stage1.py --time  (TPU A/B)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def blockwise_topk(flat, k, block):
    """Exact top-k per row of flat (..., n) via cell-order blocks.

    Returns (values, indices) identical to lax.top_k(flat, k) including
    tie order (lowest index first), provided the pad value -inf never
    beats a real candidate (scores here are masked to -1, so -inf works).
    """
    import jax.numpy as jnp
    from jax import lax
    n = flat.shape[-1]
    nblk = -(-n // block)
    pad = nblk * block - n
    lead = flat.shape[:-1]
    padded = jnp.concatenate(
        [flat, jnp.full(lead + (pad,), -jnp.inf, flat.dtype)], axis=-1)
    blocks = padded.reshape(lead + (nblk, block))
    bv, bi = lax.top_k(blocks, min(k, block))            # (..., nblk, k)
    base = (jnp.arange(nblk, dtype=jnp.int32) * block)[:, None]
    gi = (bi + base).reshape(lead + (-1,))               # global cell ids
    mv = bv.reshape(lead + (-1,))
    neg_sorted, idx_sorted = lax.sort((-mv, gi), dimension=-1,
                                      is_stable=True, num_keys=1)
    return -neg_sorted[..., :k], idx_sorted[..., :k]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--check', action='store_true')
    ap.add_argument('--time', action='store_true')
    ap.add_argument('--batch', type=int, default=4)
    ap.add_argument('--cells', type=int, default=14651)  # 91*161
    ap.add_argument('--k', type=int, default=128)
    ap.add_argument('--blocks', type=str, default='512,1024,2048,4096')
    ap.add_argument('--iters', type=int, default=30)
    args = ap.parse_args()

    import jax
    if args.check:
        jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    import jax.numpy as jnp
    from jax import lax
    import numpy as np

    shape = (args.batch, 17, args.cells)
    key = jax.random.PRNGKey(0)
    # Tie-heavy: quantize to 64 levels, mask ~97% to the -1 sentinel like
    # the real masked score volume.
    u = jax.random.uniform(key, shape)
    q = jnp.floor(u * 64) / 64
    keep = jax.random.uniform(jax.random.split(key)[0], shape) < 0.03
    flat = jnp.where(keep, q, -1.0).astype(jnp.float32)

    ref_fn = jax.jit(lambda x: lax.top_k(x, args.k))

    if args.check:
        rv, ri = jax.block_until_ready(ref_fn(flat))
        for block in [int(b) for b in args.blocks.split(',')]:
            bv, bi = jax.block_until_ready(
                jax.jit(lambda x, b=block: blockwise_topk(x, args.k, b))(flat))
            ok_v = bool(jnp.all(rv == bv))
            ok_i = bool(jnp.all(ri == bi))
            print(f'block={block}: values {"OK" if ok_v else "MISMATCH"}, '
                  f'indices {"OK" if ok_i else "MISMATCH"}')
            assert ok_v and ok_i
        # Dense (no mask) variant too — worst-case tie pressure.
        dense = q.astype(jnp.float32)
        rv, ri = jax.block_until_ready(ref_fn(dense))
        for block in [int(b) for b in args.blocks.split(',')]:
            bv, bi = jax.block_until_ready(
                jax.jit(lambda x, b=block: blockwise_topk(x, args.k, b))(dense))
            assert bool(jnp.all(rv == bv)) and bool(jnp.all(ri == bi)), block
        print('dense tie-heavy: all blocks OK')
        return

    if args.time:
        def bench(fn, x):
            fn_j = jax.jit(fn)
            out = jax.block_until_ready(fn_j(x))
            best = float('inf')
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = fn_j(x)
                np.asarray(out[0]).ravel()[0]
                best = min(best, (time.perf_counter() - t0) / args.iters)
            return best * 1e3

        t_ref = bench(lambda x: lax.top_k(x, args.k), flat)
        print(f'lax.top_k {shape}: {t_ref:.3f} ms')
        for block in [int(b) for b in args.blocks.split(',')]:
            t = bench(lambda x, b=block: blockwise_topk(x, args.k, b), flat)
            print(f'blockwise block={block}: {t:.3f} ms '
                  f'({t_ref / t:.2f}x)')


if __name__ == '__main__':
    main()
