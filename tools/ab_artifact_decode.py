"""A/B the decode path a serving artifact embeds (XLA traversal,
use_pallas=False) against the in-process pallas path, at serving batch
sizes, on the real chip.

Serving artifacts always lower the XLA decode path because Mosaic custom
calls are libtpu-version-pinned (posenet_tpu/serving.py design note).
VERDICT round-3 weak #3 asked: what does that choice COST at b1/b8/b128?
This tool answers with device-resident peaked-content decode timings
(dispatch N, one barrier, best-of-3; forward is identical in both programs
so decode-only deltas are the whole story).

Usage: timeout 580 python tools/ab_artifact_decode.py [--iters 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def peaked_heads(key, b, r, ppl=3):
    import jax
    import jax.numpy as jnp

    kys = jax.random.randint(key, (b, ppl, 17, 1, 1), 2, r - 2)
    kxs = jax.random.randint(jax.random.split(key)[0],
                             (b, ppl, 17, 1, 1), 2, r - 2)
    yy = jnp.arange(r)[None, None, None, :, None]
    xx = jnp.arange(r)[None, None, None, None, :]
    g = jnp.exp(-((yy - kys) ** 2 + (xx - kxs) ** 2) / 4.0)
    hm = jnp.transpose(jnp.max(0.9 * g, axis=1), (0, 2, 3, 1))
    flat = jax.random.uniform(key, (b, r, r, 98)) * 16 - 8
    return (hm, flat[..., :34], flat[..., 34:66], flat[..., 66:98])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=30)
    ap.add_argument('--batches', type=str, default='1,8,128')
    args = ap.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    import jax.numpy as jnp

    from posenet_tpu.config import DecodeConfig
    from posenet_tpu.decode import decode_batch

    r = 33  # 513x513 stride 16 — the flagship/serving grid
    for b in [int(x) for x in args.batches.split(',')]:
        heads = peaked_heads(jax.random.PRNGKey(3), b, r)
        jax.block_until_ready(heads[0])
        row = {'batch': b}
        for label, use_pallas in (('pallas', True), ('xla', False)):
            cfg = DecodeConfig(min_pose_score=0.25, use_pallas=use_pallas)
            t0 = time.perf_counter()
            out = decode_batch(*heads, 16, cfg)
            np.asarray(out.pose_scores).ravel()[0]  # reliable barrier on axon
            compile_s = time.perf_counter() - t0
            best = float('inf')
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = decode_batch(*heads, 16, cfg)
                np.asarray(out.pose_scores).ravel()[0]
                best = min(best, (time.perf_counter() - t0) / args.iters)
            row[label] = best * 1e3
            print(f'b{b} {label}: {best*1e3:.2f} ms/batch '
                  f'(compile+first {compile_s:.1f}s)', flush=True)
        print(f'b{b}: xla/pallas ratio {row["xla"]/row["pallas"]:.2f}x, '
              f'delta {row["xla"]-row["pallas"]:.2f} ms/batch '
              f'({(row["xla"]-row["pallas"])/b*1e3:.0f} us/img)', flush=True)


if __name__ == '__main__':
    main()
