"""HW verification: TPU decode (XLA path, incl. the beyond-pallas-ceiling
auto fallback at 271x481) is bit-exact vs the CPU oracle.

Two-process protocol (CPU and TPU backends cannot share one process):

    python tools/verify_tpu_exactness.py cpu   # writes /tmp/exact_big.npz
    python tools/verify_tpu_exactness.py tpu   # decodes on TPU, compares

Expected: every *_coords and *_scores array BITWISE EQUAL; *_ps (pose
scores) may differ by up to 2 ulps — the inputs to the 17-element
instance-score mean are bitwise identical (guaranteed by *_scores), but
CPU (sequential) and TPU (tree) reductions associate the sum differently
and each partial sum rounds, so the result can drift past 1 ulp; both
are valid f32 roundings of the same sum (the reference computes it in
host float64). Observed: 1 ulp on most toolchain states, 2 ulps on some
(2026-08-18 evening chip state). Guards the
`lax.optimization_barrier` index pinning in decode.py `_traverse` /
`_traverse_all_candidates` — without it, XLA:TPU fuses the float
clip(round(coord/stride)) chain into the gathers and recomputes it with
a different contraction, flipping ~0.7% of keypoints one cell off
(round-3 HW bisection; see PARITY.md).
"""
import os
import sys

import numpy as np

if len(sys.argv) != 2 or sys.argv[1] not in ('cpu', 'tpu'):
    sys.exit(f'usage: {sys.argv[0]} cpu|tpu  (run cpu first, then tpu)')
mode = sys.argv[1]
import jax

if mode == 'cpu':
    jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
import jax.numpy as jnp

if mode == 'tpu' and jax.default_backend() != 'tpu':
    # The axon TPU is tunneled and silently ABSENT in background shells;
    # without this guard the "tpu" run would compare CPU against CPU and
    # vacuously PASS.
    sys.exit(f'FAIL: tpu mode but default backend is {jax.default_backend()!r}'
             ' — run from a foreground shell with the TPU tunnel up')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from posenet_tpu.config import DecodeConfig
from posenet_tpu.decode import decode_batch


def synth(seed, H, W, B, people):
    rng = np.random.RandomState(seed)
    hm = rng.uniform(0.0, 0.2, (B, H, W, 17)).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    for b in range(B):
        for p in range(people):
            ky = rng.randint(2, H - 2, 17)
            kx = rng.randint(2, W - 2, 17)
            g = np.exp(-((yy[None] - ky[:, None, None]) ** 2
                         + (xx[None] - kx[:, None, None]) ** 2) / 4.0)
            hm[b] = np.maximum(hm[b], 0.9 * np.transpose(g, (1, 2, 0)))
    off = rng.uniform(-8, 8, (B, H, W, 34)).astype(np.float32)
    dfwd = rng.uniform(-24, 24, (B, H, W, 32)).astype(np.float32)
    dbwd = rng.uniform(-24, 24, (B, H, W, 32)).astype(np.float32)
    return hm, off, dfwd, dbwd


cases = [
    ('4kgrid', 271, 481, 1, 8, None),   # > 68MB table ceiling: auto -> XLA
    ('s91a', 91, 161, 2, 6, False),
    ('s91b', 91, 161, 2, 6, False),
]
results = {}
for i, (name, H, W, B, ppl, use_pallas) in enumerate(cases):
    heads = synth(100 + i, H, W, B, ppl)
    cfg = DecodeConfig(min_pose_score=0.02, score_threshold=0.25,
                       use_pallas=use_pallas)
    out = decode_batch(*[jnp.asarray(a) for a in heads], 8, cfg)
    results[f'{name}_coords'] = np.asarray(out.keypoint_coords)
    results[f'{name}_scores'] = np.asarray(out.keypoint_scores)
    results[f'{name}_ps'] = np.asarray(out.pose_scores)
    print(name, 'poses:', int((results[f"{name}_ps"] > 0).sum()))

if mode == 'cpu':
    np.savez('/tmp/exact_big.npz', **results)
    print('cpu written')
else:
    ref = np.load('/tmp/exact_big.npz')
    ok = True
    for k, v in results.items():
        if np.array_equal(v, ref[k]):
            print(f'{k}: EQUAL')
            continue
        d = np.abs(v - ref[k])
        # ulp size is value-dependent (5.96e-8 in [0.5,1), 1.19e-7 in
        # [1,2)); compare against the spacing at each reference value, not
        # a constant. 2 ulps: see module docstring (mean-reduction
        # association over bitwise-identical keypoint scores).
        if k.endswith('_ps') and (d <= 2 * np.spacing(np.abs(ref[k]))).all():
            ulps = float((d / np.spacing(np.abs(ref[k]))).max())
            print(f'{k}: within {ulps:.0f} ulp(s) (max {d.max():.3g}) — '
                  f'expected, see module docstring')
            if ulps > 1:
                # Soft marker: 2 ulps is within the documented bound but
                # exceeds the historically common 1-ulp state — grep-able
                # so a genuine regression on a previously-1-ulp toolchain
                # stays visible in logs without failing the run.
                print(f'{k}: NOTE drift {ulps:.0f} ulp > historical 1 ulp '
                      f'(soft marker, still PASS)')
            continue
        ok = False
        print(f'{k}: {np.count_nonzero(d)}/{d.size} differ, '
              f'max {d.max():.6g}')
    print('PASS: coords/scores bitwise equal' if ok else 'FAIL: MISMATCH')
    sys.exit(0 if ok else 1)
