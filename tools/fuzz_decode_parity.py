"""Offline deep-fuzz: randomized end-to-end decode parity vs the torch
reference (an extended-range version of tests/test_decode.py::
test_decode_fuzz_parity, for idle-time sweeps far beyond the committed
8-case budget).

Usage:
    python tools/fuzz_decode_parity.py --start 0 --count 100

Per case: synthesize multi-person heads (continuous amplitudes, so exact
score ties — the one documented argsort divergence, PARITY.md — have
measure zero), size the candidate budget from the true masked local-max
count (so the documented budget-truncation divergence cannot trigger),
run both decoders, compare pose count / scores / coords. Exits non-zero
on the first mismatch with a full repro dump.
"""

import argparse
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from posenet_tpu.constants import LOCAL_MAXIMUM_RADIUS  # noqa: E402
from posenet_tpu.decode_multi import decode_multiple_poses  # noqa: E402
from posenet_tpu.ops.nms import local_max_mask  # noqa: E402

import reference_oracle  # noqa: E402


def run_case(seed: int) -> str:
    """Returns '' on parity, else a description of the mismatch."""
    rng = np.random.RandomState(seed)
    stride = int(rng.choice([8, 16, 32]))
    r_h = int(rng.choice([5, 9, 17, 33, 65, 91]))
    r_w = int(rng.choice([5, 9, 17, 33, 65, 161]))
    n_people = rng.randint(0, 11)
    hm = rng.uniform(0, 0.45, (r_h, r_w, 17))
    yy, xx = np.mgrid[0:r_h, 0:r_w]
    for _ in range(n_people):
        ky = rng.randint(1, max(2, r_h - 1), 17)
        kx = rng.randint(1, max(2, r_w - 1), 17)
        g = np.exp(-((yy[None] - ky[:, None, None]) ** 2
                     + (xx[None] - kx[:, None, None]) ** 2) / 3.0)
        amp = rng.uniform(0.75, 1.0, 17)[None, None, :]
        hm = np.maximum(hm, amp * np.transpose(g, (1, 2, 0)))
    hm = hm.astype(np.float32)
    off = rng.uniform(-stride, stride, (r_h, r_w, 34)).astype(np.float32)
    dfw = rng.uniform(-2 * stride, 2 * stride,
                      (r_h, r_w, 32)).astype(np.float32)
    dbw = rng.uniform(-2 * stride, 2 * stride,
                      (r_h, r_w, 32)).astype(np.float32)
    kw = dict(
        max_pose_detections=int(rng.choice([1, 3, 5, 10, 15, 25])),
        score_threshold=float(rng.choice([0.1, 0.25, 0.4, 0.5, 0.7])),
        nms_radius=int(rng.choice([0, 1, 5, 20, 45, 90, 200])),
        min_pose_score=float(rng.choice([0.0, 0.15, 0.25, 0.5])),
    )
    n_local_max = int(np.asarray(local_max_mask(
        jnp.asarray(hm), kw["score_threshold"], LOCAL_MAXIMUM_RADIUS)).sum())
    budget = max(128, -(-n_local_max // 64) * 64)

    chw = lambda a: np.transpose(a, (2, 0, 1))  # noqa: E731
    ref = reference_oracle.reference_decode(
        chw(hm), chw(off), chw(dfw), chw(dbw), stride, **kw)
    ours = decode_multiple_poses(chw(hm), chw(off), chw(dfw), chw(dbw),
                                 stride, max_candidates=budget, **kw)
    ref_ps = np.asarray(ref[0])
    n_ref = int((ref_ps > 0).sum())
    n_ours = int((ours[0] > 0).sum())
    ctx = (f"seed={seed} stride={stride} grid=({r_h},{r_w}) "
           f"people={n_people} {kw} budget={budget} local_max={n_local_max}")
    if n_ours != n_ref:
        return f"pose count {n_ours} != {n_ref} [{ctx}]"
    if n_ref:
        if not np.allclose(ours[0][:n_ref], ref_ps[:n_ref], atol=1e-5):
            return (f"pose scores diverge "
                    f"(max {np.abs(ours[0][:n_ref]-ref_ps[:n_ref]).max():.3g})"
                    f" [{ctx}]")
        dks = np.abs(ours[1][:n_ref] - np.asarray(ref[1])[:n_ref]).max()
        if dks > 1e-5:
            return f"keypoint scores diverge (max {dks:.3g}) [{ctx}]"
        dc = np.abs(ours[2][:n_ref] - np.asarray(ref[2])[:n_ref]).max()
        if dc > 1e-3:
            return f"coords diverge (max {dc:.3g} px) [{ctx}]"
        do = np.abs(ours[3][:n_ref] - np.asarray(ref[3])[:n_ref]).max()
        if do > 1e-3:
            return f"pose offsets diverge (max {do:.3g}) [{ctx}]"
    return ""


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--count", type=int, default=50)
    p.add_argument("--seed_base", type=int, default=910_000)
    args = p.parse_args()

    fails = 0
    for n, i in enumerate(range(args.start, args.start + args.count)):
        # Nearly every case compiles fresh program shapes; holding hundreds
        # of XLA:CPU executables live eventually makes LLVM's JIT fail with
        # 'Cannot allocate memory' then segfault (seen at ~85 cases on the
        # dev box). Cases are independent, so drop the compiled-program
        # cache periodically and eat the recompiles.
        if n and n % 10 == 0:
            jax.clear_caches()
        msg = run_case(args.seed_base + i * 17)
        if msg:
            fails += 1
            print(f"FAIL case {i}: {msg}")
        elif i % 10 == 0:
            print(f"ok through case {i}", flush=True)
    print(f"done: {args.count} cases, {fails} failures")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
