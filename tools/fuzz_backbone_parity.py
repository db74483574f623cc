"""Offline deep-fuzz: randomized backbone parity vs the torch reference.

Extends the fixed matrix in tests/test_backbone.py to arbitrary
stride-valid shapes: random model_id x output_stride x (H, W), fresh
random params per case, all four head tensors compared at <=1e-4 (the
SURVEY §7.3 golden bound, f32 HIGHEST precision both sides). The dilated
asymmetric padding math is the subtlest parity surface in the model; this
sweeps it far beyond the committed shapes.

Usage:
    python tools/fuzz_backbone_parity.py --count 25
"""

import argparse
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from posenet_tpu.config import ModelConfig  # noqa: E402
from posenet_tpu.models import mobilenet_v1  # noqa: E402

import reference_oracle  # noqa: E402


def run_case(seed: int) -> str:
    rng = np.random.RandomState(seed)
    model_id = int(rng.choice([50, 75, 100, 101]))
    stride = int(rng.choice([8, 16, 32]))
    h = stride * rng.randint(2, 13) + 1
    w = stride * rng.randint(2, 13) + 1
    cfg = ModelConfig(model_id=model_id, output_stride=stride)
    params = mobilenet_v1.init_params(jax.random.PRNGKey(seed), cfg)
    x_nchw = rng.uniform(-1, 1, size=(1, 3, h, w)).astype(np.float32)

    ref = reference_oracle.reference_forward(params, x_nchw, model_id,
                                             stride)
    out = mobilenet_v1.forward(params,
                               jnp.asarray(x_nchw.transpose(0, 2, 3, 1)),
                               cfg, precision=jax.lax.Precision.HIGHEST)
    ours = (out['heatmap'], out['offset'], out['displacement_fwd'],
            out['displacement_bwd'])
    ctx = f"seed={seed} m{model_id} s{stride} {h}x{w}"
    for name, r, m in zip(('heatmap', 'offset', 'dfwd', 'dbwd'), ref, ours):
        err = float(np.abs(np.asarray(m).transpose(0, 3, 1, 2) - r).max())
        if err > 1e-4:
            return f"{name} max abs err {err:.3g} [{ctx}]"
    return ""


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--count", type=int, default=25)
    p.add_argument("--seed_base", type=int, default=550_000)
    args = p.parse_args()

    fails = 0
    for n, i in enumerate(range(args.start, args.start + args.count)):
        if n and n % 8 == 0:
            jax.clear_caches()  # fresh shapes every case; see CLAUDE.md
        msg = run_case(args.seed_base + i * 13)
        if msg:
            fails += 1
            print(f"FAIL case {i}: {msg}")
        else:
            print(f"ok case {i}", flush=True)
    print(f"done: {args.count} cases, {fails} failures")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
