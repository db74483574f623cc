"""Device-op profile of the bench.py headline program (fused forward +
peaked-content decode, b128 513x513 m101 s16).

Runs the exact fused_peaked program from bench.py under jax.profiler and
prints the per-op device-time table (posenet_tpu.profiling.device_time_report)
plus a coarse phase rollup keyed on op-name substrings, so "decode prep is
~2 ms" claims resolve to actual ops (transposes? top-k sort? one-hot builds?).

Usage: timeout 600 python tools/profile_fused.py [--iters 5] [--batch 128]

--model/--output_stride/--height/--width profile OTHER BASELINE configs
(e.g. config 3: --model 101 --output_stride 8 --height 721 --width 1281
--batch 4) with the same peaked-decode-content methodology.
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=513)
    ap.add_argument("--height", type=int, default=0, help="overrides --size")
    ap.add_argument("--width", type=int, default=0, help="overrides --size")
    ap.add_argument("--model", type=int, default=101)
    ap.add_argument("--output_stride", type=int, default=16)
    ap.add_argument("--top", type=int, default=60)
    ap.add_argument("--trace_dir", default="/tmp/posenet_profile_fused")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    from posenet_tpu.config import DecodeConfig, ModelConfig
    from posenet_tpu.decode import decode_batch
    from posenet_tpu.models import mobilenet_v1
    from posenet_tpu.profiling import device_time_report

    batch = args.batch
    height = args.height or args.size
    width = args.width or args.size
    stride = args.output_stride
    cfg = ModelConfig(model_id=args.model, output_stride=stride,
                      compute_dtype=jnp.bfloat16)
    decode_cfg = DecodeConfig(min_pose_score=0.25)
    params = mobilenet_v1.cast_params(
        mobilenet_v1.init_params(jax.random.PRNGKey(0), cfg),
        cfg.compute_dtype)

    frames = (jax.random.uniform(jax.random.PRNGKey(0),
                                 (batch, height, width, 3)) * 255
              ).astype(jnp.uint8)
    jax.block_until_ready(frames)

    rh = (height - 1) // stride + 1
    rw = (width - 1) // stride + 1
    key = jax.random.PRNGKey(7)
    kys = jax.random.randint(key, (batch, 3, 17, 1, 1), 2, rh - 2)
    kxs = jax.random.randint(jax.random.split(key)[0],
                             (batch, 3, 17, 1, 1), 2, rw - 2)
    yy = jnp.arange(rh)[None, None, None, :, None]
    xx = jnp.arange(rw)[None, None, None, None, :]
    g = jnp.exp(-((yy - kys) ** 2 + (xx - kxs) ** 2) / 4.0)
    peaked_hm = jnp.transpose(jnp.max(0.9 * g, axis=1), (0, 2, 3, 1))
    flat_f = jax.random.uniform(key, (batch, rh, rw, 98)) * 16 - 8
    peaked = (peaked_hm, flat_f[..., :34], flat_f[..., 34:66],
              flat_f[..., 66:98])
    jax.block_until_ready(peaked_hm)

    @functools.partial(jax.jit, static_argnames=('dcfg',))
    def fused_peaked(params, frames_u8, peaked, dcfg):
        x = frames_u8.astype(cfg.compute_dtype) * (2.0 / 255.0) - 1.0
        heads = mobilenet_v1.forward(params, x, cfg)
        tied = jax.lax.optimization_barrier(
            (heads['heatmap'], heads['offset'], heads['displacement_fwd'],
             heads['displacement_bwd'], *peaked))
        hm, off, dfwd, dbwd = tied[:4]
        p_hm, p_off, p_dfwd, p_dbwd = tied[4:]
        out = decode_batch(p_hm, p_off, p_dfwd, p_dbwd, cfg.output_stride,
                           dcfg)
        fwd_probe = (hm[0, 0, 0, 0].astype(jnp.float32)
                     + off[0, 0, 0, 0] + dfwd[0, 0, 0, 0]
                     + dbwd[0, 0, 0, 0])
        return out, fwd_probe

    def barrier(out):
        return np.asarray(out[0].pose_scores).ravel()[0]

    print("warming up (compile)...", flush=True)
    t0 = time.perf_counter()
    barrier(fused_peaked(params, frames, peaked, decode_cfg))
    print(f"warm call done in {time.perf_counter() - t0:.1f}s", flush=True)

    jax.profiler.start_trace(args.trace_dir)
    for _ in range(args.iters):
        out = fused_peaked(params, frames, peaked, decode_cfg)
    barrier(out)
    jax.profiler.stop_trace()

    report = device_time_report(args.trace_dir, top=args.top)
    print(report)
    print(f"\n(n.b. durations are summed over {args.iters} iterations)")


if __name__ == "__main__":
    main()
