"""BASELINE.json benchmark suite — all five configs.

Prints one JSON line per config (see BASELINE.md):
  1. MobileNetV1-50 s16, single 513x513 image, multi-pose decode (the
     CPU-runnable benchmark.py path — runs on whatever backend is present).
  2. MobileNetV1-101 s16, batch=16 image-folder inference, decode on-device.
  3. MobileNetV1-101 s8, high-accuracy decode at 1280x720.
  4. Streaming 720p per-frame latency mode (webcam trace, batch=1).
  5. train.py fine-tune step, data-parallel across 8 chips (or as many
     devices as exist; on a single-TPU host this runs DP over 1 device and
     the 8-way layout is validated by __graft_entry__.dryrun_multichip).
  6. (extra, not in BASELINE) stride-8 1080p decode-only on the 136x241
     grid through the bit-exact pallas kernel.
  7. (extra, not in BASELINE) config 5 in mixed precision
     (--train_dtype bfloat16): frozen trunk bf16, everything else f32.

Usage: python benchmark_suite.py [--configs 1,2,3,4,5,6,7] [--iters N]
"""

import argparse
import json
import time

import numpy as np


def _barrier(x):
    return np.asarray(x).ravel()[0]


def run_inference_config(name, model_id, output_stride, height, width, batch,
                         iters, latency_mode=False):
    import jax
    import jax.numpy as jnp

    from posenet_tpu.config import DecodeConfig, ModelConfig
    from posenet_tpu.models import mobilenet_v1
    from posenet_tpu.pipeline import infer_jit

    cfg = ModelConfig(model_id=model_id, output_stride=output_stride,
                      compute_dtype=jnp.bfloat16)
    decode_cfg = DecodeConfig(min_pose_score=0.25)
    params = mobilenet_v1.cast_params(
        mobilenet_v1.init_params(jax.random.PRNGKey(0), cfg), jnp.bfloat16)
    frames = (jax.random.uniform(jax.random.PRNGKey(1),
                                 (batch, height, width, 3)) * 255
              ).astype(jnp.uint8)
    jax.block_until_ready(frames)

    out = infer_jit(params, frames, cfg, decode_cfg)
    _barrier(out.pose_scores)

    if latency_mode:
        # On a tunneled TPU the host<->device RPC round trip dominates
        # single-frame latency; report it separately so device-side latency
        # is visible (a co-located host would not pay it).
        tiny = jnp.zeros((1,), jnp.float32) + 1.0
        _barrier(tiny * 1.0)  # compile the probe OUTSIDE the timed loop
        rtts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            _barrier(tiny * 1.0)
            rtts.append((time.perf_counter() - t0) * 1000)
        rtt = float(np.percentile(rtts, 50))

        lat = []
        for _ in range(iters):
            t0 = time.perf_counter()
            _barrier(infer_jit(params, frames, cfg, decode_cfg).pose_scores)
            lat.append((time.perf_counter() - t0) * 1000)
        p50 = float(np.percentile(lat, 50))
        p99 = float(np.percentile(lat, 99))
        print(json.dumps({
            "config": name, "metric": "per-frame latency",
            "p50_ms": round(p50, 2), "p99_ms": round(p99, 2),
            "host_rtt_ms": round(rtt, 2),
            "p50_device_ms": round(max(p50 - rtt, 0.0), 2),
            "fps_at_p50": round(1000.0 / p50 * batch, 1)}))
        return

    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer_jit(params, frames, cfg, decode_cfg)
    _barrier(out.pose_scores)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "config": name, "metric": "throughput",
        "img_per_s": round(iters * batch / dt, 1),
        "ms_per_batch": round(dt / iters * 1000, 2), "batch": batch}))


def run_decode_1080p_config(iters):
    """Config 6: bit-exact on-device decode at the stride-8 1080p grid
    (1081x1921 input -> 136x241 score grid, 32.8k cells) — the regime that
    previously fell back to the non-reference-exact XLA path. Decode-only
    (synthesized peaked heads): the decode grid, not the conv forward, is
    what this regime stresses (SURVEY.md §5 long-context analog)."""
    import jax
    import jax.numpy as jnp

    from posenet_tpu.config import DecodeConfig
    from posenet_tpu.decode import decode_batch

    h, w, stride, batch = 136, 241, 8, 4
    decode_cfg = DecodeConfig(min_pose_score=0.25, score_threshold=0.3)
    key = jax.random.PRNGKey(3)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # peaked multi-person-like heads: low base + scattered peaks
    base = jax.random.uniform(k1, (batch, h, w, 17), jnp.float32, 0.0, 0.25)
    peaks = (jax.random.uniform(k2, (batch, h, w, 17)) > 0.9995).astype(
        jnp.float32) * 0.7
    heatmap = jnp.minimum(base + peaks, 0.99)
    offsets = jax.random.uniform(k3, (batch, h, w, 34), jnp.float32, -4., 4.)
    disp = jax.random.uniform(k4, (batch, h, w, 64), jnp.float32, -40., 40.)
    dfwd, dbwd = disp[..., :32], disp[..., 32:]
    jax.block_until_ready(heatmap)

    out = decode_batch(heatmap, offsets, dfwd, dbwd, stride, decode_cfg)
    _barrier(out.pose_scores)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = decode_batch(heatmap, offsets, dfwd, dbwd, stride, decode_cfg)
    _barrier(out.pose_scores)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "config": "6: s8 1080p decode (bit-exact kernel)",
        "metric": "decode throughput", "grid": f"{h}x{w}", "batch": batch,
        "ms_per_batch": round(dt / iters * 1000, 2),
        "img_per_s": round(iters * batch / dt, 1)}))


def run_train_config(iters, dtype='float32'):
    import jax
    import jax.numpy as jnp

    from posenet_tpu.config import ModelConfig, TrainConfig
    from posenet_tpu.models import mobilenet_v1
    from posenet_tpu.parallel import mesh as mesh_lib
    from posenet_tpu.training import train_step as ts

    n_dev = len(jax.devices())
    mesh = mesh_lib.make_mesh(n_dev)
    model_cfg = ModelConfig(model_id=101, output_stride=16,
                            compute_dtype=jnp.dtype(dtype))
    train_cfg = TrainConfig(model_id=101, batch_size=2 * n_dev,
                            compute_dtype=jnp.dtype(dtype))

    params = mobilenet_v1.init_params(jax.random.PRNGKey(0), model_cfg)
    state, tx = ts.init_train_state(params, train_cfg)
    state = mesh_lib.replicate(state, mesh)
    step_fn = ts.make_train_step(tx, model_cfg, train_cfg, mesh=mesh)

    batch = {
        'image': (jax.random.uniform(
            jax.random.PRNGKey(1), (2 * n_dev, 513, 513, 3)) * 2 - 1
        ).astype(jnp.float32),
        'keypoints': (jax.random.uniform(
            jax.random.PRNGKey(2), (2 * n_dev, 15, 17, 2)) * 32
        ).astype(jnp.float32),
    }
    batch = mesh_lib.shard_batch(batch, mesh)

    state, metrics = step_fn(state, batch)
    _barrier(metrics['loss'])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step_fn(state, batch)
    _barrier(metrics['loss'])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "config": f"5: train step DP ({dtype})", "devices": n_dev,
        "global_batch": 2 * n_dev,
        "ms_per_step": round(dt / iters * 1000, 2),
        "img_per_s": round(iters * 2 * n_dev / dt, 1)}))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    parser = argparse.ArgumentParser()
    parser.add_argument('--configs', type=str, default='1,2,3,4,5')
    parser.add_argument('--iters', type=int, default=20)
    args = parser.parse_args()
    configs = {int(c) for c in args.configs.split(',')}

    if 1 in configs:
        run_inference_config("1: m50 s16 single 513x513", 50, 16, 513, 513,
                             1, args.iters, latency_mode=True)
    if 2 in configs:
        run_inference_config("2: m101 s16 batch16 513x513", 101, 16, 513, 513,
                             16, args.iters)
    if 3 in configs:
        # 1280x720 -> stride-valid 1281x721 (reference valid_resolution rule)
        run_inference_config("3: m101 s8 720p high-accuracy", 101, 8, 721,
                             1281, batch=4, iters=max(1, args.iters // 4),
                             latency_mode=False)
    if 4 in configs:
        run_inference_config("4: 720p streaming latency", 101, 16, 721, 1281,
                             1, args.iters, latency_mode=True)
    if 5 in configs:
        run_train_config(max(1, args.iters // 4))
    if 6 in configs:
        run_decode_1080p_config(args.iters)
    if 7 in configs:
        # mixed-precision train step (--train_dtype bfloat16): frozen trunk
        # in bf16, master params / head accum / loss / Adam in f32
        run_train_config(max(1, args.iters // 4), dtype='bfloat16')


if __name__ == '__main__':
    main()
