"""Driver benchmark: img/s/chip at 513x513 (MobileNetV1-101, stride 16) with
full on-device multi-pose decode — the BASELINE.json headline metric.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against the reference's only published number, the
README's "200-300 fps" forward-only GPU claim (BASELINE.md) — we use its
midpoint, 250 img/s, noting our number additionally includes the decode the
reference runs on the host.
"""

import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    from posenet_tpu.config import DecodeConfig, ModelConfig
    from posenet_tpu.models import mobilenet_v1
    from posenet_tpu.pipeline import infer_jit

    batch = 128
    size = 513
    cfg = ModelConfig(model_id=101, output_stride=16,
                      compute_dtype=jnp.bfloat16)
    decode_cfg = DecodeConfig(min_pose_score=0.25)
    params = mobilenet_v1.cast_params(
        mobilenet_v1.init_params(jax.random.PRNGKey(0), cfg),
        cfg.compute_dtype)

    # Generate frames on device: a host->device upload of 100MB uint8 over
    # a tunneled connection can dominate the run.
    frames = (jax.random.uniform(jax.random.PRNGKey(0),
                                 (batch, size, size, 3)) * 255).astype(jnp.uint8)
    jax.block_until_ready(frames)

    def barrier(out):
        # Force a host round-trip on a tiny output: the only reliable
        # execution barrier on the tunneled axon platform, where
        # block_until_ready can return before the computation finishes.
        return np.asarray(out.pose_scores).ravel()[0]

    # Warm up / compile.
    barrier(infer_jit(params, frames, cfg, decode_cfg))

    # Measure steady state: dispatch n_iters batches, one barrier at the
    # end — the tunnel round-trip amortizes to <1 ms/batch over 40 iters.
    n_iters = 40
    start = time.perf_counter()
    for _ in range(n_iters):
        out = infer_jit(params, frames, cfg, decode_cfg)
    barrier(out)
    elapsed = time.perf_counter() - start

    imgs_per_s = n_iters * batch / elapsed

    # p50 per-batch latency (single dispatch + barrier; includes tunnel RTT).
    lat = []
    for _ in range(10):
        t0 = time.perf_counter()
        barrier(infer_jit(params, frames, cfg, decode_cfg))
        lat.append((time.perf_counter() - t0) * 1000)
    p50_ms = float(np.percentile(lat, 50))

    baseline = 250.0  # reference README.md:12 midpoint (forward-only, GPU)
    print(json.dumps({
        "metric": "img/s/chip 513x513 m101 s16 fused forward+decode (batch=128, bf16)",
        "value": round(imgs_per_s, 1),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_s / baseline, 2),
        "extra": {"p50_batch_ms": round(p50_ms, 2), "batch": batch},
    }))


if __name__ == "__main__":
    main()
