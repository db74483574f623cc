"""Driver benchmark: img/s/chip at 513x513 (MobileNetV1-101, stride 16) with
full on-device multi-pose decode — the BASELINE.json headline metric.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against the reference's only published number, the
README's "200-300 fps" forward-only GPU claim (BASELINE.md) — we use its
midpoint, 250 img/s, noting our number additionally includes the decode the
reference runs on the host.

HEADLINE HONESTY (round-3 change): the greedy decode is data-dependent —
near-flat heatmaps (what random weights produce from noise frames) let the
accept loop exit almost immediately, flattering throughput by ~10%. The
headline is therefore measured on PEAKED multi-person heatmaps (3 gaussian
people per frame): the backbone forward runs on real frames and the decode
consumes synthesized peaked heads, with jax.lax.optimization_barrier tying
the decode inputs to the forward outputs so XLA schedules them serially in
ONE program exactly like the production fused path (decode cannot start
before the forward finishes). The old flat-content number is kept as an
extra.
"""

import functools
import json
import os
import subprocess
import sys
import time

import numpy as np

# Self-calibrating stall guard (see _stall_guard_retry): best healthy
# headline ever measured on this host, used to spot tunnel-stall episodes.
_BEST_SIDECAR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".bench_best.json")
# Below this fraction of the recorded best, a run is treated as a suspected
# axon tunnel stall (observed 2026-08-19: 259 img/s vs a healthy 5945 —
# 23x — from intermittent dispatch stalls; chip-state variance is only a
# few percent, so 0.5 cleanly separates the two).
_STALL_FRACTION = 0.5
# Known-healthy floor for THIS benchmark config (m101 513x513 b128 fused):
# every healthy measurement across rounds 1-4 exceeded 5000 img/s, and a
# stalled tunnel measures in the hundreds. Seeds the guard on a fresh host
# (no sidecar yet) so a first run during a stall episode is still flagged
# instead of being recorded as the healthy best (advisor r4), and gates
# sidecar writes so a stalled value can never become the baseline.
_HEALTHY_FLOOR = 2000.0


def _probe_backend(timeout_s: float = 240.0):
    """Fail fast if the TPU tunnel is down OR degraded.

    On the axon platform a dead tunnel makes backend init hang ~20 min
    before raising UNAVAILABLE; a DEGRADED tunnel passes init (devices
    list fine) but hangs individual dispatches (both modes observed live,
    CLAUDE.md). So the probe must dispatch + host-fetch a tiny program,
    not just enumerate devices. It runs in a throwaway subprocess under a
    timeout so a sick tunnel costs minutes, not the driver's patience,
    and exits before the main process touches the backend, so the chip is
    never held twice. The probe matmul hits the persistent compile cache
    after its first-ever run."""
    probe_src = (
        "import jax; jax.config.update('jax_compilation_cache_dir', "
        "'/root/.jax_cache'); import jax.numpy as jnp, numpy as np; "
        "x = jnp.ones((128, 128), jnp.bfloat16); "
        "v = np.asarray(x @ x).ravel()[0]; assert v == 128.0, v")
    try:
        subprocess.run(
            [sys.executable, "-c", probe_src],
            timeout=timeout_s, check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    except subprocess.TimeoutExpired:
        print(f"bench.py: backend probe hung >{timeout_s:.0f}s — the TPU "
              "tunnel is down; aborting instead of hanging",
              file=sys.stderr)
        sys.exit(2)
    except subprocess.CalledProcessError as e:
        print(f"bench.py: backend probe failed (exit {e.returncode}); "
              "aborting", file=sys.stderr)
        sys.exit(2)


def _read_best(path=_BEST_SIDECAR):
    try:
        with open(path) as fh:
            return float(json.load(fh)["img_per_s"])
    except (OSError, ValueError, KeyError, TypeError):
        return None


def _write_best(v, path=_BEST_SIDECAR):
    try:
        with open(path, "w") as fh:
            json.dump({"img_per_s": round(v, 1)}, fh)
    except OSError:
        pass


def stall_guard_retry(measure, sidecar=_BEST_SIDECAR, sleep=time.sleep,
                      max_retries=2):
    """Re-measure through axon tunnel-stall episodes.

    The tunnel intermittently stalls dispatches for minutes at a time
    (CLAUDE.md 2026-08-19: a healthy 5945 img/s program measured 259 —
    every best-of-3 window equally slow, so min-taking cannot save the
    number). Guard: compare against the best healthy headline this host
    ever recorded (sidecar, updated on every non-degraded run); a result
    below _STALL_FRACTION of it is re-measured up to `max_retries` times
    after 30 s cool-downs, keeping the max. Throughput is a max-statistic,
    so retries only improve accuracy; a genuine code regression is still
    reported (flagged `suspected_tunnel_stall`) after ~2.5 min of extra
    wall — never hidden. Returns (value, degraded).

    No-sidecar runs are seeded from _HEALTHY_FLOOR so a FIRST run on a
    host during a stall episode is flagged rather than recorded as the
    healthy best; the sidecar is only written by a run that needed no
    retries AND clears the floor (advisor r4)."""
    best_known = _read_best(sidecar)
    reference = max(best_known or 0.0, _HEALTHY_FLOOR)
    value = measure()
    retries = 0
    while value < _STALL_FRACTION * reference and retries < max_retries:
        print(f"bench.py: {value:.0f} img/s is <{_STALL_FRACTION:.0%} of "
              f"the known-healthy reference ({reference:.0f}); suspected "
              "tunnel stall — cooling down 30 s and re-measuring",
              file=sys.stderr)
        sleep(30)
        value = max(value, measure())
        retries += 1
    degraded = value < _STALL_FRACTION * reference
    if (retries == 0 and value >= _HEALTHY_FLOOR
            and (best_known is None or value > best_known)):
        _write_best(value, sidecar)
    return value, degraded


def main():
    _probe_backend()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    from posenet_tpu.config import DecodeConfig, ModelConfig
    from posenet_tpu.decode import decode_batch
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

    # Peaked multi-person heads (3 gaussian-blob people x 17 keypoints per
    # frame, generated on device) — realistic decode load.
    r = (size - 1) // 16 + 1
    key = jax.random.PRNGKey(7)
    kys = jax.random.randint(key, (batch, 3, 17, 1, 1), 2, r - 2)
    kxs = jax.random.randint(jax.random.split(key)[0],
                             (batch, 3, 17, 1, 1), 2, r - 2)
    yy = jnp.arange(r)[None, None, None, :, None]
    xx = jnp.arange(r)[None, None, None, None, :]
    g = jnp.exp(-((yy - kys) ** 2 + (xx - kxs) ** 2) / 4.0)   # (B,3,17,R,R)
    peaked_hm = jnp.transpose(jnp.max(0.9 * g, axis=1), (0, 2, 3, 1))
    flat_f = jax.random.uniform(key, (batch, r, r, 98)) * 16 - 8
    peaked = (peaked_hm, flat_f[..., :34], flat_f[..., 34:66],
              flat_f[..., 66:98])
    jax.block_until_ready(peaked_hm)

    @functools.partial(jax.jit, static_argnames=('dcfg',))
    def fused_peaked(params, frames_u8, peaked, dcfg):
        """Forward on frames + decode on peaked heads in ONE program, with
        the decode inputs barrier-tied to the forward outputs (serial
        schedule, like the production fused path)."""
        x = frames_u8.astype(cfg.compute_dtype) * (2.0 / 255.0) - 1.0
        heads = mobilenet_v1.forward(params, x, cfg)
        # ALL four head outputs go through the barrier: consuming only the
        # heatmap would let XLA narrow/DCE the offset+displacement channels
        # of the fused head conv, making the measured forward cheaper than
        # the production path.
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

    def barrier(x):
        # Force a host round-trip on a tiny output: the only reliable
        # execution barrier on the tunneled axon platform, where
        # block_until_ready can return before the computation finishes.
        return np.asarray(x).ravel()[0]

    n_iters = 40

    def best_of_3(dispatch, fetch):
        # Best-of-3 runs of an n_iters-dispatch window (CLAUDE.md timing
        # methodology): chip-state variance between sessions is a few
        # percent, and the best run is the least-perturbed measurement.
        barrier(fetch(dispatch()))  # warm/compile outside the timed window
        best = float('inf')
        for _ in range(3):
            start = time.perf_counter()
            for _ in range(n_iters):
                out = dispatch()
            barrier(fetch(out))
            best = min(best, time.perf_counter() - start)
        return n_iters * batch / best

    # ---- headline: fused forward + peaked-content decode ----
    imgs_per_s, degraded = stall_guard_retry(lambda: best_of_3(
        lambda: fused_peaked(params, frames, peaked, decode_cfg),
        lambda out: out[0].pose_scores))

    # p50 per-batch latency (single dispatch + barrier; includes tunnel RTT).
    lat = []
    for _ in range(10):
        t0 = time.perf_counter()
        barrier(fused_peaked(params, frames, peaked, decode_cfg)[0].pose_scores)
        lat.append((time.perf_counter() - t0) * 1000)
    p50_ms = float(np.percentile(lat, 50))

    # ---- extra: the old flat-content fused program (noise frames through
    # random weights -> near-flat heads -> early-exit decode) ----
    flat_imgs_per_s = best_of_3(
        lambda: infer_jit(params, frames, cfg, decode_cfg),
        lambda out: out.pose_scores)

    baseline = 250.0  # reference README.md:12 midpoint (forward-only, GPU)
    print(json.dumps({
        "metric": "img/s/chip 513x513 m101 s16 fused forward+decode, "
                  "peaked multi-person heads (batch=128, bf16)",
        "value": round(imgs_per_s, 1),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_s / baseline, 2),
        "extra": {"p50_batch_ms": round(p50_ms, 2), "batch": batch,
                  "flat_content_img_per_s": round(flat_imgs_per_s, 1),
                  **({"suspected_tunnel_stall": True} if degraded else {})},
    }))


if __name__ == "__main__":
    main()
