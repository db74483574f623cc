"""posenet-serve tests: HTTP frontend + coalescing device worker over a
tiny CPU artifact (posenet_tpu/server.py). No reference counterpart — the
reference has no serving story (SURVEY.md §2.2)."""

import json
import os
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax

from posenet_tpu.config import DecodeConfig, ModelConfig
from posenet_tpu.models import mobilenet_v1
from posenet_tpu.models.model_factory import PoseNet
from posenet_tpu.server import PoseServer, make_http_server
from posenet_tpu.serving import load_serving_artifact, save_serving_artifact

HW = (65, 65)


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    cfg = ModelConfig(model_id=50, output_stride=16)
    params = mobilenet_v1.init_params(jax.random.PRNGKey(11), cfg)
    path = str(tmp_path_factory.mktemp("srv") / "m50.posenet")
    save_serving_artifact(
        PoseNet(params, cfg), path,
        decode_cfg=DecodeConfig(min_pose_score=0.0, score_threshold=0.25),
        batch_sizes=(1, 4), input_hw=HW, platforms=("cpu",))
    return load_serving_artifact(path)


@pytest.fixture(scope="module")
def server(artifact):
    srv = PoseServer(artifact, batch_wait_ms=2.0)
    yield srv
    srv.close()


@pytest.fixture(scope="module")
def http_base(server):
    httpd = make_http_server(server, "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()
    httpd.server_close()


def _frames(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (n, *HW, 3)).astype(np.uint8)


def test_decode_frame_matches_artifact(server, artifact):
    frame = _frames(1)[0]
    poses = server.decode_frame(frame)
    out = artifact(frame[None])
    ps = np.asarray(out.pose_scores)[0]
    assert len(poses) == int((ps > 0).sum())
    if poses:
        assert poses[0]["score"] == pytest.approx(float(ps[0]), abs=1e-6)
        assert {"part", "y", "x", "score"} <= set(poses[0]["keypoints"][0])


def test_concurrent_requests_coalesce_and_match(server, artifact):
    """8 concurrent clients over exported batches {1,4}: every caller gets
    the same poses the b4/b1 programs produce for its own frame."""
    frames = _frames(8, seed=3)
    results = [None] * 8

    def call(i):
        results[i] = server.decode_frame(frames[i])

    threads = [threading.Thread(target=call, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    ref = artifact(frames[:4]), artifact(frames[4:])
    for i in range(8):
        ps = np.asarray(ref[i // 4].pose_scores)[i % 4]
        assert results[i] is not None
        assert len(results[i]) == int((ps > 0).sum()), f"client {i}"
        if results[i]:
            assert results[i][0]["score"] == pytest.approx(
                float(ps[0]), abs=1e-5)


def test_scale_yx_applied(server):
    frame = _frames(1, seed=5)[0]
    base = server.decode_frame(frame)
    scaled = server.decode_frame(frame, scale_yx=(2.0, 3.0))
    for p0, p1 in zip(base, scaled):
        for k0, k1 in zip(p0["keypoints"], p1["keypoints"]):
            assert k1["y"] == pytest.approx(2.0 * k0["y"], rel=1e-6)
            assert k1["x"] == pytest.approx(3.0 * k0["x"], rel=1e-6)


def test_decode_frame_validates_shape(server):
    with pytest.raises(ValueError, match="uint8"):
        server.decode_frame(np.zeros((3, 3, 3), np.uint8))


def test_http_healthz_and_raw_frame(http_base, server, artifact):
    with urllib.request.urlopen(http_base + "/healthz", timeout=30) as r:
        health = json.loads(r.read())
    assert health["ok"] and health["artifact"]["model_id"] == 50

    frame = _frames(1, seed=7)[0]
    req = urllib.request.Request(
        http_base + "/v1/decode", data=frame.tobytes(),
        headers={"Content-Type": "application/x-posenet-frame"})
    with urllib.request.urlopen(req, timeout=120) as r:
        body = json.loads(r.read())
    assert body["source_hw"] == list(HW)
    ps = np.asarray(artifact(frame[None]).pose_scores)[0]
    assert len(body["poses"]) == int((ps > 0).sum())


def test_http_jpeg_roundtrip_scales_to_source(http_base):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(9)
    src = rng.integers(0, 255, (130, 260, 3)).astype(np.uint8)  # 2x, 4x HW
    ok, enc = cv2.imencode(".png", src)  # png: exact pixels through codec
    assert ok
    req = urllib.request.Request(http_base + "/v1/decode",
                                 data=enc.tobytes(),
                                 headers={"Content-Type": "image/png"})
    with urllib.request.urlopen(req, timeout=120) as r:
        body = json.loads(r.read())
    assert body["source_hw"] == [130, 260]
    for pose in body["poses"]:
        for kp in pose["keypoints"]:
            assert -1 <= kp["y"] <= 131 and -1 <= kp["x"] <= 262


def test_server_over_data_parallel_artifact(tmp_path):
    """The full multi-chip serving story: a batch-sharded (4-device) DP
    artifact behind the coalescing server. 3 concurrent clients pad up to
    the b4 program; each gets the poses the artifact produces alone."""
    assert len(jax.devices()) >= 4
    cfg = ModelConfig(model_id=50, output_stride=16)
    params = mobilenet_v1.init_params(jax.random.PRNGKey(21), cfg)
    path = str(tmp_path / "dp.posenet")
    save_serving_artifact(
        PoseNet(params, cfg), path,
        decode_cfg=DecodeConfig(min_pose_score=0.0, score_threshold=0.25),
        batch_sizes=(4,), input_hw=HW, platforms=("cpu",),
        data_parallel_devices=4)
    artifact = load_serving_artifact(path)
    srv = PoseServer(artifact, batch_wait_ms=20.0)
    try:
        frames = _frames(3, seed=17)
        results = [None] * 3
        threads = [threading.Thread(
            target=lambda i=i: results.__setitem__(
                i, srv.decode_frame(frames[i]))) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        padded = np.zeros((4, *HW, 3), np.uint8)
        padded[:3] = frames
        ps = np.asarray(artifact(padded).pose_scores)
        for i in range(3):
            assert results[i] is not None, f"client {i} timed out"
            assert len(results[i]) == int((ps[i] > 0).sum())
        assert srv.stats["batches_by_size"][4] >= 1
    finally:
        srv.close()


def test_per_request_thresholds(http_base, server):
    frame = _frames(1, seed=23)[0]
    base = server.decode_frame(frame)
    if not base:
        pytest.skip("random weights produced no poses for this seed")
    # a pose-score filter above the top score drops everything
    top = base[0]["score"]
    assert server.decode_frame(frame, min_pose_score=top + 1e-3) == []
    # part-score filter strips keypoints but keeps the pose
    strict = server.decode_frame(frame, min_part_score=2.0)
    assert len(strict) == len(base)
    assert all(p["keypoints"] == [] for p in strict)
    # over HTTP via query params; unknown params are a 400
    req = urllib.request.Request(
        http_base + f"/v1/decode?min_pose_score={top + 1e-3}",
        data=frame.tobytes(),
        headers={"Content-Type": "application/x-posenet-frame"})
    body = json.loads(urllib.request.urlopen(req, timeout=120).read())
    assert body["poses"] == []
    req = urllib.request.Request(http_base + "/v1/decode?bogus=1",
                                 data=frame.tobytes())
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400


def test_statsz_counts_batches(http_base, server):
    before = json.loads(urllib.request.urlopen(
        http_base + "/statsz", timeout=30).read())
    server.decode_frame(_frames(1, seed=13)[0])
    after = json.loads(urllib.request.urlopen(
        http_base + "/statsz", timeout=30).read())
    assert after["requests_done"] == before["requests_done"] + 1
    assert after["batches_by_size"]["1"] == before["batches_by_size"]["1"] + 1
    assert after["device_ms_last"] > 0


def test_http_errors(http_base):
    # bad route
    req = urllib.request.Request(http_base + "/v1/nope", data=b"x")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 404
    # undecodable image body
    req = urllib.request.Request(http_base + "/v1/decode",
                                 data=b"not an image")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    # oversized body rejected before it is read
    req = urllib.request.Request(http_base + "/v1/decode", data=b"x",
                                 headers={"Content-Length":
                                          str(100 << 20)})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    # wrong-size raw frame
    req = urllib.request.Request(
        http_base + "/v1/decode", data=b"\0" * 17,
        headers={"Content-Type": "application/x-posenet-frame"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400


# ---- live-pipeline backend (no artifact) ----

@pytest.fixture(scope="module")
def live_model():
    cfg = ModelConfig(model_id=50, output_stride=16)
    params = mobilenet_v1.init_params(jax.random.PRNGKey(11), cfg)
    return PoseNet(params, cfg)


def test_live_backend_matches_pipeline(live_model):
    """PoseServer over LivePipelineBackend answers decode_frame with the
    same poses as calling the fused pipeline directly."""
    from posenet_tpu.pipeline import PoseNetPipeline
    from posenet_tpu.server import LivePipelineBackend

    dcfg = DecodeConfig(min_pose_score=0.0, score_threshold=0.25)
    backend = LivePipelineBackend(live_model, decode_cfg=dcfg,
                                  input_hw=HW, batch_sizes=(1, 4))
    assert backend.meta["backend"] == "live-pipeline"
    srv = PoseServer(backend, batch_wait_ms=2.0)
    try:
        frame = _frames(1, seed=3)[0]
        poses = srv.decode_frame(frame)
        out = PoseNetPipeline(live_model, dcfg)(frame[None])
        ps = np.asarray(out.pose_scores)[0]
        assert len(poses) == int((ps > 0).sum())
        if poses:
            assert poses[0]["score"] == pytest.approx(float(ps[0]), abs=1e-6)
    finally:
        srv.close()


def test_live_backend_validation(live_model):
    from posenet_tpu.server import LivePipelineBackend

    with pytest.raises(ValueError, match="stride-valid"):
        LivePipelineBackend(live_model, input_hw=(64, 64))
    with pytest.raises(ValueError, match="divide"):
        LivePipelineBackend(live_model, input_hw=HW, batch_sizes=(1, 4),
                            num_devices=4)


def test_serve_cli_requires_exactly_one_source(capsys):
    from posenet_tpu.server import main as serve_main

    with pytest.raises(SystemExit):
        serve_main([])  # neither --artifact nor --model
    with pytest.raises(SystemExit):
        serve_main(["--artifact", "x.posenet", "--model", "50"])  # both


def test_shutdown_answers_queued_requests(artifact):
    """Requests accepted before close() must still be answered (the
    graceful-shutdown contract) — the worker drains to the sentinel, it
    does not exit after the current batch."""
    import concurrent.futures

    srv = PoseServer(artifact, batch_wait_ms=50.0)
    try:
        with concurrent.futures.ThreadPoolExecutor(6) as ex:
            futs = [ex.submit(srv.decode_frame, _frames(1, seed=i)[0])
                    for i in range(6)]
            import time
            time.sleep(0.05)  # let them enqueue
            closer = ex.submit(srv.close)
            results = [f.result(timeout=120) for f in futs]
            closer.result(timeout=120)
        assert all(isinstance(r, list) for r in results)
        # and NEW enqueues after shutdown are refused with the 503 error
        from posenet_tpu.server import ServerUnavailable
        with pytest.raises(ServerUnavailable, match="shutting down"):
            srv.decode_frame(_frames(1)[0])
    finally:
        srv.close()


def test_shutdown_sentinel_consumed_mid_batch(artifact):
    """close() while the worker sits INSIDE _drain's coalescing window:
    the sentinel is consumed mid-batch (sets _stop, returns the batch) —
    the worker must still exit after answering it instead of blocking
    forever in the next queue.get() (advisor r4: the sentinel is gone
    and enqueues are refused, so nothing could ever unblock it)."""
    import concurrent.futures
    import time

    srv = PoseServer(artifact, batch_wait_ms=300.0)
    try:
        with concurrent.futures.ThreadPoolExecutor(2) as ex:
            fut = ex.submit(srv.decode_frame, _frames(1)[0], timeout_s=60.0)
            time.sleep(0.08)   # worker now coalescing inside the window
            srv.close()        # sentinel lands mid-window
            assert isinstance(fut.result(timeout=60), list)
        # the worker exited (pre-fix: alive forever, close leaked it)
        srv._worker.join(timeout=10.0)
        assert not srv._worker.is_alive()
    finally:
        srv.close()


def test_pipeline_depth_1_synchronous_matches(artifact):
    """pipeline_depth=1 restores the fully synchronous worker: a
    concurrent burst still coalesces and every caller gets its own
    frame's poses."""
    frames = _frames(8, seed=31)
    srv = PoseServer(artifact, batch_wait_ms=20.0, pipeline_depth=1)
    try:
        results = [None] * 8

        def call(i):
            results[i] = srv.decode_frame(frames[i])

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for i in range(8):
            ps = np.asarray(artifact(frames[i][None]).pose_scores)[0]
            assert results[i] is not None, f"client {i}"
            assert len(results[i]) == int((ps > 0).sum()), f"client {i}"
    finally:
        srv.close()


def test_pipelined_multi_chunk_burst(artifact):
    """Default depth-2 pipelining across MANY successive chunks (24
    requests over batches {1,4}): the worker dispatches chunk N+1 before
    fetching chunk N, and every caller must still get its own frame's
    result in order."""
    frames = _frames(24, seed=37)
    srv = PoseServer(artifact, batch_wait_ms=5.0, pipeline_depth=2)
    try:
        results = [None] * 24

        def call(i):
            results[i] = srv.decode_frame(frames[i])

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(24)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        for i in range(24):
            ps = np.asarray(artifact(frames[i][None]).pose_scores)[0]
            assert results[i] is not None, f"client {i}"
            assert len(results[i]) == int((ps > 0).sum()), f"client {i}"
        assert srv.stats["requests_done"] == 24
        assert srv.stats["errors"] == 0
    finally:
        srv.close()


def test_pipelined_dispatch_failure_recovers(artifact):
    """A backend that raises on one chunk's DISPATCH fails that chunk's
    callers with the error (not a hang) and the worker keeps serving the
    next request — dispatch failures leave nothing in flight."""

    class Flaky:
        def __init__(self, inner):
            self._inner = inner
            self.input_hw = inner.input_hw
            self.batch_sizes = inner.batch_sizes
            self.fail_next = 0

        def __call__(self, frames):
            if self.fail_next > 0:
                self.fail_next -= 1
                raise RuntimeError("injected dispatch failure")
            return self._inner(frames)

    flaky = Flaky(artifact)
    srv = PoseServer(flaky, batch_wait_ms=2.0, pipeline_depth=2)
    try:
        frame = _frames(1, seed=41)[0]
        assert isinstance(srv.decode_frame(frame), list)  # healthy first
        flaky.fail_next = 1
        with pytest.raises(RuntimeError, match="injected dispatch"):
            srv.decode_frame(frame)
        # worker survived (Exception != worker death) and serves again
        assert srv.healthy
        assert isinstance(srv.decode_frame(frame), list)
        assert srv.stats["errors"] == 1
    finally:
        srv.close()


def test_artifact_rejects_non_uint8(artifact):
    """Float frames must raise, not be silently astype-wrapped into
    garbage poses."""
    bad = np.zeros((1, *HW, 3), np.float32)
    with pytest.raises(ValueError, match="uint8"):
        artifact(bad)


def test_artifact_accepts_device_frames(artifact):
    """A device-resident jax.Array input passes through without a host
    round trip and decodes identically to the numpy path."""
    import jax.numpy as jnp

    frames = _frames(1, seed=9)
    out_np = artifact(frames)
    out_dev = artifact(jnp.asarray(frames))
    np.testing.assert_array_equal(np.asarray(out_np.pose_scores),
                                  np.asarray(out_dev.pose_scores))
    np.testing.assert_array_equal(np.asarray(out_np.keypoint_coords),
                                  np.asarray(out_dev.keypoint_coords))


def test_failed_export_leaves_no_artifact(tmp_path, monkeypatch):
    """An export that dies partway must not leave a loadable-but-broken
    zip at the output path (meta listing programs the archive lacks)."""
    from posenet_tpu import serving as serving_mod
    from posenet_tpu.config import DecodeConfig as DC
    from posenet_tpu.serving import save_serving_artifact

    cfg = ModelConfig(model_id=50, output_stride=16)
    params = mobilenet_v1.init_params(jax.random.PRNGKey(2), cfg)
    path = str(tmp_path / "broken.posenet")

    def boom(*a, **kw):  # dies AFTER meta.json is in the zip
        raise RuntimeError("lowering failed")

    monkeypatch.setattr(serving_mod.jax_export, "export", boom)
    with pytest.raises(RuntimeError, match="lowering failed"):
        save_serving_artifact(PoseNet(params, cfg), path,
                              decode_cfg=DC(min_pose_score=0.0),
                              batch_sizes=(1,), input_hw=HW,
                              platforms=("cpu",))
    assert not os.path.exists(path)
    assert not os.path.exists(path + ".tmp")


def test_unhealthy_server_maps_to_503(artifact):
    """A dead device worker flips healthy=False: /healthz returns 503,
    and new enqueues are refused with ServerUnavailable (mapped to 503
    by the HTTP layer) instead of blocking 120 s for a reply that can
    never come."""
    import urllib.error

    from posenet_tpu.server import ServerUnavailable

    srv = PoseServer(artifact, batch_wait_ms=2.0)
    try:
        srv.healthy = False  # what the worker's top-level guard sets
        with pytest.raises(ServerUnavailable, match="unhealthy"):
            srv.decode_frame(_frames(1)[0])
        httpd = make_http_server(srv, "127.0.0.1", 0)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            with pytest.raises(urllib.error.HTTPError) as exc:
                urllib.request.urlopen(
                    f"http://127.0.0.1:{httpd.server_address[1]}/healthz",
                    timeout=10)
            assert exc.value.code == 503
        finally:
            httpd.shutdown()
            httpd.server_close()
    finally:
        srv.close()
