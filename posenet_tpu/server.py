"""`posenet-serve`: a minimal production serving frontend over an AOT
artifact (posenet_tpu/serving.py).

The reference has no serving story at all — deployment means shipping
Python+torch+.pth and writing your own loop (reference
posenet/models/model_factory.py:11-23 is the whole story). The TPU-native
path pairs the compiled StableHLO artifact with this stdlib HTTP frontend:

    posenet-export --model 101 --batch_sizes 1,8 --output m101.posenet
    posenet-serve --artifact m101.posenet --port 8080
    curl -s --data-binary @photo.jpg localhost:8080/v1/decode | jq .

or, without an export step, serve the in-process fused pipeline directly
(LivePipelineBackend: pallas decode on TPU, optional --num_devices N
data-parallel mesh; artifacts remain the version-pinned fleet option):

    posenet-serve --model 101 --size 513 513 --batch_sizes 1,8

Design:
- **One worker thread owns the device.** HTTP handler threads enqueue
  (frame, reply-slot) pairs; the worker drains the queue and dispatches.
  XLA programs are not re-entrant-safe to call from many threads, and a
  single chip serializes execution anyway — a lock-free handoff queue is
  the whole scheduler.
- **Request coalescing**: the artifact carries one program per exported
  batch size. The worker groups whatever is queued into the largest
  exported batch that is <= pending count (repeatedly), and pads the
  remainder up to the smallest exported batch that covers it (padding
  rows are zero frames whose results are dropped). Under load this rides
  the big-batch program (5497 img/s at b128 vs ~35 req/s at b1 on v5e —
  batching IS the serving throughput story on TPU).
- **Host does images, device does math**: JPEG/PNG decode (cv2) + fused
  resize/BGR->RGB (native/preprocess.cpp, cv2 fallback) to the artifact's
  input resolution stay on the request thread; only
  uint8 frames cross into the worker. Coordinates are scaled back to the
  source resolution before replying, same contract as the reference's
  `keypoint_coords *= output_scale` (reference image_demo.py:50).

Endpoints:
    GET  /healthz      -> {"ok": true, "artifact": <meta>}
    GET  /statsz       -> request/error counts, batch-size histogram,
                          device time (coalescing effectiveness)
    POST /v1/decode    -> optional ?min_pose_score=&min_part_score=
                          (per-request post-filters; only stricter than
                          the artifact's baked config has effect)
                          body: JPEG/PNG bytes (or raw
                          `application/x-posenet-frame` uint8 RGB at the
                          artifact resolution, zero-copy path)
                          reply: {"poses": [{"score", "keypoints":
                          [{"part", "y", "x", "score"}]}], "source_hw"}
"""

from __future__ import annotations

import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional, Sequence, Tuple

import numpy as np

from posenet_tpu.constants import PART_NAMES

_RAW_CONTENT_TYPE = "application/x-posenet-frame"


class ServerUnavailable(RuntimeError):
    """Transient server-side refusal (shutting down / overloaded / dead
    worker) — the HTTP layer maps it to 503 so clients and load balancers
    retry instead of treating it as a caller bug."""


class _Request:
    """One enqueued frame and its reply slot."""

    __slots__ = ("frame", "scale_yx", "min_pose_score", "min_part_score",
                 "event", "result", "error")

    def __init__(self, frame: np.ndarray, scale_yx: Tuple[float, float],
                 min_pose_score: float, min_part_score: float):
        self.frame = frame
        self.scale_yx = scale_yx
        self.min_pose_score = min_pose_score
        self.min_part_score = min_part_score
        self.event = threading.Event()
        self.result = None
        self.error: Optional[str] = None


class LivePipelineBackend:
    """The in-process fused pipeline behind the same interface a
    ServingArtifact exposes (`__call__` / `input_hw` / `batch_sizes` /
    `meta`), so PoseServer can serve either. Compared to an artifact:

      + no export step — serve current weights (e.g. straight after
        `train.py`, or `--allow_random_init` smoke runs);
      + TPU keeps the pallas decode kernel (artifacts always embed the
        XLA decode — free at b1-b8, 2.8x slower at b128; PARITY.md);
      + optional multi-chip data-parallel serving: `num_devices=N` builds
        an N-device ('data',) mesh and the pipeline runs per-shard under
        shard_map (posenet_tpu/pipeline.py).
      - NOT version-pinned: an artifact is frozen StableHLO whose results
        are stable across hosts and jax upgrades (the replica-consistency
        story); a live pipeline can drift at the ulp level with the
        toolchain. Prefer artifacts for fleet deployments.
    """

    def __init__(self, model, *,
                 decode_cfg=None,
                 input_hw: Tuple[int, int] = (513, 513),
                 batch_sizes: Sequence[int] = (1, 8),
                 num_devices: Optional[int] = None):
        from posenet_tpu.config import DecodeConfig
        from posenet_tpu.pipeline import PoseNetPipeline
        from posenet_tpu.serving import _validate_input_hw

        if decode_cfg is None:
            decode_cfg = DecodeConfig(min_pose_score=0.25)
        _validate_input_hw(tuple(input_hw), model.cfg.output_stride)
        self.input_hw = tuple(int(v) for v in input_hw)
        self.batch_sizes = sorted(set(int(b) for b in batch_sizes))
        if not self.batch_sizes or self.batch_sizes[0] < 1:
            raise ValueError(f"bad batch_sizes {batch_sizes}")
        mesh = None
        if num_devices:
            import jax

            from posenet_tpu.parallel.mesh import make_mesh

            n = int(num_devices)
            if len(jax.devices()) < n:
                # make_mesh slices devices[:n] without checking — a
                # smaller host would silently serve under-sharded while
                # /healthz reported num_devices=n.
                raise ValueError(
                    f"num_devices={n} but only {len(jax.devices())} "
                    f"device(s) are available")
            bad = [b for b in self.batch_sizes if b % n]
            if bad:
                raise ValueError(
                    f"num_devices={n} must divide every served "
                    f"batch size; got {bad}")
            mesh = make_mesh(n)
        self._pipe = PoseNetPipeline(model, decode_cfg, mesh=mesh)
        self.meta = {
            "backend": "live-pipeline",
            "model_id": model.cfg.model_id,
            "output_stride": model.cfg.output_stride,
            "input_hw": list(self.input_hw),
            "batch_sizes": self.batch_sizes,
            "num_devices": int(num_devices) if num_devices else 1,
            "decode": {
                "max_pose_detections": decode_cfg.max_pose_detections,
                "score_threshold": decode_cfg.score_threshold,
                "nms_radius": decode_cfg.nms_radius,
                "min_pose_score": decode_cfg.min_pose_score,
                "max_candidates": decode_cfg.max_candidates,
            },
        }

    def __call__(self, frames: np.ndarray):
        return self._pipe(frames)


class PoseServer:
    """Serving loop: artifact + coalescing worker + HTTP frontend."""

    def __init__(self, artifact, *, min_part_score: float = 0.0,
                 batch_wait_ms: float = 2.0, queue_depth: int = 256,
                 pipeline_depth: int = 2):
        self.artifact = artifact
        self.input_hw = tuple(artifact.input_hw)
        self.batch_sizes = sorted(artifact.batch_sizes)
        self.min_part_score = float(min_part_score)
        self.batch_wait_s = batch_wait_ms / 1000.0
        # 2 = depth-1 pipelining: dispatch batch N+1 (async JAX dispatch:
        # the host builds/uploads it) before fetching batch N's results,
        # so device compute overlaps host-side coalescing + upload — the
        # win on upload-bound tunneled hosts. 1 = fully synchronous
        # (dispatch, fetch, reply, repeat). Deeper queues are deliberately
        # not offered: >2 unsynced in-flight programs degrade badly on
        # tunneled runtimes (axon queue pathology, CLAUDE.md).
        self.pipeline_depth = 2 if int(pipeline_depth) >= 2 else 1
        # Flipped false if the device worker thread dies; /healthz
        # reports it and new enqueues are refused (they could never be
        # answered).
        self.healthy = True
        # /statsz counters; worker-thread writes, reader copies (GIL-atomic
        # int/float updates, no lock needed).
        self.stats = {"requests_done": 0, "errors": 0,
                      "batches_by_size": {b: 0 for b in self.batch_sizes},
                      "device_ms_total": 0.0, "device_ms_last": 0.0}
        self._queue: "queue.Queue[_Request]" = queue.Queue(queue_depth)
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._worker_loop,
                                        name="posenet-device-worker",
                                        daemon=True)
        self._worker.start()

    # ---- device worker ----

    def _drain(self) -> List[_Request]:
        """Block for one request, then coalesce whatever else arrives
        within the batching window (bounded by the largest program)."""
        first = self._queue.get()
        if first is None:  # shutdown sentinel
            return []
        batch = [first]
        while len(batch) < self.batch_sizes[-1]:
            try:
                # batch_wait_ms=0 disables coalescing beyond what is
                # already queued; otherwise each arrival extends the
                # window by one batch_wait_s.
                nxt = (self._queue.get_nowait() if self.batch_wait_s == 0
                       else self._queue.get(timeout=self.batch_wait_s))
            except queue.Empty:
                break
            if nxt is None:
                self._stop.set()
                break
            batch.append(nxt)
        return batch

    def _drain_window(self) -> List[_Request]:
        """Bounded-wait drain used while a chunk is in flight: same
        per-arrival coalescing window as _drain, but the INITIAL get is
        bounded too — the worker must come back to fetch the in-flight
        chunk rather than block indefinitely (its callers would hang).
        The waiting overlaps device compute, so it costs nothing; a
        pure get_nowait variant measured WORSE (it dispatched b4s
        whenever only 4 requests had landed yet, losing the b8 program:
        16 clients went 11.6 -> the windowed drain's full-b8 schedule)."""
        batch: List[_Request] = []
        while len(batch) < self.batch_sizes[-1]:
            try:
                nxt = (self._queue.get_nowait() if self.batch_wait_s == 0
                       else self._queue.get(timeout=self.batch_wait_s))
            except queue.Empty:
                break
            if nxt is None:
                self._stop.set()
                break
            batch.append(nxt)
        return batch

    def _program_batch(self, n: int) -> int:
        """Smallest exported batch size that covers n pending frames."""
        for b in self.batch_sizes:
            if b >= n:
                return b
        return self.batch_sizes[-1]

    def _worker_loop(self):
        # Drain until the shutdown sentinel: requests accepted before
        # close() must still be answered (the graceful-SIGTERM contract),
        # so the loop is NOT gated on _stop — _drain returns [] only
        # after consuming the sentinel. A top-level guard bounds the
        # blast radius of any unexpected error: without it, one
        # MemoryError outside _dispatch/_finish's try would silently kill
        # the sole device worker forever while /healthz stayed green.
        #
        # Pipelining (pipeline_depth=2): at most ONE chunk is
        # dispatched-but-unfetched at any time (`inflight`). The next
        # chunk is built and dispatched BEFORE the in-flight one is
        # fetched, so its upload rides the device's compute window. Two
        # invariants keep this safe: (a) the loop NEVER blocks on the
        # queue while a chunk is in flight — its callers would hang —
        # so it drains non-blockingly and, when nothing is queued,
        # fetches the in-flight chunk instead; (b) every request is
        # reachable by the BaseException handler until answered: the
        # active chunk stays prepended to `pending` until its dispatch
        # returns, then lives in `inflight` until fetched (advisor r4).
        pending: List[_Request] = []
        inflight = None  # (handles, chunk, batch_size, t0)
        while True:
            try:
                if inflight is None:
                    pending = self._drain()
                    if not pending:
                        return
                else:
                    pending = self._drain_window()
                    if not pending:
                        self._finish_chunk(inflight)
                        inflight = None
                        if self._stop.is_set() and self._queue.empty():
                            return
                        continue
                # Largest exported batch repeatedly, remainder padded up.
                while pending:
                    b = self._program_batch(len(pending))
                    nxt = self._dispatch_chunk(pending[:b], b)
                    if inflight is not None:
                        self._finish_chunk(inflight)
                    inflight = nxt  # None if the dispatch itself failed
                    pending = pending[b:]
                    if self.pipeline_depth == 1 and inflight is not None:
                        self._finish_chunk(inflight)
                        inflight = None
                # The shutdown sentinel can be consumed INSIDE a drain's
                # coalescing window (it sets _stop and returns the batch);
                # without this gate the next _drain would block forever in
                # queue.get() — the sentinel is gone and new enqueues are
                # refused once _stop is set (advisor r4).
                if self._stop.is_set():
                    if inflight is not None:
                        self._finish_chunk(inflight)
                        inflight = None
                    if self._queue.empty():
                        return
            except BaseException as e:  # noqa: BLE001 — sole worker
                self.healthy = False
                # Only requests not yet answered: _finish_chunk may have
                # delivered results before the raise (e.g. a late
                # KeyboardInterrupt in its bookkeeping tail).
                at_risk = list(inflight[1]) + pending if inflight else pending
                unanswered = [r for r in at_risk if not r.event.is_set()]
                self.stats["errors"] += len(unanswered)
                for req in unanswered:
                    req.error = f"device worker died: {type(e).__name__}: {e}"
                    req.event.set()
                raise

    def _dispatch_chunk(self, chunk: List[_Request], batch_size: int):
        """Build + dispatch one padded batch; NO result fetch. Returns the
        in-flight record for _finish_chunk, or None (callers already
        failed) if the dispatch itself raised."""
        import time

        t0 = time.perf_counter()
        try:
            frames = np.zeros((batch_size, *self.input_hw, 3), np.uint8)
            for i, req in enumerate(chunk):
                frames[i] = req.frame
            out = self.artifact(frames)
        except Exception as e:  # propagate to every caller in the chunk
            self.stats["errors"] += len(chunk)
            for req in chunk:
                req.error = f"{type(e).__name__}: {e}"
                req.event.set()
            return None
        return (out, chunk, batch_size, t0)

    def _finish_chunk(self, inflight):
        """Fetch one dispatched chunk's results and reply to its callers.
        device_ms spans dispatch->fetch-complete, so under pipelining it
        includes host work overlapped with the NEXT chunk's dispatch."""
        import time

        out, chunk, batch_size, t0 = inflight
        try:
            # One host fetch for the whole chunk (the tunnel RTT is per
            # fetch, not per image).
            pose_scores = np.asarray(out.pose_scores)
            kp_scores = np.asarray(out.keypoint_scores)
            kp_coords = np.asarray(out.keypoint_coords)
            results = [self._poses_json(pose_scores[i], kp_scores[i],
                                        kp_coords[i], req)
                       for i, req in enumerate(chunk)]
        except Exception as e:  # propagate to every caller in the chunk
            self.stats["errors"] += len(chunk)
            for req in chunk:
                req.error = f"{type(e).__name__}: {e}"
                req.event.set()
            return
        ms = (time.perf_counter() - t0) * 1000.0
        self.stats["batches_by_size"][batch_size] += 1
        self.stats["device_ms_total"] += ms
        self.stats["device_ms_last"] = ms
        self.stats["requests_done"] += len(chunk)
        for req, result in zip(chunk, results):
            req.result = result
            req.event.set()

    def _poses_json(self, pose_scores, kp_scores, kp_coords, req: _Request):
        poses = []
        for p in range(pose_scores.shape[0]):
            # per-request thresholds are post-filters, sound because they
            # can only be stricter than the artifact's baked decode config
            if pose_scores[p] <= 0 or pose_scores[p] < req.min_pose_score:
                continue
            kps = [{"part": PART_NAMES[k],
                    "y": float(kp_coords[p, k, 0] * req.scale_yx[0]),
                    "x": float(kp_coords[p, k, 1] * req.scale_yx[1]),
                    "score": float(kp_scores[p, k])}
                   for k in range(kp_scores.shape[1])
                   if kp_scores[p, k] >= req.min_part_score]
            poses.append({"score": float(pose_scores[p]), "keypoints": kps})
        return poses

    # ---- request-thread API ----

    def decode_frame(self, frame: np.ndarray,
                     scale_yx: Tuple[float, float] = (1.0, 1.0),
                     timeout_s: float = 120.0,
                     min_pose_score: float = 0.0,
                     min_part_score: Optional[float] = None):
        """Enqueue one preprocessed (H, W, 3) uint8 RGB frame; block for
        the decoded poses. Thread-safe. Per-call thresholds post-filter
        the artifact's results (only stricter values have any effect)."""
        if frame.shape != (*self.input_hw, 3) or frame.dtype != np.uint8:
            raise ValueError(
                f"frame must be uint8 {(*self.input_hw, 3)}, got "
                f"{frame.dtype} {frame.shape}")
        if self._stop.is_set() or not self.healthy:
            raise ServerUnavailable(
                "server is shutting down" if self._stop.is_set()
                else "device worker died; server is unhealthy")
        req = _Request(frame, scale_yx, float(min_pose_score),
                       self.min_part_score if min_part_score is None
                       else float(min_part_score))
        try:
            self._queue.put(req, timeout=5.0)
        except queue.Full:
            raise ServerUnavailable(
                "request queue full (server overloaded)") from None
        if not req.event.wait(timeout_s):
            raise TimeoutError("decode timed out")
        if req.error is not None:
            raise RuntimeError(req.error)
        return req.result

    def warmup(self):
        """Compile/execute every exported batch-size program once, so no
        request ever pays a first-call compile. Called before the HTTP
        frontend binds (the worker is idle, so the direct artifact calls
        cannot race it).

        Each program is synchronized with a small HOST FETCH, not just
        dispatched: on tunneled TPU platforms a fetch is the only
        reliable execution barrier, and leaving warmup's results
        unsynced in flight deadlocked the worker thread's FIRST result
        fetch behind them (observed on axon: the worker's
        np.asarray(pose_scores) blocked forever while dispatch itself
        succeeded)."""
        for b in self.batch_sizes:
            out = self.artifact(np.zeros((b, *self.input_hw, 3), np.uint8))
            np.asarray(out.pose_scores).ravel()

    def decode_image_bytes(self, data: bytes, content_type: str = "",
                           **thresholds):
        """Decode an encoded image (JPEG/PNG) or a raw frame; returns
        (poses, source_hw). `thresholds` forwards per-request
        min_pose_score/min_part_score to decode_frame."""
        th, tw = self.input_hw
        if content_type == _RAW_CONTENT_TYPE:
            frame = np.frombuffer(data, np.uint8)
            if frame.size != th * tw * 3:
                raise ValueError(
                    f"raw frame must be {th}x{tw}x3={th * tw * 3} bytes, "
                    f"got {frame.size}")
            return (self.decode_frame(frame.reshape(th, tw, 3),
                                      **thresholds), [th, tw])
        import cv2
        bgr = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        if bgr is None:
            raise ValueError("could not decode image bytes (JPEG/PNG?)")
        sh, sw = bgr.shape[:2]
        # Fastest measured resize+BGR->RGB (native_preprocess.resize_rgb:
        # cv2 resize + cvtColor, 0.83 ms/720p frame vs 2.30 ms for the
        # old resize + ::-1 numpy copy this replaced; the native C++ lib
        # is the cv2-free fallback). Request threads spend their host
        # time here, not in the device queue.
        from posenet_tpu import native_preprocess as npp
        frame = npp.resize_rgb(bgr, (th, tw))
        poses = self.decode_frame(frame, scale_yx=(sh / th, sw / tw),
                                  **thresholds)
        return poses, [sh, sw]

    def close(self):
        self._stop.set()
        try:
            self._queue.put_nowait(None)
        except queue.Full:
            pass
        self._worker.join(timeout=10.0)


def make_http_server(pose_server: PoseServer, host: str = "127.0.0.1",
                     port: int = 0) -> ThreadingHTTPServer:
    """Bind the HTTP frontend (serve_forever is the caller's loop)."""

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                ok = pose_server.healthy
                self._reply(200 if ok else 503,
                            {"ok": ok,
                             "artifact": pose_server.artifact.meta})
            elif self.path == "/statsz":
                s = dict(pose_server.stats)
                s["batches_by_size"] = {
                    str(k): v for k, v in s["batches_by_size"].items()}
                self._reply(200, s)
            else:
                self._reply(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            from urllib.parse import parse_qsl, urlsplit

            url = urlsplit(self.path)
            if url.path != "/v1/decode":
                self._reply(404, {"error": f"no route {url.path}"})
                return
            try:
                thresholds = {}
                for key, val in parse_qsl(url.query):
                    if key not in ("min_pose_score", "min_part_score"):
                        raise ValueError(f"unknown query param '{key}'")
                    thresholds[key] = float(val)
                n = int(self.headers.get("Content-Length", 0))
                if n <= 0:
                    raise ValueError("empty body (send image bytes)")
                if n > 64 << 20:
                    raise ValueError(
                        f"body too large ({n} bytes; limit 64 MiB)")
                data = self.rfile.read(n)
                poses, source_hw = pose_server.decode_image_bytes(
                    data, self.headers.get("Content-Type", ""),
                    **thresholds)
                self._reply(200, {"poses": poses, "source_hw": source_hw})
            except ValueError as e:
                # the body may not have been consumed (e.g. oversized):
                # close instead of letting keep-alive desync on it
                self.close_connection = True
                self._reply(400, {"error": str(e)})
            except TimeoutError as e:
                # server-side stall (device hang / overload), NOT a
                # caller bug: 504 so clients and load balancers retry
                self.close_connection = True
                self._reply(504, {"error": str(e)})
            except ServerUnavailable as e:
                self.close_connection = True
                self._reply(503, {"error": str(e)})
            except Exception as e:
                self.close_connection = True
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, *a):  # quiet-by-default, like the rest
            pass

    return ThreadingHTTPServer((host, port), Handler)


def main(argv: Optional[Sequence[str]] = None):
    import argparse

    from posenet_tpu.serving import load_serving_artifact

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--artifact",
                   help="*.posenet artifact from posenet-export "
                        "(mutually exclusive with --model)")
    p.add_argument("--model", type=int, choices=(50, 75, 100, 101),
                   help="LIVE mode: serve the in-process fused pipeline "
                        "for this model id instead of an artifact (no "
                        "export step; pallas decode on TPU; see "
                        "LivePipelineBackend)")
    p.add_argument("--output_stride", type=int, default=16,
                   help="live mode: model output stride")
    p.add_argument("--size", type=int, nargs=2, default=(513, 513),
                   metavar=("H", "W"),
                   help="live mode: stride-valid input resolution")
    p.add_argument("--batch_sizes", type=str, default="1,8",
                   help="live mode: comma-separated served batch programs")
    p.add_argument("--min_pose_score", type=float, default=0.25,
                   help="live mode: decode min pose score")
    p.add_argument("--num_devices", type=int, default=None,
                   help="live mode: serve data-parallel over an N-device "
                        "mesh (N must divide every served batch size)")
    p.add_argument("--allow_random_init", action="store_true",
                   help="live mode: random weights if download fails")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--min_part_score", type=float, default=0.0)
    p.add_argument("--batch_wait_ms", type=float, default=2.0,
                   help="coalescing window after the first queued request")
    p.add_argument("--pipeline_depth", type=int, default=2, choices=(1, 2),
                   help="2 (default): dispatch the next batch before "
                        "fetching the in-flight one, overlapping device "
                        "compute with host coalescing + upload; 1: fully "
                        "synchronous batches")
    args = p.parse_args(argv)

    if bool(args.artifact) == bool(args.model):
        p.error("exactly one of --artifact or --model is required")
    if args.model:
        from posenet_tpu.config import DecodeConfig
        from posenet_tpu.models import load_model

        model = load_model(args.model, output_stride=args.output_stride,
                           allow_random_init=args.allow_random_init)
        artifact = LivePipelineBackend(
            model,
            decode_cfg=DecodeConfig(min_pose_score=args.min_pose_score),
            input_hw=tuple(args.size),
            batch_sizes=[int(b) for b in args.batch_sizes.split(",")],
            num_devices=args.num_devices)
        source = f"live model {args.model} s{args.output_stride}"
    else:
        artifact = load_serving_artifact(args.artifact)
        source = args.artifact
    pose_server = PoseServer(artifact,
                             min_part_score=args.min_part_score,
                             batch_wait_ms=args.batch_wait_ms,
                             pipeline_depth=args.pipeline_depth)
    # Warm every exported batch-size program before accepting traffic
    # (a first jax compile can take tens of seconds; measured: a cold b4
    # program cost the first coalesced batch 21 s).
    print("posenet-serve: warming programs for batches "
          f"{pose_server.batch_sizes} ...")
    pose_server.warmup()
    httpd = make_http_server(pose_server, args.host, args.port)
    print(f"posenet-serve: {args.host}:{httpd.server_address[1]} "
          f"serving={source} batches={pose_server.batch_sizes}")

    # Graceful SIGTERM (the container-orchestrator stop signal): finish
    # in-flight batches, refuse new connections, exit 0.
    import signal

    def _term(signum, frame):
        threading.Thread(target=httpd.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _term)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
        pose_server.close()


if __name__ == "__main__":
    main()
