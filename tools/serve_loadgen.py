"""Load generator for posenet-serve: N client threads posting raw frames
for T seconds; reports req/s, latency percentiles, and the server's own
/statsz (batch-size histogram = coalescing effectiveness).

Usage (server already running):
    python tools/serve_loadgen.py --base http://127.0.0.1:8080 \
        --clients 32 --seconds 20

The raw-frame content type skips JPEG work on both sides, so this measures
the serving stack itself: HTTP handoff -> coalescing queue -> device
program -> reply. On TPU, expect req/s to track the largest exported batch
program's throughput once clients >> batch (bench.py's fused number is the
ceiling).

--jpeg HxW instead posts an encoded JPEG at the given SOURCE resolution,
exercising the request-thread image path too (cv2 imdecode +
native_preprocess.resize_rgb) — the realistic client workload.
"""

import argparse
import json
import threading
import time
import urllib.request

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--base", default="http://127.0.0.1:8080")
    p.add_argument("--clients", type=int, default=32)
    p.add_argument("--seconds", type=float, default=20.0)
    p.add_argument("--timeout", type=float, default=120.0)
    p.add_argument("--jpeg", default="", metavar="HxW",
                   help="post JPEG bytes at this source resolution instead "
                        "of a raw model-resolution frame")
    args = p.parse_args()

    meta = json.loads(urllib.request.urlopen(
        args.base + "/healthz", timeout=30).read())["artifact"]
    h, w = meta["input_hw"]
    if args.jpeg:
        import cv2
        sh, sw = (int(d) for d in args.jpeg.lower().split("x"))
        src = (np.random.default_rng(0).integers(0, 255, (sh, sw, 3))
               .astype(np.uint8))
        ok, buf = cv2.imencode(".jpg", src)
        assert ok
        frame, content_type = bytes(buf.tobytes()), "image/jpeg"
    else:
        frame = (np.random.default_rng(0).integers(0, 255, (h, w, 3))
                 .astype(np.uint8).tobytes())
        content_type = "application/x-posenet-frame"
    stats0 = json.loads(urllib.request.urlopen(
        args.base + "/statsz", timeout=30).read())

    # one warm call so compile time stays out of the measurement
    req = urllib.request.Request(
        args.base + "/v1/decode", data=frame,
        headers={"Content-Type": content_type})
    urllib.request.urlopen(req, timeout=args.timeout).read()

    stop = time.perf_counter() + args.seconds
    lats, errors, lock = [], [0], threading.Lock()

    def client():
        while time.perf_counter() < stop:
            t0 = time.perf_counter()
            try:
                r = urllib.request.Request(
                    args.base + "/v1/decode", data=frame,
                    headers={"Content-Type": content_type})
                urllib.request.urlopen(r, timeout=args.timeout).read()
                dt = (time.perf_counter() - t0) * 1000
                with lock:
                    lats.append(dt)
            except Exception:
                with lock:
                    errors[0] += 1

    threads = [threading.Thread(target=client) for _ in range(args.clients)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start

    stats1 = json.loads(urllib.request.urlopen(
        args.base + "/statsz", timeout=30).read())
    hist = {k: stats1["batches_by_size"][k] - stats0["batches_by_size"][k]
            for k in stats1["batches_by_size"]}
    lats.sort()
    pct = lambda q: lats[int(q * (len(lats) - 1))] if lats else float("nan")
    print(json.dumps({
        "req_per_s": round(len(lats) / wall, 1),
        "requests": len(lats), "errors": errors[0],
        "clients": args.clients, "wall_s": round(wall, 2),
        "latency_ms": {"p50": round(pct(0.50), 1),
                       "p90": round(pct(0.90), 1),
                       "p99": round(pct(0.99), 1)},
        "batches_by_size": hist,
    }))


if __name__ == "__main__":
    main()
