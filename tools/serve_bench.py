"""Concurrent-client benchmark of the HTTP serving front door (tools/serve.py).

The device dispatch-loop headline (bench.py: fused int8 e2e img/s) says nothing
about what a CLIENT of the HTTP server actually sees — request decode, canvas
packing, coalescing wait, JSON encode, and the GIL all sit between the socket and
the TPU. This harness measures that path end to end: it starts the REAL server
stack in-process (tools/serve.make_server: ThreadingHTTPServer ->
BatchingFrontEnd -> DetectorService), then drives it with closed-loop client
threads posting JPEG bytes, and reports requests/sec + latency percentiles per
concurrency level, plus the gap to the device headline.

Host caveat this environment imposes: client and server share ONE vCPU, so the
client's own JPEG encode/HTTP work depresses the numbers vs a real deployment
where clients are remote. The JSON records this.

Usage:
  python tools/serve_bench.py config/fakecoco_10k.yml --weights w.msgpack \
      --ptq --batch-size 16 --concurrency 1,8,32 --requests 192 --out SERVE_BENCH.json
"""

import argparse
import http.client
import json
import logging
import os
import statistics
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _make_jpeg(h=480, w=640, seed=0) -> bytes:
    import cv2

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (h, w, 3), np.uint8)
    # a few box-ish blobs so NMS has something to chew on (all-noise images
    # produce near-zero detections and understate JSON-encode cost)
    for i in range(8):
        x, y = rng.integers(0, w - 96), rng.integers(0, h - 96)
        img[y:y + 96, x:x + 96] = rng.integers(0, 255, 3, np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    return buf.tobytes()


def _percentiles(xs):
    xs = sorted(xs)

    def pct(p):
        return xs[min(len(xs) - 1, int(round(p / 100 * (len(xs) - 1))))]

    return {"p50_ms": round(pct(50) * 1e3, 1), "p95_ms": round(pct(95) * 1e3, 1),
            "p99_ms": round(pct(99) * 1e3, 1), "mean_ms": round(statistics.mean(xs) * 1e3, 1)}


def run_level(host, port, payloads, concurrency, total_requests):
    """Closed-loop: `concurrency` threads, each with a persistent connection,
    posting until the shared budget is drained. Returns (req/s, latency stats)."""
    lock = threading.Lock()
    remaining = [total_requests]
    latencies = []
    errors = [0]
    det_counts = []

    def worker(wid):
        conn = http.client.HTTPConnection(host, port, timeout=120)
        i = wid
        while True:
            with lock:
                if remaining[0] <= 0:
                    break
                remaining[0] -= 1
            body = payloads[i % len(payloads)]
            i += concurrency
            t0 = time.perf_counter()
            try:
                conn.request("POST", "/detect", body=body,
                             headers={"Content-Type": "application/octet-stream"})
                resp = conn.getresponse()
                data = resp.read()
                dt = time.perf_counter() - t0
                if resp.status != 200:
                    with lock:
                        errors[0] += 1
                    continue
                n_det = len(json.loads(data)["detections"])
            except Exception:
                with lock:
                    errors[0] += 1
                conn = http.client.HTTPConnection(host, port, timeout=120)
                continue
            with lock:
                latencies.append(dt)
                det_counts.append(n_det)
        conn.close()

    threads = [threading.Thread(target=worker, args=(k,)) for k in range(concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    done = len(latencies)
    return {
        "concurrency": concurrency,
        "requests": done,
        "errors": errors[0],
        "wall_s": round(wall, 2),
        "req_per_s": round(done / wall, 1),
        "latency": _percentiles(latencies) if latencies else None,
        "mean_detections_per_image": round(float(np.mean(det_counts)), 1) if det_counts else 0,
    }


def main():
    logging.basicConfig(level=logging.WARNING)
    p = argparse.ArgumentParser(description="HTTP serving benchmark")
    p.add_argument("config", type=str, nargs="?", default=None)
    p.add_argument("--weights", type=str, default=None)
    p.add_argument("--artifact", type=str, default=None)
    p.add_argument("--names", type=str, default="coco", choices=["coco", "none"])
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--batch-tiers", type=str, default="1,4",
                   help="extra compiled batch sizes below --batch-size (see tools/serve.py)")
    p.add_argument("--max-wait-ms", type=float, default=4.0)
    p.add_argument("--score-thresh", type=float, default=0.3)
    p.add_argument("--iou-thresh", type=float, default=0.45)
    p.add_argument("--ptq", action="store_true")
    p.add_argument("--ptq-heads", action="store_true")
    p.add_argument("--concurrency", type=str, default="1,8,32")
    p.add_argument("--requests", type=int, default=192,
                   help="requests per concurrency level")
    p.add_argument("--device-headline-img-s", type=float, default=None,
                   help="device dispatch-loop img/s to quantify the HTTP gap against")
    p.add_argument("--out", type=str, default="SERVE_BENCH.json")
    args = p.parse_args()

    from tools.serve import build_artifact_service, build_service, make_server

    if args.artifact:
        service, info = build_artifact_service(args)
    elif args.config:
        service, info = build_service(args)
    else:
        p.error("either a config YAML or --artifact is required")

    # compile + warm every batch tier before measuring
    service.warm()
    server = make_server(service, info, "127.0.0.1", 0, max_wait_ms=args.max_wait_ms)
    host, port = server.server_address
    srv_thread = threading.Thread(target=server.serve_forever, daemon=True)
    srv_thread.start()

    payloads = [_make_jpeg(seed=s) for s in range(8)]
    # one warm request through the full HTTP path
    warm = run_level(host, port, payloads, 1, 4)
    print(f"warmup: {warm}", flush=True)

    levels = []
    for c in [int(x) for x in args.concurrency.split(",")]:
        lvl = run_level(host, port, payloads, c, args.requests)
        print(json.dumps(lvl), flush=True)
        levels.append(lvl)

    server.shutdown()
    server.frontend.close()

    best = max(lvl["req_per_s"] for lvl in levels)
    result = {
        "what": ("closed-loop concurrent-client benchmark of the HTTP serving path "
                 "(ThreadingHTTPServer -> BatchingFrontEnd request coalescing -> "
                 "DetectorService fused XLA program); client threads and server share "
                 "this host's single vCPU, so req/s here is a LOWER bound vs remote "
                 "clients — the client's own JPEG/HTTP work is inside the measurement"),
        "server": {**info, "batch_size": args.batch_size,
                   "batch_tiers": sorted(getattr(service, "_tiers", [args.batch_size])),
                   "max_wait_ms": args.max_wait_ms,
                   "score_thresh": args.score_thresh},
        "image": "640x480 JPEG (~host decode + on-device resize per request)",
        "levels": levels,
        "best_req_per_s": best,
    }
    if args.device_headline_img_s:
        result["device_headline_img_s"] = args.device_headline_img_s
        result["http_fraction_of_device_headline"] = round(
            best / args.device_headline_img_s, 3)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
