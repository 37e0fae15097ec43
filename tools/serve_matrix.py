"""One controlled serving benchmark matrix (round-4 VERDICT item 5).

Round 4 left three serving measurements that could not be compared to each
other: SERVE_BENCH.json (live int8, tiers, post-backlog-fix), SERVE_BENCH_NOTIERS
(live int8, earlier host state), and SERVE_BENCH_ARTIFACT (pre-backlog-fix, one
baked batch shape, different host contention). This driver produces ONE
like-for-like table: every cell runs back-to-back in the same host state, as a
fresh subprocess of tools/serve_bench.py (fresh TPU client per cell, no memory
or compile-cache bleed between paths):

    {live bf16, live int8-PTQ, artifact} x {tiers on, tiers off} x c in {1,8,32}

"tiers on" = compiled batch shapes {1,4,16} with dispatch at the smallest tier
that fits the drained queue; "tiers off" = one compiled shape (16), every
request padded to it. The artifact rows serve tools/export.py --fused blobs
through DetectorService.from_artifact: the multi-tier row uses a --tiers 1,4,16
bundle (round-5 capability), the no-tiers row a single batch-16 blob. Artifacts
are exported by this driver with the SAME weights and NMS knobs as the live
rows, so the live-vs-artifact gap measures the serving path, not the model.

Usage:
  python tools/serve_matrix.py config/parity_mid.yml --weights w.msgpack \
      --out SERVE_BENCH_V2.json
"""

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def run(cmd):
    print("+ " + " ".join(cmd), flush=True)
    t0 = time.time()
    r = subprocess.run(cmd, cwd=_REPO, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-4000:], file=sys.stderr)
        print(r.stderr[-4000:], file=sys.stderr)
        raise RuntimeError(f"cell failed ({time.time() - t0:.0f}s): {' '.join(cmd)}")
    print(f"  done in {time.time() - t0:.0f}s", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", type=str)
    p.add_argument("--weights", type=str, required=True)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--concurrency", type=str, default="1,8,32")
    p.add_argument("--requests", type=int, default=128)
    p.add_argument("--score-thresh", type=float, default=0.3)
    p.add_argument("--workdir", type=str, default="/tmp/serve_matrix")
    p.add_argument("--out", type=str, default="SERVE_BENCH_V2.json")
    args = p.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    py = sys.executable
    common = ["--concurrency", args.concurrency, "--requests", str(args.requests),
              "--batch-size", str(args.batch_size),
              "--score-thresh", str(args.score_thresh)]
    tiers_on = ["--batch-tiers", "1,4"]       # + batch_size = shapes {1,4,16}
    tiers_off = ["--batch-tiers", ""]          # one shape: batch_size

    # ---- artifacts, same weights/knobs as the live rows
    bundle = os.path.join(args.workdir, "detector_tiers.bundle")
    single = os.path.join(args.workdir, "detector_b16.stablehlo")
    exp = [py, "tools/export.py", args.config, "--weights", args.weights,
           "--fused", "--score-thresh", str(args.score_thresh)]
    if not os.path.exists(bundle):
        run(exp + ["--tiers", f"1,4,{args.batch_size}", "--out", bundle])
    if not os.path.exists(single):
        run(exp + ["--batch-size", str(args.batch_size), "--out", single])

    cells = {
        "live_bf16/tiers":   [args.config, "--weights", args.weights] + tiers_on,
        "live_bf16/notiers": [args.config, "--weights", args.weights] + tiers_off,
        "live_int8/tiers":   [args.config, "--weights", args.weights, "--ptq"] + tiers_on,
        "live_int8/notiers": [args.config, "--weights", args.weights, "--ptq"] + tiers_off,
        "artifact/tiers":    ["--artifact", bundle] + tiers_on,
        "artifact/notiers":  ["--artifact", single] + tiers_off,
    }

    results, t_start = {}, time.time()
    for name, cell_args in cells.items():
        out = os.path.join(args.workdir, name.replace("/", "_") + ".json")
        run([py, "tools/serve_bench.py", *cell_args, *common, "--out", out])
        with open(out) as f:
            results[name] = json.load(f)

    # ---- one table: rows = cells, cols = concurrency levels
    table = {}
    for name, res in results.items():
        table[name] = {
            f"c{lvl['concurrency']}": {
                "req_per_s": lvl["req_per_s"],
                "p50_ms": lvl["latency"]["p50_ms"],
                "p95_ms": lvl["latency"]["p95_ms"],
                "errors": lvl["errors"],
            }
            for lvl in res["levels"]
        }

    def best(name):
        return max(lvl["req_per_s"] for lvl in results[name]["levels"])

    summary = {
        "live_int8_vs_artifact_best_req_s": round(
            best("live_int8/tiers") / best("artifact/tiers"), 3),
        "tiers_single_request_p50_win_ms": {
            n.split("/")[0]: round(
                table[n]["c1"]["p50_ms"] - table[n.split("/")[0] + "/tiers"]["c1"]["p50_ms"], 1)
            for n in table if n.endswith("/notiers")
        },
        "total_errors": sum(
            lvl["errors"] for res in results.values() for lvl in res["levels"]),
    }

    doc = {
        "what": ("controlled serving benchmark matrix: every cell ran back-to-back "
                 "in the same host state as a fresh subprocess (ThreadingHTTPServer "
                 "-> BatchingFrontEnd -> DetectorService); rows differ only in the "
                 "execution path (live bf16 / live int8-PTQ / exported StableHLO "
                 "artifact) and tier policy ({1,4,16} vs single shape 16); same "
                 "weights, same NMS knobs, same client workload (640x480 JPEGs)"),
        "config": args.config,
        "weights": args.weights,
        "requests_per_level": args.requests,
        "wall_minutes": round((time.time() - t_start) / 60, 1),
        "table": table,
        "summary": summary,
        "cells_raw": {k: v["levels"] for k, v in results.items()},
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"table": table, "summary": summary}, indent=1), flush=True)


if __name__ == "__main__":
    main()
