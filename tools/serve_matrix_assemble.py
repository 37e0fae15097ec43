"""Assemble SERVE_BENCH_V2.json from already-completed serve_matrix cell files.

tools/serve_matrix.py writes its one like-for-like table only after ALL six
cells finish; if the run is cut short (wall-clock budget, host preemption),
the completed per-cell jsons in its --workdir are still valid measurements
taken back-to-back in the same host state. This assembler builds the same
table/summary document from whatever subset exists, recording which cells are
missing instead of discarding the finished ones.

Usage:
  python tools/serve_matrix_assemble.py --workdir /tmp/serve_matrix \
      --out SERVE_BENCH_V2.json [--note "..."]
"""

import argparse
import json
import os

CELLS = [
    "live_bf16/tiers", "live_bf16/notiers",
    "live_int8/tiers", "live_int8/notiers",
    "artifact/tiers", "artifact/notiers",
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", type=str, default="/tmp/serve_matrix")
    p.add_argument("--out", type=str, default="SERVE_BENCH_V2.json")
    p.add_argument("--note", type=str, default=None)
    args = p.parse_args()

    results = {}
    missing = []
    for name in CELLS:
        path = os.path.join(args.workdir, name.replace("/", "_") + ".json")
        if os.path.exists(path):
            with open(path) as f:
                results[name] = json.load(f)
        else:
            missing.append(name)

    table = {
        name: {
            f"c{lvl['concurrency']}": {
                "req_per_s": lvl["req_per_s"],
                "p50_ms": lvl["latency"]["p50_ms"],
                "p95_ms": lvl["latency"]["p95_ms"],
                "errors": lvl["errors"],
            }
            for lvl in res["levels"]
        }
        for name, res in results.items()
    }

    def best(name):
        return max(lvl["req_per_s"] for lvl in results[name]["levels"])

    summary = {"total_errors": sum(
        lvl["errors"] for res in results.values() for lvl in res["levels"])}
    if "live_int8/tiers" in results and "artifact/tiers" in results:
        summary["live_int8_vs_artifact_best_req_s"] = round(
            best("live_int8/tiers") / best("artifact/tiers"), 3)
    summary["tiers_single_request_p50_win_ms"] = {
        base: round(table[f"{base}/notiers"]["c1"]["p50_ms"]
                    - table[f"{base}/tiers"]["c1"]["p50_ms"], 1)
        for base in ("live_bf16", "live_int8", "artifact")
        if f"{base}/tiers" in table and f"{base}/notiers" in table
        and "c1" in table.get(f"{base}/tiers", {})
        and "c1" in table.get(f"{base}/notiers", {})
    }

    doc = {
        "what": ("controlled serving benchmark matrix: every cell ran back-to-back "
                 "in the same host state as a fresh subprocess (ThreadingHTTPServer "
                 "-> BatchingFrontEnd -> DetectorService); rows differ only in the "
                 "execution path (live bf16 / live int8-PTQ / exported StableHLO "
                 "artifact) and tier policy ({1,4,16} vs single shape 16); same "
                 "weights, same NMS knobs, same client workload (640x480 JPEGs)"),
        "cells_missing": missing,
        "table": table,
        "summary": summary,
        "cells_raw": {k: v["levels"] for k, v in results.items()},
    }
    if args.note:
        doc["note"] = args.note
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"table": table, "summary": summary, "missing": missing},
                     indent=1))


if __name__ == "__main__":
    main()
