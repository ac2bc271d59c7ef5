"""Large-mesh bench rows as a driver-runnable machine-readable artifact.

VERDICT r4 item 7: the driver's BENCH record is 65k-only; the 262k-1M
rows lived in builder-run BASELINE.md. This wrapper runs bench.py's
wedged-tunnel armor once per large size (skipping the XLA baseline and
the inference pass — the train number is the deliverable) and writes
BENCH_LARGE_r5.json with one row per size that produced a number inside
the budget.

Usage: python bench_large.py
Env: BENCH_LARGE_SIZES (default "262144,524288"), BENCH_LARGE_BUDGET_S
(default 2400 total), BENCH_LARGE_OUT (default BENCH_LARGE_r5.json).
Also prints one JSON summary line to stdout.
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))

# edge counts of the cached bench meshes (logged by bench.py; stored here
# so a row can be labeled even if the inner log line is lost)
KNOWN_EDGES = {262144: 977436, 524288: 1955031, 786432: 2932571,
               1048576: 3910100}


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    sizes = [int(s) for s in os.environ.get(
        "BENCH_LARGE_SIZES", "262144,524288").split(",") if s]
    budget = int(os.environ.get("BENCH_LARGE_BUDGET_S", 2400))
    out_path = os.path.join(ROOT, os.environ.get(
        "BENCH_LARGE_OUT", "BENCH_LARGE_r5.json"))
    t0 = time.monotonic()
    # merge: rows for sizes not re-run this invocation are kept, so the
    # artifact can be refreshed one size at a time (BENCH_LARGE_SIZES)
    kept = []
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                kept = [r for r in json.load(f).get("rows", [])
                        if r.get("nodes") not in sizes]
        except Exception:  # noqa: BLE001 — corrupt artifact, start fresh
            kept = []
    rows = []
    for i, n in enumerate(sizes):
        remaining = budget - (time.monotonic() - t0)
        if remaining < 300:
            log(f"budget exhausted before {n}; stopping")
            break
        per_size = int(remaining / (len(sizes) - i))
        env = dict(
            os.environ,
            BENCH_NODES=str(n),
            BENCH_SKIP_BASELINE="1",
            BENCH_SKIP_INFERENCE="1",
            BENCH_TIMEOUT_S=str(min(per_size - 120, 1200)),
            BENCH_TOTAL_BUDGET_S=str(per_size),
            BENCH_ATTEMPTS="2",
        )
        log(f"=== {n} nodes (budget {per_size}s) ===")
        t1 = time.monotonic()
        proc = subprocess.run(
            [sys.executable, "-u", os.path.join(ROOT, "bench.py")],
            env=env, capture_output=True, text=True)
        wall = time.monotonic() - t1
        sys.stderr.write(proc.stderr[-2000:] if proc.stderr else "")
        row = {"nodes": n, "edges": KNOWN_EDGES.get(n),
               "wall_s": round(wall, 1), "rc": proc.returncode}
        for line in (proc.stdout or "").splitlines():
            line = line.strip()
            if line.startswith("{") and '"metric"' in line:
                j = json.loads(line)
                row["edges_per_s"] = j["value"]
                if row["edges"]:
                    row["ms_per_step"] = round(
                        row["edges"] / j["value"] * 1e3, 1)
        rows.append(row)
        log(f"row: {row}")
        merged = sorted(kept + rows, key=lambda r: r.get("nodes") or 0)
        with open(out_path, "w") as f:  # checkpoint after every size
            json.dump({"rows": merged,
                       "note": "train edges/s per size via bench.py armor "
                               "(BENCH_SKIP_BASELINE, no inference); "
                               "ms_per_step derived from known edge "
                               "counts"}, f, indent=1)
    log(f"wrote {out_path}")
    ok = [r for r in rows if r.get("edges_per_s")]
    print(json.dumps({"metric": "large_mesh_rows", "value": len(ok),
                      "unit": "rows",
                      "rows": {str(r["nodes"]): r.get("edges_per_s")
                               for r in rows}}), flush=True)


if __name__ == "__main__":
    main()
