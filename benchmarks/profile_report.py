"""Headless analysis of a jax.profiler trace (xplane.pb -> op tables).

Companion to benchmarks/profile_step.py: aggregates device time by HLO
category and prints the top self-time ops, so kernel A/Bs can be attributed
without a TensorBoard UI. Uses the xprof pip package's converter (the same
backend `xprof --logdir` serves).

Usage:
  python benchmarks/profile_report.py [--logdir /tmp/aero_profile]
      [--tool hlo_stats] [--top 40] [--csv out.csv]
      [--group REGEX]   # extra aggregation bucket, e.g. 'fused_kernel'
"""

import argparse
import glob
import gzip
import io
import json
import os
import sys
from collections import defaultdict


def find_xplane(logdir: str) -> str:
    pats = [os.path.join(logdir, "**", "*.xplane.pb")]
    hits = []
    for p in pats:
        hits.extend(glob.glob(p, recursive=True))
    if not hits:
        raise SystemExit(f"no *.xplane.pb under {logdir}")
    return max(hits, key=os.path.getmtime)


def load_tool(xplane: str, tool: str):
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data([xplane], tool, {})
    if isinstance(data, bytes):
        try:
            data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
        except OSError:
            pass
        data = data.decode("utf-8", errors="replace")
    return data


def parse_gviz(data: str):
    """hlo_stats ships as a gviz DataTable JSON; return (cols, rows)."""
    tbl = json.loads(data)
    cols = [c.get("label") or c.get("id") for c in tbl["cols"]]
    rows = [[(c or {}).get("v") for c in r["c"]] for r in tbl["rows"]]
    return cols, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/aero_profile")
    ap.add_argument("--tool", default="hlo_stats")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--csv", default=None)
    ap.add_argument("--group", action="append", default=[],
                    help="regex; ops matching it are also summed as a bucket")
    args = ap.parse_args()

    xplane = find_xplane(args.logdir)
    print(f"# trace: {xplane}", file=sys.stderr)

    from xprof.convert import raw_to_tool_data
    tools = raw_to_tool_data.xspace_to_tool_names([xplane])
    print(f"# available tools: {tools}", file=sys.stderr)

    data = load_tool(xplane, args.tool)
    if args.csv:
        with open(args.csv, "w") as f:
            f.write(data if isinstance(data, str) else str(data))
        print(f"# raw tool output -> {args.csv}", file=sys.stderr)

    try:
        cols, rows = parse_gviz(data)
    except Exception:
        # not gviz JSON: just dump the head
        print(str(data)[:4000])
        return
    idx = {c: i for i, c in enumerate(cols)}

    def col(row, *names, default=None):
        for n in names:
            if n in idx:
                return row[idx[n]]
        return default

    # normalize: every hlo_stats variant carries name/category/self-time
    entries = []
    for r in rows:
        entries.append({
            "name": str(col(r, "HLO op name", "hlo_op_name", "name", "HloOpName", default="?")),
            "category": str(col(r, "HLO op category", "hlo_category", "category", default="?")),
            "program": str(col(r, "program_id", "Program id", default="")),
            "occ": col(r, "#Occurrences", "occurrences", default=0) or 0,
            "self_us": float(col(r, "Total self time (us)", "total_self_time_us",
                                 "self_time_us", default=0) or 0),
            "flop_rate": col(r, "Normalized FLOP rate (GFLOPs/s)", default=None),
            "bw": col(r, "memory BW (GiB/s)", "Memory BW (GiB/s)", default=None),
        })
    total = sum(e["self_us"] for e in entries)
    print(f"total device self time: {total/1e3:.3f} ms over {len(entries)} ops")

    by_cat = defaultdict(float)
    for e in entries:
        by_cat[e["category"]] += e["self_us"]
    print("\n== by HLO category ==")
    for cat, us in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{us/1e3:10.3f} ms  {100*us/max(total,1e-9):5.1f}%  {cat}")

    if args.group:
        import re
        print("\n== custom groups ==")
        for pat in args.group:
            rx = re.compile(pat)
            us = sum(e["self_us"] for e in entries if rx.search(e["name"]))
            print(f"{us/1e3:10.3f} ms  {100*us/max(total,1e-9):5.1f}%  /{pat}/")

    print(f"\n== top {args.top} ops by self time ==")
    for e in sorted(entries, key=lambda e: -e["self_us"])[:args.top]:
        extra = ""
        if e["flop_rate"]:
            extra += f" gflops={e['flop_rate']}"
        if e["bw"]:
            extra += f" bw={e['bw']}"
        print(f"{e['self_us']/1e3:10.3f} ms  x{e['occ']:<5} {e['category'][:18]:18} "
              f"{e['name'][:90]}{extra}")


if __name__ == "__main__":
    main()
