"""Merge per-process PARITY stack files (benchmarks/trained_parity_bsms.py
--stacks runs) into one artifact, recomputing means and recording per-stack
seed counts (stacks may legitimately carry unequal n — the comparison is
SEM-based, not paired).

Usage: python benchmarks/merge_parity.py OUT IN1 IN2 [...]
Later inputs override earlier ones per stack when they carry MORE seeds.
"""

import json
import sys

import numpy as np


def main():
    out_path, *ins = sys.argv[1:]
    merged = {}
    for path in ins:
        with open(path) as f:
            d = json.load(f)
        for name, row in d.items():
            if name == "dataset":
                merged.setdefault("dataset", row)
                continue
            have = len(merged.get(name, {}).get(
                "test_mean_rrmse_pct_per_seed", []))
            if len(row.get("test_mean_rrmse_pct_per_seed", [])) > have:
                merged[name] = row
    seeds = {}
    for name, row in merged.items():
        if name == "dataset":
            continue
        t = np.array(row["test_mean_rrmse_pct_per_seed"])
        row["test_mean_rrmse_pct"] = float(t.mean())
        row["test_mean_rrmse_pct_sem"] = float(
            t.std(ddof=1) / np.sqrt(len(t)))
        if row.get("val_mean_rrmse_pct_per_seed"):
            row["val_mean_rrmse_pct"] = float(
                np.mean(row["val_mean_rrmse_pct_per_seed"]))
        seeds[name] = len(t)
    merged["dataset"]["seeds"] = seeds
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps({k: {"n": seeds[k],
                          "mean": round(v["test_mean_rrmse_pct"], 2),
                          "sem": round(v["test_mean_rrmse_pct_sem"], 2)}
                      for k, v in merged.items() if k != "dataset"}))


if __name__ == "__main__":
    main()
