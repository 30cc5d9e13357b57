"""Throughput-regression gate over committed chipday artifacts.

``python benchmarks/regression_check.py <fresh_dir> [baseline_dir]``

Compares the fresh battery's throughput JSONs against the most recent
*committed* chipday results directory (or an explicit baseline). Exits
nonzero with a per-row report if any throughput metric dropped more than
the tolerance — so engine/kernel features added each round can't silently
cost tok/s (VERDICT r2 next-steps #9).

Checked files/metrics (missing files or rows are skipped with a note, so
partial batteries still gate what they measured):
  serving.json       tok_s_e2e    per config row
  spec_bench.json    tok_s        per config row
  decode_suite.json  tok_s        per config row
  train_bench.json   ms_per_step  per recipe row  (lower is better)
  gemm_sol.json      us           per (scheme, m, k, n) row (lower is better)
"""

import json
import os
import subprocess
import sys

TOLERANCE = 0.15  # fail on >15% throughput loss (benches use median timing)

# file -> (row key fields, metric, higher_is_better)
CHECKS = {
    "serving.json": (("config",), "tok_s_e2e", True),
    "spec_bench.json": (("config",), "tok_s", True),
    "decode_suite.json": (("config",), "tok_s", True),
    "train_bench.json": (("recipe",), "ms_per_step", False),
    "gemm_sol.json": (("scheme", "m", "k", "n"), "us", False),
    "attn_sol.json": (("kv", "T"), "us", False),
    "sam_bench.json": (("config",), "images_per_s", True),
    "diffusion.json": (("config",), "step_ms", False),
}

# a half-empty baseline must not silently gate nothing (VERDICT r4 weak #7:
# the r3 baseline dir only overlapped 2 rows and the gate "passed").
# Override with AO_REG_MIN_ROWS (unit tests use tiny synthetic batteries).
MIN_ROWS = int(os.environ.get("AO_REG_MIN_ROWS", "25"))


def load_rows(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return rows


def committed_baseline_dir(results_root, exclude):
    """Latest chipday_* dir tracked by git, excluding the fresh one."""
    try:
        out = subprocess.run(
            ["git", "ls-files", results_root], capture_output=True,
            text=True, check=True, cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))),
        ).stdout
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    dirs = sorted({
        os.path.dirname(p) for p in out.splitlines()
        if os.path.basename(os.path.dirname(p)).startswith("chipday_")
    })
    dirs = [d for d in dirs if os.path.abspath(d) != os.path.abspath(exclude)]
    return dirs[-1] if dirs else None


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    fresh = sys.argv[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if len(sys.argv) > 2:
        base = sys.argv[2]
    else:
        base = committed_baseline_dir(
            os.path.join("benchmarks", "results"), fresh)
        if base:
            base = os.path.join(repo, base)
    if not base or not os.path.isdir(base):
        print(json.dumps({"regression_check": "skipped",
                          "reason": "no committed baseline dir"}))
        return 0

    failures, compared = [], 0
    for fname, (keyf, metric, higher) in CHECKS.items():
        fb, ff = os.path.join(base, fname), os.path.join(fresh, fname)
        if not (os.path.exists(fb) and os.path.exists(ff)):
            continue
        base_rows = {
            tuple(r.get(k) for k in keyf): r[metric]
            for r in load_rows(fb) if metric in r
        }
        for r in load_rows(ff):
            if metric not in r:
                continue
            key = tuple(r.get(k) for k in keyf)
            if key not in base_rows:
                continue
            b, v = base_rows[key], r[metric]
            if not b or not v:
                continue  # zero/absent measurements can't form a ratio
            ratio = (v / b) if higher else (b / v)
            compared += 1
            if ratio < 1.0 - TOLERANCE:
                failures.append({
                    "file": fname, "row": dict(zip(keyf, key)),
                    "metric": metric, "baseline": b, "fresh": v,
                    "ratio": round(ratio, 3),
                })

    thin = compared < MIN_ROWS
    print(json.dumps({
        "regression_check": "fail" if failures or thin else "pass",
        "baseline": base, "fresh": fresh, "rows_compared": compared,
        "min_rows": MIN_ROWS, "thin_baseline": thin,
        "tolerance": TOLERANCE, "failures": failures,
    }, indent=2))
    return 1 if failures or thin else 0


if __name__ == "__main__":
    sys.exit(main())
