#!/usr/bin/env python3
"""Build BASELINE_QUERIES.json from a full bench mirror (BENCH_LATEST.json):
per-query min-of-passes reference + environment stamp, so any later run in
the SAME environment can mechanically flag per-query regressions (e.g.
>2x the recorded time). Dev-loop tool (driver-side python).

Usage: python3 tools/make_baseline.py [bench_json] [out_json]
"""
import json
import platform
import subprocess
import sys

bench_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_LATEST.json"
out_path = sys.argv[2] if len(sys.argv) > 2 else "BASELINE_QUERIES.json"

bench = json.load(open(bench_path))
assert "only" not in bench, "scoped dev artifact; need a full run"
assert bench.get("n_failed", 1) == 0, f"bench had failures: {bench.get('failed')}"

commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                        capture_output=True, text=True).stdout.strip()
date = subprocess.run(["git", "log", "-1", "--format=%cI"],
                      capture_output=True, text=True).stdout.strip()

out = {
    "protocol": {"runs": bench["runs"], "agg": bench["agg"],
                 "unit": bench["unit"], "sf": bench["sf"]},
    "environment": {"commit": commit, "commit_date": date,
                    "spark_master_cpus": 32,
                    "platform": platform.platform(),
                    "note": ("this container benches ~25% hotter than the "
                             "driver's; compare within one environment")},
    "total": bench["value"],
    "memo_fed": bench.get("memo_fed", []),
    "queries": bench["queries"],
}
json.dump(out, open(out_path, "w"), indent=1, sort_keys=True)
print(f"wrote {out_path}: {len(out['queries'])} queries, total {out['total']:.1f}s")
