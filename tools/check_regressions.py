#!/usr/bin/env python3
"""Compare a full bench run (BENCH_LATEST.json) against the checked-in
per-query reference (BASELINE_QUERIES.json): flag queries slower than
RATIO x their recorded time, report new/retired keys, exit nonzero on
any flag. Dev-loop tool (driver-side python).

Remember the environment caveat baked into the baseline: ratios are
only meaningful within one environment (this container benches ~25%
hotter than the driver's), and sub-second absolute deltas are noise —
the default gate is ratio-based AND skips queries under MIN_SEC.

Usage: python3 tools/check_regressions.py [bench_json] [baseline_json] [ratio]
"""
import json
import sys

RATIO = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
MIN_SEC = 0.3  # below this, per-query timings are pure invocation noise

bench_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_LATEST.json"
base_path = sys.argv[2] if len(sys.argv) > 2 else "BASELINE_QUERIES.json"
bench = json.load(open(bench_path))
base = json.load(open(base_path))

assert "only" not in bench, "scoped dev artifact; need a full run"
got, ref = bench["queries"], base["queries"]

new = sorted(set(got) - set(ref))
gone = sorted(set(ref) - set(got))
flagged = []
for k in sorted(set(got) & set(ref)):
    if max(got[k], ref[k]) < MIN_SEC:
        continue
    if got[k] > ref[k] * RATIO:
        flagged.append((k, ref[k], got[k]))

for k, r, g in flagged:
    print(f"REGRESSION {k}: {r:.2f}s -> {g:.2f}s ({g / r:.2f}x)")
for k in new:
    print(f"new key (no reference): {k} = {got[k]:.2f}s")
for k in gone:
    print(f"reference key missing from run: {k}")
tot_r, tot_g = base["total"], bench["value"]
print(f"total: {tot_r:.1f}s -> {tot_g:.1f}s ({tot_g / tot_r:.2f}x), "
      f"{len(flagged)} flagged of {len(set(got) & set(ref))} compared "
      f"(ratio gate {RATIO}x, floor {MIN_SEC}s)")
sys.exit(1 if flagged or gone else 0)
