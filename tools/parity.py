#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables, compare against the Spark parquet
dumps produced by graft.Verify. Dev-loop tool only (driver-side python).

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.sql(sql).df()
            got = pd.read_parquet(f"{out_dir}/{name}")
            w, g = canon(want), canon(got)
            if list(w.columns) != list(g.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
                continue
            if len(w) != len(g):
                print(f"FAIL {name}: rows {len(g)} != {len(w)}")
                continue
            # The driver hashes typed values: a DuckDB HUGEINT surfacing as
            # float64 vs Spark int64 hash-mismatches even when values are
            # equal (round-1 seq_pack). Mirror that sensitivity here.
            dtype_diff = [c for c in w.columns
                          if w[c].dtype.kind != g[c].dtype.kind]
            if dtype_diff:
                print(f"FAIL {name}: dtype mismatch "
                      f"{[(c, str(w[c].dtype), str(g[c].dtype)) for c in dtype_diff]}")
                continue
            diff_cols = []
            for c in w.columns:
                wc, gc = w[c], g[c]
                try:
                    same = (wc.isna() == gc.isna()).all() and \
                        (wc.fillna(0) == gc.fillna(0)).all()
                except Exception:
                    same = wc.astype(str).equals(gc.astype(str))
                if not same:
                    diff_cols.append(c)
            if diff_cols:
                print(f"FAIL {name}: value mismatch in {diff_cols}")
                for c in diff_cols[:2]:
                    mask = ~((w[c].isna() & g[c].isna()) | (w[c].fillna(0) == g[c].fillna(0)))
                    print(f"  {c}: first diffs (oracle vs spark):")
                    print(pd.DataFrame({"oracle": w[c][mask], "spark": g[c][mask]}).head(4))
            else:
                n_ok += 1
                print(f"ok   {name} ({len(w)} rows)")
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
    print(f"== {n_ok}/{len(oracle)} queries match")


if __name__ == "__main__":
    main()
