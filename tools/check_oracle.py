#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark output) and runs the
corresponding SQL from oracle_sql.json in DuckDB over the sfDir tables,
then compares: column names (sorted), row counts, and values (sorted rows,
bit-exact for every dtype including floats — mirroring the driver's hash
compare; the reported maxabs on float mismatch is diagnostic only, never
a tolerance).
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


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            failures += 1
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failures += 1
            continue
        bad = []
        for c in g.columns:
            a, b = g[c], w[c]
            # The driver hashes raw values, so an int64 column on one side
            # and float64 on the other (e.g. DuckDB SUM(BIGINT) -> HUGEINT
            # -> pandas float64) hash-mismatches even when values agree.
            if (pd.api.types.is_float_dtype(a)
                    != pd.api.types.is_float_dtype(b)):
                bad.append(
                    f"{c}: dtype mismatch {a.dtype} vs {b.dtype} "
                    "(driver hash would fail; CAST the oracle aggregate)")
                continue
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                a = a.astype(float)
                b = b.astype(float)
                exact = (a == b) | (a.isna() & b.isna())
                if not exact.all():
                    mx = (a - b).abs().max()
                    bad.append(f"{c}: {int((~exact).sum())} diffs, maxabs={mx:.3e}")
            else:
                if not (a.astype(object).where(a.notna(), None)
                        == b.astype(object).where(b.notna(), None)).all():
                    n = int((a.astype(object).where(a.notna(), None)
                             != b.astype(object).where(b.notna(), None)).sum())
                    bad.append(f"{c}: {n} value diffs (dtype {a.dtype} vs {b.dtype})")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad))
            failures += 1
        else:
            print(f"OK   {name} ({len(g)} rows)")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
