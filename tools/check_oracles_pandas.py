#!/usr/bin/env python3
"""Pandas-path replica of the driver's correctness compare (builder-side QA
tool, not part of the library). The driver reads the Spark dump with
pandas/pyarrow, runs the oracle SQL in DuckDB with .df(), sorts columns by
name, sorts rows by all columns, then hashes values — so dtype-level
representation differences (Decimal vs float64, datetime unit, Int64 vs
float64-with-NaN) break it even when check_oracles.py's exact value compare
passes. Usage:

    python3 tools/check_oracles_pandas.py /tmp/verify-out /root/testdata/sf0.01 [only,queries]
"""
import glob
import json
import sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_spark(out_dir, name):
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    return pq.ParquetDataset(files).read().to_pandas()


def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return df


def row_hash(df):
    # mirrors a hash of stringified cells after the sort
    return pd.util.hash_pandas_object(
        df.astype(str), index=False).values.tolist()


def main(out_dir, sf_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = canon(load_spark(out_dir, name))
            want = canon(con.execute(sql).df())
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
                n_fail += 1
                continue
            if len(got) != len(want):
                print(f"FAIL {name}: rows {len(got)} != {len(want)}")
                n_fail += 1
                continue
            gh, wh = row_hash(got), row_hash(want)
            if gh != wh:
                bad = next(i for i, (a, b) in enumerate(zip(gh, wh)) if a != b)
                print(f"FAIL {name}: first hash mismatch at sorted row {bad}:")
                for c in got.columns:
                    gv, wv = got[c].iloc[bad], want[c].iloc[bad]
                    mark = "  " if str(gv) == str(wv) else "->"
                    print(f"  {mark} {c}: spark={gv!r} ({got[c].dtype}) "
                          f"duckdb={wv!r} ({want[c].dtype})")
                n_fail += 1
                continue
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
