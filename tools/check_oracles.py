#!/usr/bin/env python3
"""Local replica of the driver's t2 DuckDB-oracle check (builder-side QA
tool, not part of the library). Usage:

    python3 tools/check_oracles.py /tmp/verify-out /root/testdata/sf0.01

Reads each <out>/<query>/ parquet dumped by graft.Verify, runs the matching
SQL from oracle_sql.json in DuckDB against the same tables, and compares
with the strictest plausible semantics: identical sorted column names,
identical row count, and exact value equality after sorting rows by all
columns (NaN==NaN, None==None, floats bit-exact, Decimal vs Decimal by
numeric value + scale).
"""
import json
import sys
from decimal import Decimal

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return (0, "")
    if isinstance(v, Decimal):
        return (1, str(v))
    if isinstance(v, float):
        return (1, repr(v))
    if isinstance(v, int):
        return (1, repr(v))
    return (1, str(v))


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if name in skip:
            print(f"SKIP {name}")
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
            want = con.execute(sql).fetchdf()
            gcols, wcols = sorted(got.columns), sorted(want.columns)
            if gcols != wcols:
                print(f"FAIL {name}: columns {gcols} != {wcols}")
                n_fail += 1
                continue
            if len(got) != len(want):
                print(f"FAIL {name}: rows {len(got)} != {len(want)}")
                n_fail += 1
                continue
            g = [tuple(norm(v) for v in row) for row in got[gcols].itertuples(index=False)]
            w = [tuple(norm(v) for v in row) for row in want[wcols].itertuples(index=False)]
            g.sort()
            w.sort()
            if g != w:
                bad = next(i for i, (a, b) in enumerate(zip(g, w)) if a != b)
                print(f"FAIL {name}: first value mismatch at sorted row {bad}:")
                print(f"  spark : {g[bad]}")
                print(f"  duckdb: {w[bad]}")
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
    sys.exit(main(sys.argv[1], sys.argv[2]))
