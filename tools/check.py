#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query result parquet under <verifyOutDir>/<name>/ and its oracle SQL
from <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB against views over
<sfDir>/*.parquet, sort columns by name, sort rows, and compare cell-by-cell.
Dev tooling only — the shipped engine is the Scala code under src/.
"""
import glob
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            failures += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            want = con.sql(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        # The real driver hashes raw values, so an int column on one side vs a
        # float column on the other (e.g. DuckDB sum(BIGINT) -> HUGEINT ->
        # float64 in pandas) hash-mismatches even when %.9g collapses them.
        dtype_bad = [c for c in got.columns
                     if ("int" in str(got[c].dtype)) != ("int" in str(want[c].dtype))
                     and ("object" not in str(got[c].dtype))
                     and ("object" not in str(want[c].dtype))]
        if dtype_bad:
            print(f"FAIL {name}: int/float dtype mismatch on {dtype_bad}: "
                  f"{[(str(got[c].dtype), str(want[c].dtype)) for c in dtype_bad]}")
            failures += 1
            continue
        g = sorted(tuple(norm(v) for v in row) for row in got.itertuples(index=False))
        w = sorted(tuple(norm(v) for v in row) for row in want.itertuples(index=False))
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failures += 1
        elif g != w:
            bad = [(a, b) for a, b in zip(g, w) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            failures += 1
        else:
            print(f"OK   {name}: {len(g)} rows")
    # queries without oracle: rows-only
    names_with_result = {p.split("/")[-1] for p in glob.glob(f"{out_dir}/*") if "." not in p.split("/")[-1]}
    for name in sorted(names_with_result - set(oracle)):
        n = con.sql(f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
        print(f"{'OK  ' if n > 0 else 'FAIL'} {name}: rows-only check, {n} rows")
        failures += 0 if n > 0 else 1
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
