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
        # Compare on the DECLARED schema types (parquet footer / DuckDB plan),
        # not pandas dtypes: pyarrow->pandas promotes a nullable int64 column
        # to float64 on whichever side happens to hold NULLs, which would
        # spuriously flag values that genuinely match. HUGEINT classifies as
        # float because that's what the driver's pandas conversion sees.
        def duck_family(t):
            t = t.upper()
            if t in ("HUGEINT", "UHUGEINT", "DOUBLE", "FLOAT", "REAL"):
                return "float"
            if "INT" in t:
                return "int"
            return "other"  # strings, bools, lists, DECIMAL, ... — skip
        try:
            gt = {r[0]: duck_family(r[1]) for r in con.sql(
                f"DESCRIBE SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()}
            wt = {r[0]: duck_family(r[1]) for r in con.sql(
                f"DESCRIBE {oracle[name]}").fetchall()}
        except Exception:
            gt, wt = {}, {}
        dtype_bad = [c for c in got.columns
                     if gt.get(c, "other") != wt.get(c, "other")
                     and "other" not in (gt.get(c, "other"), wt.get(c, "other"))]
        if dtype_bad:
            print(f"FAIL {name}: int/float schema-type mismatch on {dtype_bad}: "
                  f"{[(gt.get(c), wt.get(c)) for c in dtype_bad]}")
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
