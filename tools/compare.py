#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir, loads the Spark parquet result and the
matching oracle SQL (oracle_sql.json) run in DuckDB against the sfDir tables,
sorts columns by name and rows by value, and compares cell-by-cell (floats via
repr, Decimal by numeric equality).
"""
import json
import math
import sys
from decimal import Decimal
from pathlib import Path

import duckdb


def canon(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return str(v.normalize())
    return str(v)


def table_of(rows, cols):
    # sort columns by name, then rows lexicographically
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in cols), out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_rows_only = 0
    for qdir in sorted(Path(out_dir).iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        if not list(qdir.glob("*.parquet")):
            n_fail += 1
            print(f"{'FAIL':10} {name}: no spark output written")
            continue
        spark_rel = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        spark_cols = spark_rel.columns
        spark_rows = spark_rel.fetchall()
        if name not in oracle:
            n_rows_only += 1
            status = "ROWS-ONLY"
            print(f"{status:10} {name}: rows={len(spark_rows)}")
            if len(spark_rows) == 0:
                print(f"  !! zero rows")
            continue
        try:
            ora_rel = con.sql(oracle[name])
            ora_cols = ora_rel.columns
            ora_rows = ora_rel.fetchall()
        except Exception as e:
            n_fail += 1
            print(f"{'FAIL':10} {name}: oracle SQL error: {e}")
            continue
        sc, sr = table_of(spark_rows, spark_cols)
        oc, orows = table_of(ora_rows, ora_cols)
        if sc != oc:
            n_fail += 1
            print(f"{'FAIL':10} {name}: column mismatch spark={sc} oracle={oc}")
        elif len(sr) != len(orows):
            n_fail += 1
            print(f"{'FAIL':10} {name}: row count spark={len(sr)} oracle={len(orows)}")
        elif sr != orows:
            n_fail += 1
            diffs = [(a, b) for a, b in zip(sr, orows) if a != b][:3]
            print(f"{'FAIL':10} {name}: value mismatch, first diffs: {diffs}")
        else:
            n_pass += 1
            print(f"{'PASS':10} {name}: {len(sr)} rows")
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
