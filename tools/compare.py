#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Mirrors the driver's pandas-based compare: the Spark result is read with
pandas/pyarrow (so parquet DECIMAL surfaces as decimal.Decimal and arrays as
numpy arrays — both of which the driver cannot canonicalize; outputs must
avoid them), the oracle SQL runs in DuckDB and is fetched as a pandas frame,
then both sides are column-sorted by name, row-sorted by every column, and
compared cell-by-cell via canonical strings.
"""
import json
import math
import sys
from decimal import Decimal
from pathlib import Path

import duckdb
import pandas as pd


def canon(v):
    # STRICTER than the driver: float NaN canonicalizes to "NaN", distinct
    # from NULL, so a genuine NaN-vs-NULL divergence between Spark and the
    # oracle fails HERE even though the driver's pandas compare (which folds
    # NaN into NULL) would let it slide. Passing the strict local gate
    # implies passing the driver's.
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if v is None or v is pd.NA:
        return "<NULL>"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, Decimal):
        return "DECIMAL:" + str(v)  # deliberately never equal to a float repr
    return str(v)


def frame_table(df):
    cols = sorted(df.columns)
    df = df[cols]
    try:
        df = df.sort_values(by=cols, kind="mergesort")
    except TypeError as e:
        raise RuntimeError(f"unsortable result (driver would ERR): {e}")
    rows = [tuple(canon(v) for v in rec) for rec in df.itertuples(index=False, name=None)]
    rows.sort()  # canonical strings break ties pandas sorts differently
    return cols, rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
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
        if only is not None and name not in only:
            continue
        parts = list(qdir.glob("*.parquet"))
        if not parts:
            n_fail += 1
            print(f"{'FAIL':10} {name}: no spark output written")
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)
        except Exception as e:
            n_fail += 1
            print(f"{'FAIL':10} {name}: spark parquet unreadable in pandas: {e}")
            continue
        if name not in oracle:
            n_rows_only += 1
            print(f"{'ROWS-ONLY':10} {name}: rows={len(spark_df)}")
            if len(spark_df) == 0:
                print("  !! zero rows")
            continue
        try:
            ora_df = con.sql(oracle[name]).df()
        except Exception as e:
            n_fail += 1
            print(f"{'FAIL':10} {name}: oracle SQL error: {e}")
            continue
        try:
            sc, sr = frame_table(spark_df)
            oc, orows = frame_table(ora_df)
        except RuntimeError as e:
            n_fail += 1
            print(f"{'FAIL':10} {name}: {e}")
            continue
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
