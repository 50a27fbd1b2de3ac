#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output against
the DuckDB oracles and report per-query row/schema/value match.

Usage: python3 tools/check_oracle.py <sf_dir> <verify_out_dir> [query ...]
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


import datetime


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.dt.floor("us").astype("datetime64[us]")
        elif s.dtype == object and s.map(
                lambda v: v is None or isinstance(v, (datetime.date, datetime.datetime))).all():
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.map(lambda v: float(v) if isinstance(v, (int,)) else v)
    return df.reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle_sql = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir, f"{t}.parquet")
        if p.exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    results = {}
    for name, sql in sorted(oracle_sql.items()):
        if only and name not in only:
            continue
        spark_dir = Path(out_dir, name)
        if not spark_dir.exists():
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        try:
            spark_df = pd.concat(
                [pd.read_parquet(f) for f in sorted(spark_dir.glob("*.parquet"))],
                ignore_index=True)
            ora_df = con.sql(sql).df()
        except Exception as e:
            results[name] = f"ERR: {e}"
            continue
        s, o = norm(spark_df), norm(ora_df)
        if len(s) != len(o):
            results[name] = f"ROWS {len(s)} vs {len(o)}"
        elif list(s.columns) != list(o.columns):
            results[name] = f"COLS {list(s.columns)} vs {list(o.columns)}"
        else:
            try:
                pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=True)
                results[name] = "OK"
            except AssertionError as e:
                results[name] = "VALUE MISMATCH: " + str(e).splitlines()[-1][:200]
    bad = {k: v for k, v in results.items() if v != "OK"}
    for k, v in sorted(results.items()):
        print(f"{k:24s} {v}")
    print(f"\n{len(results) - len(bad)}/{len(results)} OK")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
