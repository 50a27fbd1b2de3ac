#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Reads each query's parquet output (written by graft.Verify) and compares it
cell-for-cell against the oracle SQL run by DuckDB over the same scale-factor
tables. Columns are sorted by name (like the driver) and rows compared in
emitted order and, if that fails, in fully-sorted order.

Usage: tools/validate.py [outdir] [sfdir]
"""
import json, math, sys
import duckdb

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
            "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sfdir}/{tbl}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def canon(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return [cols[i] for i in idx], [tuple(norm(r[i]) for i in idx) for r in rows]

fail = 0
for name, sql in sorted(oracle.items()):
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        gcols = [d[0] for d in got.description]
        grows = got.fetchall()
        want = con.execute(sql)
        wcols = [d[0] for d in want.description]
        wrows = want.fetchall()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fail += 1
        continue

    gc, gr = canon(gcols, grows)
    wc, wr = canon(wcols, wrows)
    if gc != wc:
        print(f"FAIL {name}: columns {gc} != {wc}")
        fail += 1
        continue
    if len(gr) != len(wr):
        print(f"FAIL {name}: rows {len(gr)} != {len(wr)}")
        fail += 1
        continue
    if gr != wr:
        srt_g, srt_w = sorted(gr, key=repr), sorted(wr, key=repr)
        if srt_g == srt_w:
            print(f"WARN {name}: matches only after row sort ({len(gr)} rows)")
            continue
        bad = next(i for i, (a, b) in enumerate(zip(srt_g, srt_w)) if a != b)
        print(f"FAIL {name}: first diff at sorted row {bad}:")
        print(f"  got : {srt_g[bad]}")
        print(f"  want: {srt_w[bad]}")
        fail += 1
        continue
    print(f"PASS {name} ({len(gr)} rows)")

# rows-only keys (no oracle SQL): a zero-row output proves only that the
# query doesn't throw (the round-9 q74 lesson) — assert non-vacuity
import os
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if name in oracle or not os.path.isdir(d):
        continue
    try:
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
    except Exception as e:
        print(f"FAIL {name} (rows-only): {e}")
        fail += 1
        continue
    if n == 0:
        print(f"FAIL {name} (rows-only): VACUOUS - 0 rows proves nothing")
        fail += 1
    else:
        print(f"PASS {name} (rows-only, {n} rows)")

print(f"\n{'ALL PASS' if fail == 0 else f'{fail} FAILURES'} "
      f"({len(oracle)} queries with oracles)")
sys.exit(1 if fail else 0)
