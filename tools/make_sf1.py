#!/usr/bin/env python3
"""Synthesize an sfN (COPIES x sf0.1) test set for the scaling audit
(SURVEY round-8 lead: wall-vs-sf ratios per query). Default COPIES=10
(sf1 under /tmp/sf1); `tools/make_sf1.py /tmp/sf10 100` builds the sf10
set for the round-10 decade-up audit.

Relational tables replicate 10x with CONSISTENT key offsets (each copy's
foreign keys point at its own copy of the parent, so join fan-outs and
group cardinalities scale linearly, exactly like a bigger generated set).

`documents` gets a per-copy token perturbation (a copy marker inserted
every 2 tokens): no run of 3 original tokens survives, so copies share
ZERO 3-gram shingles — the corpus scales as 10 independent sf0.1
corpora (the honest linear-scaling shape; a marker every 5 tokens left
~40% shared shingles and manufactured 225k cross-copy near-miss
candidate pairs, poisoning the audit with a data artifact). Within-copy
planted near-dups keep their relationship since both sides receive
aligned insertions.

`events.user_id` is NOT offset: a 10x event stream over the SAME user
population keeps heavy hitters heavy (offsetting user ids diluted every
user's relative frequency 10x and tripped the Misra-Gries
certify-or-refuse gate — again an artifact, not a plan property).

`embeddings` are synthesized fresh around the sf0.1 per-label centroids
(same dim, unit norm, same cluster count/spread shape): replicating
vectors verbatim would create cos=1 duplicate groups and blow the exact
pair operators up quadratically by construction, which would poison the
audit with a data artifact instead of a plan property.

Deterministic throughout (seed 42). Driver-side tooling only — the Scala
library never reads this script.
"""
import duckdb
import numpy as np
import os
import sys

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10
os.makedirs(DST, exist_ok=True)

con = duckdb.connect()

def src(t):
    return f"'{SRC}/{t}.parquet'"

def write(t, sql):
    con.sql(f"COPY ({sql}) TO '{DST}/{t}.parquet' (FORMAT parquet)")
    n = con.sql(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")

# fixed dimensions: copy as-is
for t in ("region", "nation"):
    write(t, f"SELECT * FROM {src(t)}")

# key offsets: parent offset reused by every child foreign key
OFF = {"c": 15000, "s": 1000, "p": 20000, "o": 150000, "e": 100000,
       "u": 1500, "d": 1_000_000, "v": 2000}

def copies(select_tpl):
    return " UNION ALL ".join(select_tpl.format(i=i) for i in range(COPIES))

write("customer", copies(
    f"SELECT c_custkey + {{i}} * {OFF['c']} AS c_custkey, c_name, c_nationkey, "
    f"c_acctbal, c_mktsegment FROM {src('customer')}"))
write("supplier", copies(
    f"SELECT s_suppkey + {{i}} * {OFF['s']} AS s_suppkey, s_name, s_nationkey, "
    f"s_acctbal FROM {src('supplier')}"))
write("part", copies(
    f"SELECT p_partkey + {{i}} * {OFF['p']} AS p_partkey, p_name, p_brand, "
    f"p_type, p_size, p_retailprice FROM {src('part')}"))
write("orders", copies(
    f"SELECT o_orderkey + {{i}} * {OFF['o']} AS o_orderkey, "
    f"o_custkey + {{i}} * {OFF['c']} AS o_custkey, o_orderstatus, o_totalprice, "
    f"o_orderdate, o_orderpriority FROM {src('orders')}"))
write("lineitem", copies(
    f"SELECT l_orderkey + {{i}} * {OFF['o']} AS l_orderkey, "
    f"l_partkey + {{i}} * {OFF['p']} AS l_partkey, "
    f"l_suppkey + {{i}} * {OFF['s']} AS l_suppkey, "
    f"l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
    f"l_returnflag, l_linestatus, l_shipdate FROM {src('lineitem')}"))
write("events", copies(
    f"SELECT event_id + {{i}} * {OFF['e']} AS event_id, ts, "
    f"user_id, event_type, value, props "
    f"FROM {src('events')}"))

# documents: aligned copy-marker insertion every 2 tokens
docs = con.sql(f"SELECT doc_id, text, lang, source FROM {src('documents')}").fetchall()
rows = []
for i in range(COPIES):
    tag = f"cpy{i}tok"
    for doc_id, text, lang, source in docs:
        toks = (text or "").split()
        out = []
        for j, tk in enumerate(toks):
            if j and j % 2 == 0:
                out.append(tag)
            out.append(tk)
        t2 = " ".join(out)
        rows.append((doc_id + i * OFF["d"], t2, lang, source, len(t2)))
import pyarrow as pa
import pyarrow.parquet as pq
tbl = pa.table({
    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
    "text": pa.array([r[1] for r in rows], pa.string()),
    "lang": pa.array([r[2] for r in rows], pa.string()),
    "source": pa.array([r[3] for r in rows], pa.string()),
    "n_chars": pa.array([r[4] for r in rows], pa.int64()),
})
pq.write_table(tbl, f"{DST}/documents.parquet")
print(f"documents: {len(rows)} rows")

# embeddings: fresh synthesis around sf0.1 per-label centroids
emb = con.sql(f"SELECT vec_id, embedding, label FROM {src('embeddings')}").fetchall()
V = np.stack([np.array(e, dtype=np.float64) for _, e, _ in emb])
labels = np.array([l for _, _, l in emb])
dim = V.shape[1]
rng = np.random.default_rng(42)
cents = {}
spread = {}
for l in np.unique(labels):
    sub = V[labels == l]
    cents[l] = sub.mean(axis=0)
    spread[l] = max(float(np.linalg.norm(sub - cents[l], axis=1).mean()), 1e-6)
n_out = len(emb) * COPIES
out_vecs = np.empty((n_out, dim), dtype=np.float32)
out_lab = np.empty(n_out, dtype=np.int32)
ls = sorted(cents)
for r in range(n_out):
    l = ls[r % len(ls)]
    v = cents[l] + rng.standard_normal(dim) * (spread[l] / np.sqrt(dim))
    v /= np.linalg.norm(v)
    out_vecs[r] = v
    out_lab[r] = l
tbl = pa.table({
    "vec_id": pa.array(np.arange(n_out, dtype=np.int64)),
    "embedding": pa.array(list(out_vecs), pa.list_(pa.float32())),
    "label": pa.array(out_lab, pa.int32()),
})
pq.write_table(tbl, f"{DST}/embeddings.parquet")
print(f"embeddings: {n_out} rows")
print("done:", DST)
