#!/usr/bin/env python3
"""Generate INDEPENDENT-implementation oracle fixtures for the three
deterministic queries whose semantics no SQL engine can express directly:

  q58  deflate sizes   — python zlib (same madler zlib algorithm family as
                         java.util.zip.Deflater, but an independent binding
                         and runtime), keyed by md5(text) so the fixture is
                         content-addressed and scale-factor-agnostic.
  q98  BPE merge table — an independent python BPE trainer (reimplemented
                         from the published algorithm, not from the Scala),
                         keyed by a corpus fingerprint (md5 over the sorted
                         per-doc text md5s) so each scale dir selects
                         exactly its own merge table.
  q99  sas7bdat CSV    — the u64_pages fixture decoded by pandas.read_sas
                         (a third-party public reader) and dumped as CSV,
                         so DuckDB reads what PANDAS says the file holds.

The DuckDB oracle SQL in SparkEntry then joins these fixtures — a genuine
cross-implementation check, not Spark output compared to itself.

Usage: python3 tools/make_oracle_fixtures.py [outdir]
(default outdir: src/test/resources/oracle)
"""
import hashlib
import re
import sys
import zlib
from pathlib import Path

import numpy as np
import pandas as pd

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

# Spark's tokens(): split(trim(text), '\\s+') — trim strips SPACES only,
# Java \s is [ \t\n\x0b\f\r], and split keeps boundary empties (limit -1;
# python re.split has the same boundary behavior).
_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def spark_tokens(text):
    return _WS.split(text.strip(" "))


def doc_tables():
    import duckdb
    con = duckdb.connect()
    for sf in SF_DIRS:
        p = Path(sf, "documents.parquet")
        if not p.exists():
            continue
        rows = con.execute(
            f"SELECT doc_id, text FROM read_parquet('{p}') ORDER BY doc_id").fetchall()
        yield sf, rows


def corpus_fp(texts):
    """md5 over the SORTED per-doc text md5 hexes — order-independent, and
    computable in plain DuckDB SQL as
    md5(string_agg(md5(text), '' ORDER BY md5(text)))."""
    hs = sorted(hashlib.md5(t.encode("utf8")).hexdigest() for t in texts if t is not None)
    return hashlib.md5("".join(hs).encode("ascii")).hexdigest()


# ---------------------------------------------------------------- q58

def deflate_fixture(outdir):
    rows = {}
    for _, docs in doc_tables():
        for _, text in docs:
            if text is None:
                continue
            fp = hashlib.md5(text.encode("utf8")).hexdigest()
            if fp in rows:
                continue
            b = text.encode("utf8")
            comp = len(zlib.compress(b))  # default level 6 == Deflater default
            ratio = 1.0 if len(b) == 0 else comp / len(b)
            # math.rint == IEEE round-half-even == np.rint, on the same double
            rows[fp] = (fp, len(b), comp, float(np.rint(ratio * 1e6) / 1e6))
    df = pd.DataFrame(sorted(rows.values()),
                      columns=["fp", "raw_bytes", "deflate_bytes", "compress_ratio"])
    df = df.astype({"raw_bytes": "int64", "deflate_bytes": "int64"})
    df.to_parquet(Path(outdir, "deflate_sizes.parquet"), index=False)
    print(f"deflate_sizes.parquet: {len(df)} distinct texts")


# ---------------------------------------------------------------- q98

def bpe_train(texts, merges=30, min_freq=1, max_vocab=1 << 20):
    """Independent BPE trainer: word-frequency dict, char+</w> symbol init,
    per-round (count DESC, pair ASC) best pair, left-to-right non-overlap
    merge — the textbook algorithm (Sennrich et al. 2016)."""
    freq = {}
    for text in texts:
        if text is None:
            continue
        for w in spark_tokens(text):
            freq[w] = freq.get(w, 0) + 1
    items = [(w, c) for w, c in freq.items() if c >= min_freq]
    items.sort(key=lambda x: (-x[1], x[0]))
    items = items[:max_vocab]
    words = [list(w) + ["</w>"] for w, _ in items]
    out = []
    for rank in range(merges):
        counts = {}
        for wlist, (_, c) in zip(words, items):
            for a, b in zip(wlist, wlist[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        (l, r), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((rank, l, r, n))
        merged = l + r
        for wlist in words:
            j = 0
            while j < len(wlist) - 1:
                if wlist[j] == l and wlist[j + 1] == r:
                    wlist[j] = merged
                    del wlist[j + 1]
                else:
                    j += 1
    return out


def bpe_fixture(outdir):
    all_rows = []
    for sf, docs in doc_tables():
        texts = [t for _, t in docs]
        fp = corpus_fp(texts)
        table = bpe_train(texts, merges=30)
        for rank, l, r, n in table:
            all_rows.append((fp, rank, l, r, n))
        print(f"bpe[{sf}]: fp={fp} first={table[0]} last={table[-1]}")
    df = pd.DataFrame(all_rows,
                      columns=["corpus_fp", "rank", "left", "right", "pair_count"])
    df = df.astype({"rank": "int32", "pair_count": "int64"})
    df.to_parquet(Path(outdir, "bpe_merges.parquet"), index=False)
    print(f"bpe_merges.parquet: {len(df)} rows over {df.corpus_fp.nunique()} corpora")


# ---------------------------------------------------------------- q99

def sas_csv_twin(outdir):
    src = "src/test/resources/sas7bdat/u64_pages.sas7bdat"
    df = pd.read_sas(src, format="sas7bdat", encoding="utf-8")
    # pandas reads id/ratio as float64, name/flag as str — exactly the Spark
    # reader's schema for this fixture
    p = Path(outdir, "u64_pages.csv")
    df.to_csv(p, index=False)
    print(f"u64_pages.csv: {len(df)} rows from pandas.read_sas")


def main():
    outdir = Path(sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/oracle")
    outdir.mkdir(parents=True, exist_ok=True)
    deflate_fixture(outdir)
    bpe_fixture(outdir)
    sas_csv_twin(outdir)


if __name__ == "__main__":
    main()
