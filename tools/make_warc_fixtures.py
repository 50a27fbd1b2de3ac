#!/usr/bin/env python3
"""Generate WARC fixtures for the Scala reader spec, plus the oracle CSV.

Two layers of independence:
 1. the WRITER below emits records per the ISO 28500 grammar;
 2. an INDEPENDENT re-parser (written from the spec, sharing no code with
    the writer: it re-reads the produced bytes length-driven) validates
    every produced file and emits the expected-values CSV the DuckDB
    oracle reads.

Usage: python3 tools/make_warc_fixtures.py
"""
import gzip
import hashlib
import io
import sys
from pathlib import Path

OUT = Path("src/test/resources/warc")
ORACLE = Path("src/test/resources/oracle")


def record(warc_type, rid, date, payload: bytes, uri=None, ctype=None):
    h = [f"WARC/1.0",
         f"WARC-Type: {warc_type}",
         f"WARC-Record-ID: <urn:uuid:{rid}>",
         f"WARC-Date: {date}"]
    if uri:
        h.append(f"WARC-Target-URI: {uri}")
    if ctype:
        h.append(f"Content-Type: {ctype}")
    h.append(f"Content-Length: {len(payload)}")
    head = ("\r\n".join(h) + "\r\n\r\n").encode("utf-8")
    return head + payload + b"\r\n\r\n"


def http_response(status, ctype, body: bytes):
    head = (f"HTTP/1.1 {status} {'OK' if status == 200 else 'ERR'}\r\n"
            f"Content-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode()
    return head + body


def build():
    recs = []
    recs.append(record(
        "warcinfo", "00000000-0000-0000-0000-000000000001",
        "2026-08-14T10:00:00Z",
        b"software: graft-fixture 1.0\r\nformat: WARC File Format 1.0\r\n",
        ctype="application/warc-fields"))
    html1 = ("<html><head><title>Página uno</title></head>"
             "<body><p>Hello crawl world &amp; friends</p></body></html>").encode("utf-8")
    recs.append(record(
        "response", "00000000-0000-0000-0000-000000000002",
        "2026-08-14T10:00:01Z", http_response(200, "text/html; charset=utf-8", html1),
        uri="http://example.com/one", ctype="application/http; msgtype=response"))
    # body containing the \r\n\r\n delimiter — a length-driven parser must
    # not be fooled
    tricky = b"first\r\n\r\nsecond\r\n\r\nthird"
    recs.append(record(
        "response", "00000000-0000-0000-0000-000000000003",
        "2026-08-14T10:00:02Z", http_response(200, "text/plain", tricky),
        uri="http://example.com/tricky", ctype="application/http; msgtype=response"))
    recs.append(record(
        "request", "00000000-0000-0000-0000-000000000004",
        "2026-08-14T10:00:02Z",
        b"GET /tricky HTTP/1.1\r\nHost: example.com\r\n\r\n",
        uri="http://example.com/tricky", ctype="application/http; msgtype=request"))
    recs.append(record(
        "response", "00000000-0000-0000-0000-000000000005",
        "2026-08-14T10:00:03Z", http_response(404, "text/html", b"<html>gone</html>"),
        uri="http://example.com/missing", ctype="application/http; msgtype=response"))
    # empty-body response
    recs.append(record(
        "response", "00000000-0000-0000-0000-000000000006",
        "2026-08-14T10:00:04Z", http_response(200, "text/html", b""),
        uri="http://example.com/empty", ctype="application/http; msgtype=response"))
    recs.append(record(
        "metadata", "00000000-0000-0000-0000-000000000007",
        "2026-08-14T10:00:05Z", b"fetchTimeMs: 22\r\n",
        uri="http://example.com/one", ctype="application/warc-fields"))
    return recs


def reparse(blob: bytes, where: str):
    """Independent spec-driven re-parse → list of header-dict + payload."""
    out = []
    i = 0
    n = len(blob)
    while i < n:
        # skip blank separators
        while i < n and blob[i:i + 2] in (b"\r\n",) or (i < n and blob[i:i+1] == b"\n"):
            if blob[i:i + 2] == b"\r\n":
                i += 2
            elif blob[i:i+1] == b"\n":
                i += 1
            else:
                break
        if i >= n:
            break
        end = blob.index(b"\r\n\r\n", i)
        head = blob[i:end].decode("utf-8").split("\r\n")
        assert head[0].startswith("WARC/"), (where, head[0])
        hdr = {}
        for line in head[1:]:
            k, v = line.split(":", 1)
            hdr[k.strip().lower()] = v.strip()
        length = int(hdr["content-length"])
        payload = blob[end + 4:end + 4 + length]
        assert len(payload) == length, where
        assert blob[end + 4 + length:end + 4 + length + 4] == b"\r\n\r\n", where
        i = end + 4 + length + 4
        out.append((hdr, payload))
    return out


def expected_rows(parsed):
    rows = []
    for hdr, payload in parsed:
        wtype = hdr.get("warc-type")
        status = ""
        http_ct = ""
        body = payload
        if wtype in ("response", "request") and \
                hdr.get("content-type", "").startswith("application/http"):
            sep = payload.find(b"\r\n\r\n")
            if sep >= 0:
                head = payload[:sep].decode("latin-1").split("\r\n")
                if head[0].startswith("HTTP/"):
                    status = head[0].split(" ")[1]
                for line in head[1:]:
                    if line.lower().startswith("content-type:"):
                        http_ct = line.split(":", 1)[1].strip()
                body = payload[sep + 4:]
        rows.append({
            "record_id": hdr.get("warc-record-id", ""),
            "warc_type": wtype or "",
            "target_uri": hdr.get("warc-target-uri", ""),
            "warc_date": hdr.get("warc-date", ""),
            "content_length": int(hdr["content-length"]),
            "http_status": status,
            "http_content_type": http_ct,
            "body_md5": hashlib.md5(body).hexdigest(),
            "body_bytes": len(body),
        })
    return rows


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    ORACLE.mkdir(parents=True, exist_ok=True)
    recs = build()
    # file 1: plain, first 4 records
    plain = b"".join(recs[:4])
    (OUT / "sample_a.warc").write_bytes(plain)
    # file 2: per-record gzip members (the Common Crawl layout), last 3
    gz = io.BytesIO()
    for r in recs[4:]:
        gz.write(gzip.compress(r))
    (OUT / "sample_b.warc.gz").write_bytes(gz.getvalue())

    parsed = reparse(plain, "sample_a") + \
        reparse(gzip.decompress((OUT / "sample_b.warc.gz").read_bytes()), "sample_b")
    assert len(parsed) == len(recs), (len(parsed), len(recs))
    rows = expected_rows(parsed)
    import csv
    with open(ORACLE / "warc_expected.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {len(recs)} records over 2 files; expected CSV with {len(rows)} rows")


if __name__ == "__main__":
    main()
