#!/usr/bin/env python3
"""Generate minimal uncompressed .sas7bdat fixtures for the Scala reader spec.

The layout follows the publicly documented sas7bdat format (the
community-reverse-engineered spec implemented by pandas.read_sas, parso and
readstat). Each generated file is VALIDATED here with pandas.read_sas — an
independent public reader — before it lands in test resources, so the Scala
reader is tested against files a third-party implementation accepts, not
against its own assumptions.
"""
import struct
import sys

import numpy as np
import pandas as pd

MAGIC = (b"\x00\x00\x00\x00\x00\x00\x00\x00"
         b"\x00\x00\x00\x00\xc2\xea\x81\x60"
         b"\xb3\x14\x11\xcf\xbd\x92\x08\x00"
         b"\x09\xc7\x31\x8c\x18\x1f\x10\x11")

def build(u64, page_kind, rows, cols, page_size=4096, header_size=None, big_endian=False,
          enc_code=20, enc_name="utf-8"):
    """cols: list of (name, 'd'|'s', width, values). Returns file bytes."""
    ilen = 8 if u64 else 4
    bit_off = 32 if u64 else 16
    ptr_len = 24 if u64 else 12
    if header_size is None:
        header_size = 8192 if u64 else 1024
    bo = ">" if big_endian else "<"
    W = lambda fmt, v: struct.pack(bo + fmt, v)
    UI = lambda v: W("Q" if u64 else "I", v)

    row_length = sum(c[2] for c in cols)
    n_rows = rows

    # ---- subheaders (content bytes; offsets resolved at page assembly)
    def sig(le_bytes_32, ext=b"\xff\xff\xff\xff"):
        # 32-bit signature or its u64 widening; caller passes LE byte form
        if not u64:
            b = le_bytes_32
        else:
            if le_bytes_32 in (b"\xf7\xf7\xf7\xf7", b"\xf6\xf6\xf6\xf6"):
                b = b"\x00\x00\x00\x00" + le_bytes_32
            else:
                b = le_bytes_32 + b"\xff\xff\xff\xff"
        return b[::-1] if big_endian else b

    # row_size subheader: fields at multiples of int length; lcs/lcp zero
    rs = bytearray(808 if u64 else 480)
    rs[0:ilen] = sig(b"\xf7\xf7\xf7\xf7")
    rs[5 * ilen:5 * ilen + ilen] = UI(row_length)
    rs[6 * ilen:6 * ilen + ilen] = UI(n_rows)
    rs[9 * ilen:9 * ilen + ilen] = UI(len(cols))   # col_count_p1
    rs[10 * ilen:10 * ilen + ilen] = UI(0)         # col_count_p2
    mix_rows = n_rows if page_kind == "mix" else 0
    rs[15 * ilen:15 * ilen + ilen] = UI(mix_rows)

    cs = bytearray(3 * ilen)
    cs[0:ilen] = sig(b"\xf6\xf6\xf6\xf6")
    cs[ilen:2 * ilen] = UI(len(cols))

    # column text: blob at +ilen: [size:2][zeros to 28][names...]
    names_blob = bytearray(28)
    name_pos = []
    fmt_pos = []
    for c in cols:
        nb = c[0].encode()
        name_pos.append((len(names_blob), len(nb)))
        names_blob += nb
    for c in cols:
        fmt = (c[4] if len(c) > 4 else "").encode()
        fmt_pos.append((len(names_blob), len(fmt)))
        names_blob += fmt
    if len(names_blob) % 4:
        names_blob += b"\x00" * (4 - len(names_blob) % 4)
    struct.pack_into(bo + "H", names_blob, 0, len(names_blob))
    ct = bytearray(ilen) + bytes(names_blob)
    ct[0:ilen] = sig(b"\xfd\xff\xff\xff")

    # column names: entries at offset+ilen+8*(i+1)
    cn = bytearray(2 * ilen + 12 + 8 * len(cols))
    cn[0:ilen] = sig(b"\xff\xff\xff\xff")
    for i, (off, ln) in enumerate(name_pos):
        base = ilen + 8 * (i + 1)
        struct.pack_into(bo + "HHH", cn, base, 0, off, ln)

    # column attributes: 16-or-12 byte entries from offset+2*ilen
    esz = ilen + 8
    ca = bytearray(2 * ilen + 12 + esz * len(cols))
    ca[0:ilen] = sig(b"\xfc\xff\xff\xff")
    data_off = 0
    for i, (_, typ, width, _) in enumerate([c[:4] for c in cols]):
        base_do = ilen + 8 + i * esz          # col_data_offset (ilen bytes)
        base_dl = 2 * ilen + 8 + i * esz      # col_data_len (4 bytes)
        base_ty = 2 * ilen + 14 + i * esz     # col_type (1 byte)
        ca[base_do:base_do + ilen] = UI(data_off)
        struct.pack_into(bo + "I", ca, base_dl, width)
        ca[base_ty] = 1 if typ == "d" else 2
        data_off += width
    assert data_off == row_length

    # one format_and_label subheader per column, in column order
    fmt_shs = []
    for i in range(len(cols)):
        fl = bytearray(3 * ilen + 40)
        fl[0:ilen] = sig(b"\xfe\xfb\xff\xff")
        foff, flen = fmt_pos[i]
        struct.pack_into(bo + "H", fl, 3 * ilen + 22, 0)      # format text idx
        struct.pack_into(bo + "H", fl, 3 * ilen + 24, foff)   # format offset
        struct.pack_into(bo + "H", fl, 3 * ilen + 26, flen)   # format length
        struct.pack_into(bo + "H", fl, 3 * ilen + 28, 0)      # label text idx
        struct.pack_into(bo + "H", fl, 3 * ilen + 30, 0)
        struct.pack_into(bo + "H", fl, 3 * ilen + 32, 0)
        fmt_shs.append(bytes(fl))

    subheaders = [bytes(rs), bytes(cs), bytes(ct), bytes(cn), bytes(ca)] + fmt_shs

    # ---- rows
    def row_bytes(r):
        out = bytearray()
        for _, typ, width, values in [c[:4] for c in cols]:
            v = values[r]
            if typ == "d":
                out += struct.pack(bo + "d", np.nan if v is None else float(v))
            else:
                out += v.encode(enc_name).ljust(width, b" ")[:width]
        return bytes(out)

    # ---- pages
    pages = []

    def meta_page(shs, page_type, row_slice):
        page = bytearray(page_size)
        ptrs_end = bit_off + 8 + ptr_len * len(shs)
        # subheaders packed at page END (SAS convention)
        cursor = page_size
        offsets = []
        for sh in shs:
            cursor -= len(sh)
            offsets.append(cursor)
            page[cursor:cursor + len(sh)] = sh
        # row data (mix page): 8-aligned after pointer array
        align = (8 - (ptrs_end % 8)) % 8
        data_start = ptrs_end + align
        nrows_here = 0
        if row_slice:
            for r in row_slice:
                rb = row_bytes(r)
                assert data_start + len(rb) <= cursor, "page overflow"
                page[data_start:data_start + len(rb)] = rb
                data_start += len(rb)
                nrows_here += 1
        struct.pack_into(bo + "H", page, bit_off + 0, page_type)
        struct.pack_into(bo + "H", page, bit_off + 2, len(shs) + nrows_here)
        struct.pack_into(bo + "H", page, bit_off + 4, len(shs))
        for i, (sh, off) in enumerate(zip(shs, offsets)):
            p = bit_off + 8 + i * ptr_len
            page[p:p + ilen] = UI(off)
            page[p + ilen:p + 2 * ilen] = UI(len(sh))
            page[p + 2 * ilen] = 0     # compression
            page[p + 2 * ilen + 1] = 0 # type
        return bytes(page)

    def data_page(row_slice):
        page = bytearray(page_size)
        struct.pack_into(bo + "H", page, bit_off + 0, 0x0100)
        struct.pack_into(bo + "H", page, bit_off + 2, len(row_slice))
        struct.pack_into(bo + "H", page, bit_off + 4, 0)
        pos = bit_off + 8
        for r in row_slice:
            rb = row_bytes(r)
            assert pos + len(rb) <= page_size, "data page overflow"
            page[pos:pos + len(rb)] = rb
            pos += len(rb)
        return bytes(page)

    if page_kind == "mix":
        pages.append(meta_page(subheaders, 0x0200, range(n_rows)))
    else:
        pages.append(meta_page(subheaders, 0x0000, None))
        per_page = (page_size - bit_off - 8) // row_length
        r = 0
        while r < n_rows:
            chunk = range(r, min(r + per_page, n_rows))
            pages.append(data_page(chunk))
            r += per_page

    # ---- header
    hdr = bytearray(header_size)
    hdr[0:32] = MAGIC
    if u64:
        hdr[32] = 0x33
    hdr[35] = 0x33  # align1 = 4 (header fields shift by 4)
    a1 = 4
    hdr[37] = 0x00 if big_endian else 0x01
    hdr[39] = ord("1")  # unix
    hdr[70] = enc_code  # header encoding byte (20 = utf-8)
    hdr[92:92 + 64] = b"GRAFT_FIXTURE".ljust(64)
    hdr[156:164] = b"DATA    "
    struct.pack_into(bo + "d", hdr, 164 + a1, 2.0e9)  # created
    struct.pack_into(bo + "d", hdr, 172 + a1, 2.0e9)  # modified
    struct.pack_into(bo + "I", hdr, 196 + a1, header_size)
    struct.pack_into(bo + "I", hdr, 200 + a1, page_size)
    struct.pack_into(bo + ("Q" if u64 else "I"), hdr, 204 + a1, len(pages))
    hdr[216 + a1:216 + a1 + 8] = b"9.0401M2"
    hdr[224 + a1:224 + a1 + 16] = b"X64_10PRO".ljust(16)
    return bytes(hdr) + b"".join(pages)


def rle_compress(row):
    """Greedy SASYZCRL encoder over the command set confirmed against
    pandas (see the round-5 probe): blank/zero/byte runs collapse to fill
    commands, everything else goes out as literal copies. Long forms stay
    at nib=0 where every public implementation agrees on the length."""
    out = bytearray()
    i, n = 0, len(row)
    lit = bytearray()

    def flush_lit():
        j = 0
        while j < len(lit):
            take = min(64, len(lit) - j)
            if take > 64 - 15 and len(lit) - j > 64:  # prefer long copy for big blocks
                take = min(319, len(lit) - j)
                out.append(0x00)
                out.append(take - 64)
                out.extend(lit[j:j + take])
            else:
                k = take - 1
                out.append([0x80, 0x90, 0xA0, 0xB0][k // 16] | (k % 16))
                out.extend(lit[j:j + take])
            j += take
        lit.clear()

    while i < n:
        b = row[i]
        run = 1
        while i + run < n and row[i + run] == b and run < 272:
            run += 1
        if b == 0x20 and run >= 2:
            flush_lit()
            take = run if run <= 17 else min(run, 272)
            if take <= 17:
                out.append(0xE0 | (take - 2))
            else:
                out.append(0x60)
                out.append(take - 17)
            i += take
        elif b == 0x00 and run >= 2:
            flush_lit()
            take = run if run <= 17 else min(run, 272)
            if take <= 17:
                out.append(0xF0 | (take - 2))
            else:
                out.append(0x70)
                out.append(take - 17)
            i += take
        elif run >= 3:
            flush_lit()
            take = run if run <= 18 else min(run, 273)
            if take <= 18:
                out.append(0xC0 | (take - 3))
            else:
                out.append(0x40)
                out.append(take - 18)
            out.append(b)
            i += take
        else:
            lit.append(b)
            i += 1
    flush_lit()
    return bytes(out)


def rdc_compress(row):
    """Greedy SASYZCR2 (RDC, COMPRESS=BINARY) encoder over the command set
    confirmed against pandas (round-5 probe): a 16-bit big-endian control
    word precedes each group of 16 items; a 0 bit is one literal byte, a 1
    bit is a command byte (high nibble = cmd, low nibble = cnt):
      cmd 0: short RLE, run = cnt + 3, fill byte follows
      cmd 1: long RLE, run = cnt + (next << 4) + 19, fill byte follows
      cmd 2: long copy, ofs = cnt + 3 + (next << 4), len = next2 + 16
      cmd 3-15: short copy of cmd bytes, ofs = cnt + 3 + (next << 4)
    The encoder prefers RLE for runs >= 3, then the longest back-reference
    within offset 4098 (len capped at 271), else a literal."""
    items = []  # (is_cmd, bytes)
    i, n = 0, len(row)
    while i < n:
        b = row[i]
        run = 1
        while i + run < n and row[i + run] == b and run < 4114:
            run += 1
        if run >= 3:
            take = run
            if take <= 18:
                items.append((1, bytes([0x00 | (take - 3), b])))
            else:
                take = min(take, 19 + 0xFFF)
                c = take - 19
                items.append((1, bytes([0x10 | (c & 0x0F), c >> 4, b])))
            i += take
            continue
        # longest back-reference ending before i within offset window
        best_len, best_ofs = 0, 0
        lo = max(0, i - 4098)
        for j in range(lo, i):
            if row[j] != b:
                continue
            m = 0
            while i + m < n and m < 271 and row[j + m] == row[i + m]:
                m += 1
            if m > best_len:
                best_len, best_ofs = m, i - j
        if best_len >= 3 and best_ofs >= 3:
            take = best_len
            o = best_ofs - 3
            if take <= 15:
                items.append((1, bytes([(take << 4) | (o & 0x0F), o >> 4])))
            else:
                take = min(take, 271)
                items.append((1, bytes([0x20 | (o & 0x0F), o >> 4, take - 16])))
            i += take
            continue
        items.append((0, bytes([b])))
        i += 1
    out = bytearray()
    for g in range(0, len(items), 16):
        grp = items[g:g + 16]
        ctrl = 0
        for k, (is_cmd, _) in enumerate(grp):
            if is_cmd:
                ctrl |= 0x8000 >> k
        out += bytes([ctrl >> 8, ctrl & 0xFF])
        for _, bs in grp:
            out += bs
    return bytes(out)


def build_rle_file(u64, rows, cols, page_size=4096, header_size=None,
                   comp_lit=b"SASYZCRL", compressor=rle_compress, tag=b"GRAFT_RLE"):
    """Compressed (SASYZCRL) file: rows stored as compressed subheaders
    (pointer compression=4, type=1) on meta pages, spilling across pages."""
    import importlib
    ilen = 8 if u64 else 4
    bit_off = 32 if u64 else 16
    ptr_len = 24 if u64 else 12
    if header_size is None:
        header_size = 8192 if u64 else 1024
    bo = "<"
    W = lambda fmt, v: struct.pack(bo + fmt, v)
    UI = lambda v: W("Q" if u64 else "I", v)
    row_length = sum(c[2] for c in cols)

    def sig(le4):
        if not u64:
            return le4
        if le4 in (b"\xf7\xf7\xf7\xf7", b"\xf6\xf6\xf6\xf6"):
            return b"\x00\x00\x00\x00" + le4
        return le4 + b"\xff\xff\xff\xff"

    rs = bytearray(808 if u64 else 480)
    rs[0:ilen] = sig(b"\xf7\xf7\xf7\xf7")
    rs[5 * ilen:6 * ilen] = UI(row_length)
    rs[6 * ilen:7 * ilen] = UI(rows)
    rs[9 * ilen:10 * ilen] = UI(len(cols))
    rs[15 * ilen:16 * ilen] = UI(0)
    struct.pack_into(bo + "H", rs, 682 if u64 else 354, 0)  # lcs
    struct.pack_into(bo + "H", rs, 706 if u64 else 378, 8)  # lcp

    cs = bytearray(3 * ilen)
    cs[0:ilen] = sig(b"\xf6\xf6\xf6\xf6")
    cs[ilen:2 * ilen] = UI(len(cols))

    blob = bytearray(28)
    # compression literal where readers look for it (offset+16(+4) from
    # subheader start = blob position 12 for u64, 16-4-... keep 12)
    blob[12:20] = comp_lit
    name_pos = []
    for c in cols:
        nb = c[0].encode()
        name_pos.append((len(blob), len(nb)))
        blob += nb
    fmt_pos = [(len(blob), 0)] * len(cols)
    while len(blob) % 4:
        blob += b"\x00"
    struct.pack_into(bo + "H", blob, 0, len(blob))
    ct = bytearray(ilen) + bytes(blob)
    ct[0:ilen] = sig(b"\xfd\xff\xff\xff")

    cn = bytearray(2 * ilen + 12 + 8 * len(cols))
    cn[0:ilen] = sig(b"\xff\xff\xff\xff")
    for i, (off, ln) in enumerate(name_pos):
        struct.pack_into(bo + "HHH", cn, ilen + 8 * (i + 1), 0, off, ln)

    esz = ilen + 8
    ca = bytearray(2 * ilen + 12 + esz * len(cols))
    ca[0:ilen] = sig(b"\xfc\xff\xff\xff")
    doff = 0
    for i, c in enumerate(cols):
        ca[ilen + 8 + i * esz:ilen + 8 + i * esz + ilen] = UI(doff)
        struct.pack_into(bo + "I", ca, 2 * ilen + 8 + i * esz, c[2])
        ca[2 * ilen + 14 + i * esz] = 1 if c[1] == "d" else 2
        doff += c[2]

    fmt_shs = []
    for i in range(len(cols)):
        fl = bytearray(3 * ilen + 40)
        fl[0:ilen] = sig(b"\xfe\xfb\xff\xff")
        fmt_shs.append(bytes(fl))

    def row_bytes(r):
        out = bytearray()
        for _, typ, width, values in [c[:4] for c in cols]:
            v = values[r]
            if typ == "d":
                out += struct.pack(bo + "d", np.nan if v is None else float(v))
            else:
                out += v.encode().ljust(width, b" ")[:width]
        return bytes(out)

    meta_shs = [(bytes(rs), 0, 0), (bytes(cs), 0, 0), (bytes(ct), 0, 0),
                (bytes(cn), 0, 0), (bytes(ca), 0, 0)] + [(f, 0, 0) for f in fmt_shs]
    row_shs = []
    for r in range(rows):
        payload = compressor(row_bytes(r))
        assert len(payload) < row_length, "row did not compress"
        row_shs.append((payload, 4, 1))

    pages = []
    pending = meta_shs + row_shs
    while pending:
        page = bytearray(page_size)
        cursor = page_size
        placed = []
        while pending:
            sh, comp, typ = pending[0]
            need = len(sh)
            ptrs_end = bit_off + 8 + ptr_len * (len(placed) + 1)
            if cursor - need < ptrs_end:
                break
            cursor -= need
            page[cursor:cursor + need] = sh
            placed.append((sh, comp, typ, cursor))
            pending.pop(0)
        assert placed, "page too small for a subheader"
        struct.pack_into(bo + "H", page, bit_off, 0x0000)
        struct.pack_into(bo + "H", page, bit_off + 2, len(placed))
        struct.pack_into(bo + "H", page, bit_off + 4, len(placed))
        for i, (sh, comp, typ, off) in enumerate(placed):
            p = bit_off + 8 + i * ptr_len
            page[p:p + ilen] = UI(off)
            page[p + ilen:p + 2 * ilen] = UI(len(sh))
            page[p + 2 * ilen] = comp
            page[p + 2 * ilen + 1] = typ
        pages.append(bytes(page))

    hdr = bytearray(header_size)
    hdr[0:32] = MAGIC
    if u64:
        hdr[32] = 0x33
    hdr[35] = 0x33
    hdr[37] = 0x01
    hdr[39] = ord("1")
    hdr[70] = 20
    hdr[92:92 + 64] = tag.ljust(64)
    hdr[156:164] = b"DATA    "
    struct.pack_into(bo + "d", hdr, 168, 2.0e9)
    struct.pack_into(bo + "d", hdr, 176, 2.0e9)
    struct.pack_into(bo + "I", hdr, 200, header_size)
    struct.pack_into(bo + "I", hdr, 204, page_size)
    struct.pack_into(bo + ("Q" if u64 else "I"), hdr, 208 if u64 else 204, len(pages))
    return bytes(hdr) + b"".join(pages)


def validate(path, cols, n_rows, enc="utf-8"):
    from datetime import datetime, timedelta
    # enc="infer" additionally validates the header encoding BYTE: pandas
    # reads the code and picks the codec itself
    df = pd.read_sas(path, format="sas7bdat", encoding=enc)
    assert list(df.columns) == [c[0] for c in cols], (list(df.columns), path)
    assert len(df) == n_rows, (len(df), n_rows, path)
    for c in cols:
        name, typ, width, values = c[:4]
        fmt = c[4] if len(c) > 4 else ""
        got = df[name].tolist()
        for g, w in zip(got, values):
            if typ == "d" and w is None:
                assert pd.isna(g), (name, g, w, path)
            elif typ == "d" and fmt in ("DATE", "DATE9", "YYMMDD", "MMDDYY"):
                exp = datetime(1960, 1, 1) + timedelta(days=float(w))
                assert g == exp, (name, g, exp, path)
            elif typ == "d" and fmt in ("DATETIME", "DATETIME20"):
                exp = datetime(1960, 1, 1) + timedelta(seconds=float(w))
                assert g == exp, (name, g, exp, path)
            elif typ == "d":
                assert abs(g - float(w)) < 1e-9, (name, g, w, path)
            else:
                assert g == w, (name, repr(g), repr(w), path)
    print(f"OK {path}: {len(df)} rows, cols={list(df.columns)}, formats applied")


def make_cols(n):
    return [
        ("id", "d", 8, list(range(1, n + 1))),
        ("ratio", "d", 8, [None if i % 7 == 3 else i * 0.5 - 3.25 for i in range(n)]),
        ("name", "s", 12, [f"row_{i:03d}" for i in range(n)]),
        ("flag", "s", 1, ["Y" if i % 2 == 0 else "N" for i in range(n)]),
    ]


def main(outdir):
    fixtures = [
        # multi-page: 1 meta + several data pages (69 rows fit per 2048 page)
        ("u64_pages.sas7bdat", 200, None, dict(u64=True, page_kind="data", page_size=2048)),
        ("u64_mix.sas7bdat", 25, None, dict(u64=True, page_kind="mix", page_size=4096)),
        ("x86_mix.sas7bdat", 25, None, dict(u64=False, page_kind="mix", page_size=4096)),
        ("u64_bigend.sas7bdat", 25, None, dict(u64=True, page_kind="mix", page_size=4096, big_endian=True)),
        ("u64_dates.sas7bdat", 25, "dates", dict(u64=True, page_kind="mix", page_size=4096)),
    ]
    n = 40
    cols = make_cols(n)
    data = build_rle_file(u64=True, rows=n, cols=cols, page_size=2048)
    pth = f"{outdir}/u64_rle.sas7bdat"
    with open(pth, "wb") as f:
        f.write(data)
    validate(pth, cols, n)

    # RDC twin: same rows/geometry, SASYZCR2 literal + RDC row payloads.
    # repeat_tail forces back-reference commands (short + long copies).
    rcols = make_cols(n)
    rcols.append(("blurb", "s", 64,
                  [f"u{i:02d}vkz-!#u{i:02d}vkz" + ("PAT" + f"{i:02d}") * 5
                   for i in range(n)]))
    data = build_rle_file(u64=True, rows=n, cols=rcols, page_size=2048,
                          comp_lit=b"SASYZCR2", compressor=rdc_compress,
                          tag=b"GRAFT_RDC")
    pth = f"{outdir}/u64_rdc.sas7bdat"
    with open(pth, "wb") as f:
        f.write(data)
    validate(pth, rcols, n)

    # Non-latin1 encodings: the header byte names the codec, strings are
    # stored in it, and pandas VALIDATES with encoding="infer" — so the
    # code->codec mapping itself is cross-checked, not just the bytes.
    enc_fixtures = [
        ("u64_cp1251.sas7bdat", 61, "cp1251",
         ["Москва", "Привет мир", "данные", "Санкт-Петербург", "тест"]),
        ("u64_sjis.sas7bdat", 138, "shift_jis",
         ["東京", "こんにちは", "データ", "大阪市", "テスト"]),
    ]
    for fname, code, codec, words in enc_fixtures:
        n = len(words)
        cols = [
            ("id", "d", 8, list(range(1, n + 1))),
            ("name", "s", 24, words),
            ("flag", "s", 1, ["Y" if i % 2 == 0 else "N" for i in range(n)]),
        ]
        data = build(u64=True, page_kind="mix", rows=n, cols=cols,
                     page_size=4096, enc_code=code, enc_name=codec)
        pth = f"{outdir}/{fname}"
        with open(pth, "wb") as f:
            f.write(data)
        validate(pth, cols, n, enc="infer")

    for fname, n, kind, kw in fixtures:
        if kind == "dates":
            cols = [
                ("id", "d", 8, list(range(1, n + 1))),
                ("d1", "d", 8, [None if i == 5 else 20000 + 31 * i for i in range(n)], "DATE"),
                ("ts1", "d", 8, [None if i == 9 else 1.9e9 + 3600.0 * i for i in range(n)], "DATETIME"),
                ("plain", "d", 8, [i * 1.25 for i in range(n)]),
            ]
        else:
            cols = make_cols(n)
        data = build(rows=n, cols=cols, **kw)
        p = f"{outdir}/{fname}"
        with open(p, "wb") as f:
            f.write(data)
        validate(p, cols, n)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/sas7bdat")
