"""Pure-Python SPSS ``.sav`` (system file) reader — the S8 converter
without pyreadstat.

The system-file format is publicly documented (PSPP manual, "System
File Format"): a 176-byte header, type-2 variable records (with
continuation records for wide strings), type-3/4 value-label records,
type-6 documents, type-7 extension records (long variable names live in
subtype 13), a type-999 dictionary terminator, then case data — raw
8-byte elements or the bias-compressed bytecode (command bytes 0/252/
253/254/255, small integers as ``code − bias``).

Output parity targets the reference converter
(lib_materialize/datamart_materialize/spss.py:6-13): pyreadstat +
``to_csv(float_format='%g', index=False, line_terminator='\\r\\n')`` —
numerics as ``%g``, system-missing as empty cells, trailing-space-
stripped strings, DATE-family columns as ISO dates and DATETIME as
``YYYY-MM-DD HH:MM:SS`` (SPSS times are seconds since 1582-10-14).

zsav (``$FL3``) is supported: its case data is the same bias-compressed
bytecode wrapped in the PSPP-documented ZLIB data record — a 24-byte
header (zheader_ofs / ztrailer_ofs / ztrailer_len int64s), independent
zlib streams, and a trailer of per-block descriptors — decompressed and
fed to the same bytecode decoder.  Value labels and missing-value
ranges are parsed past (the reference's CSV output ignores them too).
"""

from __future__ import annotations

import csv
import datetime as dt
import struct
import zlib

_EPOCH = dt.datetime(1582, 10, 14)
_SYSMIS = float("-1.7976931348623157e+308")

#: print-format TYPE codes (PSPP manual): DATE family → date output
_DATE_TYPES = frozenset([20, 23, 24, 38, 39])  # DATE ADATE JDATE EDATE SDATE
_DATETIME_TYPES = frozenset([22])              # DATETIME


class SavError(ValueError):
    pass


def _zsav_case_bytes(data: bytes, pos: int, en: str) -> bytes:
    """ZLIB data record (PSPP manual, "ZLIB Compressed Data Record"):
    a 24-byte header — zheader_ofs (must equal this record's own file
    offset), ztrailer_ofs, ztrailer_len as int64 — followed by
    independent zlib streams, then a trailer holding int64 bias, int64
    zero, int32 block_size, int32 n_blocks and one
    (uncompressed_ofs, compressed_ofs, uncompressed_size,
    compressed_size) descriptor per block.  Returns the concatenated
    decompressed case stream (the ordinary bias-compressed bytecode)."""
    if pos + 24 > len(data):
        raise SavError("zsav: truncated ZLIB header")
    zheader_ofs, ztrailer_ofs, ztrailer_len = struct.unpack(
        en + "qqq", data[pos:pos + 24]
    )
    if zheader_ofs != pos:
        raise SavError("zsav: ZLIB header offset mismatch")
    if ztrailer_len < 24 or ztrailer_ofs + ztrailer_len > len(data):
        raise SavError("zsav: ZLIB trailer out of bounds")
    t = ztrailer_ofs
    _bias, _zero, _block_size, n_blocks = struct.unpack(
        en + "qqii", data[t:t + 24]
    )
    if ztrailer_len != 24 + 24 * n_blocks:
        raise SavError("zsav: trailer length disagrees with block count")
    out = bytearray()
    off = t + 24
    for _ in range(n_blocks):
        _unc_ofs, cmp_ofs, unc_len, cmp_len = struct.unpack(
            en + "qqii", data[off:off + 24]
        )
        off += 24
        if unc_len < 0 or unc_len > 0x10000000:  # 256 MiB/block sanity cap
            raise SavError("zsav: implausible uncompressed block size")
        try:
            # cap output at unc_len+1 so a crafted block claiming a huge
            # expansion cannot allocate unbounded memory before the size
            # check (decompression-bomb guard on untrusted input)
            d = zlib.decompressobj()
            chunk = d.decompress(data[cmp_ofs:cmp_ofs + cmp_len], unc_len + 1)
        except zlib.error as e:
            raise SavError(f"zsav: bad ZLIB block: {e}") from None
        if len(chunk) != unc_len or d.unconsumed_tail:
            raise SavError("zsav: block decompressed to unexpected size")
        out += chunk
    return bytes(out)


def _read_sav(path: str):
    """→ (column names, per-column print-format types, list of rows)."""
    with open(path, "rb") as f:
        data = f.read()
    zsav = data[:4] == b"$FL3"
    if not zsav and data[:4] != b"$FL2":
        raise SavError("not an SPSS system file (missing $FL2 magic)")
    if len(data) < 176:
        raise SavError("truncated system file (header is 176 bytes)")

    # endianness from layout_code at offset 64 (2, or 3 for IBM variants)
    (lc_le,) = struct.unpack("<i", data[64:68])
    en = "<" if lc_le in (2, 3) else ">"
    _, compression, _, ncases = struct.unpack(en + "iiii", data[68:84])
    (bias,) = struct.unpack(en + "d", data[84:92])
    pos = 176

    def i4() -> int:
        nonlocal pos
        (v,) = struct.unpack(en + "i", data[pos:pos + 4])
        pos += 4
        return v

    cols: list[dict] = []      # visible columns
    elements: list[tuple] = [] # per-case element schema: ("n",) | ("s", nseg)
    longnames: dict[str, str] = {}
    encoding = None

    while pos + 4 <= len(data):
        rtype = i4()
        if rtype == 2:  # variable record
            vtype = i4()
            has_label = i4()
            n_missing = i4()
            print_fmt = i4()
            i4()  # write format
            name = data[pos:pos + 8].rstrip(b" \x00").decode(
                "latin-1"
            )
            pos += 8
            if has_label:
                ll = i4()
                pos += (ll + 3) // 4 * 4
            if n_missing:
                pos += abs(n_missing) * 8
            if vtype == -1:
                continue  # continuation of a wide string (already counted)
            fmt_type = (print_fmt >> 16) & 0xFF
            if vtype == 0:
                cols.append({"name": name, "kind": "n", "fmt": fmt_type})
                elements.append(("n",))
            else:
                nseg = (vtype + 7) // 8
                cols.append({"name": name, "kind": "s", "width": vtype,
                             "fmt": fmt_type})
                elements.append(("s", nseg))
        elif rtype == 3:  # value labels
            n = i4()
            for _ in range(n):
                pos += 8  # value
                ll = data[pos]
                # length byte + text, padded so (1 + ll) is a multiple of 8
                pos += (1 + ll + 7) // 8 * 8
        elif rtype == 4:  # variable indexes for the preceding labels
            n = i4()
            pos += 4 * n
        elif rtype == 6:  # documents
            n = i4()
            pos += 80 * n
        elif rtype == 7:  # extension record
            subtype = i4()
            size = i4()
            count = i4()
            payload = data[pos:pos + size * count]
            pos += size * count
            if subtype == 14 and payload.strip(b"\x00"):
                # very-long-string stitching: a >255-byte string is split
                # into several dictionary variables; emitting them as
                # separate columns would be silently wrong — refuse
                raise SavError(
                    "very long strings (>255 bytes, subtype 14) unsupported"
                )
            if subtype == 13:  # long variable names: SHORT=Long\tSHORT=...
                for pair in payload.decode("latin-1", "replace").split("\t"):
                    if "=" in pair:
                        short, long_ = pair.split("=", 1)
                        longnames[short.strip()] = long_.strip()
            elif subtype == 20:  # character encoding
                encoding = payload.decode("ascii", "replace").strip("\x00 ")
        elif rtype == 999:  # dictionary terminator
            i4()  # filler
            break
        else:
            raise SavError(f"unknown .sav record type {rtype}")

    for c in cols:
        c["longname"] = longnames.get(c["name"])
    enc = encoding or "utf-8"

    def decode_str(b: bytes) -> str:
        try:
            return b.decode(enc)
        except (UnicodeDecodeError, LookupError):
            return b.decode("latin-1")

    # --- case data -----------------------------------------------------
    if zsav:
        # the decompressed stream is the ordinary bytecode form
        data, pos, compression = _zsav_case_bytes(data, pos, en), 0, 1
    raw_elements: list[bytes | float] = []
    if compression == 0:
        while pos + 8 <= len(data):
            raw_elements.append(data[pos:pos + 8])
            pos += 8
    elif compression == 1:
        eof = False
        while not eof and pos + 8 <= len(data):
            cmds = data[pos:pos + 8]
            pos += 8
            for c in cmds:
                if c == 0:
                    continue
                if c == 252:
                    eof = True
                    break
                if c == 253:
                    raw_elements.append(data[pos:pos + 8])
                    pos += 8
                elif c == 254:
                    raw_elements.append(b"        ")
                elif c == 255:
                    raw_elements.append(_SYSMIS)
                else:
                    raw_elements.append(float(c) - bias)
    else:
        raise SavError(f"unsupported .sav compression code {compression}")

    def num(e) -> float:
        if isinstance(e, float):
            return e
        if e == b"        ":
            # compression code 254 (all-spaces element) reaching a
            # NUMERIC variable: only on malformed/unusual files —
            # unpacking the 8 spaces would yield a garbage double
            # (~7.3e228); treat as system-missing (ADVICE r4)
            return _SYSMIS
        return struct.unpack(en + "d", e)[0]

    def raw(e) -> bytes:
        if isinstance(e, float):
            return b" " * 8  # sysmis inside a string: blank
        return e

    per_case = sum(1 if k[0] == "n" else k[1] for k in elements)
    rows = []
    i = 0
    while i + per_case <= len(raw_elements):
        if ncases >= 0 and len(rows) >= ncases:
            break
        row = []
        for col, el in zip(cols, elements):
            if el[0] == "n":
                v = num(raw_elements[i])
                i += 1
                row.append(None if v == _SYSMIS else v)
            else:
                b = b"".join(raw(raw_elements[i + j]) for j in range(el[1]))
                i += el[1]
                row.append(decode_str(b[:col["width"]]).rstrip())
        rows.append(row)
    return cols, rows


def sav_to_csv(src: str, dst: str) -> None:
    """S8 converter, pyreadstat-free (reference parity:
    lib_materialize/datamart_materialize/spss.py:6-13 — '%g' floats,
    empty cells for system-missing, CRLF line endings, ISO dates)."""
    cols, rows = _read_sav(src)

    def cell(col, v):
        if v is None:
            return ""
        if col["kind"] == "s":
            return v
        if col["fmt"] in _DATE_TYPES:
            return (_EPOCH + dt.timedelta(seconds=v)).date().isoformat()
        if col["fmt"] in _DATETIME_TYPES:
            return (_EPOCH + dt.timedelta(seconds=v)).strftime(
                "%Y-%m-%d %H:%M:%S"
            )
        return "%g" % v

    with open(dst, "w", newline="") as f:
        wr = csv.writer(f, lineterminator="\r\n")
        wr.writerow(c.get("longname") or c["name"] for c in cols)
        for r in rows:
            wr.writerow(cell(c, v) for c, v in zip(cols, r))
