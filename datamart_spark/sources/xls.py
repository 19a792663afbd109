"""Pure-Python legacy Excel ``.xls`` (BIFF8) reader — the S6 half that
previously required xlrd.

Two public formats compose a .xls file:

- the OLE2 / Compound File Binary container ([MS-CFB]): 512-byte
  header, FAT built from the DIFAT, directory entries, and a mini-FAT
  whose 64-byte sectors live inside the root entry's stream (streams
  under the 4096-byte cutoff — small workbooks — are stored there);
- the BIFF8 workbook stream ([MS-XLS]): globals substream (DATEMODE,
  FORMAT, XF, SST with CONTINUE splits, BOUNDSHEET) followed by one
  sheet substream per sheet (NUMBER / RK / MULRK / LABELSST / BOOLERR /
  FORMULA / BLANK cell records).

Output parity targets the reference converter
(lib_materialize/datamart_materialize/excel.py:8-31, xlrd-based):
exactly one sheet required, dates → ISO-8601 via the workbook's
datemode, numbers via ``{:g}``, booleans as 1/0, rows padded to the
sheet's column count.  Date detection reuses the same builtin-id set +
format-code heuristic as the sibling xlsx reader (formats.py).
"""

from __future__ import annotations

import struct


class XlsError(ValueError):
    pass


_FREE, _ENDOFCHAIN = 0xFFFFFFFF, 0xFFFFFFFE


def _cfb_stream(data: bytes, name_wanted: tuple[str, ...]) -> bytes:
    """Extract a named stream from an OLE2 compound file ([MS-CFB])."""
    if data[:8] != b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
        raise XlsError("not an OLE2 compound file")
    if len(data) < 512 + 512:  # header + at least one sector
        raise XlsError("truncated OLE2 compound file")
    sect_shift, mini_shift = struct.unpack("<HH", data[30:34])
    ssz, mssz = 1 << sect_shift, 1 << mini_shift
    n_fat = struct.unpack("<I", data[44:48])[0]
    dir_start = struct.unpack("<I", data[48:52])[0]
    mini_cutoff = struct.unpack("<I", data[56:60])[0]
    minifat_start = struct.unpack("<I", data[60:64])[0]
    difat_start = struct.unpack("<I", data[68:72])[0]
    n_difat = struct.unpack("<I", data[72:76])[0]

    def sector(i: int) -> bytes:
        # [MS-CFB]: sector 0 begins one FULL sector after offset 0, so
        # v4 files (4096-byte sectors) start their data at 4096, not 512
        off = (i + 1) * ssz
        return data[off:off + ssz]

    # DIFAT: 109 entries in the header + chained DIFAT sectors
    difat = list(struct.unpack("<109I", data[76:512]))
    s = difat_start
    for _ in range(n_difat):
        body = sector(s)
        difat.extend(struct.unpack(f"<{ssz // 4 - 1}I", body[:-4]))
        s = struct.unpack("<I", body[-4:])[0]
    fat: list[int] = []
    for i in range(n_fat):
        fat.extend(struct.unpack(f"<{ssz // 4}I", sector(difat[i])))

    def chain(start: int, limit: int) -> bytes:
        out = bytearray()
        s = start
        while s != _ENDOFCHAIN and s != _FREE and len(out) < limit:
            out += sector(s)
            s = fat[s]
        return bytes(out[:limit])

    # directory entries (128 bytes each)
    dirdata = chain(dir_start, len(data))
    entries = []
    for off in range(0, len(dirdata) - 127, 128):
        e = dirdata[off:off + 128]
        (name_len,) = struct.unpack("<H", e[64:66])
        if name_len < 2:
            continue
        name = e[:name_len - 2].decode("utf-16-le", "replace")
        start, size = struct.unpack("<II", e[116:124])
        entries.append((name, e[66], start, size))
    root = next((e for e in entries if e[1] == 5), None)
    target = next((e for e in entries if e[0] in name_wanted), None)
    if target is None:
        raise XlsError(
            f"no {'/'.join(name_wanted)} stream in compound file"
        )
    _, _, start, size = target
    if size >= mini_cutoff:
        return chain(start, size)
    # small stream: mini-FAT sectors inside the root entry's stream
    if root is None:
        raise XlsError("compound file has no root entry")
    ministream = chain(root[2], root[3])
    minifat: list[int] = []
    s = minifat_start
    while s != _ENDOFCHAIN and s != _FREE:
        minifat.extend(struct.unpack(f"<{ssz // 4}I", sector(s)))
        s = fat[s]
    out = bytearray()
    s = start
    while s != _ENDOFCHAIN and s != _FREE and len(out) < size:
        out += ministream[s * mssz:(s + 1) * mssz]
        s = minifat[s]
    return bytes(out[:size])


def _rk_value(rk: int) -> float:
    """Decode a 30-bit RK number ([MS-XLS] 2.5.217)."""
    mul100 = rk & 1
    if rk & 2:  # signed 30-bit integer
        v = rk >> 2
        if v & 0x20000000:
            v -= 0x40000000
        v = float(v)
    else:  # high 30 bits of an IEEE double
        v = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    return v / 100.0 if mul100 else v


def _parse_records(stream: bytes):
    pos = 0
    while pos + 4 <= len(stream):
        rid, ln = struct.unpack("<HH", stream[pos:pos + 4])
        yield rid, pos + 4, ln
        pos += 4 + ln


def _read_sst(stream: bytes, pos: int, ln: int) -> list[str]:
    """Parse the SST record plus its CONTINUE records: XLUnicode
    strings may split at any point, and a split restarts with a fresh
    grbit byte ([MS-XLS] 2.5.293)."""
    # collect the SST payload fragments (SST body + CONTINUEs)
    frags = [(pos, ln)]
    nxt = pos + ln
    while nxt + 4 <= len(stream):
        rid, l2 = struct.unpack("<HH", stream[nxt:nxt + 4])
        if rid != 0x003C:  # CONTINUE
            break
        frags.append((nxt + 4, l2))
        nxt += 4 + l2
    fi = 0
    fpos, fleft = frags[0][0], frags[0][1]

    def take(n: int) -> bytes:
        nonlocal fi, fpos, fleft
        out = bytearray()
        while n > 0:
            if fleft == 0:
                fi += 1
                fpos, fleft = frags[fi]
            m = min(n, fleft)
            out += stream[fpos:fpos + m]
            fpos += m
            fleft -= m
            n -= m
        return bytes(out)

    def take_chars(cch: int, high: bool) -> str:
        nonlocal fi, fpos, fleft
        out = []
        while cch > 0:
            if fleft == 0:
                fi += 1
                fpos, fleft = frags[fi]
                # a split restarts with a fresh high-byte flag
                high = bool(take(1)[0] & 1)
            per = 2 if high else 1
            m = min(cch, fleft // per)
            if m == 0:  # fewer than one char left in fragment
                fi += 1
                fpos, fleft = frags[fi]
                high = bool(take(1)[0] & 1)
                continue
            raw = take(m * per)
            out.append(raw.decode("utf-16-le" if high else "latin-1"))
            cch -= m
        return "".join(out)

    take(4)  # total string count
    (n_unique,) = struct.unpack("<I", take(4))
    strings = []
    for _ in range(n_unique):
        (cch,) = struct.unpack("<H", take(2))
        grbit = take(1)[0]
        high = bool(grbit & 1)
        n_runs = struct.unpack("<H", take(2))[0] if grbit & 8 else 0
        cb_ext = struct.unpack("<I", take(4))[0] if grbit & 4 else 0
        strings.append(take_chars(cch, high))
        if n_runs:
            take(4 * n_runs)
        if cb_ext:
            take(cb_ext)
    return strings


def _read_xls(data: bytes, is_date_fmt) -> tuple[list[list], int]:
    """→ (rows of typed cells, n_sheets).  Cells: str | float |
    ('date', serial) | int (bool/error, matching xlrd's row_values)."""
    wb = _cfb_stream(data, ("Workbook", "Book"))

    date1904 = False
    xf_is_date: list[bool] = []
    custom: dict[int, str] = {}
    sst: list[str] = []
    sheet_offsets: list[int] = []

    from .formats import _XLSX_DATE_FMT_IDS

    recs = list(_parse_records(wb))
    for rid, pos, ln in recs:
        if rid == 0x0022:  # DATEMODE
            date1904 = struct.unpack("<H", wb[pos:pos + 2])[0] == 1
        elif rid == 0x041E:  # FORMAT
            ifmt, cch = struct.unpack("<HH", wb[pos:pos + 4])
            grbit = wb[pos + 4]
            raw = wb[pos + 5:pos + 5 + cch * (2 if grbit & 1 else 1)]
            custom[ifmt] = raw.decode(
                "utf-16-le" if grbit & 1 else "latin-1", "replace"
            )
        elif rid == 0x00E0:  # XF
            ifmt = struct.unpack("<H", wb[pos + 2:pos + 4])[0]
            xf_is_date.append(
                ifmt in _XLSX_DATE_FMT_IDS
                or (ifmt in custom and is_date_fmt(custom[ifmt]))
            )
        elif rid == 0x00FC:  # SST
            sst = _read_sst(wb, pos, ln)
        elif rid == 0x0085:  # BOUNDSHEET
            sheet_offsets.append(struct.unpack("<I", wb[pos:pos + 4])[0])
        elif rid == 0x000A:  # EOF of the globals substream
            break

    if len(sheet_offsets) != 1:
        raise ValueError("Excel workbook has %d sheets" % len(sheet_offsets))

    def is_date(ixfe: int) -> bool:
        return 0 <= ixfe < len(xf_is_date) and xf_is_date[ixfe]

    cells: dict[tuple[int, int], object] = {}
    start = sheet_offsets[0]
    for rid, pos, ln in _parse_records(wb[start:]):
        pos += start
        if rid == 0x000A:  # EOF of the sheet substream
            break
        if rid == 0x0203:  # NUMBER
            r, c, ixfe = struct.unpack("<HHH", wb[pos:pos + 6])
            v = struct.unpack("<d", wb[pos + 6:pos + 14])[0]
            cells[(r, c)] = ("date", v) if is_date(ixfe) else v
        elif rid == 0x027E:  # RK
            r, c, ixfe = struct.unpack("<HHH", wb[pos:pos + 6])
            rk = struct.unpack("<I", wb[pos + 6:pos + 10])[0]
            v = _rk_value(rk)
            cells[(r, c)] = ("date", v) if is_date(ixfe) else v
        elif rid == 0x00BD:  # MULRK
            r, c0 = struct.unpack("<HH", wb[pos:pos + 4])
            n = (ln - 6) // 6
            for j in range(n):
                ixfe, rk = struct.unpack(
                    "<HI", wb[pos + 4 + 6 * j:pos + 10 + 6 * j]
                )
                v = _rk_value(rk)
                cells[(r, c0 + j)] = ("date", v) if is_date(ixfe) else v
        elif rid == 0x00FD:  # LABELSST
            r, c = struct.unpack("<HH", wb[pos:pos + 4])
            isst = struct.unpack("<I", wb[pos + 6:pos + 10])[0]
            cells[(r, c)] = sst[isst]
        elif rid == 0x0205:  # BOOLERR
            r, c = struct.unpack("<HH", wb[pos:pos + 4])
            val, is_err = wb[pos + 6], wb[pos + 7]
            cells[(r, c)] = int(val)  # xlrd: bool→1/0, error→code
        elif rid == 0x0006:  # FORMULA (cached result)
            r, c, ixfe = struct.unpack("<HHH", wb[pos:pos + 6])
            res = wb[pos + 6:pos + 14]
            if res[6:8] == b"\xff\xff":
                kind = res[0]
                if kind == 0:  # string result in a following STRING rec
                    for rid2, p2, l2 in _parse_records(wb[pos + ln:]):
                        if rid2 in (0x04BC, 0x0221, 0x0236):
                            continue  # SHRFMLA / ARRAY / TABLE in between
                        if rid2 == 0x0207:
                            p2 += pos + ln
                            cch, grbit = struct.unpack(
                                "<HB", wb[p2:p2 + 3]
                            )
                            raw = wb[p2 + 3:p2 + 3 + cch * (2 if grbit & 1 else 1)]
                            cells[(r, c)] = raw.decode(
                                "utf-16-le" if grbit & 1 else "latin-1",
                                "replace",
                            )
                        break
                elif kind in (1, 2):  # bool / error
                    cells[(r, c)] = int(res[2])
            else:
                v = struct.unpack("<d", res)[0]
                cells[(r, c)] = ("date", v) if is_date(ixfe) else v
        elif rid in (0x0201, 0x00BE):  # BLANK / MULBLANK: xlrd counts them
            r, c = struct.unpack("<HH", wb[pos:pos + 4])
            cells.setdefault((r, c), "")
            if rid == 0x00BE:
                c_last = struct.unpack("<H", wb[pos + ln - 2:pos + ln])[0]
                for cc in range(c, c_last + 1):
                    cells.setdefault((r, cc), "")

    if not cells:
        return ([], 1), date1904
    nrows = max(r for r, _ in cells) + 1
    ncols = max(c for _, c in cells) + 1
    return (
        [[cells.get((r, c), "") for c in range(ncols)] for r in range(nrows)],
        1,
    ), date1904


def xls_to_csv(src: str, dst: str) -> None:
    """S6 legacy converter (reference lib_materialize/excel.py:8-31):
    one sheet, ISO-8601 dates, '{:g}' numbers, booleans/errors as ints."""
    import csv

    from .formats import _xlsx_is_date_fmt, _xlsx_serial_to_iso

    with open(src, "rb") as f:
        data = f.read()
    try:
        (rows, _), date1904 = _read_xls(data, _xlsx_is_date_fmt)
    except (struct.error, IndexError) as e:
        raise XlsError(f"corrupt .xls file: {e}") from e
    with open(dst, "w", newline="") as fout:
        wr = csv.writer(fout)
        for row in rows:
            out = []
            for v in row:
                if isinstance(v, tuple):  # ('date', serial)
                    out.append(_xlsx_serial_to_iso(v[1], date1904))
                elif isinstance(v, float):
                    out.append("{0:g}".format(v))
                else:
                    out.append(v)
            wr.writerow(out)
