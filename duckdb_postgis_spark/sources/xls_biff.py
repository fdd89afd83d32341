"""Pure-stdlib legacy ``.xls`` (BIFF8) reader.

Closes the last FileType gap from the reference surface
(``src/core_processor.rs:14-22`` FileType::Excel, Excel read at
``:407-412``; legacy-xls tests at ``tests/duckdb_tests.rs:70-83``)
without xlrd, which is absent here.

Two public-spec layers, both implemented minimally but faithfully:

- **MS-CFB**: the OLE2 compound file container — header, DIFAT→FAT, sector
  chains, directory entries, and the mini-FAT/mini-stream used for streams
  under 4096 bytes (the common case for small spreadsheets).
- **MS-XLS (BIFF8)**: record stream walk — workbook globals (SST shared
  strings incl. CONTINUE splits, BOUNDSHEET sheet offsets), then the first
  worksheet's cell records (LABELSST, NUMBER, RK, MULRK, LABEL, BOOLERR,
  RSTRING, FORMULA cached results + their STRING records), stopping at the
  sheet's EOF.

Driver-side by design, like the xlsx path: spreadsheets arrive as single
small files; at 100 TB scale the pipeline pre-converts to parquet.
"""

from __future__ import annotations

import struct

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE


def _read_chain(data: bytes, fat: list[int], start: int, sector_size: int) -> bytes:
    """Concatenate the sector chain beginning at ``start`` (regular FAT)."""
    out = bytearray()
    sect = start
    seen = 0
    while sect != _ENDOFCHAIN and sect != _FREESECT:
        # MS-CFB §2.1: sector #n begins at (n+1)*sector_size — the header
        # occupies the whole of sector -1 (512 B used; V4 pads to 4096)
        off = (sect + 1) * sector_size
        out += data[off : off + sector_size]
        sect = fat[sect]
        seen += 1
        if seen > len(fat) + 1:
            raise ValueError("CFB: FAT chain cycle")
    return bytes(out)


def _cfb_open_stream(data: bytes, *names: str) -> bytes:
    """Open a named stream out of a CFB container (MS-CFB §2)."""
    if data[:8] != _CFB_MAGIC:
        raise ValueError("not an OLE2/CFB file (bad magic)")
    sector_shift = struct.unpack_from("<H", data, 30)[0]
    mini_shift = struct.unpack_from("<H", data, 32)[0]
    n_fat = struct.unpack_from("<I", data, 44)[0]
    first_dir = struct.unpack_from("<I", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    first_minifat = struct.unpack_from("<I", data, 60)[0]
    sector_size = 1 << sector_shift
    mini_size = 1 << mini_shift

    # DIFAT: first 109 FAT sector numbers live in the header; larger files
    # chain further DIFAT sectors (not needed for spreadsheet-sized inputs,
    # but walked anyway for correctness).  Sector #n starts at
    # (n+1)*sector_size (MS-CFB §2.1) — correct for both V3 (512) and V4
    # (4096) containers.
    difat = list(struct.unpack_from("<109I", data, 76))
    next_difat = struct.unpack_from("<I", data, 68)[0]
    while next_difat not in (_ENDOFCHAIN, _FREESECT):
        off = (next_difat + 1) * sector_size
        more = struct.unpack_from(f"<{sector_size // 4}I", data, off)
        difat += more[:-1]
        next_difat = more[-1]
    fat_sectors = [s for s in difat if s != _FREESECT][:n_fat]

    fat: list[int] = []
    for s in fat_sectors:
        off = (s + 1) * sector_size
        fat += struct.unpack_from(f"<{sector_size // 4}I", data, off)

    directory = _read_chain(data, fat, first_dir, sector_size)
    root_start = root_size = None
    target_start = target_size = None
    for off in range(0, len(directory), 128):
        entry = directory[off : off + 128]
        if len(entry) < 128:
            break
        name_len = struct.unpack_from("<H", entry, 64)[0]
        etype = entry[66]
        if etype == 0 or name_len < 2:
            continue
        name = entry[: name_len - 2].decode("utf-16-le", errors="replace")
        start = struct.unpack_from("<I", entry, 116)[0]
        size = struct.unpack_from("<Q", entry, 120)[0]
        if etype == 5:  # root: its chain IS the mini-stream
            root_start, root_size = start, size
        elif etype == 2 and name in names:
            target_start, target_size = start, size
    if target_start is None:
        raise ValueError(f"CFB: no stream named {names!r}")

    if target_size >= mini_cutoff:
        return _read_chain(data, fat, target_start, sector_size)[:target_size]

    # mini-stream path: the root chain holds all mini sectors; the mini-FAT
    # (its own regular chain) maps mini-sector links
    ministream = _read_chain(data, fat, root_start, sector_size)[:root_size]
    minifat_raw = _read_chain(data, fat, first_minifat, sector_size)
    minifat = list(struct.unpack_from(f"<{len(minifat_raw) // 4}I", minifat_raw))
    out = bytearray()
    sect = target_start
    seen = 0
    while sect != _ENDOFCHAIN and sect != _FREESECT:
        out += ministream[sect * mini_size : (sect + 1) * mini_size]
        sect = minifat[sect]
        seen += 1
        if seen > len(minifat) + 1:
            raise ValueError("CFB: mini-FAT chain cycle")
    return bytes(out[:target_size])


# --------------------------------------------------------------------------
# BIFF8 record layer
# --------------------------------------------------------------------------
_BOF, _EOF, _SST, _CONTINUE = 0x0809, 0x000A, 0x00FC, 0x003C
_BOUNDSHEET, _LABELSST, _LABEL, _RSTRING = 0x0085, 0x00FD, 0x0204, 0x00D6
_NUMBER, _RK, _MULRK, _BOOLERR, _FORMULA, _STRING = (
    0x0203, 0x027E, 0x00BD, 0x0205, 0x0006, 0x0207,
)
# records MS-XLS permits between a string-result FORMULA and its STRING
# (SHRFMLA / ARRAY / TABLE share the formula expression)
_FORMULA_INTERVENERS = frozenset({0x04BC, 0x0221, 0x0236})


def _records(stream: bytes, pos: int = 0):
    """Yield (opcode, payload, offset) until stream end."""
    n = len(stream)
    while pos + 4 <= n:
        op, ln = struct.unpack_from("<HH", stream, pos)
        yield op, stream[pos + 4 : pos + 4 + ln], pos
        pos += 4 + ln


def _decode_rk(rk: int) -> float | int:
    """RK-compressed number (MS-XLS 2.5.122): bit0 = ÷100, bit1 = int30."""
    if rk & 0x02:
        v = rk >> 2
        if v & 0x20000000:  # sign-extend 30-bit
            v -= 0x40000000
        num: float | int = v
    else:
        num = struct.unpack("<d", b"\x00\x00\x00\x00" + struct.pack("<I", rk & 0xFFFFFFFC))[0]
    if rk & 0x01:
        num = num / 100
        return int(num) if float(num).is_integer() else num
    return num


def _parse_sst(payload: bytes, continues: list[bytes]) -> list[str]:
    """Shared string table (MS-XLS 2.4.265) with CONTINUE handling.

    Strings are XLUnicodeRichExtendedString: cch u16, flags u8
    (0x01 wide-chars, 0x04 phonetic-ext, 0x08 rich-runs), optional run/ext
    counts, then the characters.  A string may split at a CONTINUE
    boundary, where a FRESH flags byte restates the encoding of the
    remainder — the one genuinely tricky part of BIFF8.
    """
    chunks = [payload] + continues
    ci, pos = 0, 0

    def need(k: int) -> bytes:
        """Read k bytes, hopping chunks; only callers that may legally span
        a boundary (character data) go through _chars instead."""
        nonlocal ci, pos
        buf = bytearray()
        while k:
            avail = len(chunks[ci]) - pos
            if avail == 0:
                ci += 1
                pos = 0
                continue
            take = min(k, avail)
            buf += chunks[ci][pos : pos + take]
            pos += take
            k -= take
        return bytes(buf)

    cst_unique = struct.unpack("<I", need(8)[4:])[0]
    out: list[str] = []
    for _ in range(cst_unique):
        cch = struct.unpack("<H", need(2))[0]
        flags = need(1)[0]
        wide = flags & 0x01
        n_runs = struct.unpack("<H", need(2))[0] if flags & 0x08 else 0
        cb_ext = struct.unpack("<I", need(4))[0] if flags & 0x04 else 0
        text = ""
        remaining = cch
        while remaining:
            nonlocal_avail = len(chunks[ci]) - pos
            if nonlocal_avail == 0:
                ci += 1
                pos = 0
                # continuation restates the encoding for the remainder
                wide = chunks[ci][pos] & 0x01
                pos += 1
                continue
            width = 2 if wide else 1
            take = min(remaining, nonlocal_avail // width)
            if take == 0:  # split mid-char (wide): force hop
                ci += 1
                pos = 0
                wide = chunks[ci][pos] & 0x01
                pos += 1
                continue
            raw = chunks[ci][pos : pos + take * width]
            pos += take * width
            text += raw.decode("utf-16-le" if wide else "latin-1")
            remaining -= take
        need(4 * n_runs + cb_ext)  # skip formatting runs / phonetic block
        out.append(text)
    return out


def _short_unicode(payload: bytes, off: int) -> str:
    """XLUnicodeString with u16 cch at ``off`` (BOUNDSHEET uses u8)."""
    cch = struct.unpack_from("<H", payload, off)[0]
    wide = payload[off + 2] & 0x01
    raw = payload[off + 3 : off + 3 + cch * (2 if wide else 1)]
    return raw.decode("utf-16-le" if wide else "latin-1")


def parse_xls(data: bytes) -> tuple[list[str], list[list]]:
    """Parse a BIFF8 ``.xls`` byte string → (header, data rows), same shape
    as the xlsx parser so ``read_excel`` shares one materialization path."""
    stream = _cfb_open_stream(data, "Workbook", "Book")

    # pass 1: workbook globals — SST + first BOUNDSHEET offset
    sst: list[str] = []
    sheet_offsets: list[int] = []
    rec_iter = _records(stream)
    for op, payload, _off in rec_iter:
        if op == _SST:
            continues: list[bytes] = []
            # CONTINUE records immediately follow their SST
            for op2, p2, _o2 in _records(stream, _off + 4 + len(payload)):
                if op2 != _CONTINUE:
                    break
                continues.append(p2)
            sst = _parse_sst(payload, continues)
        elif op == _BOUNDSHEET:
            sheet_offsets.append(struct.unpack_from("<I", payload, 0)[0])
        elif op == _EOF:
            break
    if not sheet_offsets:
        raise ValueError("BIFF8: no BOUNDSHEET record (no worksheets)")

    # pass 2: first worksheet cells
    cells: dict[tuple[int, int], object] = {}
    pending_str: tuple[int, int] | None = None  # FORMULA awaiting its STRING
    for op, payload, _off in _records(stream, sheet_offsets[0]):
        # a string-result FORMULA's STRING must follow immediately (only
        # SHRFMLA/ARRAY/TABLE may intervene, MS-XLS 2.4.127); any other
        # record clears the expectation so a malformed file can't attribute
        # a later unrelated STRING to the wrong cell (round-6 advice fix)
        if pending_str is not None and op not in _FORMULA_INTERVENERS and op != _STRING:
            pending_str = None
        if op == _EOF:
            break
        elif op == _FORMULA:
            # MS-XLS 2.4.127: cached result lives in the record — an IEEE
            # double, unless bytes 6-7 of the FormulaValue are 0xFFFF, in
            # which case byte 0 tags: 0=string (value in the STRING record
            # that follows), 1=bool, 2=error, 3=empty string
            rw, col, _xf = struct.unpack_from("<HHH", payload)
            if payload[12:14] == b"\xff\xff":
                tag = payload[6]
                if tag == 0:
                    pending_str = (rw, col)
                elif tag == 1:
                    cells[(rw, col)] = bool(payload[8])
                elif tag == 3:
                    cells[(rw, col)] = ""
                # tag 2 (error): cell stays absent, like BOOLERR errors
            else:
                num = struct.unpack_from("<d", payload, 6)[0]
                cells[(rw, col)] = int(num) if num.is_integer() else num
        elif op == _STRING and pending_str is not None:
            cells[pending_str] = _short_unicode(payload, 0)
            pending_str = None
        elif op == _LABELSST:
            rw, col, _xf, isst = struct.unpack_from("<HHHI", payload)
            cells[(rw, col)] = sst[isst]
        elif op == _NUMBER:
            rw, col, _xf = struct.unpack_from("<HHH", payload)
            num = struct.unpack_from("<d", payload, 6)[0]
            cells[(rw, col)] = int(num) if num.is_integer() else num
        elif op == _RK:
            rw, col, _xf, rk = struct.unpack_from("<HHHI", payload)
            cells[(rw, col)] = _decode_rk(rk)
        elif op == _MULRK:
            rw, col_first = struct.unpack_from("<HH", payload)
            n = (len(payload) - 6) // 6
            for i in range(n):
                _xf, rk = struct.unpack_from("<HI", payload, 4 + i * 6)
                cells[(rw, col_first + i)] = _decode_rk(rk)
        elif op in (_LABEL, _RSTRING):
            rw, col, _xf = struct.unpack_from("<HHH", payload)
            cells[(rw, col)] = _short_unicode(payload, 6)
        elif op == _BOOLERR:
            rw, col, _xf, val, is_err = struct.unpack_from("<HHHBB", payload)
            if not is_err:
                cells[(rw, col)] = bool(val)

    if not cells:
        return [], []
    n_rows = max(r for r, _ in cells) + 1
    n_cols = max(c for _, c in cells) + 1
    grid = [[cells.get((r, c)) for c in range(n_cols)] for r in range(n_rows)]
    header = [str(h) if h is not None else f"c{i}" for i, h in enumerate(grid[0])]
    return header, grid[1:]
