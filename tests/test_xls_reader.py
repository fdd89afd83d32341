"""Legacy ``.xls`` (BIFF8) reader tests.

The sandbox has no xlrd/xlwt, so the fixtures are handcrafted from the
public MS-CFB / MS-XLS specs: a minimal OLE2 container (header, FAT,
directory, mini-FAT + mini-stream) wrapping a BIFF8 Workbook stream.
The writer below is test-only and deliberately independent of the reader's
code paths (it lays out sectors forward; the reader walks FAT chains), so
agreement is evidence of both sides matching the spec, not each other.

Covers reference parity for legacy Excel ingestion
(``/root/reference/tests/duckdb_tests.rs:70-83``).
"""

from __future__ import annotations

import struct

import pytest

from duckdb_postgis_spark.sources.readers import read_excel
from duckdb_postgis_spark.sources.sniffer import FileType, determine_file_type


# --------------------------------------------------------------------------
# BIFF8 record builders
# --------------------------------------------------------------------------
def _rec(op: int, payload: bytes) -> bytes:
    return struct.pack("<HH", op, len(payload)) + payload


def _bof(dt: int) -> bytes:
    return _rec(0x0809, struct.pack("<HHHHII", 0x0600, dt, 0x0DBB, 0x07CC, 0, 0))


def _sst(strings: list[str], split_first_at: int | None = None) -> bytes:
    """SST record; when ``split_first_at`` is set, the first string's
    character data is split across a CONTINUE record at that char index
    (the continuation restates its own flags byte, per MS-XLS 2.5.296)."""
    head = struct.pack("<II", len(strings), len(strings))
    if split_first_at is None:
        body = b"".join(
            struct.pack("<HB", len(s), 0) + s.encode("latin-1") for s in strings
        )
        return _rec(0x00FC, head + body)
    first, rest = strings[0], strings[1:]
    part_a = struct.pack("<HB", len(first), 0) + first[:split_first_at].encode("latin-1")
    cont = b"\x00" + first[split_first_at:].encode("latin-1") + b"".join(
        struct.pack("<HB", len(s), 0) + s.encode("latin-1") for s in rest
    )
    return _rec(0x00FC, head + part_a) + _rec(0x003C, cont)


def _labelsst(rw: int, col: int, isst: int) -> bytes:
    return _rec(0x00FD, struct.pack("<HHHI", rw, col, 0, isst))


def _number(rw: int, col: int, v: float) -> bytes:
    return _rec(0x0203, struct.pack("<HHHd", rw, col, 0, v))


def _rk_int(rw: int, col: int, v: int) -> bytes:
    rk = ((v & 0x3FFFFFFF) << 2) | 0x02
    return _rec(0x027E, struct.pack("<HHHI", rw, col, 0, rk))


def _mulrk(rw: int, col_first: int, vals: list[int]) -> bytes:
    body = struct.pack("<HH", rw, col_first)
    for v in vals:
        body += struct.pack("<HI", 0, ((v & 0x3FFFFFFF) << 2) | 0x02)
    body += struct.pack("<H", col_first + len(vals) - 1)
    return _rec(0x00BD, body)


def _boolerr(rw: int, col: int, v: bool) -> bytes:
    return _rec(0x0205, struct.pack("<HHHBB", rw, col, 0, int(v), 0))


def _formula(rw: int, col: int, val8: bytes) -> bytes:
    """FORMULA record (MS-XLS 2.4.127) with cached result ``val8`` and an
    empty rgce (cce=0) — the cached value is all the reader consumes."""
    return _rec(0x0006, struct.pack("<HHH", rw, col, 0) + val8 + struct.pack("<HIH", 0, 0, 0))


def _formula_num(rw: int, col: int, v: float) -> bytes:
    return _formula(rw, col, struct.pack("<d", v))


def _formula_special(rw: int, col: int, tag: int, b2: int = 0) -> bytes:
    # tag 0=string-follows, 1=bool (b2), 2=error, 3=empty string
    return _formula(rw, col, bytes([tag, 0, b2, 0, 0, 0, 0xFF, 0xFF]))


def _string(s: str) -> bytes:
    """STRING record: cached text result of the preceding FORMULA."""
    return _rec(0x0207, struct.pack("<HB", len(s), 0) + s.encode("latin-1"))


def _workbook_stream(split_sst: bool = False) -> bytes:
    """Globals (SST, BOUNDSHEET) + one worksheet with a 3x4 table:

        name   | score | n   | ok
        alpha  | 1.5   | 7   | True
        beta   | 2.0   | 8   | False
        gamma  | -3.25 | 900 | True
    """
    strings = ["name", "score", "n", "ok", "alpha", "beta", "gamma"]
    sheet = (
        _bof(0x0010)
        + _labelsst(0, 0, 0) + _labelsst(0, 1, 1) + _labelsst(0, 2, 2) + _labelsst(0, 3, 3)
        + _labelsst(1, 0, 4) + _number(1, 1, 1.5) + _rk_int(1, 2, 7) + _boolerr(1, 3, True)
        + _labelsst(2, 0, 5) + _number(2, 1, 2.0) + _mulrk(2, 2, [8]) + _boolerr(2, 3, False)
        + _labelsst(3, 0, 6) + _number(3, 1, -3.25) + _rk_int(3, 2, 900) + _boolerr(3, 3, True)
        + _rec(0x000A, b"")
    )
    sst = _sst(strings, split_first_at=2 if split_sst else None)
    # BOUNDSHEET needs the sheet BOF offset: globals length depends only on
    # its own records, so assemble globals with a placeholder then patch
    sheet_name = b"Sheet1"
    bsheet = _rec(0x0085, struct.pack("<IHBB", 0, 0, len(sheet_name), 0) + sheet_name)
    globals_ = _bof(0x0005) + sst + bsheet + _rec(0x000A, b"")
    sheet_off = len(globals_)
    bsheet = _rec(0x0085, struct.pack("<IHBB", sheet_off, 0, len(sheet_name), 0) + sheet_name)
    globals_ = _bof(0x0005) + sst + bsheet + _rec(0x000A, b"")
    assert len(globals_) == sheet_off
    return globals_ + sheet


# --------------------------------------------------------------------------
# Minimal MS-CFB writer
# --------------------------------------------------------------------------
def _dir_entry(name: str, etype: int, start: int, size: int, child: int = 0xFFFFFFFF) -> bytes:
    raw = name.encode("utf-16-le") + b"\x00\x00"
    e = bytearray(128)
    e[: len(raw)] = raw
    struct.pack_into("<H", e, 64, len(raw))
    e[66] = etype
    e[67] = 1  # black
    struct.pack_into("<III", e, 68, 0xFFFFFFFF, 0xFFFFFFFF, child)
    struct.pack_into("<I", e, 116, start)
    struct.pack_into("<Q", e, 120, size)
    return bytes(e)


def _pad(b: bytes, size: int, fill: bytes = b"\x00") -> bytes:
    return b + fill * (size - len(b) % size if len(b) % size else 0)


def write_cfb_xls(stream: bytes, force_fat: bool = False, v4: bool = False) -> bytes:
    """Wrap a Workbook stream in a minimal OLE2 container.

    Streams < 4096 B go through the mini-FAT/mini-stream (real Excel does
    this for small files); ``force_fat`` pads the stream past the cutoff to
    exercise the regular-FAT path instead.  ``v4`` writes a major-version-4
    container (4096-B sectors, 512-B header zero-padded to the first
    sector) — sector #n must be read at (n+1)*sector_size, not 512+n*size.
    """
    if v4:
        sec = 4096
        stream = _pad(stream + _rec(0x000A, b""), 4608)  # past mini cutoff
        data_sec = _pad(stream, sec)
        n_data = len(data_sec) // sec
        fat = [0xFFFFFFFD, 0xFFFFFFFE]
        for i in range(n_data):
            fat.append(2 + i + 1 if i + 1 < n_data else 0xFFFFFFFE)
        assert len(fat) <= sec // 4, "test writer: one FAT sector only"
        dir_sec = _pad(
            _dir_entry("Root Entry", 5, 0xFFFFFFFE, 0, child=1)
            + _dir_entry("Workbook", 2, 2, len(stream)),
            sec,
        )
        body = _pad(struct.pack(f"<{len(fat)}I", *fat), sec, b"\xff") + dir_sec + data_sec
        header = bytearray(512)
        header[:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
        struct.pack_into("<H", header, 24, 0x003E)
        struct.pack_into("<H", header, 26, 0x0004)  # major version 4
        struct.pack_into("<H", header, 28, 0xFFFE)
        struct.pack_into("<H", header, 30, 12)      # 4096-B sectors
        struct.pack_into("<H", header, 32, 6)
        struct.pack_into("<I", header, 44, 1)
        struct.pack_into("<I", header, 48, 1)
        struct.pack_into("<I", header, 56, 4096)
        struct.pack_into("<I", header, 60, 0xFFFFFFFE)
        struct.pack_into("<I", header, 64, 0)
        struct.pack_into("<I", header, 68, 0xFFFFFFFE)
        struct.pack_into("<109I", header, 76, *([0] + [0xFFFFFFFF] * 108))
        return _pad(bytes(header), sec) + body  # header pads to sector size

    if force_fat:
        stream = _pad(stream + _rec(0x000A, b""), 4608)
    use_mini = len(stream) < 4096

    if use_mini:
        mini = _pad(stream, 64)
        n_mini = len(mini) // 64
        ministream_sectors = len(_pad(mini, 512)) // 512
        # sectors: 0=FAT, 1=dir, 2=miniFAT, 3..=ministream
        fat = [0xFFFFFFFD, 0xFFFFFFFE, 0xFFFFFFFE]
        for i in range(ministream_sectors):
            fat.append(3 + i + 1 if i + 1 < ministream_sectors else 0xFFFFFFFE)
        minifat = [i + 1 if i + 1 < n_mini else 0xFFFFFFFE for i in range(n_mini)]
        dir_sec = _pad(
            _dir_entry("Root Entry", 5, 3, len(mini), child=1)
            + _dir_entry("Workbook", 2, 0, len(stream)),
            512,
        )
        body = (
            _pad(struct.pack(f"<{len(fat)}I", *fat), 512, b"\xff")
            + dir_sec
            + _pad(struct.pack(f"<{len(minifat)}I", *minifat), 512, b"\xff")
            + _pad(mini, 512)
        )
        first_minifat, n_minifat = 2, 1
        wb_start = 0  # mini-sector 0
    else:
        data_sec = _pad(stream, 512)
        n_data = len(data_sec) // 512
        # sectors: 0=FAT, 1=dir, 2..=stream
        fat = [0xFFFFFFFD, 0xFFFFFFFE]
        for i in range(n_data):
            fat.append(2 + i + 1 if i + 1 < n_data else 0xFFFFFFFE)
        assert len(fat) <= 128, "test writer: one FAT sector only"
        dir_sec = _pad(
            _dir_entry("Root Entry", 5, 0xFFFFFFFE, 0, child=1)
            + _dir_entry("Workbook", 2, 2, len(stream)),
            512,
        )
        body = _pad(struct.pack(f"<{len(fat)}I", *fat), 512, b"\xff") + dir_sec + data_sec
        first_minifat, n_minifat = 0xFFFFFFFE, 0
        wb_start = 2

    header = bytearray(512)
    header[:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 24, 0x003E)  # minor version
    struct.pack_into("<H", header, 26, 0x0003)  # major version 3
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, 9)       # 512-B sectors
    struct.pack_into("<H", header, 32, 6)       # 64-B mini sectors
    struct.pack_into("<I", header, 44, 1)       # one FAT sector
    struct.pack_into("<I", header, 48, 1)       # dir starts at sector 1
    struct.pack_into("<I", header, 56, 4096)    # mini cutoff
    struct.pack_into("<I", header, 60, first_minifat)
    struct.pack_into("<I", header, 64, n_minifat)
    struct.pack_into("<I", header, 68, 0xFFFFFFFE)  # no DIFAT chain
    difat = [0] + [0xFFFFFFFF] * 108
    struct.pack_into("<109I", header, 76, *difat)
    assert wb_start in (0, 2)
    return bytes(header) + body


EXPECT = [
    ("alpha", 1.5, 7, True),
    ("beta", 2.0, 8, False),
    ("gamma", -3.25, 900, True),
]


@pytest.mark.parametrize(
    "split_sst,force_fat,v4",
    [(False, False, False), (True, False, False), (False, True, False), (False, False, True)],
    ids=["ministream", "sst-continue-split", "regular-fat", "v4-4096B-sectors"],
)
def test_read_xls_biff8(spark, tmp_path, split_sst, force_fat, v4):
    path = str(tmp_path / "t.xls")
    with open(path, "wb") as fh:
        fh.write(write_cfb_xls(_workbook_stream(split_sst=split_sst), force_fat=force_fat, v4=v4))
    df = read_excel(spark, path)
    assert df.columns == ["name", "score", "n", "ok"]
    rows = [tuple(r) for r in df.orderBy("name").collect()]
    assert rows == EXPECT


def test_read_xls_formula_cached_results(spark, tmp_path):
    """FORMULA cells surface their cached results (ADVICE r4): an IEEE
    double inline, a string via the following STRING record, a bool, an
    empty string; error results stay absent (None) like BOOLERR errors."""
    strings = ["a", "b", "c", "d"]
    sheet = (
        _bof(0x0010)
        + _labelsst(0, 0, 0) + _labelsst(0, 1, 1) + _labelsst(0, 2, 2) + _labelsst(0, 3, 3)
        + _formula_num(1, 0, 2.5) + _formula_special(1, 1, 0) + _string("fs")
        + _formula_special(1, 2, 1, b2=1) + _formula_special(1, 3, 2)
        + _number(2, 0, 1.0) + _formula_special(2, 1, 3) + _boolerr(2, 2, False)
        + _rk_int(2, 3, 5)
        + _rec(0x000A, b"")
    )
    sst = _sst(strings)
    sheet_name = b"Sheet1"
    bsheet = _rec(0x0085, struct.pack("<IHBB", 0, 0, len(sheet_name), 0) + sheet_name)
    globals_ = _bof(0x0005) + sst + bsheet + _rec(0x000A, b"")
    bsheet = _rec(0x0085, struct.pack("<IHBB", len(globals_), 0, len(sheet_name), 0) + sheet_name)
    globals_ = _bof(0x0005) + sst + bsheet + _rec(0x000A, b"")
    path = str(tmp_path / "f.xls")
    with open(path, "wb") as fh:
        fh.write(write_cfb_xls(globals_ + sheet))
    df = read_excel(spark, path)
    assert df.columns == ["a", "b", "c", "d"]
    rows = [tuple(r) for r in df.orderBy("a").collect()]
    assert rows == [(1.0, "", False, 5), (2.5, "fs", True, None)]


def test_read_xls_orphan_string_not_misattributed(spark, tmp_path):
    """Round-6 advice fix: a string-result FORMULA whose STRING record is
    MISSING must not capture a later unrelated STRING record.  Here the
    string-FORMULA at (1,0) is followed by a NUMBER cell (clearing the
    expectation) and then an orphan STRING — which must be ignored, leaving
    (1,0) absent (None), not 'orphan'."""
    strings = ["a", "b"]
    sheet = (
        _bof(0x0010)
        + _labelsst(0, 0, 0) + _labelsst(0, 1, 1)
        + _formula_special(1, 0, 0)      # string-result FORMULA, no STRING
        + _number(1, 1, 7.0)             # intervening cell record
        + _string("orphan")              # must NOT attach to (1,0)
        + _labelsst(2, 0, 1) + _number(2, 1, 8.0)  # types the 'a' column
        + _rec(0x000A, b"")
    )
    sst = _sst(strings)
    sheet_name = b"Sheet1"
    bsheet = _rec(0x0085, struct.pack("<IHBB", 0, 0, len(sheet_name), 0) + sheet_name)
    globals_ = _bof(0x0005) + sst + bsheet + _rec(0x000A, b"")
    bsheet = _rec(0x0085, struct.pack("<IHBB", len(globals_), 0, len(sheet_name), 0) + sheet_name)
    globals_ = _bof(0x0005) + sst + bsheet + _rec(0x000A, b"")
    path = str(tmp_path / "orphan.xls")
    with open(path, "wb") as fh:
        fh.write(write_cfb_xls(globals_ + sheet))
    df = read_excel(spark, path)
    rows = sorted([tuple(r) for r in df.collect()], key=lambda r: str(r[0]))
    # integral cached doubles surface as ints (reader convention)
    assert rows == [(None, 7), ("b", 8)], rows


def test_xls_sniffed_as_excel(tmp_path):
    """The sniffer's magic-byte table must route D0CF11E0 to excel, so the
    new decode path is reachable through read_file."""
    path = str(tmp_path / "legacy.xls")
    with open(path, "wb") as fh:
        fh.write(write_cfb_xls(_workbook_stream()))
    assert determine_file_type(path) == FileType.EXCEL


def test_read_file_dispatches_legacy_xls(spark, tmp_path):
    from duckdb_postgis_spark.sources.readers import read_file

    path = str(tmp_path / "legacy.xls")
    with open(path, "wb") as fh:
        fh.write(write_cfb_xls(_workbook_stream()))
    df = read_file(spark, path)
    assert df.count() == 3
