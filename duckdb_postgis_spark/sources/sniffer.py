"""File-type detection — pure-python port of the reference's decision table.

Reference: ``core_processor.rs:286-317`` (driver: 150-byte header → magic
numbers → GeoJSON content scan → .csv extension fallback),
``core_processor.rs:319-371`` (magic numbers incl. PKZip inner-name
disambiguation xlsx vs zipped shapefile), ``core_processor.rs:373-388``
(GeoJSON content detection). Same precedence, same byte patterns, same
tie-break (both zip pattern sets matching → unknown).
"""

from __future__ import annotations

import enum
import zipfile
from pathlib import Path


class FileType(enum.Enum):
    GEOPACKAGE = "Geopackage"
    SHAPEFILE = "Shapefile"
    GEOJSON = "GeoJSON"
    EXCEL = "Excel"
    CSV = "CSV"
    PARQUET = "Parquet"
    #: EXTENSION beyond the reference enum (core_processor.rs:14-22 stops at
    #: the six above): newline-delimited JSON, the dominant interchange
    #: format for training-data corpora. Detected by extension only, AFTER
    #: every reference rule, so reference parity is untouched.
    JSONL = "JSONL"

    def __str__(self) -> str:  # Display parity (core_processor.rs:23-37)
        return self.value


_HEADER_LEN = 150  # core_processor.rs:288

# PKZip member-name patterns (core_processor.rs:325-341)
_EXCEL_PATTERNS = (
    b"xl/worksheets",
    b"xl/_rels",
    b"docProps/",
    b"[Content_Types]",
    b"xl/workbook",
    b"xl/styles",
    b"xl/theme",
    b"xl/strings",
    b"xl/charts",
    b"xl/drawings",
    b"xl/sharedStrings",
    b"xl/metadata",
    b"xl/calc",
)
_SHAPEFILE_PATTERNS = (b".shp", b".dbf", b".prj", b".shx")

_XLS_MAGIC = bytes([0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1])
_PARQUET_MAGIC = b"PAR1"
_SQLITE_MAGIC = b"SQLite format 3\x00"
_PKZIP_MAGIC = bytes([0x50, 0x4B, 0x03, 0x04])


class UnknownFileTypeError(ValueError):
    pass


def match_magic_numbers(header: bytes) -> FileType | None:
    """Magic-number decision table (core_processor.rs:319-371). Operates on
    the first 150 bytes only — including the zip inner-name scan, matching
    the reference exactly."""
    if header.startswith(_PKZIP_MAGIC):
        rest = header[len(_PKZIP_MAGIC) :]
        is_excel = any(p in rest for p in _EXCEL_PATTERNS)
        is_shape = any(p in rest for p in _SHAPEFILE_PATTERNS)
        if is_excel and not is_shape:
            return FileType.EXCEL
        if is_shape and not is_excel:
            return FileType.SHAPEFILE
        return None  # both or neither → fall through (rs:365-369)
    if header.startswith(_XLS_MAGIC):
        return FileType.EXCEL
    if header.startswith(_PARQUET_MAGIC):
        return FileType.PARQUET
    if header.startswith(_SQLITE_MAGIC):
        return FileType.GEOPACKAGE
    return None


def detect_geojson(buffer: bytes) -> FileType | None:
    """Content-based GeoJSON detection (core_processor.rs:373-388)."""
    try:
        text = buffer.decode("utf-8")
    except UnicodeDecodeError:
        return None
    t = text.lstrip().lower()
    if (
        t.startswith("{")
        and '"type"' in t
        and ('"featurecollection"' in t or '"feature"' in t or '"geometry"' in t)
    ):
        return FileType.GEOJSON
    return None


def determine_file_type(file_path: str) -> FileType:
    """Sniffing driver (core_processor.rs:286-317): header magic → GeoJSON
    content → .csv extension; anything else raises."""
    p = Path(file_path)
    with open(p, "rb") as f:
        header = f.read(_HEADER_LEN)
        ft = match_magic_numbers(header)
        if ft is not None:
            return ft
        f.seek(0)
        buffer = f.read()
    ft = detect_geojson(buffer)
    if ft is not None:
        return ft
    if p.suffix.lower() == ".csv":
        return FileType.CSV
    # extension beyond the reference decision table (kept LAST so all
    # reference precedence rules fire first): .jsonl/.ndjson, optionally
    # compressed (.jsonl.gz etc. — Spark's json source decompresses)
    suffixes = [s.lower() for s in p.suffixes[-2:]]
    if any(s in (".jsonl", ".ndjson") for s in suffixes):
        return FileType.JSONL
    raise UnknownFileTypeError("Unknown or unsupported file type")


def find_shapefile_path(zip_path: str) -> str:
    """First .shp member of a zip archive (core_processor.rs:270-283)."""
    with zipfile.ZipFile(zip_path) as zf:
        for name in zf.namelist():
            if name.endswith(".shp"):
                return name
    raise FileNotFoundError("No .shp file found in ZIP archive")
