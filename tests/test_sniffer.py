"""File-type detection tests — port of the reference's entire test suite
(tests/duckdb_tests.rs:9-127), byte-for-byte fixtures."""

from __future__ import annotations

import pytest

from duckdb_postgis_spark.sources.sniffer import (
    FileType,
    UnknownFileTypeError,
    determine_file_type,
    find_shapefile_path,
)


def w(tmp_path, name: str, data: bytes) -> str:
    p = tmp_path / name
    p.write_bytes(data)
    return str(p)


def test_detect_geojson_content(tmp_path):
    # duckdb_tests.rs:10-25
    content = b'{"type": "FeatureCollection", "features": [{"type": "Feature", "geometry": {"type": "Point", "coordinates": [102.0, 0.5]}, "properties": {"name": "Test Point"}}]}'
    assert determine_file_type(w(tmp_path, "t.geojson", content)) is FileType.GEOJSON


def test_detect_csv_by_extension(tmp_path):
    # duckdb_tests.rs:27-37
    content = b"id,name,value\n1,test,100\n2,sample,200"
    assert determine_file_type(w(tmp_path, "t.csv", content)) is FileType.CSV


def test_detect_geopackage_sqlite_header(tmp_path):
    # duckdb_tests.rs:39-52
    content = b"SQLite format 3\x00" + b"\x00" * 100
    assert determine_file_type(w(tmp_path, "t.gpkg", content)) is FileType.GEOPACKAGE


def test_detect_xlsx_pkzip_inner_names(tmp_path):
    # duckdb_tests.rs:54-68
    content = b"PK\x03\x04" + b"xl/worksheets/sheet1.xml" + b"\x00" * 50
    assert determine_file_type(w(tmp_path, "t.xlsx", content)) is FileType.EXCEL


def test_detect_legacy_xls_cfbf(tmp_path):
    # duckdb_tests.rs:70-83
    content = bytes([0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1]) + b"\x00" * 100
    assert determine_file_type(w(tmp_path, "t.xls", content)) is FileType.EXCEL


def test_detect_zipped_shapefile(tmp_path):
    # duckdb_tests.rs:85-101
    content = b"PK\x03\x04" + b"layer.shp" + b"\x00" * 50
    assert determine_file_type(w(tmp_path, "t.zip", content)) is FileType.SHAPEFILE


def test_detect_parquet_magic(tmp_path):
    # duckdb_tests.rs:103-116
    content = b"PAR1" + b"\x00" * 100
    assert determine_file_type(w(tmp_path, "t.parquet", content)) is FileType.PARQUET


def test_display_formatting():
    # duckdb_tests.rs:118-127
    assert str(FileType.GEOPACKAGE) == "Geopackage"
    assert str(FileType.SHAPEFILE) == "Shapefile"
    assert str(FileType.GEOJSON) == "GeoJSON"
    assert str(FileType.EXCEL) == "Excel"
    assert str(FileType.CSV) == "CSV"
    assert str(FileType.PARQUET) == "Parquet"


def test_unknown_type_raises(tmp_path):
    with pytest.raises(UnknownFileTypeError):
        determine_file_type(w(tmp_path, "t.bin", b"\x01\x02\x03\x04" * 10))


def test_zip_both_patterns_ambiguous(tmp_path):
    # core_processor.rs:365-369: both excel and shapefile patterns → None →
    # falls through to unknown
    content = b"PK\x03\x04" + b"xl/worksheets" + b".shp" + b"\x00" * 30
    with pytest.raises(UnknownFileTypeError):
        determine_file_type(w(tmp_path, "t.zip", content))


def test_find_shapefile_path(tmp_path):
    import zipfile

    p = tmp_path / "a.zip"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("dir/layer.shp", b"x")
        zf.writestr("dir/layer.dbf", b"y")
    assert find_shapefile_path(str(p)) == "dir/layer.shp"


# --------------------------------------------------------------------------
# hypothesis fuzz: arbitrary bytes never crash detection
# --------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_postgis_spark.sources.sniffer import (
    FileType,
    UnknownFileTypeError,
    determine_file_type,
    detect_geojson,
    match_magic_numbers,
)


@settings(max_examples=300, deadline=None)
@given(header=st.binary(min_size=0, max_size=200))
def test_fuzz_magic_numbers_total(header):
    # total function: classifies or returns None, never raises
    r = match_magic_numbers(header)
    assert r is None or isinstance(r, FileType)


@settings(max_examples=300, deadline=None)
@given(buf=st.binary(min_size=0, max_size=400))
def test_fuzz_geojson_detector_total(buf):
    r = detect_geojson(buf)
    assert r is None or r is FileType.GEOJSON


@settings(max_examples=100, deadline=None)
@given(body=st.binary(min_size=0, max_size=300))
def test_fuzz_determine_file_type_clean_failure(tmp_path_factory, body):
    # unknown content must raise the typed error (reference behavior:
    # unsupported file type), never a decode/index crash
    import tempfile, os

    fd, path = tempfile.mkstemp(suffix=".bin")
    try:
        os.write(fd, body)
        os.close(fd)
        try:
            r = determine_file_type(path)
            assert isinstance(r, FileType)
        except UnknownFileTypeError:
            pass
    finally:
        os.unlink(path)


# --------------------------------------------------------------------------
# JSONL extension (round 5 — beyond the reference enum, precedence-last)
# --------------------------------------------------------------------------
def test_jsonl_by_extension(tmp_path):
    from duckdb_postgis_spark.sources.sniffer import FileType, determine_file_type

    p = tmp_path / "corpus.jsonl"
    p.write_text('{"doc_id": 1, "text": "hello"}\n{"doc_id": 2, "text": "world"}\n')
    assert determine_file_type(str(p)) == FileType.JSONL
    p2 = tmp_path / "corpus.ndjson"
    p2.write_text('{"a": 1}\n')
    assert determine_file_type(str(p2)) == FileType.JSONL


def test_jsonl_does_not_shadow_reference_rules(tmp_path):
    """A .jsonl file whose content matches the GeoJSON rules must still be
    GeoJSON — the reference decision table keeps precedence."""
    from duckdb_postgis_spark.sources.sniffer import FileType, determine_file_type

    p = tmp_path / "features.jsonl"
    p.write_text('{"type": "FeatureCollection", "features": []}')
    assert determine_file_type(str(p)) == FileType.GEOJSON


def test_read_jsonl_roundtrip(spark, tmp_path):
    import gzip

    from duckdb_postgis_spark.sources.readers import read_file

    lines = "".join(f'{{"doc_id": {i}, "text": "doc {i}", "n": {i * 10}}}\n' for i in range(5))
    p = tmp_path / "docs.jsonl"
    p.write_text(lines)
    df = read_file(spark, str(p))
    assert df.count() == 5
    assert set(df.columns) == {"doc_id", "text", "n"}
    assert df.agg({"n": "sum"}).collect()[0][0] == 100

    pgz = tmp_path / "docs2.jsonl.gz"
    with gzip.open(pgz, "wt") as fh:
        fh.write(lines)
    df2 = read_file(spark, str(pgz))
    assert df2.count() == 5
