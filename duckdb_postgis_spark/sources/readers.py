"""Format readers: file → Spark DataFrame (reference ``create_duckb_table``,
core_processor.rs:391-428, re-expressed per format).

Distributed formats (Parquet, CSV, GeoJSON) read through Spark's native
sources — pushdown/pruning/splitting apply, so they scale to cluster-sized
inputs. Driver-side formats (GeoPackage via stdlib sqlite3, zipped point
Shapefiles via a minimal pure-python codec, Excel gated on openpyxl) are
ingested on the driver then parallelized — matching the reference's own
profile, where these arrive as single small files; for 100 TB geo data,
pre-convert to (geo)parquet.
"""

from __future__ import annotations

import io
import sqlite3
import struct
import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_postgis_spark.sources.sniffer import (
    FileType,
    determine_file_type,
    find_shapefile_path,
)


def read_file(
    spark: SparkSession, path: str, file_type: FileType | None = None
) -> DataFrame:
    """Dispatch mirroring core_processor.rs:391-428."""
    ft = file_type or determine_file_type(path)
    if ft is FileType.PARQUET:
        return spark.read.parquet(path)
    if ft is FileType.CSV:
        return read_csv(spark, path)
    if ft is FileType.GEOJSON:
        return read_geojson(spark, path)
    if ft is FileType.GEOPACKAGE:
        return read_geopackage(spark, path)
    if ft is FileType.SHAPEFILE:
        return read_zipped_shapefile(spark, path)
    if ft is FileType.EXCEL:
        return read_excel(spark, path)
    if ft is FileType.JSONL:
        return read_jsonl(spark, path)
    raise ValueError(f"unsupported file type {ft}")


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Newline-delimited JSON (extension surface beyond the reference — the
    dominant training-corpus interchange format). Spark's native json
    source: distributed, splittable on uncompressed input, transparent
    codec handling for .jsonl.gz; schema inferred from a sampled pass the
    same way the CSV reader infers (pass a schema explicitly in production
    to skip the inference job). Corrupt lines land in _corrupt_record
    under PERMISSIVE rather than failing the 100 TB job."""
    return spark.read.option("mode", "PERMISSIVE").json(path)


def read_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV with header sniff + bad-row skip: Spark's DROPMALFORMED ≈ DuckDB
    ``read_csv(ignore_errors=true, header=true)`` (core_processor.rs:413-418)."""
    return (
        spark.read.option("header", True)
        .option("inferSchema", True)
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )


#: ledgered persist for the parsed GeoJSON frame (the _PAGERANK_PERSISTED
#: convention: single-threaded-sequential contract; each read_geojson call
#: releases the previous call's cache, so repeated invocations never reuse
#: a prior run's computation — only the probes WITHIN one process_file do)
_GEOJSON_PERSISTED: list[DataFrame] = []


def read_geojson(spark: SparkSession, path: str) -> DataFrame:
    """GeoJSON FeatureCollection → one row per feature: properties flattened
    to columns + ``geometry_json`` (full geometry as JSON text) +
    ``geometry_wkt`` normalized for EVERY geometry type via the pure-python
    codec (the reference reads via GDAL st_read, core_processor.rs:393-398,
    and normalizes all geometries to 2D WKT, geo_strategy.rs:283-291).
    Distributed end to end; the JSON→WKT step is an Arrow-batched pandas
    UDF (geometry nesting depth varies by type, beyond builtin exprs).

    The returned frame is PERSISTED behind a ledger (r13 OPTIMIZATION
    round, guide §5 caching-when-reused): a multiLine JSON source is one
    unsplittable parse task, and process_file's lifecycle (geometry
    detection probe, CRS probe, final consumer) re-ran that parse + the
    WKT UDF 4-5× per invocation — measured 8.7 s → 2.6 s at the sf0.1
    GeoJSON-e2e shape from caching it once per call.  The ledger
    unpersists on the NEXT read_geojson call, so no computation survives
    across invocations (bench reps each pay the full parse)."""
    from py4j.protocol import Py4JError

    while _GEOJSON_PERSISTED:
        try:
            _GEOJSON_PERSISTED.pop().unpersist(blocking=False)
        except Py4JError:
            pass  # cache died with its stopped session (pagerank precedent)
    raw = spark.read.option("multiLine", True).json(path)
    if "features" not in raw.columns:
        return raw  # bare Feature / geometry object
    # re-read with geometry as raw JSON text: inference would otherwise
    # unify coordinates across Point/LineString/Polygon (different nesting
    # depths) and corrupt the non-majority shapes
    raw = spark.read.option("multiLine", True).schema(
        _geometry_as_string(raw.schema)
    ).json(path)
    feats = raw.select(F.explode("features").alias("f"))
    props = feats.select("f.properties.*") if _has_field(feats, "f.properties") else None
    geom_json = F.col("f.geometry").alias("geometry_json")
    cols = []
    if props is not None:
        cols = [F.col(f"f.properties.{c}").alias(c) for c in props.columns]
    out = feats.select(*cols, geom_json)
    # pandas_udf registration needs a live session → wrap at call time
    wkt_udf = F.pandas_udf(_geojson_wkt_series, "string")
    res = out.withColumn("geometry_wkt", wkt_udf("geometry_json")).persist()
    _GEOJSON_PERSISTED.append(res)
    return res


def _geojson_wkt_series(geom_json):  # pd.Series[str] -> pd.Series[str]
    import json

    from duckdb_postgis_spark.functions.wkb import from_geojson, to_wkt

    def conv(s):
        if s is None:
            return None
        try:
            return to_wkt(from_geojson(json.loads(s)))
        except (ValueError, KeyError, TypeError, IndexError):
            return None

    return geom_json.map(conv)


def _geometry_as_string(schema):
    """Rewrite features.element.geometry to StringType (the JSON source
    returns the raw JSON text for StringType fields — lossless for any
    geometry nesting depth)."""
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    fields = []
    for f in schema.fields:
        if f.name == "features" and isinstance(f.dataType, ArrayType) and isinstance(
            f.dataType.elementType, StructType
        ):
            elem = StructType(
                [
                    StructField("geometry", StringType()) if g.name == "geometry" else g
                    for g in f.dataType.elementType.fields
                ]
            )
            fields.append(StructField(f.name, ArrayType(elem), f.nullable))
        else:
            fields.append(f)
    return StructType(fields)


def _has_field(df: DataFrame, field: str) -> bool:
    try:
        df.select(field)
        return True
    except Exception:
        return False


# --------------------------------------------------------------------------
# GeoPackage (SQLite container) — stdlib sqlite3, no GDAL
# --------------------------------------------------------------------------


def read_geopackage(
    spark: SparkSession, path: str, layer: str | None = None
) -> DataFrame:
    """GeoPackage reader (reference: GDAL ``st_read``,
    core_processor.rs:393-398). A .gpkg is a SQLite database; the feature
    table is listed in ``gpkg_contents`` and geometry blobs carry a 'GP'
    header followed by standard WKB — parsed with our WKB codec, surfaced as
    ``<col>_wkb`` bytes plus x/y for points. Driver-side by design (small
    files); at scale pre-convert to parquet."""
    con = sqlite3.connect(path)
    try:
        cur = con.execute(
            "SELECT table_name FROM gpkg_contents WHERE data_type='features'"
        )
        tables = [r[0] for r in cur.fetchall()]
        if not tables:
            raise ValueError("no feature tables in GeoPackage")
        tbl = layer or tables[0]
        gcol_row = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns WHERE table_name=?",
            (tbl,),
        ).fetchone()
        gcol = gcol_row[0] if gcol_row else None
        epsg = _gpkg_epsg(con, tbl)
        rows = con.execute(f'SELECT * FROM "{tbl}"').fetchall()
        cols = [d[0] for d in con.execute(f'SELECT * FROM "{tbl}" LIMIT 0').description]
    finally:
        con.close()
    records = []
    for r in rows:
        rec = dict(zip(cols, r))
        if gcol and rec.get(gcol) is not None:
            rec[gcol] = _gpkg_geom_to_wkb(rec[gcol])
        if epsg is not None:
            rec["crs_epsg"] = epsg
        records.append(rec)
    return spark.createDataFrame(records) if records else spark.createDataFrame([], schema=", ".join(f"`{c}` string" for c in cols))


def _gpkg_epsg(con: sqlite3.Connection, tbl: str) -> str | None:
    """Authoritative CRS from GeoPackage metadata — gpkg_contents.srs_id
    resolved through gpkg_spatial_ref_sys to the EPSG code (the reference
    queries st_read_meta's auth_code, geo_strategy.rs:55-70). Returns None
    when the tables are absent/unresolvable → caller falls back to range
    inference."""
    try:
        row = con.execute(
            "SELECT srs_id FROM gpkg_contents WHERE table_name=?", (tbl,)
        ).fetchone()
        if row is None or row[0] is None:
            return None
        srs_id = int(row[0])
        ref = con.execute(
            "SELECT organization, organization_coordsys_id "
            "FROM gpkg_spatial_ref_sys WHERE srs_id=?",
            (srs_id,),
        ).fetchone()
        if ref and ref[0] and str(ref[0]).upper() == "EPSG" and ref[1] is not None:
            return str(int(ref[1]))
        return str(srs_id) if srs_id > 0 else None
    except sqlite3.Error:
        return None


def _gpkg_geom_to_wkb(blob: bytes) -> bytes:
    """Strip the GeoPackage binary header (magic 'GP', version, flags,
    srs_id, optional envelope) → raw WKB."""
    if blob[:2] != b"GP":
        return bytes(blob)  # already WKB
    flags = blob[3]
    env_code = (flags >> 1) & 0x07
    env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}.get(env_code, 0)
    return bytes(blob[8 + env_len :])


# --------------------------------------------------------------------------
# Zipped Shapefile — minimal pure-python codec (all geometry types + DBF)
# --------------------------------------------------------------------------


def read_zipped_shapefile(spark: SparkSession, zip_path: str) -> DataFrame:
    """Zipped-shapefile reader (reference: GDAL vsizip st_read,
    core_processor.rs:399-406 + member discovery :270-283). Pure-python
    parser for every ESRI shape class — Point(Z/M), MultiPoint(Z/M),
    PolyLine(Z/M), Polygon(Z/M), Z/M forced to 2D — emitting standard WKB
    (``geometry_wkb``) decodable by functions/wkb.py, centroid ``x``/``y``
    probe columns, .dbf attributes, and ``crs_epsg`` from the .prj sniff
    (geo_strategy.rs:22-44)."""
    from duckdb_postgis_spark.functions.geo import crs_from_prj_text
    from duckdb_postgis_spark.functions.wkb import centroid, wkb_decode

    shp_member = find_shapefile_path(zip_path)
    base = shp_member[: -len(".shp")]
    with zipfile.ZipFile(zip_path) as zf:
        shp = zf.read(shp_member)
        names = set(zf.namelist())
        dbf = zf.read(base + ".dbf") if base + ".dbf" in names else None
        prj = zf.read(base + ".prj").decode("ascii", "ignore") if base + ".prj" in names else ""
    geoms = _parse_shp_geoms(shp)
    attrs = _parse_dbf(dbf) if dbf else [{} for _ in geoms]
    epsg = crs_from_prj_text(prj) if prj else "4326"
    records = []
    for wkb, a in zip(geoms, attrs):
        rec = dict(a)
        if wkb is None:  # Null shape (type 0)
            rec["x"] = rec["y"] = None
            rec["geometry_wkb"] = None
        else:
            cx, cy = centroid(wkb_decode(wkb))
            rec["x"] = cx
            rec["y"] = cy
            rec["geometry_wkb"] = wkb
        rec["crs_epsg"] = epsg
        records.append(rec)
    if not records:
        return spark.createDataFrame(
            [], schema="x double, y double, geometry_wkb binary, crs_epsg string"
        )
    return spark.createDataFrame(records)


def _parse_shp_geoms(shp: bytes) -> list[bytes | None]:
    """ESRI .shp main file: 100-byte header, then (record header, shape).
    Returns one WKB geometry (or None for Null shapes) per record. Shape
    types (ESRI spec): 1/11/21 Point, 8/18/28 MultiPoint, 3/13/23 PolyLine,
    5/15/25 Polygon; the Z/M payloads trail the XY block and are skipped via
    the record length (Force2D, matching geo_strategy.rs:283-291)."""
    out: list[bytes | None] = []
    pos = 100
    n = len(shp)
    while pos + 8 <= n:
        (_recno, content_len) = struct.unpack(">ii", shp[pos : pos + 8])
        pos += 8
        out.append(_shape_to_wkb(shp, pos))
        pos += content_len * 2  # content length is in 16-bit words
    return out


def _shape_to_wkb(shp: bytes, pos: int) -> bytes | None:
    shape_type = struct.unpack("<i", shp[pos : pos + 4])[0]
    if shape_type == 0:
        return None
    if shape_type == 31:  # MultiPatch (round 7; GDAL's st_read reads these)
        return _multipatch_to_wkb(shp, pos)
    base = shape_type % 10  # 11→1 (PointZ), 23→3 (PolyLineM), ...
    if base == 1:  # Point
        x, y = struct.unpack("<dd", shp[pos + 4 : pos + 20])
        return _wkb_point(x, y)
    if base == 8:  # MultiPoint: bbox, numPoints, points
        (npts,) = struct.unpack("<i", shp[pos + 36 : pos + 40])
        pts = _read_xy(shp, pos + 40, npts)
        return _wkb_header(4, npts) + b"".join(_wkb_point(x, y) for x, y in pts)
    if base in (3, 5):
        # PolyLine / Polygon: bbox, numParts, numPoints, parts, points
        nparts, npts = struct.unpack("<ii", shp[pos + 36 : pos + 44])
        parts = list(struct.unpack(f"<{nparts}i", shp[pos + 44 : pos + 44 + 4 * nparts]))
        pts = _read_xy(shp, pos + 44 + 4 * nparts, npts)
        bounds = parts + [npts]
        rings = [pts[bounds[i] : bounds[i + 1]] for i in range(nparts)]
        if base == 3:
            lines = [_wkb_path(2, r) for r in rings]
            if len(lines) == 1:
                return lines[0]
            return _wkb_header(5, len(lines)) + b"".join(lines)
        return _assemble_polygons(rings)
    raise ValueError(f"unsupported shapefile shape type {shape_type}")


#: MultiPatch part types (ESRI spec): triangle strip, triangle fan, outer
#: ring, inner ring, first ring, ring (role unspecified → winding heuristic)
_MP_TRI_STRIP, _MP_TRI_FAN, _MP_OUTER, _MP_INNER, _MP_FIRST, _MP_RING = range(6)


def _multipatch_to_wkb(shp: bytes, pos: int) -> bytes:
    """MultiPatch (type 31) → 2D WKB MultiPolygon, the same surface
    flattening GDAL's shapefile driver applies under Force2D
    (geo_strategy.rs:283-291 forces 2D anyway): triangle strips/fans
    explode into one triangle polygon each; OuterRing/FirstRing start a
    polygon, InnerRing attaches as a hole of the most recent polygon, and
    bare Ring parts fall back to the winding heuristic used for plain
    polygons.  The record layout is bbox, numParts, numPoints, parts[],
    partTypes[], points[] (Z/M payloads trail and are skipped via the
    record length)."""
    nparts, npts = struct.unpack("<ii", shp[pos + 36 : pos + 44])
    off = pos + 44
    parts = list(struct.unpack(f"<{nparts}i", shp[off : off + 4 * nparts]))
    off += 4 * nparts
    ptypes = list(struct.unpack(f"<{nparts}i", shp[off : off + 4 * nparts]))
    off += 4 * nparts
    pts = _read_xy(shp, off, npts)
    bounds = parts + [npts]

    def closed(ring: list[tuple[float, float]]) -> list[tuple[float, float]]:
        return ring if ring and ring[0] == ring[-1] else ring + [ring[0]]

    polys: list[list[list[tuple[float, float]]]] = []
    for i, ptype in enumerate(ptypes):
        seg = pts[bounds[i] : bounds[i + 1]]
        if ptype == _MP_TRI_STRIP:
            for j in range(len(seg) - 2):
                polys.append([[seg[j], seg[j + 1], seg[j + 2], seg[j]]])
        elif ptype == _MP_TRI_FAN:
            for j in range(1, len(seg) - 1):
                polys.append([[seg[0], seg[j], seg[j + 1], seg[0]]])
        elif ptype in (_MP_OUTER, _MP_FIRST):
            polys.append([closed(seg)])
        elif ptype == _MP_INNER:
            if polys:
                polys[-1].append(closed(seg))
            else:  # dangling hole: promote (GDAL tolerates these too)
                polys.append([closed(seg)])
        elif ptype == _MP_RING:
            ring = closed(seg)
            area = sum(
                x1 * y2 - x2 * y1
                for (x1, y1), (x2, y2) in zip(ring, ring[1:])
            )
            if area <= 0 or not polys:  # clockwise → new outer ring
                polys.append([ring])
            else:
                polys[-1].append(ring)
        else:
            raise ValueError(f"unsupported MultiPatch part type {ptype}")
    if not polys:
        raise ValueError("MultiPatch record with no surface parts")
    parts_wkb = [
        struct.pack("<BII", 1, 3, len(p)) + b"".join(_ring_bytes(r) for r in p)
        for p in polys
    ]
    return _wkb_header(6, len(parts_wkb)) + b"".join(parts_wkb)


def _read_xy(shp: bytes, pos: int, npts: int) -> list[tuple[float, float]]:
    vals = struct.unpack(f"<{2 * npts}d", shp[pos : pos + 16 * npts])
    return [(vals[2 * i], vals[2 * i + 1]) for i in range(npts)]


def _wkb_header(geom_type: int, count: int) -> bytes:
    return struct.pack("<BII", 1, geom_type, count)


def _wkb_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, 1, x, y)


def _wkb_path(geom_type: int, coords: list[tuple[float, float]]) -> bytes:
    body = b"".join(struct.pack("<dd", x, y) for x, y in coords)
    return _wkb_header(geom_type, len(coords)) + body


def _ring_bytes(coords: list[tuple[float, float]]) -> bytes:
    return struct.pack("<I", len(coords)) + b"".join(
        struct.pack("<dd", x, y) for x, y in coords
    )


def _assemble_polygons(rings: list[list[tuple[float, float]]]) -> bytes:
    """SHP polygon rings: outer rings wind clockwise (negative shoelace
    area), holes counter-clockwise, holes follow their outer ring — the
    standard GDAL grouping heuristic."""
    polys: list[list[list[tuple[float, float]]]] = []
    for ring in rings:
        area = sum(
            x1 * y2 - x2 * y1 for (x1, y1), (x2, y2) in zip(ring, ring[1:])
        )
        if area <= 0 or not polys:  # clockwise → new outer ring
            polys.append([ring])
        else:  # counter-clockwise → hole of the most recent outer
            polys[-1].append(ring)
    if len(polys) == 1:
        return struct.pack("<BII", 1, 3, len(polys[0])) + b"".join(
            _ring_bytes(r) for r in polys[0]
        )
    parts = [
        struct.pack("<BII", 1, 3, len(p)) + b"".join(_ring_bytes(r) for r in p)
        for p in polys
    ]
    return _wkb_header(6, len(parts)) + b"".join(parts)


def _parse_dbf(dbf: bytes) -> list[dict]:
    """Minimal dBase III parser: C (text) and N/F (numeric) fields."""
    n_records = struct.unpack("<I", dbf[4:8])[0]
    header_len, record_len = struct.unpack("<HH", dbf[8:12])
    fields = []
    pos = 32
    while dbf[pos] != 0x0D:
        name = dbf[pos : pos + 11].split(b"\x00")[0].decode("ascii", "ignore")
        ftype = chr(dbf[pos + 11])
        flen = dbf[pos + 16]
        fields.append((name, ftype, flen))
        pos += 32
    out = []
    pos = header_len
    for _ in range(n_records):
        rec = dbf[pos : pos + record_len]
        pos += record_len
        if not rec or rec[0:1] == b"*":  # deleted
            continue
        vals, off = {}, 1
        for name, ftype, flen in fields:
            raw = rec[off : off + flen].decode("ascii", "ignore").strip()
            off += flen
            if ftype in ("N", "F") and raw:
                vals[name] = float(raw) if ("." in raw or "e" in raw.lower()) else int(raw)
            else:
                vals[name] = raw or None
        out.append(vals)
    return out


# --------------------------------------------------------------------------
# Excel — pure-stdlib xlsx reader (zip + XML); legacy .xls needs xlrd
# --------------------------------------------------------------------------


def read_excel(spark: SparkSession, path: str) -> DataFrame:
    """Excel reader (reference: DuckDB ``read_xlsx``,
    core_processor.rs:407-412; detection ported per duckdb_tests.rs:54-68;
    legacy-xls coverage per duckdb_tests.rs:70-83).
    An .xlsx is a zip of XML — parsed with stdlib zipfile + ElementTree
    (first worksheet + sharedStrings); a legacy binary .xls (OLE2 magic
    D0 CF 11 E0) goes through the pure-stdlib BIFF8 walk in
    ``sources/xls_biff.py`` — no openpyxl/xlrd needed.  Driver-side by
    design: spreadsheets arrive as single small files; at scale
    pre-convert to parquet."""
    if zipfile.is_zipfile(path):
        header, data = _parse_xlsx(path)
    else:
        from duckdb_postgis_spark.sources.xls_biff import parse_xls

        with open(path, "rb") as fh:
            header, data = parse_xls(fh.read())
    if not data:
        return spark.createDataFrame(
            [], schema=", ".join(f"`{c}` string" for c in header) or "c0 string"
        )
    # both formats store every number as a double; cells that happened to
    # be integral decoded as int — re-widen any column that mixes both so
    # Spark's schema inference sees one type per column
    for i in range(len(header)):
        vals = [row[i] for row in data]
        if any(isinstance(v, float) for v in vals) and any(
            type(v) is int for v in vals
        ):
            for row in data:
                if type(row[i]) is int:
                    row[i] = float(row[i])
    return spark.createDataFrame(
        [dict(zip(header, row)) for row in data]
    ).select(*header)


_XLSX_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _parse_xlsx(path: str) -> tuple[list[str], list[list]]:
    """First worksheet of an .xlsx → (header, rows). Handles shared strings
    (t=\"s\"), inline strings (t=\"inlineStr\"), booleans (t=\"b\"), and
    numbers (int when integral); blank cells and ragged rows become None.
    Column position is decoded from the cell reference (A1 style), so
    sparse rows stay aligned."""
    import xml.etree.ElementTree as ET

    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_XLSX_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_XLSX_NS}t")))
        sheet = next(
            (
                n
                for n in sorted(names)
                if n.startswith("xl/worksheets/sheet") and n.endswith(".xml")
            ),
            None,
        )
        if sheet is None:
            raise ValueError(f"no worksheet found in {path}")
        root = ET.fromstring(zf.read(sheet))

    rows: list[list] = []
    for row_el in root.iter(f"{_XLSX_NS}row"):
        cells: dict[int, object] = {}
        for c in row_el.findall(f"{_XLSX_NS}c"):
            ref = c.get("r", "")
            col = 0
            for ch in ref:
                if ch.isalpha():
                    col = col * 26 + (ord(ch.upper()) - 64)
                else:
                    break
            idx = col - 1 if col else len(cells)
            ctype = c.get("t", "n")
            if ctype == "inlineStr":
                cells[idx] = "".join(
                    t.text or "" for t in c.iter(f"{_XLSX_NS}t")
                )
                continue
            v = c.find(f"{_XLSX_NS}v")
            if v is None or v.text is None:
                continue
            if ctype == "s":
                cells[idx] = shared[int(v.text)]
            elif ctype == "b":
                cells[idx] = v.text == "1"
            elif ctype == "str":  # formula cached string result
                cells[idx] = v.text
            else:
                num = float(v.text)
                cells[idx] = int(num) if num.is_integer() else num
        width = max(cells, default=-1) + 1
        rows.append([cells.get(i) for i in range(width)])

    if not rows:
        return [], []
    width = max(len(r) for r in rows)
    rows = [r + [None] * (width - len(r)) for r in rows]
    header = [
        str(h) if h is not None else f"c{i}" for i, h in enumerate(rows[0])
    ]
    return header, rows[1:]


__all__ = [
    "read_file",
    "read_csv",
    "read_geojson",
    "read_geopackage",
    "read_zipped_shapefile",
    "read_excel",
]


def write_sample_zip_shapefile(path: str, points: list[tuple[float, float]], prj: str = "") -> None:
    """Test helper: build a minimal zipped point shapefile."""
    payloads = [struct.pack("<idd", 1, x, y) for x, y in points]
    write_sample_zip_shapefile_records(path, payloads, prj)


def shp_poly_payload(shape_type: int, parts: list[list[tuple[float, float]]]) -> bytes:
    """Test helper: one PolyLine (3) / Polygon (5) record payload."""
    pts = [p for part in parts for p in part]
    xs, ys = [p[0] for p in pts], [p[1] for p in pts]
    starts, acc = [], 0
    for part in parts:
        starts.append(acc)
        acc += len(part)
    return (
        struct.pack("<i", shape_type)
        + struct.pack("<dddd", min(xs), min(ys), max(xs), max(ys))
        + struct.pack("<ii", len(parts), len(pts))
        + struct.pack(f"<{len(parts)}i", *starts)
        + b"".join(struct.pack("<dd", x, y) for x, y in pts)
    )


def shp_multipoint_payload(points: list[tuple[float, float]]) -> bytes:
    """Test helper: one MultiPoint (8) record payload."""
    xs, ys = [p[0] for p in points], [p[1] for p in points]
    return (
        struct.pack("<i", 8)
        + struct.pack("<dddd", min(xs), min(ys), max(xs), max(ys))
        + struct.pack("<i", len(points))
        + b"".join(struct.pack("<dd", x, y) for x, y in points)
    )


def shp_multipatch_payload(
    parts: list[tuple[int, list[tuple[float, float]]]]
) -> bytes:
    """Test helper: one MultiPatch (31) record payload — parts are
    (part_type, xy_points); the mandatory Z block (zmin, zmax, one zero per
    point) trails the XY data exactly as in real files, so round-trip tests
    prove the force-2D skip honors the record length."""
    pts = [p for _, part in parts for p in part]
    xs, ys = [p[0] for p in pts], [p[1] for p in pts]
    starts, acc = [], 0
    for _, part in parts:
        starts.append(acc)
        acc += len(part)
    return (
        struct.pack("<i", 31)
        + struct.pack("<dddd", min(xs), min(ys), max(xs), max(ys))
        + struct.pack("<ii", len(parts), len(pts))
        + struct.pack(f"<{len(parts)}i", *starts)
        + struct.pack(f"<{len(parts)}i", *[t for t, _ in parts])
        + b"".join(struct.pack("<dd", x, y) for x, y in pts)
        + struct.pack("<dd", 0.0, 0.0)  # z range
        + struct.pack(f"<{len(pts)}d", *([0.0] * len(pts)))  # z values
    )


def write_sample_zip_shapefile_records(
    path: str, shape_payloads: list[bytes], prj: str = ""
) -> None:
    """Test helper: zip a .shp (given raw record payloads) + minimal .dbf."""
    shp_records = b""
    for i, content in enumerate(shape_payloads, 1):
        shp_records += struct.pack(">ii", i, len(content) // 2) + content
    shape_type = (
        struct.unpack("<i", shape_payloads[0][:4])[0] if shape_payloads else 1
    )
    header = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(
        ">i", (100 + len(shp_records)) // 2
    ) + struct.pack("<ii", 1000, shape_type) + struct.pack(
        "<dddddddd", 0, 0, 0, 0, 0, 0, 0, 0
    )
    shp = header + shp_records
    # minimal dbf with one N field 'id'
    n = len(shape_payloads)
    fields = struct.pack("<11sc4xBB14x", b"id", b"N", 10, 0)
    dbf_header = struct.pack("<BBBBIHH20x", 3, 24, 1, 1, n, 32 + 32 + 1, 11)
    records = b"".join(b" " + str(i).rjust(10).encode() for i in range(n))
    dbf = dbf_header + fields + b"\x0d" + records + b"\x1a"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("layer.shp", shp)
        zf.writestr("layer.dbf", dbf)
        if prj:
            zf.writestr("layer.prj", prj)
