"""Geometry-column and coordinate-pair detection over a Spark schema.

Pure-python ports of the reference's detection logic, operating on
``df.dtypes`` instead of DuckDB's information_schema:
  - geometry columns   core_processor.rs:165-195
  - coordinate pairs   core_processor.rs:198-267 (identical pattern table,
                       precedence, first-match-wins, and name sanitization)
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# (x_pattern, y_pattern) in reference precedence order (core_processor.rs:213-229)
COORDINATE_PATTERNS: tuple[tuple[str, str], ...] = (
    # the reference lists upper- and lower-case "X-coordinate" rows
    # separately (core_processor.rs:214-215); they collapse to one here
    # because matching is case-insensitive
    ("x-coordinate", "y-coordinate"),
    ("x_coordinate", "y_coordinate"),
    ("longitude", "latitude"),
    ("long", "lat"),
    ("lng", "lat"),
    ("lon", "lat"),
    ("easting", "northing"),
    ("east", "north"),
    ("point_x", "point_y"),
    ("pt_x", "pt_y"),
    ("x_coord", "y_coord"),
    ("xcoord", "ycoord"),
    ("x", "y"),
)


def _find_col(columns: list[str], pattern: str, axis: str) -> str | None:
    """Reference match rule (core_processor.rs:236-250): exact lowercase
    equality, OR substring match guarded by containing 'coord' or the axis
    letter."""
    for col in columns:
        low = col.lower()
        if low == pattern or (
            pattern in low and ("coord" in low or axis in low)
        ):
            return col
    return None


def sanitize_geom_name(name: str) -> str:
    """Name cleanup for the synthesized geometry column
    (core_processor.rs:254-257: '-', ' ' → '_'; '(' ')' removed)."""
    return name.replace("-", "_").replace(" ", "_").replace("(", "").replace(")", "")


def find_coordinate_pair(columns: list[str]) -> tuple[str, str] | None:
    """First matching (x, y) column pair, reference precedence
    (core_processor.rs:233-259; first pattern match wins, then break)."""
    for x_pat, y_pat in COORDINATE_PATTERNS:
        x_col = _find_col(columns, x_pat, "x")
        y_col = _find_col(columns, y_pat, "y")
        if x_col is not None and y_col is not None:
            return x_col, y_col
    return None


def synthesized_geom_name(x_col: str, y_col: str) -> str:
    """``geom_from_<x>_<y>`` (core_processor.rs:253-258)."""
    return f"geom_from_{sanitize_geom_name(x_col)}_{sanitize_geom_name(y_col)}"


def find_geometry_columns(df: DataFrame, is_tabular: bool) -> list[str]:
    """Geometry-column hunt over the Spark schema (core_processor.rs:165-195).

    Tabular formats (CSV/Excel) route to coordinate-pair detection; geo
    formats look for: binary columns with geo/geom in the name, or columns of
    non-primitive type (not double/int/string — Spark's analog of DuckDB's
    ``data_type NOT IN (DOUBLE, INTEGER, VARCHAR)``) named like geometry.
    Always excludes GDB's ``gdb_geomattr_data`` (rs:188-190).
    """
    if is_tabular:
        pair = find_coordinate_pair(df.columns)
        return [synthesized_geom_name(*pair)] if pair else []
    primitives = {"double", "int", "bigint", "float", "string", "boolean", "date"}
    out = []
    for name, dtype in df.dtypes:
        if name == "gdb_geomattr_data":
            continue
        low = name.lower()
        if dtype == "binary" and ("geo" in low or "geom" in low):
            out.append(name)
        elif dtype not in primitives and not dtype.startswith("decimal") and (
            "geom" in low or low == "geometry"
        ):
            out.append(name)
        elif dtype == "string" and (low == "geometry" or low.endswith("_wkt") or low == "wkt"):
            # WKT text columns — the reference reaches these through its
            # ST_GeomFromText probe (geo_strategy.rs:174-175)
            out.append(name)
    return out
