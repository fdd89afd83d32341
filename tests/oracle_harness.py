"""Local replica of the driver's DuckDB-oracle comparison.

Stricter than the driver: exact multiset equality of normalized rows after
sorting columns by name — if this passes, the driver's order-insensitive
value hash passes.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

from duckdb_postgis_spark.catalog import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    # driver fidelity: the driver canons results through pandas, so the
    # pandas dtype DuckDB materializes (e.g. HUGEINT → float64!) is part of
    # the contract even when Python-level values compare equal
    odf = con.execute(sql).df()
    con.close()
    return cols, rows, odf


def _kind_class(series) -> str:
    """Collapse a pandas series dtype to the class the driver's value hash
    distinguishes: int vs float vs text vs bytes vs datetime vs bool.

    Round-1 lesson: DuckDB 1.0 SUM(INTEGER) → HUGEINT → pandas float64,
    which hash-mismatches Spark's int64 ("19525.0" vs "19525") while plain
    Python comparison says 10 == 10.0 — type classes must be asserted."""
    k = series.dtype.kind
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    # object column: classify by first non-null value
    for v in series:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, int):
            return "int"
        if isinstance(v, (float, Decimal)):
            return "float"
        if isinstance(v, str):
            return "text"
        if isinstance(v, (bytes, bytearray)):
            return "bytes"
        if isinstance(v, (_dt.datetime, _dt.date)):
            return "datetime"
        return type(v).__name__
    return "all-null"


def _norm_cell(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill sub-1e-9 representation noise only; exact-convention values
        # are already bit-identical
        return round(v, 9)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def compare_query(spark, name: str, fn, oracle: str, sf_dir: str) -> None:
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    o_cols, o_rows, odf = run_oracle(oracle, sf_dir)
    assert sorted(s_cols) == sorted(o_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    # dtype-class fidelity (see _kind_class): compare what pandas sees on
    # both sides, since that is what the driver hashes
    spdf = sdf.toPandas()
    kind_mismatch = {}
    for c in s_cols:
        sk, ok = _kind_class(spdf[c]), _kind_class(odf[c])
        # a column that is nullable-int on one side surfaces as float64 in
        # pandas on BOTH sides (Spark toPandas and duckdb .df() upgrade the
        # same way), so int-vs-float here is a real engine-type divergence —
        # except when either side has no non-null value to classify
        if "all-null" in (sk, ok):
            continue
        if {sk, ok} == {"int", "float"} and (
            spdf[c].isna().any() or odf[c].isna().any()
        ):
            continue
        if sk != ok:
            kind_mismatch[c] = (sk, ok)
    assert not kind_mismatch, (
        f"{name}: pandas dtype-class mismatch (spark, oracle): {kind_mismatch} — "
        "driver value-hash will fail even if Python values compare equal "
        "(e.g. CAST(SUM(int) AS BIGINT) missing in oracle)"
    )
    ns_cols, ns = normalize(s_cols, s_rows)
    _, no = normalize(o_cols, o_rows)
    assert len(ns) == len(no), f"{name}: row count spark={len(ns)} oracle={len(no)}"
    mismatches = [(a, b) for a, b in zip(ns, no) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(ns)} row mismatches; cols={ns_cols}; "
        f"first 3: {mismatches[:3]}"
    )
