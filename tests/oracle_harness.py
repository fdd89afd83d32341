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
    con.close()
    return cols, rows


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
    o_cols, o_rows = run_oracle(oracle, sf_dir)
    assert sorted(s_cols) == sorted(o_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    ns_cols, ns = normalize(s_cols, s_rows)
    _, no = normalize(o_cols, o_rows)
    assert len(ns) == len(no), f"{name}: row count spark={len(ns)} oracle={len(no)}"
    mismatches = [(a, b) for a, b in zip(ns, no) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(ns)} row mismatches; cols={ns_cols}; "
        f"first 3: {mismatches[:3]}"
    )
