"""Exactness guarantees of the long-cents money convention (functions/num.py).

The round-6 fast path rests on three claims, each proven here rather than
assumed:

1. ``cents`` recovery: for any k-decimal-digit value n/10^k stored as its
   nearest double, FLOOR(x*10^k + 0.5) == n exactly — positive, negative,
   and the exactly-representable quarters included (hypothesis-swept).
2. Engine mirror: the Spark ``cents``/``lsum``/``lsum_split`` columns and
   their ``sql_*`` DuckDB twins produce bit-identical doubles on real
   table data (the convention is only useful if BOTH sides land on the
   same IEEE value).
3. ``lsum_split`` == single-accumulator sum: the 2^20-radix hi/lo split
   recombines to exactly the plain sum on data small enough for both to
   be exact.
"""

from __future__ import annotations

import math

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from duckdb_postgis_spark.catalog import table
from duckdb_postgis_spark.functions.num import (
    cents,
    lavg,
    lsum,
    lsum_split,
    sql_cents,
    sql_lavg,
    sql_lsum,
    sql_lsum_split,
)


# --------------------------------------------------------------------------
# claim 1: pure-python model of the expression both engines evaluate
# --------------------------------------------------------------------------
@settings(max_examples=2000, deadline=None)
@given(
    n=st.integers(min_value=-(10**13), max_value=10**13),
    scale=st.sampled_from([0, 1, 2, 4]),
)
def test_cents_recovers_fixed_point_exactly(n: int, scale: int):
    x = n / (10**scale)  # nearest double to the fixed-point value
    recovered = math.floor(x * float(10**scale) + 0.5)
    assert recovered == n, (n, scale, x)


# --------------------------------------------------------------------------
# claims 2+3 on real data: Spark vs DuckDB vs each other
# --------------------------------------------------------------------------
def _duck(sf_dir: str, sql: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    out = con.execute(sql).fetchall()
    con.close()
    return out


def test_lsum_lavg_mirror_duckdb_bitwise(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    got = (
        li.groupBy("l_returnflag")
        .agg(
            lsum("l_extendedprice").alias("s"),
            lavg("l_extendedprice").alias("a"),
            F.sum(cents("l_discount")).alias("c"),
        )
        .orderBy("l_returnflag")
        .collect()
    )
    want = _duck(
        sf_dir,
        f"""
        SELECT l_returnflag,
               {sql_lsum('l_extendedprice')} AS s,
               {sql_lavg('l_extendedprice')} AS a,
               CAST(SUM({sql_cents('l_discount')}) AS BIGINT) AS c
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
    )
    for g, w in zip(got, want):
        assert g.l_returnflag == w[0]
        # bit-identical, no tolerance: that IS the convention's claim
        assert g.s == w[1], (g.s, w[1])
        assert g.a == w[2], (g.a, w[2])
        assert g.c == w[3], (g.c, w[3])


def test_lsum_split_equals_plain_sum(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    prod = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    got = (
        li.groupBy("l_returnflag")
        .agg(
            lsum_split(prod, 1e4).alias("split"),
            (F.sum(prod).cast("double") / F.lit(1e4)).alias("plain"),
        )
        .collect()
    )
    for r in got:
        assert r.split == r.plain, (r.l_returnflag, r.split, r.plain)


def test_lsum_split_mirror_duckdb_bitwise(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    prod = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    prod_sql = (
        f"({sql_cents('l_extendedprice')} * (100 - {sql_cents('l_discount')}))"
    )
    got = (
        li.groupBy("l_returnflag")
        .agg(lsum_split(prod, 1e4).alias("s"))
        .orderBy("l_returnflag")
        .collect()
    )
    want = _duck(
        sf_dir,
        f"""
        SELECT l_returnflag, {sql_lsum_split(prod_sql, 1e4)} AS s
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
    )
    for g, w in zip(got, want):
        assert g.s == w[1], (g.l_returnflag, g.s, w[1])
