"""Randomized scalar-expression differential fuzzer (round 6; companion to
test_fuzz_compositions.py).

Each seed draws a handful of typed scalar expressions from a grammar whose
every production is rendered simultaneously as a Spark Column and a DuckDB
SQL fragment, projects them over a filtered table, and requires exact
normalized equality.  This sweeps the per-function semantic minefield —
1-based substring indexing, null propagation through CASE/COALESCE/NULLIF,
integer %, date extraction/arithmetic, IEEE double arithmetic — across
hundreds of random combinations the fixed corpus can't enumerate.

Deliberately EXCLUDED from the grammar (documented cross-engine
divergence, each pinned by the fixed corpus where the repo needs it):
  * transcendental math (pow/exp/log/trig) — libm implementations differ
    in the last ULP between the JVM and DuckDB;
  * ROUND(double, n) — Spark routes doubles through BigDecimal.valueOf
    (shortest-repr) HALF_UP while DuckDB rounds the binary double half
    away from zero; equal almost always, not provably always (the repo's
    exact-money convention in functions/num.py exists to avoid exactly
    this);
  * regex (Java regex vs DuckDB's engine differ on classes/anchors).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from duckdb_postgis_spark.catalog import table
from tests.oracle_harness import normalize, run_oracle

SEEDS_PER_CHUNK = 30
N_CHUNKS = 10


# --------------------------------------------------------------------------
# typed expression grammar: every generator returns (Column, sql_text) built
# from the same draw.  depth bounds recursion.
# --------------------------------------------------------------------------
_INT_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
_STR_COLS = ["l_returnflag", "l_linestatus"]
_DATE_COL = "l_shipdate"  # timestamp in parquet; both engines extract alike


def _int_expr(rng: random.Random, depth: int):
    if depth <= 0 or rng.random() < 0.35:
        if rng.random() < 0.7:
            c = rng.choice(_INT_COLS)
            return F.col(c).cast("long"), f"CAST({c} AS BIGINT)"
        n = rng.randint(-50, 50)
        return F.lit(n).cast("long"), f"CAST({n} AS BIGINT)"
    k = rng.randrange(7)
    a_c, a_s = _int_expr(rng, depth - 1)
    if k == 0:
        b_c, b_s = _int_expr(rng, depth - 1)
        return a_c + b_c, f"({a_s} + {b_s})"
    if k == 1:
        b_c, b_s = _int_expr(rng, depth - 1)
        return a_c - b_c, f"({a_s} - {b_s})"
    if k == 2:
        n = rng.randint(2, 9)
        return a_c * n, f"({a_s} * {n})"
    if k == 3:
        # pmod-free % with a positive right side; Spark % and DuckDB %
        # both take the dividend's sign — identical for these operands
        m = rng.randint(2, 13)
        return a_c % m, f"({a_s} % {m})"
    if k == 4:
        return F.abs(a_c), f"ABS({a_s})"
    if k == 5:
        b_c, b_s = _int_expr(rng, depth - 1)
        return F.greatest(a_c, b_c), f"GREATEST({a_s}, {b_s})"
    b_c, b_s = _int_expr(rng, depth - 1)
    return F.least(a_c, b_c), f"LEAST({a_s}, {b_s})"


def _str_expr(rng: random.Random, depth: int):
    if depth <= 0 or rng.random() < 0.4:
        if rng.random() < 0.75:
            c = rng.choice(_STR_COLS)
            return F.col(c), c
        s = rng.choice(["x", "AB", "zz", ""])
        return F.lit(s), f"'{s}'"
    k = rng.randrange(10)
    a_c, a_s = _str_expr(rng, depth - 1)
    if k == 0:
        return F.upper(a_c), f"UPPER({a_s})"
    if k == 1:
        return F.lower(a_c), f"LOWER({a_s})"
    if k == 6:
        return F.trim(a_c), f"TRIM({a_s})"
    if k == 7:
        # non-empty FROM only (empty-pattern REPLACE semantics diverge)
        frm, to = rng.choice([("a", "_"), ("an", "X"), ("E", ""), ("1", "9")])
        return (
            F.replace(a_c, F.lit(frm), F.lit(to)),
            f"REPLACE({a_s}, '{frm}', '{to}')",
        )
    if k == 8:
        return F.reverse(a_c), f"REVERSE({a_s})"
    if k == 9:
        n = rng.randint(0, 6)
        return F.left(a_c, F.lit(n)), f"LEFT({a_s}, {n})"
    if k == 2:
        b_c, b_s = _str_expr(rng, depth - 1)
        return F.concat(a_c, b_c), f"({a_s} || {b_s})"
    if k == 3:
        # 1-based start on both engines; fixed positive length
        st = rng.randint(1, 3)
        ln = rng.randint(1, 4)
        return (
            F.substring(a_c, st, ln),
            f"SUBSTRING({a_s}, {st}, {ln})",
        )
    if k == 4:
        b_c, b_s = _str_expr(rng, depth - 1)
        return (
            F.when(a_c < b_c, a_c).otherwise(b_c),
            f"CASE WHEN {a_s} < {b_s} THEN {a_s} ELSE {b_s} END",
        )
    pad = rng.choice(["-", "*"])
    n = rng.randint(3, 6)
    return F.lpad(a_c, n, pad), f"LPAD({a_s}, {n}, '{pad}')"


def _num_scalar(rng: random.Random):
    """Double-typed expression over money columns: +,-,* and / are IEEE
    bit-identical cross-engine; no rounding, no libm."""
    a = rng.choice(["l_extendedprice", "l_discount", "l_tax", "l_quantity"])
    b = rng.choice(["l_extendedprice", "l_discount", "l_tax", "l_quantity"])
    k = rng.randrange(4)
    if k == 0:
        return F.col(a) + F.col(b), f"({a} + {b})"
    if k == 1:
        return F.col(a) - F.col(b), f"({a} - {b})"
    if k == 2:
        return F.col(a) * F.col(b), f"({a} * {b})"
    # divisor strictly positive: quantity >= 1 in the testdata
    return F.col(a) / F.col("l_quantity"), f"({a} / l_quantity)"


def _date_expr(rng: random.Random):
    k = rng.randrange(8)
    c = _DATE_COL
    if k == 5:
        # month arithmetic clamps to month end identically (1996-01-31
        # + 1 month = 1996-02-29 on both engines, parity-checked)
        n = rng.randint(-6, 6)
        return (
            F.add_months(F.col(c).cast("date"), n),
            f"CAST(CAST({c} AS DATE) + INTERVAL ({n}) MONTH AS DATE)",
        )
    if k == 6:
        return (
            F.last_day(F.col(c).cast("date")),
            f"LAST_DAY(CAST({c} AS DATE))",
        )
    if k == 7:
        return (
            F.trunc(F.col(c).cast("date"), "month"),
            f"CAST(DATE_TRUNC('month', CAST({c} AS DATE)) AS DATE)",
        )
    if k == 0:
        return F.year(c).cast("long"), f"CAST(YEAR({c}) AS BIGINT)"
    if k == 1:
        return F.month(c).cast("long"), f"CAST(MONTH({c}) AS BIGINT)"
    if k == 2:
        return F.dayofmonth(c).cast("long"), f"CAST(DAY({c}) AS BIGINT)"
    if k == 3:
        n = rng.randint(-30, 30)
        return (
            F.date_add(F.col(c).cast("date"), n),
            f"CAST({c} AS DATE) + {n}",
        )
    d = f"199{rng.randint(3, 8)}-0{rng.randint(1, 9)}-15"
    return (
        F.datediff(F.col(c).cast("date"), F.lit(d).cast("date")).cast("long"),
        f"CAST(DATE_DIFF('day', DATE '{d}', CAST({c} AS DATE)) AS BIGINT)",
    )


def _null_mix(rng: random.Random, depth: int):
    """NULL-propagation surface: NULLIF / COALESCE / CASE over int exprs."""
    a_c, a_s = _int_expr(rng, depth)
    k = rng.randrange(3)
    if k == 0:
        m = rng.randint(0, 5)
        inner_c, inner_s = F.nullif(a_c % 7, F.lit(m)), f"NULLIF(({a_s} % 7), {m})"
        b_c, b_s = _int_expr(rng, depth - 1)
        return F.coalesce(inner_c, b_c), f"COALESCE({inner_s}, {b_s})"
    if k == 1:
        t = rng.randint(-10, 10)
        return (
            F.when(a_c > t, a_c).cast("long"),
            f"CASE WHEN {a_s} > {t} THEN {a_s} END",
        )
    b_c, b_s = _int_expr(rng, depth - 1)
    return (
        F.when(a_c % 2 == 0, a_c).otherwise(-b_c),
        f"CASE WHEN ({a_s} % 2) = 0 THEN {a_s} ELSE -({b_s}) END",
    )


def _run_one(spark, sf_dir: str, seed: int) -> None:
    rng = random.Random(90_000 + seed)
    gens = [
        lambda: _int_expr(rng, 3),
        lambda: _str_expr(rng, 3),
        lambda: _num_scalar(rng),
        lambda: _date_expr(rng),
        lambda: _null_mix(rng, 2),
    ]
    picks = [rng.choice(gens)() for _ in range(rng.randint(3, 6))]
    cols = [c.alias(f"e{i}") for i, (c, _) in enumerate(picks)]
    sqls = ", ".join(f"{s} AS e{i}" for i, (_, s) in enumerate(picks))

    # bounded slice keeps each seed cheap; the modulus filter is rendered
    # identically on both sides so the slice is the same rows
    m = rng.randint(3, 7)
    r = rng.randrange(m)
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % m == r)
    got = li.select(*cols)
    sql = f"SELECT {sqls} FROM lineitem WHERE l_orderkey % {m} = {r}"

    s_cols, s_rows = got.columns, [tuple(row) for row in got.collect()]
    o_cols, o_rows, _ = run_oracle(sql, sf_dir)
    _, ns = normalize(s_cols, s_rows)
    _, no = normalize(o_cols, o_rows)
    assert ns == no, f"scalar mismatch seed={seed}\nSQL: {sql}"


@pytest.mark.parametrize("chunk", range(N_CHUNKS))
def test_fuzz_scalar_parity(spark, sf_dir, chunk):
    for i in range(SEEDS_PER_CHUNK):
        _run_one(spark, sf_dir, chunk * SEEDS_PER_CHUNK + i)
