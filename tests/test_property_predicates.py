"""Property-style differential predicates (SURVEY §5.4).

Seeded random conjunctive predicates over lineitem are rendered from ONE spec
into both a Spark Column and a DuckDB WHERE clause; grouped exact aggregates
must match. This catches operator-semantics drift (null handling, LIKE
escaping, date comparison, decimal rounding) that the fixed query corpus
might miss.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from duckdb_postgis_spark.catalog import table
from duckdb_postgis_spark.functions.num import dsum, sql_dsum
from tests.oracle_harness import normalize, run_oracle


def _gen_clauses(rng: random.Random):
    """Yield (spark_col, sql_text) pairs built from one random choice."""
    clauses = []
    if rng.random() < 0.8:
        lo = rng.randint(1, 40)
        hi = lo + rng.randint(1, 10)
        clauses.append(
            (
                F.col("l_quantity").between(lo, hi),
                f"l_quantity BETWEEN {lo} AND {hi}",
            )
        )
    if rng.random() < 0.6:
        d = rng.choice([0.0, 0.02, 0.04, 0.06, 0.08])
        clauses.append((F.col("l_discount") <= d, f"l_discount <= {d}"))
    if rng.random() < 0.6:
        flags = rng.sample(["A", "N", "R"], rng.randint(1, 2))
        inlist = ", ".join(f"'{x}'" for x in flags)
        clauses.append(
            (F.col("l_returnflag").isin(flags), f"l_returnflag IN ({inlist})")
        )
    if rng.random() < 0.5:
        y = rng.randint(1993, 1997)
        clauses.append(
            (F.col("l_shipdate") >= f"{y}-06-01", f"l_shipdate >= DATE '{y}-06-01'")
        )
    if rng.random() < 0.4:
        k = rng.randint(0, 9)
        clauses.append(
            (F.col("l_partkey") % 10 == k, f"l_partkey % 10 = {k}")
        )
    if not clauses:  # degenerate draw: fall back to a tautology pair
        clauses.append((F.col("l_quantity") >= 0, "l_quantity >= 0"))
    return clauses


@pytest.mark.parametrize("seed", range(12))
def test_random_predicate_parity(spark, sf_dir, seed):
    rng = random.Random(seed)
    clauses = _gen_clauses(rng)
    cond = clauses[0][0]
    for c, _ in clauses[1:]:
        cond = cond & c
    where = " AND ".join(sql for _, sql in clauses)

    li = table(spark, sf_dir, "lineitem")
    got = (
        li.filter(cond)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), dsum("l_extendedprice").alias("rev"))
    )
    sql = f"""
        SELECT l_returnflag, COUNT(*) AS n, {sql_dsum("l_extendedprice")} AS rev
        FROM lineitem WHERE {where} GROUP BY l_returnflag
    """
    s_cols, s_rows = got.columns, [tuple(r) for r in got.collect()]
    o_cols, o_rows, _ = run_oracle(sql, sf_dir)
    _, ns = normalize(s_cols, s_rows)
    _, no = normalize(o_cols, o_rows)
    assert ns == no, f"seed={seed} where={where}"
