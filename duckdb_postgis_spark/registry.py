"""Query + oracle registry backing ``__spark_entry__.py``.

Every operator from SURVEY.md §2.8-2.11 registers itself here with an
optional DuckDB oracle SQL twin.  The driver runs both sides at sf0.01 and
compares row-count + schema + order-insensitive value hash, so the contract
is: *identical column names, identical values* (see functions/num.py for the
exact-arithmetic conventions that make float values match bit-for-bit).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as queries()[name]; ``oracle`` as its DuckDB twin."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registration side-effects run."""
    from duckdb_postgis_spark.operators import (  # noqa: F401
        geo,
        llm,
        multimodal,
        relational,
        streaming,
    )
    from duckdb_postgis_spark.plans import layout  # noqa: F401
    from duckdb_postgis_spark.streaming import streams  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)


def describe() -> list[dict[str, Any]]:
    load_all()
    return [
        {"name": n, "oracle": n in ORACLES, "doc": (f.__doc__ or "").strip().splitlines()[0] if f.__doc__ else ""}
        for n, f in sorted(QUERIES.items())
    ]
