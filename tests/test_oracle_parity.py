"""Differential tests: every registered query vs its DuckDB oracle at the
smallest scale factor — the local replica of the driver's correctness gate."""

from __future__ import annotations

import pytest

from duckdb_postgis_spark import registry
from tests.oracle_harness import compare_query

registry.load_all()
ORACLE_CASES = sorted(registry.ORACLES)
ROWS_ONLY_CASES = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_parity(spark, sf_dir, name):
    compare_query(spark, name, registry.QUERIES[name], registry.ORACLES[name], sf_dir)


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_runs(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert df.columns


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert e.queries()
    assert set(e.oracle_sql()) <= set(e.queries())


def test_sf_interleave_no_stale_views(spark):
    """Temp-view re-registration must not leak data across sf dirs: the same
    view-backed query run at sf0.001 → sf0.01 → sf0.001 returns sf-consistent
    results (regression probe for register_views caching)."""
    from duckdb_postgis_spark import registry

    registry.load_all()
    q = registry.QUERIES["subquery_scalar_in"]
    a1 = sorted(map(str, q(spark, "/root/testdata/sf0.001").collect()))
    b = sorted(map(str, q(spark, "/root/testdata/sf0.01").collect()))
    a2 = sorted(map(str, q(spark, "/root/testdata/sf0.001").collect()))
    assert a1 == a2
    assert b != a1  # different scale factors genuinely differ in values


def test_mapinpandas_idempotent_rerun(spark):
    """A mapInPandas query re-run in the same session returns identical
    results (broadcast/Arrow-batch reuse probe)."""
    from duckdb_postgis_spark import registry

    registry.load_all()
    q = registry.QUERIES["multimodal_image_features"]
    r1 = sorted(map(str, q(spark, "/root/testdata/sf0.001").collect()))
    r2 = sorted(map(str, q(spark, "/root/testdata/sf0.001").collect()))
    assert r1 == r2


@pytest.mark.parametrize(
    "name", ["pricing_summary", "dedup_minhash_lsh", "window_trailing_range"]
)
def test_partition_count_invariance(spark, sf_dir, name):
    """Results must not depend on shuffle partitioning — the property that
    makes every oracle-checked value reproducible on a 1000-executor
    cluster with different parallelism than the test harness."""
    from duckdb_postgis_spark import registry

    registry.load_all()
    q = registry.QUERIES[name]
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(map(str, q(spark, sf_dir).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = sorted(map(str, q(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert a == b


SF01_SUBSET = [
    "pricing_summary",        # 600k-row scan, 9 aggregates
    "window_trailing_range",  # 100k-event RANGE window
    "agg_percentiles",        # exact ordered-set aggregate
    "text_stats",             # exact integer token arithmetic
    "sessionize_islands",     # microsecond gap compare + running-sum ids
    "events_anomaly_zscore",  # exact-moment z-scores
    "knn_cosine_topk",        # block-pair cogroup matmul vs 4M-pair oracle
    "dedup_simhash",          # pure-JVM bit arithmetic at 10x scale
    "dedup_substring_spans",  # positional md5 shingle match at 10x scale
    "agg_quantile_histogram_merge",  # rank pins under 10x value spread
    "similarity_search_pq",   # recall_ge_06 pin at its measured-0.8 scale
]


@pytest.mark.parametrize("name", SF01_SUBSET)
def test_oracle_parity_sf01(spark, name):
    """Scale-up parity: the same value-exactness discipline must hold at
    10x the default test scale (sf0.1 — the bench scale), where double
    accumulation error and partition-order effects would surface first."""
    compare_query(
        spark, name, registry.QUERIES[name], registry.ORACLES[name],
        "/root/testdata/sf0.1",
    )


def test_bad_sf_dir_fails_clean(spark):
    """A wrong data directory must surface Spark's typed PATH_NOT_FOUND
    analysis error — not a partial result or an opaque crash."""
    from pyspark.errors import AnalysisException

    from duckdb_postgis_spark import registry

    registry.load_all()
    for name in ("pricing_summary", "text_stats"):
        with pytest.raises(AnalysisException):
            registry.QUERIES[name](spark, "/root/testdata/sf-does-not-exist").collect()


def test_concurrent_queries_do_not_cross_views(spark):
    """A fixed temp-view name raced under concurrent invocations (another
    call could replace the view between registration and analysis) —
    view names are per-invocation now.  Eight concurrent invocations
    across two sf dirs must each return exactly their single-threaded
    result."""
    import concurrent.futures as cf

    from duckdb_postgis_spark import registry

    registry.load_all()
    names = ["events_multigrain_rollup", "text_shingle_udtf"]
    dirs = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    expected = {
        (n, d): registry.QUERIES[n](spark, d).count()
        for n in names
        for d in dirs
    }
    jobs = [(n, d) for n in names for d in dirs] * 2
    with cf.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(
            ex.map(lambda nd: registry.QUERIES[nd[0]](spark, nd[1]).count(), jobs)
        )
    for (n, d), got in zip(jobs, results):
        assert got == expected[(n, d)], (n, d, got, expected[(n, d)])
