"""Physical-layout plan gates (M5): partition pruning and co-located joins.

Correct rows are necessary, the right plan is the point — these assert the
scan/exchange structure that makes the layouts pay off at 100 TB.
"""

from __future__ import annotations

from duckdb_postgis_spark import registry
from tests.test_plans import plan_of

registry.load_all()


def test_events_partition_pruning(spark, sf_dir):
    df = registry.QUERIES["events_partition_pruned"](spark, sf_dir)
    p = plan_of(df)
    scan = p[p.index("Scan parquet") :]
    filters = [ln for ln in scan.splitlines() if "PartitionFilters" in ln][0]
    assert "event_date" in filters and "2024-01-15" in filters, filters
    # the time predicate must NOT survive as a post-scan row filter
    assert "PushedFilters: []" in scan or "2024-01-15" not in (
        [ln for ln in scan.splitlines() if "PushedFilters" in ln] or [""]
    )[0]


def test_bucketed_join_has_no_exchange_below_join(spark, sf_dir):
    df = registry.QUERIES["join_bucketed_colocated"](spark, sf_dir)
    p = plan_of(df)
    assert "SortMergeJoin" in p, p
    assert "SelectedBucketsCount" in p, p
    # Every Exchange in the plan must be ABOVE the join (the 5-row agg on
    # o_orderpriority and the final sort) — none may repartition the join
    # keys, which is what bucketing eliminates.
    for ln in p.splitlines():
        if "hashpartitioning(" in ln or "rangepartitioning(" in ln:
            assert "l_orderkey" not in ln and "o_orderkey" not in ln, ln


def test_bucketed_scan_reports_buckets(spark, sf_dir):
    from duckdb_postgis_spark.plans import ensure_bucketed_table

    li = ensure_bucketed_table(spark, sf_dir, "lineitem", "l_orderkey")
    assert li.count() > 0
