"""AQE skew-join handling — the runtime half of the skew story (M5).

agg_skew_salted covers explicit salting for aggregation; this test proves
the join-side claim in SURVEY §4 ("AQE handles skew"): a hot-key sort-merge
join gets its oversized partition split at runtime (skew=true in the final
plan) once the adaptive thresholds see it. Thresholds are shrunk so the
effect is visible at test scale; the mechanism is identical at 100 TB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skew_tables(spark, tmp_path):
    # left: 200k rows, 90% on key 0 (hot), remainder uniform over 1..99
    left = spark.range(200_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(0))
        .otherwise((F.col("id") % 99) + 1)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    # right: 100 keys x 2k rows — big enough to stay out of broadcast range
    right = spark.range(200_000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("r_payload")
    )
    lp, rp = f"{tmp_path}/left", f"{tmp_path}/right"
    left.write.parquet(lp)
    right.write.parquet(rp)
    return lp, rp


def test_aqe_splits_skewed_join_partition(spark, skew_tables):
    lp, rp = skew_tables
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        left = spark.read.parquet(lp)
        right = spark.read.parquet(rp)
        # Global aggregate: no required hash distribution above the join, so
        # AQE is free to split the hot partition (a groupBy on the join key
        # would pin the distribution and veto the split). Aggregate the
        # payloads so column pruning keeps them in the shuffle — a hot
        # partition of constant keys alone lz4-compresses to almost nothing
        # and would duck under the skew byte threshold.
        joined = left.join(right, "k").agg(
            F.count("*").alias("n"), F.sum("payload").alias("s")
        )
        n = joined.collect()[0]["n"]
        # hot key 0: 180k x 2k; the other 99 keys: ~202 x 2k each
        assert n == 180_000 * 2_000 + 20_000 * 2_000
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
