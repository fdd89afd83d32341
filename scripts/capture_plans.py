"""Capture .explain("formatted") for named queries into plans/r14/.

Usage:
    python scripts/capture_plans.py before|after [name1 name2 ...]

Defaults to the 13 bench headliners.  Runs in the exact bench session
(same confs as bench.py's make_session) on the optimized scan layout so
the captured plans are the ones the benchmark executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "pricing_summary",
    "join_broadcast_4way",
    "window_rank_topn",
    "sort_limit_topk",
    "agg_distinct",
    "stream_tumbling",
    "text_stats",
    "knn_cosine_topk",
    "dedup_minhash_lsh",
    "pipeline_training_e2e",
    "events_ewma_trailing",
    "sample_hard_negative_mining",
    "graph_pagerank_bipartite",
]


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE

    from pyspark.sql import SparkSession

    from duckdb_postgis_spark import registry
    from duckdb_postgis_spark.catalog import ensure_scan_layout

    opt_dir, _ = ensure_scan_layout(SF_DIR)
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("plan-capture")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "1048576")
        .config("spark.sql.files.openCostInBytes", "32768")
        .config("spark.sql.files.minPartitionNum", CPUS)
        .config("spark.locality.wait", "0")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)), "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    queries = registry.all_queries()
    for name in names:
        df = queries[name](spark, opt_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
