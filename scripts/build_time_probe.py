"""Rank registered queries by DRIVER-SIDE build time: the seconds spent
inside fn(spark, sf_dir) constructing the DataFrame (py4j round trips,
expression-tree building, any ensure_* cache probes) BEFORE any action
runs.  The registry sweep times build+exec together; this isolates the
build half so F.expr-style fixes (the r13 dedup_simhash treatment) can
be targeted by measurement instead of guesswork.

Usage:
    python scripts/build_time_probe.py [--names a,b,...] [--reps N] [--out F]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics as st
import sys
import time

# repo root derived from this file's location (r13 ADVICE: no hardcoded path)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--names", help="comma-separated query names (default: all)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/build_time_probe.json")
    opts = ap.parse_args()
    names_filter = opts.names.split(",") if opts.names else None
    reps = opts.reps
    out_path = opts.out

    from pyspark.sql import SparkSession

    from duckdb_postgis_spark import registry
    from duckdb_postgis_spark.catalog import ensure_scan_layout

    opt_dir, _ = ensure_scan_layout(SF_DIR)
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("build-time-probe")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = registry.all_queries()
    names = sorted(queries) if names_filter is None else names_filter
    results: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        try:
            # warm once: ensure_* layouts materialize, JVM classes load
            fn(spark, opt_dir)
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn(spark, opt_dir)
                ts.append(time.perf_counter() - t0)
            results[name] = round(st.median(ts), 4)
        except Exception as e:  # streaming live queries may need a sink
            results[name] = -1.0
            print(f"  [skip] {name}: {type(e).__name__}: {e}", file=sys.stderr)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    for name, sec in sorted(results.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{sec:8.3f}  {name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
