"""Interleaved A/B re-measurement of knn_cosine_topk at the sf1 shape.

MEASUREMENT TRAP found while running this (r13): /tmp/sf1_stress
parquet has ONE row group per file, so DuckDB (row-group parallelism)
and Spark (one scan task per row group) BOTH serialize on it — the
first run measured duckdb 312 s / spark 6 s, a layout artifact, not
drift.  Point SF_DIR at the bench scan-layout dir (ensure_scan_layout,
19 row groups) and match the bench core count (32) for apples-to-
apples with BENCH_full numbers.

(r12 judge order #6): the r12 window measured 1.551 s (r11) -> 2.007 s
(+29%), the only headliner outside the documented ±25% cross-session
band, in a round where BOTH engines' floors moved a lot (machine
drift).  Alternated round-robin reps (A=Spark, B=DuckDB twin) make
drift hit both measurands equally; medians decide.

Verdict rule: Spark median inside [1.16, 2.51] s (the r11 value +25%
to the r12 value +25%) AND still far below the DuckDB twin -> noise;
a Spark median pinned at/above the r12 value with a stable DuckDB
median -> a real regression to bisect.

Usage: python scripts/knn_topk_ab.py [sf_dir] [rounds]
"""

from __future__ import annotations

import statistics as st
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_stress"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
CPUS = int(sys.argv[3]) if len(sys.argv) > 3 else 32  # match the bench harness


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    from duckdb_postgis_spark import registry

    registry.load_all()
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("knn-topk-ab")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .getOrCreate()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    oracle = registry.ORACLES["knn_cosine_topk"]

    def a_spark() -> None:
        registry.QUERIES["knn_cosine_topk"](spark, SF_DIR).collect()

    def b_duck() -> None:
        con.execute(oracle).fetchall()

    # warm both paths once (JIT, page cache, broadcast) before timing
    a_spark()
    b_duck()
    times: dict[str, list[float]] = {"spark": [], "duckdb": []}
    for _ in range(ROUNDS):
        for key, fn in (("spark", a_spark), ("duckdb", b_duck)):
            t0 = time.monotonic()
            fn()
            times[key].append(time.monotonic() - t0)
    med = {k: st.median(v) for k, v in times.items()}
    print(f"spark  reps: {[round(t, 3) for t in times['spark']]}")
    print(f"duckdb reps: {[round(t, 3) for t in times['duckdb']]}")
    print(
        f"medians: spark {med['spark']:.3f}s duckdb {med['duckdb']:.3f}s "
        f"ratio {med['spark'] / med['duckdb']:.3f}"
    )
    print(f"r11 spark 1.551s / r12 spark 2.007s (window, not interleaved)")


if __name__ == "__main__":
    main()
