"""Interleaved A/B for the replay-checkpoint scratch dir (r13 tail probe).

Arms differ ONLY in SPARK_GRAFT_STREAM_CKPT_DIR, read at call time by
streams._replay_ckpt_dir: "/tmp" reproduces the pre-change disk-backed
checkpoints, "" selects the /dev/shm tmpfs default.  Arms alternate within
one session (A,B,A,B,...) so machine drift hits both equally; per-arm
median over --reps reported per live query.

Usage:
    python scripts/stream_ckpt_ab.py [--reps N] [--names a,b,...]
"""

from __future__ import annotations

import os
import statistics as st
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> int:
    args = sys.argv[1:]
    reps = 3
    names_filter = None
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--names":
            names_filter = args[i + 1].split(",")
            i += 2
        else:
            raise SystemExit(f"unknown arg {args[i]}")

    from pyspark.sql import SparkSession

    from duckdb_postgis_spark import registry
    from duckdb_postgis_spark.catalog import ensure_scan_layout

    opt_dir, _ = ensure_scan_layout(SF_DIR)

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("stream-ckpt-ab")
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

    queries = registry.all_queries()
    if names_filter is None:
        import duckdb_postgis_spark.streaming.streams as streams_mod

        names = sorted(
            n for n, fn in queries.items()
            if getattr(fn, "__module__", "") == streams_mod.__name__
        )
    else:
        names = names_filter
    print(f"live queries: {names}", flush=True)

    totals = {"disk": 0.0, "shm": 0.0}
    for name in names:
        fn = queries[name]
        per_arm: dict[str, list[float]] = {"disk": [], "shm": []}
        # one untimed warm rep so JIT/scan-cache effects land outside the A/B
        os.environ["SPARK_GRAFT_STREAM_CKPT_DIR"] = "/tmp"
        fn(spark, opt_dir).write.format("noop").mode("overwrite").save()
        for _ in range(reps):
            for arm, val in (("disk", "/tmp"), ("shm", "")):
                os.environ["SPARK_GRAFT_STREAM_CKPT_DIR"] = val
                spark.sparkContext.setJobDescription(f"ab:{name}:{arm}")
                t0 = time.perf_counter()
                fn(spark, opt_dir).write.format("noop").mode("overwrite").save()
                per_arm[arm].append(time.perf_counter() - t0)
        d, s = st.median(per_arm["disk"]), st.median(per_arm["shm"])
        totals["disk"] += d
        totals["shm"] += s
        print(f"{name}: disk {d:.3f}s  shm {s:.3f}s  ({(d - s) / d * 100:+.1f}%)",
              flush=True)
    print(f"TOTAL disk {totals['disk']:.1f}s  shm {totals['shm']:.1f}s")
    os.environ.pop("SPARK_GRAFT_STREAM_CKPT_DIR", None)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
