"""Phase profile for the live Structured Streaming family (r14 verdict #4).

For each registered stream_*_live/-join query, runs the real replay through
an instrumented run_available_now and records WHERE the wall-clock goes:

- build_s:   fn() entry to writeStream.start() (plan construction, schema
             footer reads, _probe_events_ts)
- drain_s:   start() to awaitTermination() returning (micro-batch execution)
- teardown_s: stop/cleanup (checkpoint rmtree)
- per-batch StreamingQueryProgress durationMs breakdown (triggerExecution,
  queryPlanning, addBatch, getBatch, latestOffset, walCommit, commitOffsets)
  and stateOperators commit times

Output JSON ranks queries by total and aggregates the family's phase sums,
so "micro-batch machinery" is an artifact, not prose.

Usage:
    python scripts/stream_profile.py [--out F] [--names a,b,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/stream_profile.json")
    ap.add_argument("--names", default=None)
    ap.add_argument("--conf", action="append", default=[], help="extra k=v session confs")
    opts = ap.parse_args()

    from pyspark.sql import SparkSession

    from duckdb_postgis_spark import registry
    from duckdb_postgis_spark.catalog import ensure_scan_layout
    from duckdb_postgis_spark.streaming import streams

    opt_dir, _ = ensure_scan_layout(SF_DIR)
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("stream-profile")
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
    for kv in opts.conf:
        k, v = kv.split("=", 1)
        spark.conf.set(k, v)
    spark.sparkContext.setLogLevel("ERROR")

    queries = registry.all_queries()
    names = (
        opts.names.split(",")
        if opts.names
        else [n for n in queries if n.startswith("stream_") and n in (
            "stream_tumbling_live", "stream_hll_distinct_live",
            "stream_cms_topk_live", "stream_sliding_live",
            "stream_session_live", "stream_watermark_late_live",
            "stream_dedup_live", "stream_user_state", "stream_static_join",
            "stream_stream_join", "stream_upsert_live",
            "stream_stream_left_outer", "stream_chained_dedup_agg",
            "stream_quantile_hist_live", "stream_rate_limit_live",
        )]
    )

    orig_run = streams.run_available_now
    profile: dict = {}
    current: dict = {}

    def instrumented(sdf, name, output_mode="append", timeout=120):
        spark_ = sdf.sparkSession
        prev = spark_.conf.get("spark.sql.shuffle.partitions", None)
        spark_.conf.set("spark.sql.shuffle.partitions", "8")
        timeout_ = int(os.environ.get("SPARK_GRAFT_STREAM_TIMEOUT", str(timeout)))
        ckpt = streams._replay_ckpt_dir(f"ckpt_{name}_")
        rec = current.setdefault("runs", [])
        t_start = time.perf_counter()
        try:
            q = (
                sdf.writeStream.format("memory")
                .queryName(name)
                .outputMode(output_mode)
                .trigger(availableNow=True)
                .option("checkpointLocation", ckpt)
                .start()
            )
            t_started = time.perf_counter()
            finished = q.awaitTermination(timeout_)
            t_drained = time.perf_counter()
            progress = [json.loads(p.json) for p in q.recentProgress]
            if not finished or q.isActive:
                q.stop()
                raise RuntimeError(f"replay {name} did not drain")
        finally:
            if prev is not None:
                spark_.conf.set("spark.sql.shuffle.partitions", prev)
            else:
                spark_.conf.unset("spark.sql.shuffle.partitions")
            import shutil

            shutil.rmtree(ckpt, ignore_errors=True)
        t_done = time.perf_counter()
        rec.append(
            {
                "sink": name,
                "start_s": round(t_started - t_start, 4),
                "drain_s": round(t_drained - t_started, 4),
                "teardown_s": round(t_done - t_drained, 4),
                "n_batches": len(progress),
                "batches": [
                    {
                        "batchId": p.get("batchId"),
                        "numInputRows": p.get("numInputRows"),
                        "durationMs": p.get("durationMs"),
                        "stateOperators": [
                            {
                                k: so.get(k)
                                for k in (
                                    "operatorName",
                                    "commitTimeMs",
                                    "numRowsTotal",
                                    "numShufflePartitions",
                                )
                            }
                            for so in p.get("stateOperators", [])
                        ],
                    }
                    for p in progress
                ],
            }
        )
        return spark_.table(name)

    streams.run_available_now = instrumented
    try:
        for name in names:
            fn = queries[name]
            current = {}
            spark.sparkContext.setJobDescription(f"stream-profile:{name}")
            t0 = time.perf_counter()
            try:
                df = fn(spark, opt_dir)
                t_build = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t_end = time.perf_counter()
                current["build_and_replay_s"] = round(t_build - t0, 4)
                current["consume_s"] = round(t_end - t_build, 4)
                current["total_s"] = round(t_end - t0, 4)
            except Exception as exc:  # noqa: BLE001
                current["error"] = f"{type(exc).__name__}: {exc}"
            profile[name] = current
            print(
                f"{name}: total={current.get('total_s')}s "
                f"runs={len(current.get('runs', []))}",
                flush=True,
            )
    finally:
        streams.run_available_now = orig_run

    # family aggregates
    agg = {"total_s": 0.0, "start_s": 0.0, "drain_s": 0.0, "teardown_s": 0.0,
           "n_batches": 0, "durations_ms": {}}
    for rec in profile.values():
        agg["total_s"] += rec.get("total_s", 0.0)
        for run in rec.get("runs", []):
            agg["start_s"] += run["start_s"]
            agg["drain_s"] += run["drain_s"]
            agg["teardown_s"] += run["teardown_s"]
            agg["n_batches"] += run["n_batches"]
            for b in run["batches"]:
                for k, v in (b.get("durationMs") or {}).items():
                    agg["durations_ms"][k] = agg["durations_ms"].get(k, 0) + v
    for k in ("total_s", "start_s", "drain_s", "teardown_s"):
        agg[k] = round(agg[k], 3)

    out = {"sf_dir": opt_dir, "cpus": CPUS, "family": agg, "queries": profile}
    with open(opts.out, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(agg, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
