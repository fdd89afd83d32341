"""Interleaved A/B re-measurement of pipeline_training_e2e at the sf1
shape (r11 judge order #6): its sf1 ratio moved 11.4x -> 3.32x on layout
changes alone, so the r9 'runs at/below its own stage-skeleton floor'
adjudication deserves one refreshed check.

Three measurands, interleaved round-robin (A, B, C, A, B, C, ...) so
machine drift hits all three equally:

  A = pipeline_training_e2e (Spark, the registered query)
  B = its registered DuckDB oracle on the same parquet
  C = refreshed STAGE SKELETON: identical scan + the same two exchanges
      (digest window, source window) + final agg, with the in-row
      quality compute (split/fold/stopwords) deleted — the zero-compute
      cost of the plan SHAPE.

Verdict rule (the judge's bar): Spark <= 2x DuckDB, or Spark within
noise of its own skeleton floor -> the structural adjudication stands.

Usage: python scripts/training_e2e_ab.py [sf_dir] [rounds]
"""

from __future__ import annotations

import statistics as st
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_stress"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 7


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from duckdb_postgis_spark import registry
    from duckdb_postgis_spark.catalog import table
    from duckdb_postgis_spark.operators.training import _CTX

    registry.load_all()
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("training-e2e-ab")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )

    def spark_full() -> None:
        registry.QUERIES["pipeline_training_e2e"](spark, SF_DIR).collect()

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    oracle = registry.ORACLES["pipeline_training_e2e"]

    def duck_full() -> None:
        con.execute(oracle).fetchall()

    def spark_skeleton() -> None:
        # same scan width (text read for the digest), same dedup window
        # on a 32-byte digest, same source pack window, same final agg —
        # all per-row compute beyond sha2 removed
        docs = table(spark, SF_DIR, "documents")
        g = docs.select(
            "doc_id", "lang", "source",
            F.length("text").alias("n_words"),
            F.sha2("text", 256).alias("h"),
        )
        keep = F.min("doc_id").over(Window.partitionBy("h"))
        s = (
            g.withColumn("keep_id", keep)
            .filter(F.col("doc_id") == F.col("keep_id"))
            .drop("h", "keep_id")
        )
        pack_w = (
            Window.partitionBy("source")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        c = s.withColumn(
            "cum", F.coalesce(F.sum("n_words").over(pack_w), F.lit(0)).cast("long")
        )
        c.groupBy("lang").agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("sum_tokens"),
            F.countDistinct(
                F.concat_ws(":", "source",
                            F.floor(F.col("cum") / _CTX).cast("string"))
            ).alias("n_bins"),
        ).collect()

    jobs = [("spark_full", spark_full), ("duckdb", duck_full),
            ("skeleton", spark_skeleton)]
    for _, fn in jobs:  # warm twice each
        fn(); fn()
    times: dict[str, list[float]] = {n: [] for n, _ in jobs}
    for _ in range(ROUNDS):
        for name, fn in jobs:
            t0 = time.perf_counter()
            fn()
            times[name].append(time.perf_counter() - t0)
    med = {n: st.median(ts) for n, ts in times.items()}
    print({n: [round(t, 3) for t in ts] for n, ts in times.items()})
    print(
        f"medians: spark={med['spark_full']:.3f}s duckdb={med['duckdb']:.3f}s "
        f"skeleton={med['skeleton']:.3f}s | spark/duckdb="
        f"{med['spark_full'] / med['duckdb']:.2f} spark/skeleton="
        f"{med['spark_full'] / med['skeleton']:.2f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
