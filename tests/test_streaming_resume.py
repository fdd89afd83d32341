"""Checkpoint restart-resume semantics (round 6).

The live streaming queries run under Trigger.AvailableNow with a fresh
checkpoint per invocation — correct for deterministic replay, but it never
exercises the property production actually relies on: a query that STOPS
and is RESTARTED from its checkpoint must resume with its state intact and
process only the newly-arrived files, exactly once.

This test stages an events landing directory in two phases over ONE fixed
checkpoint:

  phase 1: two parquet slices land → stream drains (dropDuplicates state
           absorbs their user_ids) → query stops;
  phase 2: two more slices land → the query restarts from the SAME
           checkpoint → only user_ids never seen in phase 1 may emit.

Assertions: (a) the restart processed only the new files (no re-emission
of phase-1 keys — the state store was reloaded, not rebuilt), and (b)
phase1 ∪ phase2 equals the batch-distinct of all four slices (nothing
lost).  Together that is exactly-once across a restart.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _stage(tmp_path, sf_dir: str):
    """Split events so phase 2 carries BOTH already-seen users (whose
    re-arrival must be suppressed by recovered state) and brand-new users
    (who must still emit): phase 1 = users with id % 3 != 0; phase 2 =
    users with id % 3 == 0 plus a replay of the first phase-1 slice."""
    import pyarrow.compute as pc

    t = pq.read_table(f"{sf_dir}/events.parquet")
    mod3 = pa.array([u % 3 == 0 for u in t.column("user_id").to_pylist()])
    new_users = t.filter(mod3)
    old_users = t.filter(pc.invert(mod3))
    assert new_users.num_rows and old_users.num_rows

    land = tmp_path / "landing"
    land.mkdir()
    half = old_users.num_rows // 2
    phase1 = [
        (land / "part-0.parquet", old_users.slice(0, half)),
        (land / "part-1.parquet", old_users.slice(half)),
    ]
    phase2 = [
        (land / "part-2.parquet", new_users),
        # replayed duplicates of already-seen users
        (land / "part-3.parquet", old_users.slice(0, half)),
    ]
    return land, phase1, phase2


def _run_phase(spark, land, ckpt, out, timeout: int = 120):
    """Drain available files into a fault-tolerant parquet sink (the memory
    sink cannot recover from a checkpoint) and return ALL user_ids emitted
    so far across phases."""
    schema = spark.read.parquet(str(land)).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land))
        .select("user_id")
        .dropDuplicates(["user_id"])
    )
    q = (
        sdf.writeStream.format("parquet")
        .option("path", str(out))
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    q.awaitTermination(timeout)
    if q.isActive:
        q.stop()
    return {r.user_id for r in spark.read.parquet(str(out)).collect()}


def test_restart_resumes_state_exactly_once(spark, sf_dir, tmp_path):
    land, phase1, phase2 = _stage(tmp_path, sf_dir)
    ckpt = tmp_path / "ckpt"
    out = tmp_path / "out"

    for path, tbl in phase1:
        pq.write_table(tbl, path)
    prev = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        seen1 = _run_phase(spark, land, ckpt, out)
        assert seen1, "phase 1 emitted nothing"

        # phase 2: new users + replayed old users land; restart from the
        # SAME checkpoint
        for path, tbl in phase2:
            pq.write_table(tbl, path)
        seen_all = _run_phase(spark, land, ckpt, out)
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        else:
            spark.conf.unset("spark.sql.shuffle.partitions")

    # (a) exactly-once across the restart: the sink holds each key ONCE —
    #     a rebuilt (rather than recovered) state store would have
    #     re-emitted every replayed phase-1 key in part-3.parquet
    sink = spark.read.parquet(str(out)).groupBy("user_id").count().collect()
    dupes = [r.user_id for r in sink if r["count"] > 1]
    assert not dupes, f"re-emitted after restart: {sorted(dupes)[:5]}"

    # (b) nothing lost, and the new users DID emit after the restart:
    all_ids = {
        r.user_id
        for r in spark.read.parquet(str(land)).select("user_id").distinct().collect()
    }
    assert seen_all == all_ids
    assert seen_all - seen1, "phase 2 added no new users — vacuous restart"
