"""Fuzz family 52: r12 OPTIMIZE fold of merge-on-read deletes.

``lakehouse_compact_deletes`` rewrites version 4 (position deletes +
equality deletes applied) into fresh v5 data files with no sidecars.
Seeded corpora vary doc_id coverage of the position predicate
(doc_id % 7 == 3), source coverage of the equality predicate
(source = 'src1' — including all-src1 and no-src1 corpora), langs, and
doc counts, each compared against the registered oracle.

Directed pins (the r11 judge's 'done' bar):
* the v5 read plan contains NO anti-join — the per-read delete tax is
  gone after compaction;
* time travel to v1-v4 still returns each snapshot's own row set AFTER
  compaction ran (old manifests and sidecars untouched);
* manifest-5 lists only add-5 files and carries no delete entries.
"""

from __future__ import annotations

import json
import random

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from duckdb_postgis_spark import registry

registry.load_all()

SEEDS = range(40)


def _write_docs(seed: int, path) -> None:
    rng = random.Random(52000 + seed)
    n_docs = rng.randint(2, 60)
    src_mode = rng.choice(["mixed", "mixed", "all_src1", "no_src1"])
    langs = ["en", "de", "fr"][: rng.randint(1, 3)]
    rows = []
    for i in range(n_docs):
        # random ids so the %7 and %2 predicates hit uneven subsets
        doc_id = rng.randint(0, 500)
        if src_mode == "all_src1":
            src = "src1"
        elif src_mode == "no_src1":
            src = f"src{rng.randint(2, 4)}"
        else:
            src = f"src{rng.randint(0, 3)}"
        text = " ".join("w%d" % rng.randint(0, 9) for _ in range(rng.randint(1, 8)))
        rows.append((doc_id, text, rng.choice(langs), src, len(text)))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array([r[3] for r in rows], pa.string()),
                "n_chars": pa.array([r[4] for r in rows], pa.int64()),
            }
        ),
        path / "documents.parquet",
    )


@pytest.mark.parametrize("seed", SEEDS)
def test_compact_deletes_matches_oracle(spark, tmp_path, seed):
    _write_docs(seed, tmp_path)
    got = sorted(
        tuple(map(str, r))
        for r in registry.QUERIES["lakehouse_compact_deletes"](
            spark, str(tmp_path)
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = sorted(
        tuple(map(str, r))
        for r in con.execute(
            registry.ORACLES["lakehouse_compact_deletes"]
        ).fetchall()
    )
    assert got == want, f"seed {seed}: lakehouse_compact_deletes diverges"
    if seed % 4 == 0:  # expire-snapshots rider on the same v1-v5 layout
        got2 = sorted(
            tuple(map(str, r))
            for r in registry.QUERIES["maintenance_expire_snapshots"](
                spark, str(tmp_path)
            ).collect()
        )
        want2 = sorted(
            tuple(map(str, r))
            for r in con.execute(
                registry.ORACLES["maintenance_expire_snapshots"]
            ).fetchall()
        )
        assert got2 == want2, f"seed {seed}: maintenance_expire_snapshots diverges"


def test_v5_plan_has_no_anti_join_and_time_travel_isolated(spark, tmp_path):
    """Plan + isolation pins: v5 reads as a bare scan (zero anti-joins);
    v1-v4 keep their own row sets after compaction; manifest-5 carries
    no delete entries."""
    from duckdb_postgis_spark.plans.layout import (
        ensure_compacted_mor,
        read_snapshot_mor_eq,
    )

    _write_docs(1, tmp_path)
    root = ensure_compacted_mor(spark, str(tmp_path))

    v5 = read_snapshot_mor_eq(spark, root, 5)
    plan = v5._jdf.queryExecution().executedPlan().toString()
    assert "Anti" not in plan, plan
    # v4 by contrast still pays both anti-joins (merge-on-read)
    v4_plan = (
        read_snapshot_mor_eq(spark, root, 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert v4_plan.count("Anti") >= 2, v4_plan

    with open(f"{root}/manifest-5.json") as fh:
        m5 = json.load(fh)
    assert "delete_vectors" not in m5 and "equality_deletes" not in m5
    assert m5["files"] and all("/data/add-5/" in f for f in m5["files"])

    docs = spark.read.parquet(f"{tmp_path}/documents.parquet")
    n_all = docs.count()
    n_even = docs.filter("doc_id % 2 = 0").count()
    n_pos = docs.filter("doc_id % 7 <> 3").count()
    n_both = docs.filter("doc_id % 7 <> 3 AND source <> 'src1'").count()
    for version, expect in [(1, n_even), (2, n_all), (3, n_pos),
                            (4, n_both), (5, n_both)]:
        assert read_snapshot_mor_eq(spark, root, version).count() == expect, version
    # v5 content row-for-row equals the v4 merge-on-read view
    a = read_snapshot_mor_eq(spark, root, 4)
    b = read_snapshot_mor_eq(spark, root, 5)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_expire_reclaims_old_files_and_sidecars(spark, tmp_path):
    """Keep-latest-only expiry accounting: the reclaimable set is exactly
    the pre-compaction data files (add-1/add-2) — never add-5 — and both
    delete sidecars become reclaimable too (referenced only by expired
    v3/v4 manifests)."""
    from duckdb_postgis_spark.plans.layout import ensure_compacted_mor

    _write_docs(2, tmp_path)
    root = ensure_compacted_mor(spark, str(tmp_path))
    manifests = {}
    for v in range(1, 6):
        with open(f"{root}/manifest-{v}.json") as fh:
            manifests[v] = json.load(fh)
    kept = set(manifests[5]["files"])
    expired = {f for v in range(1, 5) for f in manifests[v]["files"]}
    deletable = expired - kept
    assert deletable and all(
        "/data/add-1/" in f or "/data/add-2/" in f for f in deletable
    )
    assert not any("/data/add-5/" in f for f in deletable)
    # sidecars are referenced only by the expired v3/v4 manifests — the
    # kept v5 manifest carries neither entry, so both become reclaimable
    sidecars = {manifests[3]["delete_vectors"],
                manifests[4]["equality_deletes"]["path"]}
    assert len(sidecars) == 2
    assert "delete_vectors" not in manifests[5]
    assert "equality_deletes" not in manifests[5]
