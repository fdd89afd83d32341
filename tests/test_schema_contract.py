"""Schema contract between the driver's testdata and the catalog.

Round 3 post-mortem: the driver re-exported ``events.parquet`` with
``ts`` as TIMESTAMP(MICROS) (previously int64 nanos) and the local harness
stayed green while 16 driver queries crashed and two streams silently
produced 1970-era windows.  This suite is the tripwire: it walks EVERY
``/root/testdata/sf*/{table}.parquet`` footer with pyarrow (no Spark job)
and asserts the catalog can still classify and load it, so any future
physical-encoding drift fails HERE, loudly, before a driver round does.
"""

from __future__ import annotations

import datetime as dt
import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from duckdb_postgis_spark.catalog import (
    TABLES,
    _probe_events_ts,
    rebuild_events_ts,
    table,
)

SF_DIRS = sorted(glob.glob("/root/testdata/sf*"))

#: columns every query in the registry depends on, per table — a rename or
#: type change in a driver re-export must fail this inventory, not a query.
REQUIRED_COLUMNS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"},
    "part": {"p_partkey", "p_name", "p_retailprice"},
    "orders": {"o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "o_orderstatus"},
    "lineitem": {
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}


def _sf_params():
    return [pytest.param(d, id=os.path.basename(d)) for d in SF_DIRS]


@pytest.mark.parametrize("sf", _sf_params())
@pytest.mark.parametrize("name", TABLES)
def test_footer_has_required_columns(sf, name):
    path = f"{sf}/{name}.parquet"
    assert os.path.exists(path), f"driver testdata missing: {path}"
    cols = set(pq.read_schema(path).names)
    missing = REQUIRED_COLUMNS[name] - cols
    assert not missing, f"{path}: driver dropped/renamed columns {missing}"


@pytest.mark.parametrize("sf", _sf_params())
def test_events_ts_encoding_recognized(sf):
    """The catalog's footer probe must classify events.ts AND its decoded
    min/max must be sane — the exact gate that was missing in round 3."""
    kind = _probe_events_ts(f"{sf}/events.parquet")
    assert kind in ("timestamp", "int64_nanos")


@pytest.mark.parametrize("sf", _sf_params())
@pytest.mark.parametrize("name", TABLES)
def test_catalog_loads_every_table(spark, sf, name):
    """Smoke: catalog.table() must produce a readable DataFrame with the
    required columns at every scale factor the driver ships."""
    df = table(spark, sf, name)
    assert REQUIRED_COLUMNS[name] <= set(df.columns)
    assert df.limit(1).count() == 1, f"{sf}/{name}: empty or unreadable"


@pytest.mark.parametrize("sf", _sf_params())
def test_events_ts_decodes_to_sane_years(spark, sf):
    """End-to-end: the DECODED ts (post-rebuild) must land in a sane year
    window — guards the silent 1970-collapse failure mode directly."""
    row = (
        table(spark, sf, "events")
        .selectExpr("min(ts) AS lo", "max(ts) AS hi")
        .collect()[0]
    )
    assert dt.datetime(2000, 1, 1) <= row["lo"], f"{sf}: ts decoded into the past: {row['lo']}"
    assert row["hi"] <= dt.datetime(2100, 1, 1), f"{sf}: ts decoded into the future: {row['hi']}"


def test_probe_rejects_insane_encoding(tmp_path):
    """Synthesize a parquet whose int64 'nanos' are actually seconds —
    decoded min/max lands in 1970 — and assert the probe REFUSES it."""
    t = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            # seconds-since-epoch masquerading as nanos → decodes to 1970
            "ts": pa.array([1_700_000_000, 1_700_000_600], pa.int64()),
            "user_id": pa.array([1, 2], pa.int64()),
        }
    )
    path = str(tmp_path / "events.parquet")
    pq.write_table(t, path)
    with pytest.raises(ValueError, match="outside the sane window"):
        _probe_events_ts(path)


def test_probe_rejects_insane_encoding_without_statistics(tmp_path):
    """A stats-less parquet cannot dodge the gate (ADVICE r4): with no
    footer min/max the probe decodes a bounded sample of real values and
    must still refuse seconds-masquerading-as-nanos."""
    t = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([1_700_000_000, 1_700_000_600], pa.int64()),
            "user_id": pa.array([1, 2], pa.int64()),
        }
    )
    path = str(tmp_path / "events.parquet")
    pq.write_table(t, path, write_statistics=False)
    assert pq.ParquetFile(path).metadata.row_group(0).column(1).statistics is None
    with pytest.raises(ValueError, match="outside the sane window"):
        _probe_events_ts(path)


def test_probe_stats_less_skips_nulls(tmp_path):
    """Round-6 advice fix: a stats-less file whose FIRST sampled batch
    contains NULL ts values must not TypeError on None arithmetic — the
    probe filters nulls and validates the remaining real values."""
    t = pa.table(
        {
            "ts": pa.array(
                [None, None, 1_700_000_000_000_000_000], pa.int64()
            ),
        }
    )
    path = str(tmp_path / "events.parquet")
    pq.write_table(t, path, write_statistics=False)
    assert _probe_events_ts(path) == "int64_nanos"


def test_probe_stats_less_all_null_fails_loud(tmp_path):
    """Round-6 advice fix: all-null stats-less ts used to slip the gate
    silently (lo stayed None); now it refuses loudly."""
    t = pa.table({"ts": pa.array([None] * 5, pa.int64())})
    path = str(tmp_path / "events.parquet")
    pq.write_table(t, path, write_statistics=False)
    with pytest.raises(ValueError, match="no non-null values"):
        _probe_events_ts(path)


def test_probe_reprobes_after_inplace_rewrite(tmp_path):
    """The probe cache keys on (path, size, mtime): rewriting the same path
    with a drifted encoding must re-probe and fail, not reuse the cached
    green verdict (ADVICE r4)."""
    path = str(tmp_path / "events.parquet")
    good = pa.table({"ts": pa.array([1_700_000_000_000_000_000], pa.int64())})
    pq.write_table(good, path)
    assert _probe_events_ts(path) == "int64_nanos"
    bad = pa.table({"ts": pa.array([1_700_000_000, 1_700_000_600], pa.int64())})
    pq.write_table(bad, path)
    os.utime(path, ns=(1, 1))  # force distinct mtime even on coarse clocks
    with pytest.raises(ValueError, match="outside the sane window"):
        _probe_events_ts(path)


def test_rebuild_rejects_unknown_spark_type(spark):
    """rebuild_events_ts must raise on an unsupported ts dtype, never pass
    a mis-typed column through silently."""
    df = spark.range(1).selectExpr("CAST(id AS STRING) AS ts")
    with pytest.raises(TypeError, match="unsupported Spark type"):
        rebuild_events_ts(df)


def test_probe_handles_directory_tables(tmp_path, spark):
    """At scale, tables are DIRECTORIES of parquet parts. The ts probe
    must walk part files (bounded), require one consistent encoding, and
    the catalog must load the directory with values identical to the
    single-file source."""
    import duckdb

    from duckdb_postgis_spark.catalog import _probe_events_ts, table

    src = "/root/testdata/sf0.001/events.parquet"
    d = tmp_path / "events.parquet"
    d.mkdir()
    con = duckdb.connect()
    n = con.execute(f"SELECT count(*) FROM read_parquet('{src}')").fetchone()[0]
    for i, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}') "
            f"ORDER BY event_id LIMIT {hi - lo} OFFSET {lo}) "
            f"TO '{d}/part-{i}.parquet' (FORMAT PARQUET)"
        )
    assert _probe_events_ts(str(d)) in ("timestamp", "int64_nanos")

    # load via the public path: a sf_dir containing the directory table
    got = (
        table(spark, str(tmp_path), "events")
        .selectExpr("count(*) AS n", "min(ts) AS lo", "max(ts) AS hi")
        .collect()[0]
    )
    want = (
        table(spark, "/root/testdata/sf0.001", "events")
        .selectExpr("count(*) AS n", "min(ts) AS lo", "max(ts) AS hi")
        .collect()[0]
    )
    assert got == want


def test_probe_rejects_mixed_encoding_directory(tmp_path):
    """A directory whose parts disagree on the ts encoding must fail
    loudly, not silently pick one."""
    import duckdb
    import pytest as _pytest

    from duckdb_postgis_spark.catalog import _probe_events_ts

    src = "/root/testdata/sf0.001/events.parquet"
    d = tmp_path / "events.parquet"
    d.mkdir()
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{src}') LIMIT 100) "
        f"TO '{d}/part-0.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"COPY (SELECT * REPLACE (CAST(epoch_ns(ts) AS BIGINT) AS ts) "
        f"FROM read_parquet('{src}') LIMIT 100) "
        f"TO '{d}/part-1.parquet' (FORMAT PARQUET)"
    )
    with _pytest.raises(ValueError, match="mixes ts encodings"):
        _probe_events_ts(str(d))


def test_probe_rejects_mixed_encoding_beyond_16_parts(tmp_path):
    """ADVICE r6: the r6 probe sampled only the first 16 lexicographic
    parts, so a mixed encoding in part 17+ loaded silently.  The probe
    now walks EVERY part — a bad encoding hidden at position 17 must
    fail loudly."""
    import duckdb
    import pytest as _pytest

    from duckdb_postgis_spark.catalog import _probe_events_ts

    src = "/root/testdata/sf0.001/events.parquet"
    d = tmp_path / "events.parquet"
    d.mkdir()
    con = duckdb.connect()
    for i in range(17):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}') LIMIT 50 OFFSET {50 * i}) "
            f"TO '{d}/part-{i:04d}.parquet' (FORMAT PARQUET)"
        )
    # the SORTED-LAST part carries the foreign encoding
    con.execute(
        f"COPY (SELECT * REPLACE (CAST(epoch_ns(ts) AS BIGINT) AS ts) "
        f"FROM read_parquet('{src}') LIMIT 50) "
        f"TO '{d}/part-9999.parquet' (FORMAT PARQUET)"
    )
    with _pytest.raises(ValueError, match="mixes ts encodings"):
        _probe_events_ts(str(d))


def test_directory_table_cache_invalidates_on_part_rewrite(tmp_path, spark):
    """ADVICE r6: for directory-shaped tables the _TABLE_CACHE key now
    folds per-part (name, size, mtime) — rewriting ONE part in place
    (same directory inode stats) must produce a fresh DataFrame, not the
    cached one over the old file list."""
    import duckdb

    from duckdb_postgis_spark.catalog import table

    src = "/root/testdata/sf0.001/documents.parquet"
    d = tmp_path / "documents.parquet"
    d.mkdir()
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{src}') LIMIT 100) "
        f"TO '{d}/part-0.parquet' (FORMAT PARQUET)"
    )
    n1 = table(spark, str(tmp_path), "documents").count()
    assert n1 == 100
    import os as _os
    import time as _time

    _time.sleep(0.01)  # ensure a distinct mtime_ns even on coarse clocks
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{src}') LIMIT 37) "
        f"TO '{d}/part-0.parquet.tmp' (FORMAT PARQUET)"
    )
    _os.replace(f"{d}/part-0.parquet.tmp", f"{d}/part-0.parquet")
    n2 = table(spark, str(tmp_path), "documents").count()
    assert n2 == 37, "stale cached DataFrame served after in-place part rewrite"
