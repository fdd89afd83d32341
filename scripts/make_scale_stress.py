"""Build an upscaled STRESS copy of the driver's sf0.1 testdata.

The driver ships sf{0.001,0.01,0.1}; the 100 TB brief wants evidence the
plans survive another 10×.  This generator replicates every sf0.1 table
K times (default 10 → "sf1-shaped": 6 M lineitem, 1.5 M orders, 1 M
events), shifting every key column by replica·(max_key+1) so referential
structure (orders⋈customer, lineitem keys, doc_id=vec_id) is preserved
within each replica and keys never collide across replicas.  region and
nation are dimensions and stay as-is.

This is a TEST HARNESS artifact, not driver data: the correctness signal
is unchanged (Spark and the DuckDB oracle read the SAME generated files
side by side via scripts/driver_replica.py with
SPARK_GRAFT_REPLICA_SF_DIR pointed here); only the scale is synthetic.

Timestamps and most values copy verbatim, but CONTENT columns are
deterministically perturbed per replica — documents get a replica token
appended to the text, embeddings get their first component shifted by
replica/1000 — because verbatim copies make every row 10 exact
duplicates of its replicas: dedup queries then emit O(K²·rows) pairs
and ANN corpora collapse into 10-way cosine-1.0 ties, a degenerate
shape no real 10× corpus has (measured: the first sweep attempt spent
25+ min inside knn_ivf_lsh on the all-identical corpus).  The
perturbations are pure SQL on both engines, so the side-by-side oracle
signal is unchanged.

Usage:  python scripts/make_scale_stress.py [K] [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

#: per-table key columns to shift by replica * (max_key + 1)
SHIFTS: dict[str, list[str]] = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]

#: strides must be consistent across tables sharing a key domain
STRIDE_OF = {
    "l_orderkey": "o_orderkey",
    "l_partkey": "p_partkey",
    "l_suppkey": "s_suppkey",
    "o_custkey": "c_custkey",
}


def build(k: int = 10, out: str = "/tmp/sf1_stress") -> str:
    """Build (or reuse) the K×-replicated stress copy; returns ``out``.

    Idempotent via the ``_STRESS_OK`` completion marker (records K, so a
    directory built at a different K is rebuilt, never silently reused) —
    bench.py's sf1-shape section calls this every round."""
    marker = os.path.join(out, "_STRESS_OK")
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read().strip() == f"k={k}":
                return out
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    strides: dict[str, int] = {}
    for t, cols in SHIFTS.items():
        for c in cols:
            root = STRIDE_OF.get(c, c)
            if root not in strides:
                src_t = {
                    "o_orderkey": "orders", "p_partkey": "part",
                    "s_suppkey": "supplier", "c_custkey": "customer",
                    "event_id": "events", "user_id": "events",
                    "doc_id": "documents", "vec_id": "embeddings",
                }.get(root, t)
                (mx,) = con.execute(
                    f"SELECT max({root}) FROM read_parquet('{SRC}/{src_t}.parquet')"
                ).fetchone()
                strides[root] = int(mx) + 1

    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 200000)"
        )
        print(f"{t}: copied")

    for t, cols in SHIFTS.items():
        desc = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchall()
        names = [d[0] for d in desc]
        sel = []
        for c in names:
            if c in cols:
                stride = strides[STRIDE_OF.get(c, c)]
                sel.append(f"({c} + r.i * {stride}) AS {c}")
            elif t == "events" and c == "ts":
                # each replica occupies its OWN time window (the source
                # spans ~30 days; stride 31 days): a real 10× event corpus
                # is 10× the TIME, not 10× the density — replicating into
                # the same span inflates every time-band join/window
                # quadratically (measured: stream_stream_join pair count
                # grows ~100×, an unreal shape that swamps the sweep)
                sel.append("(ts + r.i * INTERVAL 31 DAY) AS ts")
            elif t == "documents" and c == "text":
                # replica-unique content (replica 0 keeps the original)
                sel.append(
                    "CASE WHEN r.i = 0 THEN text "
                    "ELSE text || ' r' || r.i END AS text"
                )
            elif t == "embeddings" and c == "embedding":
                # nudge one component per replica: kills the 10-way
                # cosine-1.0 tie structure, preserves near-neighbor
                # geometry (replica 0 keeps the original, so vec_id 0 —
                # the query vector — is untouched)
                sel.append(
                    "CAST(list_prepend(embedding[1] + r.i / 1000.0, "
                    "embedding[2:]) AS FLOAT[]) AS embedding"
                )
            else:
                sel.append(c)
        # TIMESTAMP columns must stay TIMESTAMP_MICROS (INT96 carries no
        # stats; the engine's writers pin MICROS — mirror that here)
        con.execute(
            f"""COPY (
                SELECT {', '.join(sel)}
                FROM read_parquet('{SRC}/{t}.parquet'), range({k}) AS r(i)
            ) TO '{out}/{t}.parquet'
            (FORMAT PARQUET, ROW_GROUP_SIZE 200000)"""
        )
        (n,) = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()
        print(f"{t}: {n} rows")
    with open(marker, "w") as fh:
        fh.write(f"k={k}")
    return out


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_stress"
    build(k, out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
