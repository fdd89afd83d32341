"""Fuzz family 30: SemDeDup cell dedup, differential on random corpora.

dedup_semdedup_cells' contract has three cross-engine branch points — the
md5-ordered seed pick, the per-vector argmax cell assignment (ties break to
the lower seed id), and the exact cosine >= tau verify — all pure
arithmetic both engines must compute bit-identically.  40 seeded random
corpora (dims 8..64, sizes 60..1500 so K stays at the 16 floor AND crosses
it once cell scaling kicks in, normal and row-scaled magnitudes, planted
near-dup pairs so the tau gate has positives in high dim) write real
parquet (the operator reads footer stats) and compare the operator's rows
against the registered DuckDB oracle on the same file, requiring exact
row-set equality.
"""

from __future__ import annotations

import random

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from duckdb_postgis_spark import registry

registry.load_all()

SEEDS = range(40)


def _write_corpus(seed: int, path) -> None:
    rng = np.random.default_rng(30000 + seed)
    pyrng = random.Random(30000 + seed)
    dim = pyrng.choice([8, 16, 32, 64])
    n = pyrng.randint(60, 1500)
    M = rng.standard_normal((n, dim)).astype("float32")
    if pyrng.random() < 0.4:
        M *= rng.lognormal(0.0, 1.0, size=(n, 1)).astype("float32")
    for _ in range(max(2, n // 25)):  # plant near-dups for the tau gate
        i, j = pyrng.randrange(n), pyrng.randrange(n)
        if i != j:
            M[j] = M[i] + rng.standard_normal(dim).astype("float32") * 0.05
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [list(map(float, r)) for r in M], pa.list_(pa.float32())
            ),
        }
    )
    pq.write_table(t, path / "embeddings.parquet")


@pytest.mark.parametrize("seed", SEEDS)
def test_semdedup_spark_matches_oracle(spark, tmp_path, seed):
    _write_corpus(seed, tmp_path)
    got = sorted(
        tuple(map(str, r))
        for r in registry.QUERIES["dedup_semdedup_cells"](spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet')"
    )
    want = sorted(
        tuple(map(str, r))
        for r in con.execute(registry.ORACLES["dedup_semdedup_cells"]).fetchall()
    )
    assert got == want, f"seed {seed}: semdedup rows diverge"
    assert want, f"seed {seed}: planted near-dups produced no removals"
