"""Directed relation-class pins for geo_polygon_intersects_join.

The fixed overlay (_POLYGONS x _POLYGONS_B) was designed so every
ST_Intersects relation class appears exactly where expected; the values
below were hand-verified with an independent pure-Python implementation
before the operator was written (r13 session log).  Fuzz family 55
(tests/test_fuzz_polygon_overlay.py) covers random sets differentially.
"""

from __future__ import annotations

import duckdb

from duckdb_postgis_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_directed_relation_classes(spark):
    rows = registry.QUERIES["geo_polygon_intersects_join"](spark, SF).collect()
    got = {
        (r["pid"], r["qid"]): (r["n_edge_hits"], r["a_in_b"], r["b_in_a"])
        for r in rows
    }
    # exactly the five hand-verified intersecting pairs, nothing else
    assert set(got) == {(2, 11), (2, 15), (2, 16), (3, 12), (4, 16)}
    # crossing: edges hit, B11's anchor inside A2
    assert got[(2, 11)] == (2, 0, 1)
    # pure NESTING: zero edge hits — only the containment term fires
    assert got[(3, 12)] == (0, 0, 1)
    # shared collinear edge segment: touch-only hits
    assert got[(2, 15)][0] == 3 and got[(2, 15)][1:] == (0, 0)
    # vertex touch on A4 (B16's anchor IS the shared vertex (0, 39))
    assert got[(4, 16)][0] == 4
    # B13 (fully disjoint) and B14 (bbox overlaps A1's L-notch but
    # geometrically disjoint — the grid candidate the verify rejects)
    assert not [k for k in got if k[1] in (13, 14)]


def test_matches_registered_oracle(spark):
    got = sorted(
        tuple(map(str, r))
        for r in registry.QUERIES["geo_polygon_intersects_join"](spark, SF).collect()
    )
    want = sorted(
        tuple(map(str, r))
        for r in duckdb.connect()
        .execute(registry.ORACLES["geo_polygon_intersects_join"])
        .fetchall()
    )
    assert got == want
