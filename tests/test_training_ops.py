"""Value-pinned fixture tests for the round-5 training/dedup operators.

The driver's synthetic corpus is PII-free and prefix-unique-ish, so the
oracle comparison alone would only pin the no-hit paths of text_pii_scrub
and dedup_exact_prefix.  These tests run the SAME registered query
functions against crafted documents.parquet fixtures (table() resolves
{sf_dir}/documents.parquet, so a tmpdir is a scale factor) and pin the
hit-path values; plus determinism/distribution invariants for
sample_temperature_weighted that no single hash comparison can express.
"""

from __future__ import annotations

import math
import re

import pytest

from duckdb_postgis_spark import registry

registry.load_all()

EMAIL = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+"
PHONE = "\\+[0-9][0-9 ()-]{6,}[0-9]"

DOCS = [
    (0, "contact me at john.doe@example.com or jane@sub.domain.org", "en", "src0"),
    (1, "call +1 (555) 123-4567 now and ask for x@y.io", "en", "src0"),
    (2, "clean text with no personal information at all", "en", "src1"),
]


@pytest.fixture(scope="module")
def fixture_sf(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("pii_sf")
    rows = [(i, t, lang, src, len(t)) for i, t, lang, src in DOCS]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_pii_scrub_hit_path(spark, fixture_sf):
    out = {
        r["doc_id"]: r
        for r in registry.QUERIES["text_pii_scrub"](spark, fixture_sf).collect()
    }
    # expected redactions via python re (same semantics as Java/RE2 for
    # these lookaround-free patterns)
    for doc_id, text, _, _ in DOCS:
        red = re.sub(PHONE, "<PHONE>", re.sub(EMAIL, "<EMAIL>", text))
        r = out[doc_id]
        assert r["n_emails"] == len(re.findall(EMAIL, text))
        assert r["n_phones"] == len(re.findall(PHONE, text))
        assert r["redacted_len"] == len(red)
    assert out[0]["n_emails"] == 2 and out[0]["is_clean"] == 0
    assert out[1]["n_phones"] == 1 and out[1]["n_emails"] == 1
    assert out[2]["is_clean"] == 1 and out[2]["redacted_len"] == len(DOCS[2][1])


def test_dedup_exact_prefix_hit_path(spark, tmp_path):
    prefix = "x" * 64
    rows = [
        (0, prefix + " tail one", "en", "srcA", 73),
        (1, prefix + " tail two", "en", "srcB", 73),
        (2, "totally different document", "en", "srcA", 26),
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = registry.QUERIES["dedup_exact_prefix"](spark, str(tmp_path)).collect()
    assert len(out) == 1  # only the duplicate group reports
    g = out[0]
    assert g["keep_doc_id"] == 0 and g["n_copies"] == 2 and g["n_sources"] == 2


def test_temperature_sampling_invariants(spark, sf_dir):
    q = registry.QUERIES["sample_temperature_weighted"]
    a = sorted(r["doc_id"] for r in q(spark, sf_dir).collect())
    b = sorted(r["doc_id"] for r in q(spark, sf_dir).collect())
    assert a == b and a, "sample must be deterministic and non-empty"

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = {r["source"]: r["count"] for r in docs.groupBy("source").count().collect()}
    n_min = min(counts.values())
    kept = {
        r["source"]: r["count"]
        for r in q(spark, sf_dir).groupBy("source").count().collect()
    }
    for src, c_s in counts.items():
        rate = math.sqrt(n_min / c_s)
        k = kept.get(src, 0)
        # md5-uniform keep decisions: binomial(c_s, rate); allow 4 sigma
        sigma = math.sqrt(c_s * rate * (1 - rate))
        assert abs(k - c_s * rate) <= 4 * sigma + 1, (src, k, c_s, rate)
    # the smallest source flattens to rate 1.0 — kept entirely
    src_min = min(counts, key=lambda s: counts[s])
    assert kept[src_min] == counts[src_min]


def test_unigram_likelihood_bounds(spark, sf_dir):
    out = registry.QUERIES["text_unigram_likelihood"](spark, sf_dir).collect()
    assert out
    for r in out:
        # every token occurs at least once, so sum_freq >= n_tokens and the
        # normalized likelihood sits in (0, 1]
        assert r["sum_freq"] >= r["n_tokens"]
        assert 0.0 < r["likelihood"] <= 1.0


def test_dedup_substring_spans_planted_run(spark, tmp_path):
    """A 20-token run shared by two docs yields exactly 5 duplicated
    16-token windows in each (20-16+1), starting at the run's position;
    an INTRA-doc repeat does not count (the >=2 DISTINCT docs rule); docs
    under 16 tokens are excluded."""
    run = [f"c{i}" for i in range(20)]
    doc_a = [f"a{i}" for i in range(10)] + run + [f"z{i}" for i in range(10)]
    doc_b = [f"b{i}" for i in range(5)] + run + [f"y{i}" for i in range(5)]
    intra = [f"d{i}" for i in range(16)] * 2  # same window twice, one doc
    short = ["too", "short"]
    rows = [
        (0, " ".join(doc_a), "en", "srcA", 1),
        (1, " ".join(doc_b), "en", "srcB", 1),
        (2, " ".join(intra), "en", "srcC", 1),
        (3, " ".join(short), "en", "srcD", 1),
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in registry.QUERIES["dedup_substring_spans"](spark, str(tmp_path)).collect()}
    assert set(out) == {0, 1, 2}  # doc 3 too short
    assert out[0].n_dup_windows == 5 and out[0].first_dup_pos == 11
    assert out[1].n_dup_windows == 5 and out[1].first_dup_pos == 6
    assert out[2].n_dup_windows == 0 and out[2].first_dup_pos == 0
    assert out[0].n_windows == len(doc_a) - 15


def test_quantile_histogram_merge_constant_column(spark, tmp_path):
    """All-equal prices give min==max (bin width guard -> 1.0): every row
    lands in bin 0, the merged median equals the exact median exactly,
    and both pins stay TRUE."""
    rows = [(i, 42.5, "A") for i in range(10)] + [(i, 42.5, "B") for i in range(7)]
    spark.createDataFrame(
        rows, "l_orderkey bigint, l_extendedprice double, l_returnflag string"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = registry.QUERIES["agg_quantile_histogram_merge"](spark, str(tmp_path)).collect()
    assert [r.l_returnflag for r in out] == ["A", "B"]
    for r in out:
        assert r.exact_p50 == 42.5
        assert r.median_rank_in_bin and r.merge_equals_direct


def test_cms_topk_merge_planted_heavy_key(spark, tmp_path):
    """A planted heavy supplier must surface as the top row with all
    three CMS pins TRUE; ties below it break by supplier id."""
    rows = [(i, 777) for i in range(60)] + [
        (1000 + i, 10 + (i % 20)) for i in range(200)
    ]
    spark.createDataFrame(
        rows, "l_orderkey bigint, l_suppkey bigint"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = registry.QUERIES["agg_cms_topk_merge"](spark, str(tmp_path)).collect()
    assert len(out) == 10
    assert out[0].l_suppkey == 777 and out[0].exact_cnt == 60
    for r in out:
        assert r.cms_ge_exact and r.merge_equals_direct
        assert r.cms_est >= r.exact_cnt
