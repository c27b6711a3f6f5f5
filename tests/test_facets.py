"""JSON facet executor + aggregate registry (operators/facets.py) —
search/facet/FacetModule.java + AggValueSource.java analog."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.operators import facets

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()


def test_parse_agg_registry(spark):
    assert facets.parse_agg("avg(n_chars)") is not None
    assert facets.parse_agg("percentile(n_chars, 90)") is not None
    with pytest.raises(ValueError, match="unknown aggregate"):
        facets.parse_agg("nope(n_chars)")
    with pytest.raises(ValueError, match="unparsable"):
        facets.parse_agg("avg n_chars")


def test_custom_agg_plugs_into_spec(spark, docs):
    if "median_ish" not in facets.AGG_REGISTRY:

        @facets.register_agg("median_ish")
        def _m(c):
            return F.percentile_approx(c, 0.5, 10000)

    out = facets.json_facet(
        docs,
        {"type": "terms", "field": "lang", "limit": 10,
         "facet": {"m": "median_ish(n_chars)"}},
    ).collect()
    expect = {
        r["lang"]: r["m"]
        for r in docs.groupBy("lang")
        .agg(F.percentile_approx("n_chars", 0.5, 10000).alias("m"))
        .collect()
    }
    assert {r["lang"]: r["m"] for r in out} == expect


def test_terms_facet_matches_manual(spark, docs):
    out = facets.json_facet(
        docs,
        {"type": "terms", "field": "source", "limit": 3,
         "sort": "count desc", "facet": {"u": "unique(lang)"}},
    ).collect()
    manual = (
        docs.groupBy("source")
        .agg(F.count("*").alias("count"), F.countDistinct("lang").alias("u"))
        .orderBy(F.desc("count"), F.asc("source"))
        .limit(3)
        .collect()
    )
    assert [tuple(r) for r in out] == [tuple(r) for r in manual]


def test_nested_subfacet_shape(spark, docs):
    out = facets.json_facet(
        docs,
        {"type": "terms", "field": "lang", "limit": 5,
         "facet": {
             "avg_len": "avg(n_chars)",
             "by_src": {"type": "terms", "field": "source", "limit": 1},
         }},
    )
    assert set(out.columns) == {
        "lang", "count", "avg_len", "by_src_source", "by_src_count"
    }
    rows = out.collect()
    # subfacet top-1 source per lang must equal the window answer
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("source"))
    expect = {
        r["lang"]: r["source"]
        for r in docs.groupBy("lang", "source")
        .agg(F.count("*").alias("c"))
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    for r in rows:
        assert r["by_src_source"] == expect[r["lang"]]


def test_top_level_is_distributed_topk(spark, docs):
    """Top-level limit must plan as TakeOrderedAndProject (distributed
    partial top-k), not a single-partition global window."""
    out = facets.json_facet(
        docs, {"type": "terms", "field": "lang", "limit": 5}
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_query_facet(spark, docs):
    out = facets.json_facet(
        docs, {"type": "query", "q": "n_chars > 150",
               "facet": {"avg_len": "avg(n_chars)"}}
    ).collect()
    assert len(out) == 1
    manual = docs.filter("n_chars > 150").agg(
        F.count("*").alias("count"), F.avg("n_chars").alias("avg_len")
    ).collect()[0]
    assert tuple(out[0]) == tuple(manual)


def test_range_facet(spark, docs):
    out = facets.json_facet(
        docs, {"type": "range", "field": "n_chars",
               "start": 0, "end": 400, "gap": 100}
    ).collect()
    got = {int(r["n_chars_start"]): int(r["count"]) for r in out}
    manual = (
        docs.filter("n_chars >= 0 and n_chars < 400")
        .withColumn("b", (F.floor(F.col("n_chars") / 100) * 100))
        .groupBy("b").count().collect()
    )
    assert got == {int(r["b"]): int(r["count"]) for r in manual}
    # arithmetic bucketing: starts are aligned to the gap grid
    assert all(s % 100 == 0 for s in got)


def test_query_subfacet_under_terms(spark, docs):
    out = facets.json_facet(
        docs,
        {"type": "terms", "field": "lang", "limit": 10,
         "facet": {"longdocs": {"type": "query", "q": "n_chars > 150"}}},
    ).collect()
    manual = {
        r["lang"]: r["count"]
        for r in docs.filter("n_chars > 150").groupBy("lang").count().collect()
    }
    for r in out:
        assert (r["longdocs_count"] or 0) == manual.get(r["lang"], 0)
