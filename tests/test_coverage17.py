"""Semantic pins for the coverage17 batch: the JSON query DSL lands in the
same IR as local-params dispatch (one registry), its error contract
matches the reference's 400s, fuzzy-like-this expands against the vocab
(not the corpus), and facet.exists caps counts at 1."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod  # noqa: F401  (registers the catalog)
from lucene_solr_spark.operators.query import Bool, Term
from lucene_solr_spark.plans import coverage17_queries as c17
from lucene_solr_spark.plans.jsondsl import (
    compile_json_query,
    compile_json_request,
)
from lucene_solr_spark.plans.localparams import QueryParseError, dispatch

from .conftest import SF_DIR


# -- JSON DSL compiler --------------------------------------------------------


def test_json_named_parser_equals_local_params():
    """{"term": {...}} must produce the IDENTICAL IR as the {!term}
    local-params string — one registry, two syntaxes."""
    j = compile_json_query({"term": {"f": "text", "query": "Spark"}})
    lp = dispatch("{!term f=text}Spark")
    assert j == lp == Term("Spark")
    j2 = compile_json_query({"prefix": {"f": "text", "query": "sca"}})
    assert j2 == dispatch("{!prefix f=text}sca")


def test_json_string_arg_and_classic_string():
    assert compile_json_query({"lucene": "spark AND merge"}) == dispatch(
        "spark AND merge"
    )
    assert compile_json_query("spark AND merge") == dispatch("spark AND merge")


def test_json_bool_nests_natively():
    node = compile_json_query(
        {
            "bool": {
                "must": [{"term": {"f": "text", "query": "spark"}}],
                "must_not": [{"bool": {"must": ["dup"]}}],
                "mm": 0,
            }
        }
    )
    assert isinstance(node, Bool)
    assert node.must == (Term("spark"),)
    assert isinstance(node.must_not[0], Bool)


def test_json_quoting_round_trips():
    """Param values with spaces/quotes survive the local-params rendering."""
    node = compile_json_query({"field": {"f": "text", "query": "order batch"}})
    assert node == dispatch("{!field f=text}order batch")


@pytest.mark.parametrize(
    "bad",
    [
        {"bool": {"mustt": ["x"]}},  # unknown bool key
        {"bool": {}},  # no clauses
        {"term": 7},  # bad args type
        {"a": 1, "b": 2},  # two keys
        {"nosuchparser": "x"},  # unknown parser type
        [1, 2],  # not a dict/str
    ],
)
def test_json_error_contract(bad):
    with pytest.raises(QueryParseError):
        compile_json_query(bad)


def test_json_request_filters():
    node, filters = compile_json_request(
        {"query": "spark", "filter": {"prefix": {"f": "text", "query": "wind"}}}
    )
    assert len(filters) == 1
    with pytest.raises(QueryParseError):
        compile_json_request({"filter": ["x"]})  # no query
    with pytest.raises(QueryParseError):
        compile_json_request({"query": "x", "facet": {}})  # unsupported key


def test_json_row_filter_tightens(spark):
    rows = {r.part: r.n_docs for r in c17.json_query_dsl(spark, SF_DIR).collect()}
    assert 0 < rows["filtered"] <= rows["query"]


# -- FuzzyLikeThisQuery -------------------------------------------------------


def test_fuzzy_expansion_against_vocab(spark):
    """The expansion set comes from the terms dict: 'spakr'->spark,
    'windo'->window (edit distance 1); no seed term matches itself
    verbatim (the typos are out-of-vocabulary)."""
    from lucene_solr_spark.plans.driver_queries import _tokens

    toks = _tokens(spark, SF_DIR)
    vocab = {
        r.term
        for r in toks.select(F.explode("tokens").alias("term")).distinct().collect()
    }
    assert not (set(c17._FLT_SEEDS) & vocab)
    rows = c17.fuzzy_like_this_topk(spark, SF_DIR).collect()
    assert rows
    assert max(r.n_variants for r in rows) >= 2  # both seeds hit variants


# -- shards.tolerant ----------------------------------------------------------


def test_shards_tolerant_contract(spark):
    """tolerant=True skips the broken shard with a reason and flags
    partialResults; tolerant=False (the default) hits the failure; a
    catalog where EVERY shard is broken raises even in tolerant mode."""
    from lucene_solr_spark.operators.search import MultiSearcher
    from lucene_solr_spark.sources.catalog import Catalog

    c17.shards_tolerant_search(spark, SF_DIR).collect()  # builds + breaks odd
    root = c17._ST_CACHE[SF_DIR]
    cat = Catalog(root)

    ms = MultiSearcher.from_catalog(spark, cat, tolerant=True)
    assert ms.partial_results
    assert ms.skipped == [("odd", "missing table 'terms'")]
    assert {s.segment_id for s in ms.segments} == {"even"}

    # default mode serves the broken segment and fails when it is read
    strict = MultiSearcher.from_catalog(spark, cat)
    with pytest.raises(Exception):
        strict.topk("spark", k=5).collect()

    # every shard broken -> error even under tolerant (Solr 500s too)
    import shutil

    for s in cat.segments():
        if s.segment_id == "even":
            shutil.rmtree(f"{s.path}/postings", ignore_errors=True)
    try:
        with pytest.raises(RuntimeError, match="every segment failed"):
            MultiSearcher.from_catalog(spark, Catalog(root), tolerant=True)
    finally:
        c17._ST_CACHE.pop(SF_DIR, None)  # cache now fully broken: rebuild next use


def test_shards_tolerant_hits_are_half(spark):
    row = c17.shards_tolerant_search(spark, SF_DIR).first()
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_even = d.filter(F.col("doc_id") % 2 == 0).count()
    assert row.n_docs_served == n_even
    assert 0 < row.n_hits <= n_even
    assert row.n_skipped == 1 and row.partial_results == 1


# -- in-place DV updates ------------------------------------------------------


def test_dv_update_postings_untouched(spark):
    """A term query returns identical results before and after in-place DV
    generations land — the update never touches postings."""
    from lucene_solr_spark.operators.search import Searcher
    from lucene_solr_spark.sources.catalog import Catalog

    c17.dv_inplace_update(spark, SF_DIR).collect()  # builds + two gens
    seg = Catalog(c17._DV_CACHE[SF_DIR]).segments()[0]
    assert [g for _, g in seg.dv_generations()] == [1, 2]
    hits = Searcher(spark, seg).topk("spark join", k=10).collect()
    # rebuild the same corpus WITHOUT updates: identical top-k
    from lucene_solr_spark.corpus import documents_as_corpus
    from lucene_solr_spark.operators.indexer import build_index

    clean = build_index(
        spark, documents_as_corpus(spark, SF_DIR), out_dir=None, bucket_docs=256
    )
    clean_hits = Searcher(spark, clean).topk("spark join", k=10).collect()
    assert [(r.doc_id, r.score) for r in hits] == [
        (r.doc_id, r.score) for r in clean_hits
    ]


def test_dv_update_unknown_field_refused(spark):
    from lucene_solr_spark.operators.updates import update_numeric_docvalue
    from lucene_solr_spark.sources.catalog import Catalog

    c17.dv_inplace_update(spark, SF_DIR).collect()
    seg = Catalog(c17._DV_CACHE[SF_DIR]).segments()[0]
    ids = spark.range(1).select(F.col("id").alias("doc_id"), F.lit(1).alias("value"))
    with pytest.raises(ValueError, match="cannot add fields"):
        update_numeric_docvalue(spark, seg, "no_such_field", ids)


def test_dv_update_merge_materializes(spark):
    """forceMerge collapses DV generations: the merged segment carries the
    updated values in its base docmap and no sidecars."""
    from lucene_solr_spark.operators.merge import merge_segments
    from lucene_solr_spark.sources.catalog import Catalog

    c17.dv_inplace_update(spark, SF_DIR).collect()
    seg = Catalog(c17._DV_CACHE[SF_DIR]).segments()[0]
    merged = merge_segments(
        spark, [seg], out_dir="/tmp/spark_graft_dv_merged", segment_id="m1"
    )
    assert merged.dv_generations() == []
    versions = {
        r._version_: r.n
        for r in merged.stored_fields(spark)
        .groupBy("_version_")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    expect = {
        r.version: r.n_docs for r in c17.dv_inplace_update(spark, SF_DIR).collect()
    }
    assert versions == expect
    import shutil

    shutil.rmtree("/tmp/spark_graft_dv_merged", ignore_errors=True)


# -- facet.exists -------------------------------------------------------------


def test_facet_exists_caps_at_one(spark):
    rows = c17.facet_exists_cap(spark, SF_DIR).collect()
    assert rows
    assert all(r.n == 1 for r in rows)
    # a real facet on the same domain has counts > 1 — the cap matters
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    full = (
        d.filter(F.array_contains(F.split("text", " "), c17._FE_TERM))
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert {r.source for r in full} == {r.bucket for r in rows}
    assert any(r.n > 1 for r in full)
