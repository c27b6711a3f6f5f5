"""Semantic pins for the coverage15 batch: group.truncate's domain is one
doc per group, the range-relation matrix is internally consistent and
every relation non-trivial, the knn df gate genuinely drops terms, the
blended suggester down-weights position-1 matches, and query-mode common
grams are strictly tighter than the naive conjunction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod  # noqa: F401  (registers the catalog)
from lucene_solr_spark.plans import coverage15_queries as c15

from .conftest import SF_DIR


def test_group_truncate_domain_is_one_doc_per_group(spark):
    rows = c15.group_truncate_facet(spark, SF_DIR).collect()
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n_groups = o.select("o_custkey").distinct().count()
    assert sum(r.n_groups for r in rows) == n_groups
    # and it differs from the untruncated facet (all docs)
    full = {
        r.o_orderstatus: r.n
        for r in o.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()
    }
    trunc = {r.status: r.n_groups for r in rows}
    assert trunc != full


def test_range_relations_consistent(spark):
    rows = {r.relation: r.n_docs for r in c15.range_field_relation(spark, SF_DIR).collect()}
    assert set(rows) == {"INTERSECTS", "WITHIN", "CONTAINS", "CROSSES"}
    assert rows["INTERSECTS"] == rows["WITHIN"] + rows["CONTAINS"] + rows["CROSSES"]
    # the synthesized ranges make every relation non-trivial at sf0.001
    for rel, n in rows.items():
        assert n > 0, f"{rel} never fires - the matrix is vacuous"
    n_orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    assert rows["INTERSECTS"] < n_orders  # and the query is selective


def test_knn_df_gate_drops_terms(spark):
    """The df window keeps SOME seed terms and drops others — otherwise
    the row degenerates to plain more_like_this."""
    from lucene_solr_spark.plans.driver_queries import _tokens

    toks = _tokens(spark, SF_DIR)
    pairs = toks.select("doc_id", F.explode("tokens").alias("term")).distinct()
    nd = pairs.select(F.countDistinct("doc_id")).first()[0]
    df = {
        r.term: r.df
        for r in pairs.groupBy("term").agg(F.countDistinct("doc_id").alias("df")).collect()
    }
    seed_terms = {
        r.term for r in pairs.filter(F.col("doc_id") == c15._KNN_SEED).collect()
    }
    lo, hi = c15._KNN_MINDF_FRAC * nd, c15._KNN_MAXDF_FRAC * nd
    kept = {t for t in seed_terms if lo <= df[t] <= hi}
    assert kept and kept != seed_terms
    rows = c15.knn_stream_topk(spark, SF_DIR).collect()
    assert rows and all(r.shared <= len(kept) for r in rows)


def test_blended_infix_down_weights_position(spark):
    rows = c15.suggest_blended_infix(spark, SF_DIR).collect()
    assert rows
    by_name = {r.suggestion: r.score for r in rows}
    p = spark.read.parquet(f"{SF_DIR}/part.parquet")
    weights = {
        r.suggestion: r.w
        for r in p.groupBy(F.col("p_name").alias("suggestion"))
        .agg(F.max("p_size").alias("w"))
        .collect()
    }
    saw_p0 = saw_p1 = False
    for name, score in by_name.items():
        w = weights[name]
        first, second = name.split(" ")
        if first.startswith(c15._BI_PREFIX):
            assert score == pytest.approx(float(w)), name  # coefficient 1.0
            saw_p0 = True
        else:
            assert second.startswith(c15._BI_PREFIX)
            assert score < w, name  # down-weighted
            saw_p1 = True
    assert saw_p0 and saw_p1, "both blend positions must occur in the top-k"


def test_common_grams_query_mode_tighter(spark):
    rows = {r["mode"]: r.n_docs for r in c15.common_grams_query_mode(spark, SF_DIR).collect()}
    assert rows["query_mode"] <= rows["naive_and"]
    assert rows["query_mode"] > 0
    # strictly tighter on this corpus: co-occurrence without adjacency exists
    assert rows["query_mode"] < rows["naive_and"]


@pytest.mark.parametrize(
    "name",
    [
        # knn_stream_topk and common_grams_query_mode run the PINNED
        # tokenizer (an Arrow-batched pandas UDF by design) and are
        # excluded: the no-UDF pin applies to the pure-string rows.
        "group_truncate_facet",
        "range_field_relation",
        "suggest_blended_infix",
    ],
)
def test_no_python_eval(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
