"""Boolean query tree: engine (vectorized per-bucket eval) vs scalar oracle.

Pattern follows search/TestBooleanQuery.java / TestMinShouldMatch: the same
tree is evaluated by both implementations and must be rank- AND float32-
score-identical (ties broken doc_id asc)."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_spark.corpus import documents_as_corpus
from lucene_solr_spark.operators.indexer import build_index
from lucene_solr_spark.operators.query import (
    Bool,
    Synonym,
    Term,
    collect_terms,
    rewrite,
)
from lucene_solr_spark.operators.search import Searcher

from . import oracle
from .conftest import SF_DIR

TREES = {
    "flat_or": Bool(should=(Term("spark"), Term("join"), Term("order"))),
    "flat_and": Bool(must=(Term("table"), Term("scan"), Term("filter"))),
    "must_should": Bool(
        must=(Term("spark"),), should=(Term("join"), Term("order"))
    ),
    "must_not": Bool(
        must=(Term("spark"),), must_not=(Term("window"),)
    ),
    "filter_clause": Bool(
        must=(Term("merge"),), filter=(Term("batch"),)
    ),
    "boosted": Bool(
        should=(Term("join", boost=2.0), Term("order"), Term("batch", boost=0.5))
    ),
    "msm2": Bool(
        should=(Term("join"), Term("order"), Term("batch"), Term("stream")),
        min_should_match=2,
    ),
    "msm3": Bool(
        should=(Term("join"), Term("order"), Term("batch"), Term("stream")),
        min_should_match=3,
    ),
    "nested": Bool(
        must=(
            Term("spark"),
            Bool(should=(Term("join"), Term("order"))),
        ),
        must_not=(Term("dup"),),
    ),
    "nested_boost": Bool(
        must=(Term("table"),),
        should=(
            Bool(should=(Term("scan"), Term("filter")), boost=3.0),
            Term("sort"),
        ),
    ),
    "nested_msm": Bool(
        must=(Bool(should=(Term("spark"), Term("stream")),),),
        should=(Term("join"), Term("order"), Term("window")),
        min_should_match=2,
    ),
    "deep": Bool(
        should=(
            Bool(
                must=(Term("spark"),),
                should=(Term("join", boost=1.5),),
            ),
            Bool(
                must=(Term("merge"), Term("batch")),
                boost=2.0,
            ),
        ),
    ),
    "absent_must": Bool(must=(Term("spark"), Term("zebra"))),
    "absent_should": Bool(should=(Term("spark"), Term("zebra"))),
    # SynonymQuery leaves (blended df, summed tf)
    "synonym_leaf": Synonym(("join", "merge")),
    "synonym_should": Bool(should=(Synonym(("join", "merge")), Term("spark"))),
    "synonym_must": Bool(must=(Synonym(("order", "sort")),), should=(Term("batch"),)),
    "synonym_boost": Bool(
        should=(Synonym(("join", "merge"), boost=2.0), Term("order"))
    ),
    "synonym_absent_member": Bool(should=(Synonym(("join", "zebra")),)),
    "synonym_all_absent": Bool(should=(Synonym(("zebra", "qqq")), Term("spark"))),
}


@pytest.fixture(scope="module")
def built(spark):
    corpus = documents_as_corpus(spark, SF_DIR)
    seg = build_index(spark, corpus, out_dir=None, bucket_docs=128)
    searcher = Searcher(spark, seg)
    docs = [
        (int(r["doc_id"]), r["text"])
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ]
    return searcher, oracle.OracleIndex(docs)


@pytest.mark.parametrize("name", sorted(TREES))
def test_tree_rank_and_score_identical(built, name):
    searcher, ora = built
    q = TREES[name]
    got = [
        (r["doc_id"], np.float32(r["score"]))
        for r in searcher.topk_query(q, k=10).collect()
    ]
    want = [(d, np.float32(s)) for d, s in ora.topk_bool(q, k=10)]
    assert got == want, f"{name}: {got[:3]} vs {want[:3]}"


@pytest.mark.parametrize("name", sorted(TREES))
def test_rewrite_is_score_preserving(built, name):
    """rewrite() must be bit-identical under the scalar oracle."""
    _, ora = built
    q = TREES[name]
    assert ora.topk_bool(rewrite(q), k=20) == ora.topk_bool(q, k=20)


def test_rewrite_flattens():
    q = Bool(should=(Bool(should=(Term("a"), Term("b"))), Term("c")))
    r = rewrite(q)
    assert r == Bool(should=(Term("a"), Term("b"), Term("c")))
    q2 = Bool(must=(Bool(must=(Term("a"), Term("b"))), Term("c")))
    assert rewrite(q2) == Bool(must=(Term("a"), Term("b"), Term("c")))
    # single-clause collapse folds exact boosts only
    q3 = Bool(must=(Term("a"),), boost=2.0)
    assert rewrite(q3) == Term("a", boost=2.0)
    # msm>1 disjunction must NOT be flattened (clause counting changes)
    q4 = Bool(
        should=(Bool(should=(Term("a"), Term("b"))), Term("c")),
        min_should_match=2,
    )
    assert isinstance(rewrite(q4).should[0], Bool)


def test_collect_terms():
    q = TREES["nested"]
    assert collect_terms(q) == {"spark", "join", "order", "dup"}


def test_flat_paths_agree_with_tree(built):
    """The tree engine path must equal the flat engine path on flat shapes."""
    searcher, _ = built
    flat = searcher.topk("spark join order", k=10, mode="exhaustive").collect()
    tree = searcher.topk_query(
        Bool(should=(Term("join"), Term("order"), Term("spark"))), k=10
    ).collect()
    assert [(r["doc_id"], np.float32(r["score"])) for r in flat] == [
        (r["doc_id"], np.float32(r["score"])) for r in tree
    ]


def test_synonym_is_not_a_disjunction(built):
    """A doc containing BOTH members must score with ONE saturation over the
    summed tf (SynonymQuery), not the sum of two independent BM25 scores."""
    searcher, ora = built
    syn = {d: float(s) for d, s in ora.topk_bool(Synonym(("join", "merge")), k=10**6)}
    dis = {
        d: float(s)
        for d, s in ora.topk_bool(
            Bool(should=(Term("join"), Term("merge"))), k=10**6
        )
    }
    assert set(syn) == set(dis)  # same matching docs
    both = [
        d for d, toks in ora.tokens.items() if "join" in toks and "merge" in toks
    ]
    assert both, "corpus should contain docs with both members"
    assert any(abs(syn[d] - dis[d]) > 1e-6 for d in both)
    # engine agrees with the scalar oracle on the full ranking
    got = [
        (r["doc_id"], np.float32(r["score"]))
        for r in searcher.topk_query(Synonym(("join", "merge")), k=25).collect()
    ]
    want = [(d, np.float32(s)) for d, s in ora.topk_bool(Synonym(("join", "merge")), k=25)]
    assert got == want


def test_synonym_blends_df_as_max(built):
    """Blended idf must come from max(member dfs): a rare synonym of a
    common term scores every doc with the COMMON term's (lower) idf."""
    _, ora = built
    import math as _m

    dfs = {t: len(ora.tf.get(t, {})) for t in ("join", "merge")}
    df_max = max(dfs.values())
    idf_expect = _m.log(1.0 + (ora.N - df_max + 0.5) / (df_max + 0.5))
    # a doc with exactly one occurrence of exactly one member
    for d, s in ora.topk_bool(Synonym(("join", "merge")), k=10**6):
        toks = ora.tokens[d]
        if toks.count("join") + toks.count("merge") == 1:
            add = float(ora.cache[ora.norm_byte[d]])
            assert abs(s - idf_expect * (1.0 / (1.0 + add))) < 1e-5
            break
    else:
        pytest.skip("no single-occurrence doc in corpus")
