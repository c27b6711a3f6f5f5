"""Local-params syntax (QueryParsing#parseLocalParams) + QParser plugin
dispatch: syntax edges, per-plugin semantics (term/raw verbatim vs field
analyzed, bool composition, switch routing), the registry extension
point, and engine parity of a dispatched tree with its classic
equivalent."""

from __future__ import annotations

import pytest

from lucene_solr_spark.operators.query import Bool, DisMax, Term, eval_node, rewrite
from lucene_solr_spark.plans.localparams import (
    dispatch,
    parse_local_params,
    register_qparser,
)
from lucene_solr_spark.plans.qparser import QueryParseError, parse


# ---- syntax ------------------------------------------------------------------

def test_non_local_params_defaults_to_lucene():
    assert parse_local_params("spark AND merge") == ("lucene", {}, "spark AND merge")


def test_bare_type_and_params():
    t, local, body = parse_local_params("{!prefix f=text}sca")
    assert (t, body) == ("prefix", "sca")
    assert local == {"f": ["text"]}


def test_type_param_spelling():
    t, _, body = parse_local_params("{!type=prefix f=text}sca")
    assert (t, body) == ("prefix", "sca")


def test_quoted_values_with_escapes_and_brace():
    t, local, body = parse_local_params(
        "{!switch case.a='x \\' y' case.b=\"a}b\"}a"
    )
    assert t == "switch"
    assert local["case.a"] == ["x ' y"]
    assert local["case.b"] == ["a}b"]
    assert body == "a"


def test_v_param_replaces_body():
    t, _, body = parse_local_params("{!term f=text v=spark}ignored-tail")
    assert (t, body) == ("term", "spark")


def test_dollar_ref_resolution():
    t, local, body = parse_local_params(
        "{!switch v=$route case.hot=x}", params={"route": "hot"}
    )
    assert (t, body) == ("switch", "hot")
    with pytest.raises(QueryParseError, match="missing request parameter"):
        parse_local_params("{!term v=$nope}")


def test_repeated_keys_collect():
    _, local, _ = parse_local_params("{!bool must=a must=b}")
    assert local["must"] == ["a", "b"]


def test_flag_param_is_true():
    _, local, _ = parse_local_params("{!lucene cache}x")
    assert local["cache"] == ["true"]


def test_unterminated_raises():
    with pytest.raises(QueryParseError):
        parse_local_params("{!term f=text")
    with pytest.raises(QueryParseError):
        parse_local_params("{!term f='unclosed}x")


# ---- plugins -----------------------------------------------------------------

def test_term_and_raw_are_verbatim():
    # NO analysis: case preserved — the documented {!term} semantics
    assert dispatch("{!term f=text}Spark") == Term("Spark")
    assert dispatch("{!raw f=text}Spark") == Term("Spark")
    # non-default field tags the leaf
    assert dispatch("{!term f=lang}en") == Term("en", field="lang")


def test_field_analyzes():
    assert dispatch("{!field f=text}Spark") == Term("spark")
    assert dispatch("{!field f=text}Order Batch") == (
        "phrase", ("order", "batch"), 0, 1.0, None,
    )


def test_prefix_leaf():
    assert dispatch("{!prefix f=text}sca") == ("wildcard", "sca*", 1.0, None)


def test_bool_composes_subqueries():
    q = dispatch(
        "{!bool must='{!term f=text}spark' must_not='{!raw f=text}dup' mm=0}"
    )
    assert q == Bool(must=(Term("spark"),), must_not=(Term("dup"),))
    with pytest.raises(QueryParseError, match="at least one clause"):
        dispatch("{!bool}")


def test_switch_routing():
    q = "{!switch case.hot='{!term f=text}spark' case='{!term f=text}scan'" \
        " default='{!term f=text}table' v=$r}"
    assert dispatch(q, {"r": "hot"}) == Term("spark")
    assert dispatch(q, {"r": ""}) == Term("scan")       # empty input -> case
    assert dispatch(q, {"r": "other"}) == Term("table")  # fallthrough
    with pytest.raises(QueryParseError, match="no matching case"):
        dispatch("{!switch case.a=x}b")


def test_unknown_parser_raises():
    with pytest.raises(QueryParseError, match="unknown query parser"):
        dispatch("{!nosuch}x")


def test_register_extension_point():
    register_qparser("allcaps", lambda local, body, params: Term(body.upper()))
    try:
        assert dispatch("{!allcaps}spark") == Term("SPARK")
    finally:
        from lucene_solr_spark.plans import localparams

        del localparams._REGISTRY["allcaps"]


def test_nested_dispatch_matches_classic_tree():
    got = dispatch(
        "{!bool must='spark OR merge' must_not='{!prefix f=text}du'}"
    )
    want = Bool(
        must=(parse("spark OR merge"),),
        must_not=(("wildcard", "du*", 1.0, None),),
    )
    assert got == want


# ---- maxscore / DisMax -------------------------------------------------------

def test_maxscore_structure():
    q = dispatch("{!maxscore tie=0.5}+spark order batch")
    assert q == Bool(
        must=(Term("spark"),),
        should=(DisMax(clauses=(Term("order"), Term("batch")), tie=0.5),),
    )
    # pure disjunction: outer Bool rewrites away to the bare DisMax
    assert rewrite(dispatch("{!maxscore}order batch")) == DisMax(
        clauses=(Term("order"), Term("batch"))
    )


def test_dismax_rewrite_single_clause_collapses():
    assert rewrite(DisMax(clauses=(Term("spark"),), tie=0.7)) == Term("spark")
    assert rewrite(DisMax(clauses=(Term("spark"),), boost=2.0)) == DisMax(
        clauses=(Term("spark"),), boost=2.0
    )


def test_dismax_eval_kernel():
    import numpy as np

    tscores = {
        "a": np.array([0.5, 0.0, 0.2], dtype=np.float32),
        "b": np.array([0.3, 0.4, 0.0], dtype=np.float32),
    }
    tmasks = {
        "a": np.array([True, False, True]),
        "b": np.array([True, True, False]),
    }
    node = DisMax(clauses=(Term("a"), Term("b")), tie=0.5)
    mask, score = eval_node(node, tscores, tmasks, 3)
    assert mask.tolist() == [True, True, True]
    exp = np.float32(0.5) + np.float32(0.5) * np.float32(0.3)
    assert score[0] == exp and score[1] == np.float32(0.4)
    assert score[2] == np.float32(0.2)
    # tie=1 == SHOULD sum on the same inputs
    _, s1 = eval_node(DisMax(clauses=(Term("a"), Term("b")), tie=1.0),
                      tscores, tmasks, 3)
    _, s2 = eval_node(Bool(should=(Term("a"), Term("b"))), tscores, tmasks, 3)
    assert (s1 == s2).all()
    # empty DisMax matches nothing
    m0, s0 = eval_node(DisMax(), tscores, tmasks, 3)
    assert not m0.any() and not s0.any()


# ---- engine parity -----------------------------------------------------------

@pytest.fixture(scope="module")
def searcher(spark):
    from lucene_solr_spark.corpus import documents_as_corpus
    from lucene_solr_spark.operators.indexer import build_index
    from lucene_solr_spark.operators.search import Searcher

    from .conftest import SF_DIR

    corpus = documents_as_corpus(spark, SF_DIR)
    seg = build_index(spark, corpus, out_dir=None, bucket_docs=128)
    return Searcher(spark, seg)


def test_dispatched_tree_scores_like_classic(searcher):
    from lucene_solr_spark.plans.qparser import resolve_multi_terms

    a = resolve_multi_terms(
        dispatch("{!bool must='{!field f=text}Spark' should='{!prefix f=text}mer'}"),
        searcher,
    )
    b = resolve_multi_terms(parse("+spark mer*"), searcher)
    ra = [(r["doc_id"], r["score"]) for r in searcher.topk_query(a, k=10).collect()]
    rb = [(r["doc_id"], r["score"]) for r in searcher.topk_query(b, k=10).collect()]
    assert ra == rb


def test_maxscore_engine_matches_scalar_oracle(spark, searcher):
    import numpy as np

    from .conftest import SF_DIR
    from .oracle import OracleIndex

    docs = [
        (int(r["doc_id"]), r["text"])
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ]
    ora = OracleIndex(docs)
    node = dispatch("{!maxscore tie=0.3}order batch stream")
    got = [
        (r["doc_id"], np.float32(r["score"]))
        for r in searcher.topk_query(node, k=10).collect()
    ]
    want = [(d, np.float32(s)) for d, s in ora.topk_bool(node, k=10)]
    assert got == want


def test_maxscore_tie1_equals_sum_engine(searcher):
    node = dispatch("{!maxscore tie=1.0}order batch stream")
    sum_node = parse("order batch stream")
    ra = [
        (r["doc_id"], r["score"])
        for r in searcher.topk_query(node, k=10).collect()
    ]
    rb = [
        (r["doc_id"], r["score"])
        for r in searcher.topk_query(sum_node, k=10).collect()
    ]
    assert ra == rb


def test_bad_numeric_local_params_are_parse_errors():
    with pytest.raises(QueryParseError, match="tie"):
        dispatch("{!maxscore tie=abc}order")
    with pytest.raises(QueryParseError, match="mm"):
        dispatch("{!bool must=a mm=x}")
