"""SimpleQueryParser: grammar structure, the never-throws degradation
contract, and engine parity with the classic parser (same IR => same
topk_query scores).

Reference surface: lucene/queryparser/.../simple/SimpleQueryParser.java,
solr SimpleQParserPlugin ({!simple})."""

from __future__ import annotations

import pytest

from lucene_solr_spark.corpus import documents_as_corpus
from lucene_solr_spark.operators.indexer import build_index
from lucene_solr_spark.operators.query import Bool, Term
from lucene_solr_spark.operators.search import Searcher
from lucene_solr_spark.plans.qparser import parse, resolve_multi_terms
from lucene_solr_spark.plans.simpleqparser import simple_parse

from .conftest import SF_DIR


# ---- pure structure ---------------------------------------------------------

def test_bare_term():
    assert simple_parse("spark") == Term("spark")


def test_default_or():
    assert simple_parse("spark join") == Bool(should=(Term("spark"), Term("join")))


def test_default_and_flag():
    assert simple_parse("spark join", default_and=True) == Bool(
        must=(Term("spark"), Term("join"))
    )


def test_plus_is_and():
    assert simple_parse("spark+join") == Bool(must=(Term("spark"), Term("join")))
    # whitespace around the operator is equivalent
    assert simple_parse("spark + join") == simple_parse("spark+join")


def test_and_binds_tighter_than_or():
    # a+b | c  ==  (a AND b) OR c  — reference docs pin this precedence
    q = simple_parse("spark+merge | scan")
    assert q == Bool(
        should=(Bool(must=(Term("spark"), Term("merge"))), Term("scan"))
    )


def test_negation_at_level():
    # default operator is OR, so the positive clause stays SHOULD —
    # identical shape to the classic parser's "spark -dup"
    q = simple_parse("spark -dup")
    assert q == Bool(should=(Term("spark"),), must_not=(Term("dup"),))
    # under default AND the positive clause is required
    q = simple_parse("spark -dup", default_and=True)
    assert q == Bool(must=(Term("spark"),), must_not=(Term("dup"),))


def test_pure_negative_matches_nothing():
    q = simple_parse("-dup")
    assert isinstance(q, Bool) and not q.must and not q.should
    assert q.must_not == (Term("dup"),)


def test_phrase_and_sloppy_phrase():
    assert simple_parse('"order batch"') == ("phrase", ("order", "batch"), 0, 1.0, None)
    assert simple_parse('"order batch"~2') == (
        "phrase", ("order", "batch"), 2, 1.0, None,
    )
    # single-token phrase collapses to a Term (classic parser behavior)
    assert simple_parse('"spark"') == Term("spark")


def test_prefix_and_fuzzy_leaves():
    assert simple_parse("scan*") == ("wildcard", "scan*", 1.0, None)
    assert simple_parse("spark~1") == ("fuzzy", "spark", 1, 1.0, None)
    assert simple_parse("spark~") == ("fuzzy", "spark", 2, 1.0, None)


def test_grouping():
    q = simple_parse("(spark join)+merge")
    assert q == Bool(
        must=(Bool(should=(Term("spark"), Term("join"))), Term("merge"))
    )


def test_escape_makes_text():
    # escaped '+' is a literal char, the analyzer then splits it away
    q = simple_parse(r"spark\+join")
    assert q == ("phrase", ("spark", "join"), 0, 1.0, None) or isinstance(q, Bool)


# ---- never-throws degradation ----------------------------------------------

def test_unterminated_quote_consumes_rest():
    assert simple_parse('"order batch') == (
        "phrase", ("order", "batch"), 0, 1.0, None,
    )


def test_unmatched_lparen_closes_at_eof():
    assert simple_parse("(spark join") == Bool(should=(Term("spark"), Term("join")))


def test_stray_rparen_ignored():
    assert simple_parse("spark) join") == Bool(should=(Term("spark"), Term("join")))


def test_dangling_operators_ignored():
    assert simple_parse("spark |") == Term("spark")
    assert simple_parse("+ spark") == Term("spark")
    assert simple_parse("spark + ") == Term("spark")
    assert simple_parse("-") == Bool()


def test_empty_and_noise_inputs():
    assert simple_parse("") == Bool()
    assert simple_parse("   ") == Bool()
    assert simple_parse(")|+") == Bool()


@pytest.mark.parametrize(
    "junk",
    [
        '((("', "a+|b", '-"', "a~x", "***", '"~3', "(-)(-)", "a++++b",
        "\\", 'x "y', "|||a|||",
    ],
)
def test_never_raises(junk):
    simple_parse(junk)  # contract: no exception, whatever comes in
    simple_parse(junk, default_and=True)


# ---- engine parity with the classic parser ----------------------------------

@pytest.fixture(scope="module")
def searcher(spark):
    corpus = documents_as_corpus(spark, SF_DIR)
    seg = build_index(spark, corpus, out_dir=None, bucket_docs=128, with_positions=True)
    return Searcher(spark, seg)


PARITY = [
    # (simple grammar, classic grammar that parses to the same semantics)
    ("spark+merge", "spark AND merge"),
    ("spark merge -dup", "spark merge -dup"),
    ('"order batch"~1 spark', '"order batch"~1 spark'),
    ("scan* +spark", "scan* +spark"),
]


@pytest.mark.parametrize("sq,cq", PARITY)
def test_engine_scores_match_classic(searcher, sq, cq):
    a = resolve_multi_terms(simple_parse(sq), searcher)
    b = resolve_multi_terms(parse(cq), searcher)
    ra = [(r["doc_id"], r["score"]) for r in searcher.topk_query(a, k=10).collect()]
    rb = [(r["doc_id"], r["score"]) for r in searcher.topk_query(b, k=10).collect()]
    assert ra == rb, f"{sq!r} vs {cq!r}"


def test_explicit_or_overrides_default_and():
    # '|' must be honored under q.op=AND (it used to be swallowed by the
    # default operator and silently AND the clauses)
    q = simple_parse("spark | merge", default_and=True)
    assert q == Bool(should=(Term("spark"), Term("merge")))
    # whitespace joins into the AND group; '|' splits groups
    q = simple_parse("spark merge | scan", default_and=True)
    assert q == Bool(
        should=(Bool(must=(Term("spark"), Term("merge"))), Term("scan"))
    )
