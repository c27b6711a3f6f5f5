"""Surround query parser (operators/surround.py) — grammar → span-tree
structural pinning (DistanceQuery/OrQuery/NotQuery/SrndTruncQuery
analogs). The span KERNEL the trees run on is pinned separately in
tests/test_spans.py; the oracled driver row surround_query_topk pins the
end-to-end float32 path, so these tests stay Spark-free."""

from __future__ import annotations

import pytest

from lucene_solr_spark.operators.spans import (
    SpanNear,
    SpanNot,
    SpanOr,
    SpanTerm,
)
from lucene_solr_spark.operators.surround import (
    SurroundParseError,
    parse_surround,
)


def test_distance_ordered():
    assert parse_surround("3W(a, b)") == SpanNear(
        (SpanTerm("a"), SpanTerm("b")), slop=2, in_order=True
    )


def test_distance_unordered_multi_clause():
    assert parse_surround("n(a, b, c)") == SpanNear(
        (SpanTerm("a"), SpanTerm("b"), SpanTerm("c")), slop=0, in_order=False
    )


def test_default_distance_is_adjacent():
    assert parse_surround("W(a, b)").slop == 0
    assert parse_surround("N(a, b)").slop == 0


def test_ops_case_insensitive():
    assert parse_surround("2w(a, b)") == parse_surround("2W(a, b)")
    assert parse_surround("or(a, b)") == SpanOr((SpanTerm("a"), SpanTerm("b")))


def test_nested_tree():
    got = parse_surround("5N(OR(a, b), 2W(c, d))")
    assert got == SpanNear(
        (
            SpanOr((SpanTerm("a"), SpanTerm("b"))),
            SpanNear((SpanTerm("c"), SpanTerm("d")), slop=1, in_order=True),
        ),
        slop=4,
        in_order=False,
    )


def test_not_maps_to_span_not():
    got = parse_surround("NOT(5W(a, b), c)")
    assert got == SpanNot(
        SpanNear((SpanTerm("a"), SpanTerm("b")), slop=4, in_order=True),
        SpanTerm("c"),
    )


def test_truncation_expands_to_sorted_span_or():
    got = parse_surround(
        "W(a, te*)", expand=lambda p: ["term2", "term1"] if p == "te" else []
    )
    assert got.clauses[1] == SpanOr((SpanTerm("term1"), SpanTerm("term2")))


def test_truncation_cap():
    # surround/query/SrndTruncQuery.java + maxBasicQueries: over-broad
    # truncation raises (TooManyBasicQueries) rather than silently serving
    # an order-dependent subset of the expansion
    with pytest.raises(SurroundParseError, match="max_expansions"):
        parse_surround(
            "W(a, t*)",
            expand=lambda p: [f"t{i}" for i in range(50)],
            max_expansions=8,
        )
    # at or below the cap, all expansions are kept
    got = parse_surround(
        "W(a, t*)",
        expand=lambda p: [f"t{i}" for i in range(8)],
        max_expansions=8,
    )
    assert len(got.clauses[1].clauses) == 8


def test_truncation_absent_prefix_never_matches():
    got = parse_surround("W(a, zz*)", expand=lambda p: [])
    # sentinel term cannot appear in any terms dict (contains NUL)
    assert isinstance(got.clauses[1], SpanTerm)
    assert "\x00" in got.clauses[1].term


def test_bare_w_term_is_a_term():
    # 'w' not followed by '(' is an ordinary analyzed term
    assert parse_surround("OR(w, n)") == SpanOr((SpanTerm("w"), SpanTerm("n")))


def test_terms_are_analyzed():
    assert parse_surround("W(Spark, Data)") == SpanNear(
        (SpanTerm("spark"), SpanTerm("data")), slop=0, in_order=True
    )


@pytest.mark.parametrize(
    "bad",
    [
        "W(a)",            # distance needs >= 2 clauses
        "NOT(a)",          # NOT needs exactly 2
        "NOT(a, b, c)",
        "0W(a, b)",        # distance must be >= 1
        "W(a, b",          # missing close
        "W(a, b)) ",       # trailing input
        "(a, b)",          # no operator
        ",",
        "",
        "W(a, te*)",       # truncation without an expand callback
    ],
)
def test_syntax_errors(bad):
    with pytest.raises(SurroundParseError):
        parse_surround(bad)


def test_trailing_whitespace_tolerated():
    assert parse_surround(" W(a, b) ") == parse_surround("W(a, b)")
