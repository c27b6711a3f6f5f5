"""TermAutomatonQuery compiler (operators/automaton.py) — rewrite-to-spans
structural pinning (TermAutomatonQuery#rewrite analog). The span kernel
itself is pinned in tests/test_spans.py; the oracled driver row
term_automaton_topk pins the end-to-end float32 path."""

from __future__ import annotations

import pytest

from lucene_solr_spark.operators.automaton import (
    AutomatonCompileError,
    TermAutomaton,
    automaton_to_spans,
)
from lucene_solr_spark.operators.spans import SpanNear, SpanOr, SpanTerm


def test_union_of_two_phrases():
    auto = TermAutomaton(
        transitions=((0, 1, "key"), (1, 2, "order"), (1, 2, "value")),
        accept=frozenset({2}),
    )
    got = automaton_to_spans(auto)
    assert got == SpanOr(
        (
            SpanNear((SpanTerm("key"), SpanTerm("order")), slop=0),
            SpanNear((SpanTerm("key"), SpanTerm("value")), slop=0),
        )
    )


def test_single_term_collapses():
    auto = TermAutomaton(((0, 1, "spark"),), frozenset({1}))
    assert automaton_to_spans(auto) == SpanTerm("spark")


def test_single_path_collapses_to_phrase():
    auto = TermAutomaton(
        ((0, 1, "a"), (1, 2, "b"), (2, 3, "c")), frozenset({3})
    )
    assert automaton_to_spans(auto) == SpanNear(
        (SpanTerm("a"), SpanTerm("b"), SpanTerm("c")), slop=0, in_order=True
    )


def test_variable_length_accepts():
    # accepts "a" (state 1) and "a b" (state 2)
    auto = TermAutomaton(((0, 1, "a"), (1, 2, "b")), frozenset({1, 2}))
    got = automaton_to_spans(auto)
    assert got == SpanOr(
        (SpanTerm("a"), SpanNear((SpanTerm("a"), SpanTerm("b")), slop=0))
    )


def test_cycle_rejected():
    auto = TermAutomaton(((0, 1, "a"), (1, 0, "b")), frozenset({1}))
    with pytest.raises(AutomatonCompileError):
        automaton_to_spans(auto)


def test_path_explosion_rejected():
    # 2^10 paths through 10 binary stages > max_paths
    trans = []
    for i in range(10):
        trans.append((i, i + 1, f"x{i}"))
        trans.append((i, i + 1, f"y{i}"))
    auto = TermAutomaton(tuple(trans), frozenset({10}))
    with pytest.raises(AutomatonCompileError):
        automaton_to_spans(auto, max_paths=256)


def test_empty_language_rejected():
    auto = TermAutomaton(((0, 1, "a"),), frozenset({0}))  # accepts only ""
    with pytest.raises(AutomatonCompileError):
        automaton_to_spans(auto)


def test_duplicate_string_paths_dedupe():
    """Two state paths spelling the SAME token string must compile to one
    clause (Lucene determinizes; duplicates would double span freq)."""
    auto = TermAutomaton(
        transitions=((0, 1, "a"), (0, 2, "a"), (1, 3, "b"), (2, 3, "b")),
        accept=frozenset({3}),
    )
    got = automaton_to_spans(auto)
    assert got == SpanNear((SpanTerm("a"), SpanTerm("b")), slop=0)
