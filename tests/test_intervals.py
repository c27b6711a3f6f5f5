"""Minimal-interval algebra: pinned cases + random parity vs brute force.

Pinned divergence from span semantics (intervals.py docstring): spans
enumerate one greedy match per leading span and never minimize; intervals
discard any enumerated interval that properly contains another.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from lucene_solr_spark.operators.intervals import (
    IAfter,
    IBefore,
    IContainedBy,
    IContaining,
    IExtend,
    IMaxgaps,
    INotContainedBy,
    INotContaining,
    INotOverlapping,
    IOr,
    IOrdered,
    IOverlapping,
    IPhrase,
    ITerm,
    IUnordered,
    doc_intervals,
    interval_terms,
    minimal_filter,
    positions_from_tokens,
)
from lucene_solr_spark.operators.spans import SpanNear, SpanTerm, doc_spans

from .oracle_intervals import brute_intervals


def _pos(tokens, terms=None):
    toks = tokens.split()
    if terms is None:
        terms = set(toks)
    return positions_from_tokens(toks, set(terms))


def _se(ivs):
    return [(s, e) for s, e, _ in ivs]


# ---------------------------------------------------------------------------
# pinned cases
# ---------------------------------------------------------------------------


def test_term_intervals():
    p = _pos("a b a b a")
    assert doc_intervals(ITerm("a"), p) == [(0, 0, 0), (2, 2, 0), (4, 4, 0)]
    assert doc_intervals(ITerm("z"), p) == []


def test_ordered_minimality():
    # "key key order": covering [0,2] contains [1,2] -> only [1,2] survives
    p = _pos("key key order")
    assert doc_intervals(IOrdered(ITerm("key"), ITerm("order")), p) == [(1, 2, 0)]


def test_span_interval_divergence_pinned():
    """SpanNear ordered emits one match per leading span (no minimality);
    the interval source keeps only the minimal interval."""
    p = _pos("key key order")
    spans = doc_spans(
        SpanNear((SpanTerm("key"), SpanTerm("order")), slop=5, in_order=True), p
    )
    assert spans == [(0, 3), (1, 3)]  # half-open, both leading spans match
    ivs = doc_intervals(IOrdered(ITerm("key"), ITerm("order")), p)
    assert ivs == [(1, 2, 0)]  # closed positions, minimal only
    assert len(ivs) < len(spans)


def test_ordered_gaps_and_maxgaps():
    p = _pos("a x x b a b")
    ivs = doc_intervals(IOrdered(ITerm("a"), ITerm("b")), p)
    assert ivs == [(0, 3, 2), (4, 5, 0)]
    assert doc_intervals(IMaxgaps(0, IOrdered(ITerm("a"), ITerm("b"))), p) == [
        (4, 5, 0)
    ]
    assert doc_intervals(IMaxgaps(2, IOrdered(ITerm("a"), ITerm("b"))), p) == ivs


def test_unordered_consecutive_pairs():
    # minimal unordered(a,b) == consecutive differing-term pairs in the
    # merged position order (the SQL-oracle characterization)
    p = _pos("b a a b x a")
    ivs = doc_intervals(IUnordered(ITerm("a"), ITerm("b")), p)
    assert _se(ivs) == [(0, 1), (2, 3), (3, 5)]
    # gaps: width - 2 for term pairs
    assert [g for _, _, g in ivs] == [0, 0, 1]


def test_unordered_overlap_allowed():
    # same position sets: unordered(a, a-or-b) may overlap
    p = _pos("a b")
    ivs = doc_intervals(IUnordered(ITerm("a"), IOr(ITerm("a"), ITerm("b"))), p)
    assert (0, 0, 0) in ivs  # a overlapping itself is a zero-width window


def test_phrase_block():
    p = _pos("a b c a x b")
    assert doc_intervals(IPhrase(ITerm("a"), ITerm("b"), ITerm("c")), p) == [
        (0, 2, 0)
    ]
    assert doc_intervals(IPhrase(ITerm("a"), ITerm("x")), p) == [(3, 4, 0)]
    assert doc_intervals(IPhrase(ITerm("b"), ITerm("a")), p) == []


def test_or_minimal():
    p = _pos("a b a")
    got = doc_intervals(IOr(ITerm("a"), ITerm("b")), p)
    assert got == [(0, 0, 0), (1, 1, 0), (2, 2, 0)]
    # nested composite unioned with a term: containing interval dropped
    got = doc_intervals(IOr(IOrdered(ITerm("a"), ITerm("b")), ITerm("b")), p)
    assert got == [(0, 0, 0), (1, 1, 0), (2, 2, 0)] or (1, 1, 0) in got


def test_containing_family():
    p = _pos("key x hash order key order")
    big = IUnordered(ITerm("key"), ITerm("order"))
    assert _se(doc_intervals(big, p)) == [(0, 3), (3, 4), (4, 5)]
    assert _se(doc_intervals(IContaining(big, ITerm("hash")), p)) == [(0, 3)]
    assert _se(doc_intervals(INotContaining(big, ITerm("hash")), p)) == [
        (3, 4),
        (4, 5),
    ]
    lit = ITerm("hash")
    assert _se(doc_intervals(IContainedBy(lit, big), p)) == [(2, 2)]
    assert _se(doc_intervals(INotContainedBy(lit, IOrdered(ITerm("key"), ITerm("x"))), p)) == [
        (2, 2)
    ]


def test_before_after():
    p = _pos("a x b a x a b")
    # before(a, b): a-positions strictly before SOME b start (last b at 6)
    assert _se(doc_intervals(IBefore(ITerm("a"), ITerm("b")), p)) == [
        (0, 0),
        (3, 3),
        (5, 5),
    ]
    # after(a, b): a-positions strictly after SOME b end (first b at 2)
    assert _se(doc_intervals(IAfter(ITerm("a"), ITerm("b")), p)) == [
        (3, 3),
        (5, 5),
    ]
    # empty reference -> no intervals at all
    assert doc_intervals(IBefore(ITerm("a"), ITerm("z")), p) == []
    assert doc_intervals(IAfter(ITerm("a"), ITerm("z")), p) == []


def test_overlapping_family():
    # source windows that share at least one position with a reference window
    p = _pos("key order x hash key x key order")
    src = IUnordered(ITerm("key"), ITerm("order"))
    ref = IUnordered(ITerm("key"), ITerm("hash"))
    assert _se(doc_intervals(src, p)) == [(0, 1), (1, 4), (6, 7)]
    assert _se(doc_intervals(ref, p)) == [(0, 3), (3, 4)]
    assert _se(doc_intervals(IOverlapping(src, ref), p)) == [(0, 1), (1, 4)]
    assert _se(doc_intervals(INotOverlapping(src, ref), p)) == [(6, 7)]
    # term-leaf reference degenerates to containing (point overlap)
    assert doc_intervals(IOverlapping(src, ITerm("hash")), p) == doc_intervals(
        IContaining(src, ITerm("hash")), p
    )


def test_extend_clamp_and_minimality():
    p = _pos("a b a")
    got = doc_intervals(IExtend(ITerm("a"), 2, 1), p)
    # (0,0)->(0,1), (2,2)->(0,3): the clamped pair nests; minimal survives
    assert got == [(0, 1, 0)]
    # no clamping -> widths equal, no nesting, all survive
    assert _se(doc_intervals(IExtend(ITerm("a"), 0, 1), p)) == [(0, 1), (2, 3)]
    # gaps pass through from the inner source
    inner = IOrdered(ITerm("a"), ITerm("b"))
    assert doc_intervals(IExtend(inner, 0, 0), p) == doc_intervals(inner, p)


def test_minimal_filter_transitive():
    # A contains B contains C: only C survives, and A must not survive
    # because B (dropped) still witnesses nesting inside A via C.
    ivs = [(0, 9, 0), (1, 5, 0), (2, 3, 0)]
    assert minimal_filter(ivs) == [(2, 3, 0)]
    # duplicate (start, end): min gaps survives
    assert minimal_filter([(1, 4, 3), (1, 4, 1)]) == [(1, 4, 1)]


def test_interval_terms():
    node = IContaining(
        IUnordered(ITerm("a"), IOr(ITerm("b"), ITerm("c"))), ITerm("d")
    )
    assert interval_terms(node) == {"a", "b", "c", "d"}


# ---------------------------------------------------------------------------
# random parity vs brute force
# ---------------------------------------------------------------------------

_ALPHABET = ["a", "b", "c"]


def _rand_tree(rng: random.Random, depth: int, term_only: bool):
    if depth == 0 or rng.random() < 0.35:
        return ITerm(rng.choice(_ALPHABET))
    kind = rng.randrange(14)
    sub = lambda: _rand_tree(rng, depth - 1, term_only)  # noqa: E731
    leaf = (lambda: ITerm(rng.choice(_ALPHABET))) if term_only else sub
    if kind == 0:
        return IOrdered(leaf(), leaf())
    if kind == 1:
        return IUnordered(leaf(), leaf())
    if kind == 2:
        return IOr(sub(), sub())
    if kind == 3:
        return IPhrase(leaf(), leaf())
    if kind == 4:
        return IMaxgaps(rng.randrange(4), sub())
    if kind == 5:
        return IContaining(sub(), sub())
    if kind == 6:
        return INotContaining(sub(), sub())
    if kind == 7:
        return IBefore(sub(), sub())
    if kind == 8:
        return IAfter(sub(), sub())
    if kind == 9:
        return IOverlapping(sub(), sub())
    if kind == 10:
        return INotOverlapping(sub(), sub())
    if kind == 11:
        return IExtend(sub(), rng.randrange(3), rng.randrange(3))
    if kind == 12:
        return INotContainedBy(sub(), sub())
    return IContainedBy(sub(), sub())


@pytest.mark.parametrize("seed", range(6))
def test_random_parity_term_leaf_exact(seed):
    """Term-leaf composites: kernel == brute force including gaps."""
    rng = random.Random(1000 + seed)
    for _ in range(120):
        toks = [rng.choice(_ALPHABET + ["x"]) for _ in range(rng.randrange(1, 13))]
        node = _rand_tree(rng, 1, term_only=True)
        pos = positions_from_tokens(toks, interval_terms(node))
        got = doc_intervals(node, pos)
        want = brute_intervals(node, pos)
        assert got == want, (toks, node, got, want)


@pytest.mark.parametrize("seed", range(6))
def test_random_parity_nested_start_end(seed):
    """Arbitrary nesting: kernel == brute force on (start, end) sets
    (gaps of composite-sub chains pinned kernel-side; see oracle note)."""
    rng = random.Random(2000 + seed)
    for _ in range(80):
        toks = [rng.choice(_ALPHABET + ["x"]) for _ in range(rng.randrange(1, 12))]
        node = _rand_tree(rng, 2, term_only=False)
        pos = positions_from_tokens(toks, interval_terms(node))
        got = _se(doc_intervals(node, pos))
        want = _se(brute_intervals(node, pos))
        assert got == want, (toks, node, got, want)


def test_positions_from_tokens_dtype():
    p = positions_from_tokens(["a", "b", "a"], {"a", "z"})
    assert p["a"].dtype == np.int64 and p["a"].tolist() == [0, 2]
    assert p["z"].tolist() == []
