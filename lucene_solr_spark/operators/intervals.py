"""Minimal-interval algebra — the Lucene intervals module analog.

Reference surface being re-expressed (SURVEY.md §2.C "span / interval
queries"; path#symbol per SURVEY convention, the mount is empty):
  queries/intervals/Intervals.java            — the combinator factory:
      term / phrase / ordered / unordered / or / maxgaps /
      containing / notContaining / containedBy / notContainedBy
  queries/intervals/IntervalIterator.java     — the iterator contract:
      every source yields intervals in (start, end) order and the emitted
      set is MINIMAL: no reported interval properly contains another
      reported interval (minimal-interval semantics, Clarke et al. 1995 /
      Vigna 2008 "Efficient optimally lazy algorithms for minimal-interval
      semantics").
  queries/intervals/OrderedIntervalsSource.java
  queries/intervals/UnorderedIntervalsSource.java
  queries/intervals/DisjunctionIntervalsSource.java
  queries/intervals/FilteringIntervalsSource.java (containing/containedBy)

Pinned semantics (the scalar brute-force oracle in
tests/oracle_intervals.py mirrors EXACTLY this; positions are 0-based and
intervals are CLOSED [start, end] over token positions — note spans.py
uses half-open (start, end), the off-by-one is intentional and matches
the two reference modules' own conventions):

* Every node's result set is minimal: after enumeration, any interval
  that properly contains another enumerated interval is discarded; among
  duplicates of the same (start, end) the minimum ``gaps`` survives.
* term(t): one interval [p, p] per occurrence, gaps = 0.
* ordered(s1..sn): one sub-interval per source, strictly non-overlapping
  in clause order (next.start > prev.end); covering interval
  [first.start, last.end]; gaps = covering_width - sum(sub widths)
  + sum(sub gaps).
* unordered(s1..sn): one sub-interval per source, ANY arrangement,
  overlaps allowed (the Lucene 8+ Intervals.unordered default);
  covering interval [min start, max end];
  gaps = max(0, covering_width - sum(sub widths)) + sum(sub gaps).
* or(s1..sn): the union of the sub-results. Pinned deviation: the union
  is minimality-filtered like every other node. (Lucene's disjunction
  can surface non-minimal intervals to a parent ordered/unordered source
  — the documented "pull up disjunctions" rewrite exists precisely
  because minimizing inside OR loses matches; with single-term operands,
  the cases exercised here, the two behaviors coincide.)
* phrase(s1..sn): ordered with every inter-clause gap exactly 0
  (next.start == prev.end + 1); gaps = sum(sub gaps).
* maxgaps(n, s): intervals of s with gaps <= n.
* containing(big, little): intervals of big that contain at least one
  little interval (big.start <= l.start and l.end <= big.end).
* not_containing(big, little): intervals of big containing none.
* contained_by(little, big): intervals of little lying inside some big
  interval; not_contained_by is the complement.
* before(source, reference): intervals of source that end before the
  start of SOME reference interval (src.end < ref.start); after is the
  mirror (src.start > ref.end). Subsets of a minimal set stay minimal.
* overlapping(source, reference): intervals of source that overlap some
  reference interval (src.start <= ref.end and ref.start <= src.end);
  not_overlapping is the complement (Lucene's nonOverlapping).
* extend(source, before, after): each (s, e, g) becomes
  (max(0, s - before), e + after, g) — gaps pass through unchanged
  (ExtendedIntervalIterator reports the inner gaps). Pinned deviation:
  the result is minimality-filtered like every other node (Lucene does
  not re-minimize after extend; nesting can only arise here via the
  position-0 clamp, where two clamped intervals share start 0).

Spark restatement: interval counting rows run as Arrow-batched kernels
over the engine-tokenized ``tokens`` column (plans/coverage10_queries.py
and plans/coverage11_queries.py)
— the same per-doc position-array shape the positional-postings decode
produces, so the identical kernel serves the index path
(operators/spans.py builds the positions dict from pos_bin blocks). At
100 TB the inputs are the positional postings of the query's terms only
(parquet term pushdown), never the corpus: per-doc arrays are tiny and
the enumeration below is linear in their length for the term-leaf
queries served here.

Divergence from span semantics (pinned in tests/test_intervals.py):
SpanNear(ordered) emits one greedy match PER LEADING SPAN and never
minimizes — on tokens ``key key order``, spans yields matches at
(0, 3) and (1, 3) [half-open] while ordered(key, order) yields only
[1, 2]: the covering interval [0, 2] contains [1, 2] and is discarded.
Interval counts are therefore <= span counts for the same query shape.
"""

from __future__ import annotations

from bisect import bisect_right
from dataclasses import dataclass
from itertools import groupby

import numpy as np

__all__ = [
    "ITerm",
    "IOrdered",
    "IUnordered",
    "IOr",
    "IPhrase",
    "IMaxgaps",
    "IContaining",
    "INotContaining",
    "IContainedBy",
    "INotContainedBy",
    "IBefore",
    "IAfter",
    "IOverlapping",
    "INotOverlapping",
    "IExtend",
    "doc_intervals",
    "interval_terms",
    "minimal_filter",
]


@dataclass(frozen=True)
class ITerm:
    term: str


class _Multi:
    def __init__(self, *sources):
        if len(sources) == 1 and isinstance(sources[0], (list, tuple)):
            sources = tuple(sources[0])
        assert len(sources) >= 1, "need at least one source"
        self.sources = tuple(sources)

    def __repr__(self):
        return f"{type(self).__name__}{self.sources!r}"


class IOrdered(_Multi):
    pass


class IUnordered(_Multi):
    pass


class IOr(_Multi):
    pass


class IPhrase(_Multi):
    pass


@dataclass(frozen=True)
class IMaxgaps:
    maxgaps: int
    source: object


@dataclass(frozen=True)
class IContaining:
    big: object
    little: object


@dataclass(frozen=True)
class INotContaining:
    big: object
    little: object


@dataclass(frozen=True)
class IContainedBy:
    little: object
    big: object


@dataclass(frozen=True)
class INotContainedBy:
    little: object
    big: object


@dataclass(frozen=True)
class IBefore:
    source: object
    reference: object


@dataclass(frozen=True)
class IAfter:
    source: object
    reference: object


@dataclass(frozen=True)
class IOverlapping:
    source: object
    reference: object


@dataclass(frozen=True)
class INotOverlapping:
    source: object
    reference: object


@dataclass(frozen=True)
class IExtend:
    source: object
    before: int
    after: int


def interval_terms(node) -> set[str]:
    """All distinct terms under an interval node."""
    if isinstance(node, ITerm):
        return {node.term}
    if isinstance(node, IMaxgaps):
        return interval_terms(node.source)
    if isinstance(node, (IContaining, INotContaining)):
        return interval_terms(node.big) | interval_terms(node.little)
    if isinstance(node, (IContainedBy, INotContainedBy)):
        return interval_terms(node.little) | interval_terms(node.big)
    if isinstance(node, (IBefore, IAfter, IOverlapping, INotOverlapping)):
        return interval_terms(node.source) | interval_terms(node.reference)
    if isinstance(node, IExtend):
        return interval_terms(node.source)
    out: set[str] = set()
    for s in node.sources:
        out |= interval_terms(s)
    return out


def minimal_filter(
    intervals: list[tuple[int, int, int]],
) -> list[tuple[int, int, int]]:
    """Keep only intervals that properly contain no other interval in the
    input (IntervalIterator's minimality contract); duplicate (start, end)
    keep the minimum gaps. Output sorted by (start, end).

    Sweep: start descending. An interval (s, e) is dropped iff some other
    interval (s', e') with s' >= s, e' <= e exists — i.e. the min end seen
    at strictly larger starts is <= e, or a same-start interval has a
    smaller end. Containment is checked against ALL inputs (a dropped
    middle link still witnesses nesting for its containers), which the
    min-end bookkeeping preserves.
    """
    if not intervals:
        return []
    best: dict[tuple[int, int], int] = {}
    for s, e, g in intervals:
        k = (s, e)
        if k not in best or g < best[k]:
            best[k] = g
    items = sorted(best.items(), key=lambda kv: (-kv[0][0], kv[0][1]))
    out: list[tuple[int, int, int]] = []
    min_end: int | None = None  # min end among starts strictly greater
    for _, grp in groupby(items, key=lambda kv: kv[0][0]):
        grp = list(grp)
        group_min_end = grp[0][0][1]
        for (s, e), g in grp:
            if (min_end is not None and min_end <= e) or e > group_min_end:
                continue
            out.append((s, e, g))
        if min_end is None or group_min_end < min_end:
            min_end = group_min_end
    out.sort()
    return out


def _width(iv: tuple[int, int, int]) -> int:
    return iv[1] - iv[0] + 1


def _ordered(subs: list[list[tuple[int, int, int]]], block: bool):
    """Ordered chains over minimal sub-lists. Each sub-list, being minimal
    and sorted, has strictly increasing starts AND ends, so the earliest
    candidate with start > prev_end is also the min-end candidate — the
    greedy chain per leading interval is the lazy OrderedIntervalsSource
    walk. ``block`` pins every inter-clause gap to 0 (phrase)."""
    out = []
    starts = [[iv[0] for iv in lst] for lst in subs]
    for lead in subs[0]:
        prev_end = lead[1]
        subw = _width(lead)
        subg = lead[2]
        ok = True
        for k in range(1, len(subs)):
            lst = subs[k]
            i = bisect_right(starts[k], prev_end)
            if block:
                if i == len(lst) or lst[i][0] != prev_end + 1:
                    ok = False
                    break
            elif i == len(lst):
                ok = False
                break
            nxt = lst[i]
            subw += _width(nxt)
            subg += nxt[2]
            prev_end = nxt[1]
        if ok:
            s, e = lead[0], prev_end
            out.append((s, e, (e - s + 1) - subw + subg))
    return minimal_filter(out)


def _unordered(subs: list[list[tuple[int, int, int]]]):
    """Smallest-range walk (UnorderedIntervalsSource analog): one pointer
    per source; record the covering window, advance the pointer holding
    the minimal start; minimality filter cleans locally-non-minimal
    windows. Overlaps between sub-intervals are allowed (Lucene 8+
    Intervals.unordered default)."""
    n = len(subs)
    if any(not lst for lst in subs):
        return []
    if n == 1:
        return list(subs[0])
    idx = [0] * n
    out = []
    while True:
        cur = [subs[k][idx[k]] for k in range(n)]
        s = min(iv[0] for iv in cur)
        e = max(iv[1] for iv in cur)
        subw = sum(_width(iv) for iv in cur)
        subg = sum(iv[2] for iv in cur)
        out.append((s, e, max(0, (e - s + 1) - subw) + subg))
        k_min = min(range(n), key=lambda k: (cur[k][0], cur[k][1]))
        idx[k_min] += 1
        if idx[k_min] == len(subs[k_min]):
            break
    return minimal_filter(out)


def doc_intervals(node, positions: dict) -> list[tuple[int, int, int]]:
    """Enumerate one doc's minimal intervals for ``node`` as sorted
    (start, end, gaps) triples. ``positions[t]`` is the sorted position
    array of term t in this doc (absent terms -> no intervals)."""
    if isinstance(node, ITerm):
        pos = positions.get(node.term)
        if pos is None or len(pos) == 0:
            return []
        return [(int(p), int(p), 0) for p in pos]
    if isinstance(node, IOr):
        out: list[tuple[int, int, int]] = []
        for s in node.sources:
            out.extend(doc_intervals(s, positions))
        return minimal_filter(out)
    if isinstance(node, (IOrdered, IPhrase)):
        subs = [doc_intervals(s, positions) for s in node.sources]
        if any(not lst for lst in subs):
            return []
        return _ordered(subs, block=isinstance(node, IPhrase))
    if isinstance(node, IUnordered):
        subs = [doc_intervals(s, positions) for s in node.sources]
        return _unordered(subs)
    if isinstance(node, IMaxgaps):
        return [
            iv for iv in doc_intervals(node.source, positions) if iv[2] <= node.maxgaps
        ]
    if isinstance(node, (IContaining, INotContaining)):
        big = doc_intervals(node.big, positions)
        little = doc_intervals(node.little, positions)
        keep = isinstance(node, IContaining)
        return [
            iv
            for iv in big
            if any(iv[0] <= ls and le <= iv[1] for ls, le, _ in little) == keep
        ]
    if isinstance(node, (IContainedBy, INotContainedBy)):
        little = doc_intervals(node.little, positions)
        big = doc_intervals(node.big, positions)
        keep = isinstance(node, IContainedBy)
        return [
            iv
            for iv in little
            if any(s <= iv[0] and iv[1] <= e for s, e, _ in big) == keep
        ]
    if isinstance(node, (IBefore, IAfter)):
        src = doc_intervals(node.source, positions)
        ref = doc_intervals(node.reference, positions)
        if not ref:
            return []
        if isinstance(node, IBefore):
            last_start = max(s for s, _, _ in ref)
            return [iv for iv in src if iv[1] < last_start]
        first_end = min(e for _, e, _ in ref)
        return [iv for iv in src if iv[0] > first_end]
    if isinstance(node, (IOverlapping, INotOverlapping)):
        src = doc_intervals(node.source, positions)
        ref = doc_intervals(node.reference, positions)
        keep = isinstance(node, IOverlapping)
        return [
            iv
            for iv in src
            if any(iv[0] <= e and s <= iv[1] for s, e, _ in ref) == keep
        ]
    if isinstance(node, IExtend):
        return minimal_filter(
            [
                (max(0, s - node.before), e + node.after, g)
                for s, e, g in doc_intervals(node.source, positions)
            ]
        )
    raise TypeError(f"unknown interval node: {node!r}")


def positions_from_tokens(tokens, terms: set[str]) -> dict[str, np.ndarray]:
    """Position arrays for ``terms`` from one doc's token sequence — the
    tokens-column shape of the same dict operators/spans.py builds from
    decoded pos_bin blocks."""
    out: dict[str, list[int]] = {t: [] for t in terms}
    for i, tok in enumerate(tokens):
        if tok in out:
            out[tok].append(i)
    return {t: np.asarray(v, dtype=np.int64) for t, v in out.items()}
