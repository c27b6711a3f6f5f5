"""Scalar span-query oracle — mirrors the pinned match semantics documented
in lucene_solr_spark/operators/spans.py, evaluated from raw token lists
(the engine path decodes packed positional postings; equality between the
two pins the whole encode/decode/bucket pipeline).
"""

from __future__ import annotations

import heapq

import numpy as np

from lucene_solr_spark.operators.spans import (
    SpanContaining,
    SpanFirst,
    SpanPositionRange,
    SpanNear,
    SpanNot,
    SpanOr,
    SpanTerm,
    SpanWithin,
)

from .oracle import OracleIndex


def _doc_spans(node, toks: list[str]) -> list[tuple[int, int]]:
    if isinstance(node, SpanTerm):
        return [(i, i + 1) for i, t in enumerate(toks) if t == node.term]
    if isinstance(node, SpanOr):
        out: list[tuple[int, int]] = []
        for c in node.clauses:
            out.extend(_doc_spans(c, toks))
        return sorted(out)
    if isinstance(node, SpanFirst):
        return [s for s in _doc_spans(node.clause, toks) if s[1] <= node.end]
    if isinstance(node, SpanPositionRange):
        return [
            s
            for s in _doc_spans(node.clause, toks)
            if node.start <= s[0] and s[1] <= node.end
        ]
    if isinstance(node, SpanNot):
        inc = _doc_spans(node.include, toks)
        exc = _doc_spans(node.exclude, toks)
        return [
            (s, e) for s, e in inc
            if not any(xs < e + node.post and xe > s - node.pre for xs, xe in exc)
        ]
    if isinstance(node, SpanContaining):
        big = _doc_spans(node.big, toks)
        little = _doc_spans(node.little, toks)
        return [(s, e) for s, e in big if any(s <= ls and le <= e for ls, le in little)]
    if isinstance(node, SpanWithin):
        big = _doc_spans(node.big, toks)
        little = _doc_spans(node.little, toks)
        return [(ls, le) for ls, le in little if any(s <= ls and le <= e for s, e in big)]
    assert isinstance(node, SpanNear)
    subs = [_doc_spans(c, toks) for c in node.clauses]
    if any(not s for s in subs):
        return []
    if node.in_order:
        return [m[0] for m in _ordered(subs, node.slop)]
    return [m[0] for m in _unordered(subs, node.slop)]


def _ordered(subs, slop):
    if not subs:
        return []
    if len(subs) == 1:
        return [((a, b), 0) for a, b in subs[0]]
    out = []
    for s0 in subs[0]:
        prev_end, slack, last_end, ok = s0[1], 0, s0[1], True
        for spans in subs[1:]:
            nxt = next((s for s in spans if s[0] >= prev_end), None)
            if nxt is None:
                ok = False
                break
            slack += nxt[0] - prev_end
            prev_end = last_end = nxt[1]
        if ok and slack <= slop:
            out.append(((s0[0], last_end), slack))
    return out


def _unordered(subs, slop):
    if not subs:
        return []
    if len(subs) == 1:
        return [((a, b), 0) for a, b in subs[0]]
    n = len(subs)
    idx = [0] * n
    heap = [(subs[i][0][0], subs[i][0][1], i) for i in range(n)]
    heapq.heapify(heap)
    cur_len = [subs[i][0][1] - subs[i][0][0] for i in range(n)]
    total_len = sum(cur_len)
    max_end = max(subs[i][0][1] for i in range(n))
    out = []
    start, end, i = heapq.heappop(heap)
    best = ((start, max_end), max(0, (max_end - start) - total_len))
    while True:
        idx[i] += 1
        if idx[i] >= len(subs[i]):
            break
        ns, ne = subs[i][idx[i]]
        total_len += (ne - ns) - cur_len[i]
        cur_len[i] = ne - ns
        max_end = max(max_end, ne)
        if ns > heap[0][0]:
            if best[1] <= slop:
                out.append(best)
            heapq.heappush(heap, (ns, ne, i))
            start, end, i = heapq.heappop(heap)
            best = ((start, max_end), max(0, (max_end - start) - total_len))
        else:
            start = ns
            slack = max(0, (max_end - start) - total_len)
            if slack < best[1]:
                best = ((start, max_end), slack)
    if best[1] <= slop:
        out.append(best)
    return out


def _doc_matches_toks(node, toks: list[str]):
    if isinstance(node, SpanNear):
        subs = [_doc_spans(c, toks) for c in node.clauses]
        if any(not s for s in subs):
            return []
        return _ordered(subs, node.slop) if node.in_order else _unordered(subs, node.slop)
    if isinstance(node, SpanNot):
        inc = _doc_matches_toks(node.include, toks)
        exc = _doc_spans(node.exclude, toks)
        return [
            ((s, e), w) for (s, e), w in inc
            if not any(xs < e + node.post and xe > s - node.pre for xs, xe in exc)
        ]
    if isinstance(node, SpanContaining):
        big = _doc_matches_toks(node.big, toks)
        little = _doc_spans(node.little, toks)
        return [((s, e), w) for (s, e), w in big
                if any(s <= ls and le <= e for ls, le in little)]
    if isinstance(node, SpanWithin):
        little = _doc_matches_toks(node.little, toks)
        big = _doc_spans(node.big, toks)
        return [((ls, le), w) for (ls, le), w in little
                if any(s <= ls and le <= e for s, e in big)]
    if isinstance(node, SpanFirst):
        return [((s, e), w) for (s, e), w in _doc_matches_toks(node.clause, toks)
                if e <= node.end]
    if isinstance(node, SpanPositionRange):
        return [((s, e), w) for (s, e), w in _doc_matches_toks(node.clause, toks)
                if node.start <= s and e <= node.end]
    return [(s, 0) for s in _doc_spans(node, toks)]


def span_freq_toks(node, toks: list[str]) -> float:
    return float(sum(1.0 / (1.0 + sl) for _, sl in _doc_matches_toks(node, toks)))


def _span_terms(node) -> set[str]:
    """INDEPENDENT restatement of the scoring-terms rule (SpanWeight#
    buildSimWeight: every clause term scores EXCEPT a SpanNot's exclusion
    side, which gates matches but contributes no idf). Deliberately not
    imported from the engine — the oracle must be able to catch a bug in
    operators/spans.py#scoring_terms."""
    if isinstance(node, SpanTerm):
        return {node.term}
    if isinstance(node, (SpanFirst, SpanPositionRange)):
        return _span_terms(node.clause)
    if isinstance(node, SpanNot):
        return _span_terms(node.include)
    if isinstance(node, (SpanContaining, SpanWithin)):
        return _span_terms(node.big) | _span_terms(node.little)
    out: set[str] = set()
    for c in node.clauses:
        out |= _span_terms(c)
    return out


def topk_span(ora: OracleIndex, node, k: int = 10) -> list[tuple[int, float]]:
    """Top-k span BM25 matching operators/spans.py#span_topk: idf summed
    over the DISTINCT clause terms present in the corpus (df > 0), float32
    formula and tie-break identical to the phrase oracle."""
    distinct = sorted(_span_terms(node))
    present = [t for t in distinct if len(ora.tf.get(t, {}))]
    idf_sum = np.float32(sum(ora.idf(t) for t in present))
    out = []
    for doc_id, toks in ora.tokens.items():
        freq = span_freq_toks(node, toks)
        if not freq:
            continue
        add = ora.cache[ora.norm_byte[doc_id]]
        s = np.float32(idf_sum * (np.float32(freq) / (np.float32(freq) + add)))
        out.append((doc_id, float(s)))
    out.sort(key=lambda kv: (-kv[1], kv[0]))
    return out[:k]
