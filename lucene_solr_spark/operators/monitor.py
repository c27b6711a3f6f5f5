"""Monitor / percolator — reverse search: registered queries match docs.

Reference semantics being re-expressed (SURVEY.md §2.I):
  lucene/monitor/src/java/org/apache/lucene/monitor/Monitor.java — register
    a set of queries once, then for each incoming document report which
    queries match (alerting / saved-search / routing).
  monitor/TermFilteredPresearcher.java — the pruning trick: index the
    queries by "trigger" terms so each doc only evaluates the handful of
    queries it could possibly match, never the whole registry.

Spark restatement: the parsed query registry and its trigger-term index are
tiny (thousands of queries vs billions of docs) and ship to executors via
closure broadcast; percolation is ONE mapInPandas pass over the doc stream
— tokenize the batch vectorized, look up candidate query ids through the
trigger dict (doc terms ∩ trigger terms, plus the always-candidate set for
queries with no positive term), evaluate only those candidates per doc, and
emit (doc_id, query_id) matches. No shuffle, no join: at 100 TB the cost is
exactly one scan of the docs, and the per-doc work is bounded by the
candidate count, which is what the presearcher exists to bound.

Trigger extraction (TermFilteredPresearcher's boolean minimisation, the
practical subset): a MUST/FILTER clause lets the whole query hang off that
single clause's triggers (a doc missing them cannot match); SHOULD trees
take the union over clauses; Phrase takes its first term; Synonym all
members. Queries reduced to an empty trigger set (e.g. pure MUST_NOT)
become always-candidates — correct, just unpruned, same as Monitor's
ANYTOKEN fallback.
"""

from __future__ import annotations

import functools
import re
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..functions.analysis import tokenize_pandas
from .query import Bool, Phrase, Synonym, Term, rewrite

# ---------------------------------------------------------------------------
# Multi-term leaves — MultiTermQuery inside a monitored query. There is no
# terms dictionary to expand against (the "index" is each incoming doc),
# so these match like CONSTANT_SCORE rewrites evaluated per doc: the leaf
# matches iff ANY doc token satisfies it. They contribute NO trigger term
# (exact-term trigger index can't gate a pattern) — a query gated only by
# such a leaf becomes an always-candidate, Monitor's ANYTOKEN fallback.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class WildcardLeaf:
    pattern: str  # lowercased, * = any run, ? = one char


@dataclass(frozen=True)
class FuzzyLeaf:
    term: str
    edits: int  # OSA distance bound (FuzzyQuery transpositions=true)


@dataclass(frozen=True)
class RangeLeaf:
    lo: str | None
    hi: str | None
    inc_lo: bool
    inc_hi: bool


@functools.lru_cache(maxsize=4096)
def _wc_re(pattern: str):
    return re.compile(
        "".join(
            ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
            for ch in pattern
        )
        + r"\Z"
    )


def _leaf_matches_any(node, tokset: set[str]) -> bool:
    if isinstance(node, WildcardLeaf):
        rx = _wc_re(node.pattern)
        return any(rx.match(t) for t in tokset)
    if isinstance(node, FuzzyLeaf):
        from .search import osa_distance

        lo, hi = len(node.term) - node.edits, len(node.term) + node.edits
        return any(
            lo <= len(t) <= hi and osa_distance(node.term, t) <= node.edits
            for t in tokset
        )
    assert isinstance(node, RangeLeaf)
    for t in tokset:
        if node.lo is not None and (t < node.lo or (t == node.lo and not node.inc_lo)):
            continue
        if node.hi is not None and (t > node.hi or (t == node.hi and not node.inc_hi)):
            continue
        return True
    return False


_MULTI = (WildcardLeaf, FuzzyLeaf, RangeLeaf)


def _triggers(node) -> set[str]:
    if isinstance(node, Term):
        return {node.term}
    if isinstance(node, Phrase):
        return {node.terms[0]} if node.terms else set()
    if isinstance(node, Synonym):
        return set(node.terms)
    if isinstance(node, _MULTI):
        return set()  # patterns can't gate an exact-term trigger index
    assert isinstance(node, Bool)
    positives = list(node.must) + list(node.filter)
    for c in positives:
        t = _triggers(c)
        if t:  # one positive clause is enough to gate the whole query
            return t
    if positives:
        # required clauses exist but none is gateable (multi-term leaf /
        # nested ungateable tree): gating on the OPTIONAL should terms
        # would silently drop matches where the optionals are absent —
        # the query must be an always-candidate (ANYTOKEN fallback)
        return set()
    out: set[str] = set()
    for c in node.should:
        t = _triggers(c)
        if not t:  # an ungated SHOULD clause makes the query ungateable
            return set()
        out |= t
    return out


def _matches(node, toks: list[str], tokset: set[str]) -> bool:
    if isinstance(node, Term):
        return node.term in tokset
    if isinstance(node, Synonym):
        return any(t in tokset for t in node.terms)
    if isinstance(node, _MULTI):
        return _leaf_matches_any(node, tokset)
    if isinstance(node, Phrase):
        k = len(node.terms)
        if k == 0 or any(t not in tokset for t in node.terms):
            return False
        if node.slop == 0:
            first = node.terms[0]
            return any(
                toks[i] == first and tuple(toks[i : i + k]) == node.terms
                for i in range(len(toks) - k + 1)
            )
        from .phrase import sloppy_phrase_freq_general

        raws = [
            np.array([i for i, x in enumerate(toks) if x == t], dtype=np.int64)
            for t in node.terms
        ]
        by_term: dict[str, list[int]] = {}
        for i, t in enumerate(node.terms):
            by_term.setdefault(t, []).append(i)
        groups = [legs for legs in by_term.values() if len(legs) > 1]
        return (
            sloppy_phrase_freq_general(
                raws, list(range(k)), groups, node.slop
            )
            > 0
        )
    assert isinstance(node, Bool)
    if any(not _matches(c, toks, tokset) for c in node.must):
        return False
    if any(not _matches(c, toks, tokset) for c in node.filter):
        return False
    if any(_matches(c, toks, tokset) for c in node.must_not):
        return False
    if node.should:
        n = sum(1 for c in node.should if _matches(c, toks, tokset))
        need = node.min_should_match or (
            0 if (node.must or node.filter) else 1
        )
        return n >= need
    # Lucene semantics at EVERY depth: a BooleanQuery whose only clauses
    # are must_not matches nothing (Solr's *:* rewrite of pure-negative
    # queries is a top-level parser convenience, not query semantics).
    return bool(node.must or node.filter)


class Monitor:
    """Query registry + percolation. ``queries``: (query_id, query_string)
    pairs in the classic qparser syntax — term / phrase / boolean trees
    plus wildcard, fuzzy (OSA) and term-range leaves (evaluated per doc,
    MultiTermQuery CONSTANT_SCORE semantics)."""

    def __init__(self, queries: list[tuple[str, str]]):
        from ..plans.qparser import parse

        def to_ir(node):
            if isinstance(node, tuple):
                kind = node[0]
                if kind == "matchall":
                    # a registered *:* would fire on every doc — the
                    # reverse-search trigger-term pruning has nothing to
                    # prune on; refuse explicitly (MatchAllDocsQuery is a
                    # forward-search query, not a percolation predicate)
                    raise ValueError(
                        "Monitor does not support *:* (it would match "
                        "every document; register concrete predicates)"
                    )
                if node[-1] is not None:  # every leaf tuple ends in field
                    raise ValueError(
                        f"field-scoped {kind} queries need a per-field Monitor"
                    )
                if kind == "phrase":
                    return Phrase(tuple(node[1]), node[2], node[3], node[4])
                if kind == "wildcard":
                    return WildcardLeaf(node[1])
                if kind == "fuzzy":
                    return FuzzyLeaf(node[1], node[2])
                if kind == "range":
                    return RangeLeaf(node[1], node[2], node[3], node[4])
                raise ValueError(f"Monitor cannot evaluate {kind!r} leaves")
            if isinstance(node, Bool):
                return Bool(
                    must=tuple(to_ir(c) for c in node.must),
                    should=tuple(to_ir(c) for c in node.should),
                    must_not=tuple(to_ir(c) for c in node.must_not),
                    filter=tuple(to_ir(c) for c in node.filter),
                    min_should_match=node.min_should_match,
                    boost=node.boost,
                )
            return node

        self.parsed: dict[str, object] = {
            qid: rewrite(to_ir(parse(qs))) for qid, qs in queries
        }
        self.trigger_index: dict[str, list[str]] = {}
        self.always: list[str] = []
        for qid, node in self.parsed.items():
            trig = _triggers(node)
            if not trig:
                self.always.append(qid)
            for t in trig:
                self.trigger_index.setdefault(t, []).append(qid)

    def match(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "content",
    ) -> DataFrame:
        """(doc_id, query_id) for every registered query matching each doc.
        One tokenizing scan; candidates per doc via the trigger index."""
        parsed, trig, always = self.parsed, self.trigger_index, self.always

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                toks_s = tokenize_pandas(pdf[text_col])
                out_doc, out_q = [], []
                for did, toks in zip(pdf[id_col], toks_s):
                    tokset = set(toks)
                    cand: set[str] = set(always)
                    for t in tokset & trig.keys():
                        cand.update(trig[t])
                    for qid in cand:
                        if _matches(parsed[qid], toks, tokset):
                            out_doc.append(did)
                            out_q.append(qid)
                yield pd.DataFrame({"doc_id": out_doc, "query_id": out_q})

        return docs.select(
            docs[id_col].alias("doc_id"), docs[text_col].alias(text_col)
        ).mapInPandas(run, "doc_id long, query_id string")
