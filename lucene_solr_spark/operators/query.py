"""Boolean query tree — IR, rewrite rules, vectorized per-bucket evaluation.

Reference semantics being re-expressed (SURVEY.md §2.C):
  search/BooleanQuery.java           — clause kinds, minimumNumberShouldMatch
  search/BooleanQuery.java#rewrite   — flatten nested disjunctions,
                                       collapse single-clause trees
  search/Boolean2ScorerSupplier.java — required/optional/prohibited scorer DAG
  search/MinShouldMatchSumScorer.java— >=m-of-n optional matching
  search/BoostQuery.java             — per-clause score multiplier
  search/ReqExclScorer.java          — MUST_NOT exclusion
  search/ReqOptSumScorer.java        — MUST scores + optional SHOULD scores

Spark restatement: the tree is evaluated per doc-space bucket inside the
engine's applyInPandas leaf (operators/search.py) as dense numpy arrays over
the bucket span — one (score float32[], match bool[]) pair per node. Clause
semantics:

  * MUST: every clause matches; clause scores sum.
  * SHOULD: optional when MUST/FILTER present (pure score boosters), else at
    least max(1, min_should_match) must match; with min_should_match=m, at
    least m SHOULD clauses must match in either case. Matching SHOULD
    clauses contribute score; non-matching contribute 0.
  * MUST_NOT: no matching doc survives; contributes no score.
  * FILTER: must match, contributes no score (ConstantScore inside the tree).
  * boost: node score is multiplied by float32(boost) after evaluation.

Float32 parity contract (same as the flat path, SURVEY.md §4.3): scores
accumulate in float32 in clause-list order, MUST clauses before SHOULD
clauses; Term scores are bm25.score_block outputs; boosts multiply in
float32. tests/oracle.py#score_bool implements the identical scalar
recursion and pytest pins rank+score identity.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

__all__ = [
    "Term",
    "Phrase",
    "Synonym",
    "Bool",
    "DisMax",
    "collect_terms",
    "collect_term_leaves",
    "collect_fields",
    "collect_phrases",
    "collect_synonyms",
    "rewrite",
    "eval_node",
]


@dataclass(frozen=True)
class Term:
    """A single-term scoring clause (search/TermQuery.java + BoostQuery).
    ``field=None`` means the searcher's default field; FieldedSearcher
    rewrites fielded leaves to tagged term strings before the kernel runs,
    so eval_node itself only ever sees plain term keys."""

    term: str
    boost: float = 1.0
    field: str | None = None


@dataclass(frozen=True)
class Phrase:
    """A phrase clause inside a Boolean tree (search/PhraseQuery.java as a
    BooleanClause). Scored like a pseudo-term: freq = (sloppy) phrase
    occurrences, idf = sum over the phrase terms' idfs. Requires a
    positional index; evaluated via the cogrouped scorer
    (search.py#score_query_postings with positions). ``field`` as in Term."""

    terms: tuple
    slop: int = 0
    boost: float = 1.0
    field: str | None = None

    def __post_init__(self):
        if not isinstance(self.terms, tuple):
            object.__setattr__(self, "terms", tuple(self.terms))


@dataclass(frozen=True)
class Synonym:
    """A blended multi-term clause (search/SynonymQuery.java): terms that
    are scored as if they were ONE term. Pinned Lucene-8 semantics:
    doc freq is blended as max over the member terms' dfs
    (SynonymQuery#SynonymWeight collects TermStatistics with
    ``docFreq = max``), and at score time the doc's freq is the SUM of the
    member terms' freqs (SynonymScorer#freq). One idf, one tf saturation —
    a doc matching two synonyms is NOT scored like a 2-term disjunction."""

    terms: tuple
    boost: float = 1.0
    field: str | None = None

    def __post_init__(self):
        if not isinstance(self.terms, tuple):
            object.__setattr__(self, "terms", tuple(self.terms))


@dataclass(frozen=True)
class Bool:
    """A Boolean node (search/BooleanQuery.java). Clause tuples hold Term or
    nested Bool values."""

    must: tuple = ()
    should: tuple = ()
    must_not: tuple = ()
    filter: tuple = ()
    min_should_match: int = 0
    boost: float = 1.0

    def __post_init__(self):
        # tolerate lists at construction time
        for f in ("must", "should", "must_not", "filter"):
            v = getattr(self, f)
            if not isinstance(v, tuple):
                object.__setattr__(self, f, tuple(v))


@dataclass(frozen=True)
class DisMax:
    """A disjunction-max node (search/DisjunctionMaxQuery.java): matches
    where ANY clause matches; score = best clause score + tie *
    (sum of the others). Accumulation contract mirrors Bool: the sum is
    a float32 left fold in clause-list order, the max is exact, and the
    tie combine is float32 step-by-step ((sum-max), *tie, +max) — the
    scalar oracle and the DuckDB engine-row oracles restate the same
    fold. tie=0 is Lucene's default (pure max); tie=1 makes the node
    score-identical to a SHOULD-sum Bool."""

    clauses: tuple = ()
    tie: float = 0.0
    boost: float = 1.0

    def __post_init__(self):
        if not isinstance(self.clauses, tuple):
            object.__setattr__(self, "clauses", tuple(self.clauses))


def collect_terms(node) -> set[str]:
    """All distinct terms anywhere in the tree (incl. MUST_NOT/FILTER)."""
    if isinstance(node, Term):
        return {node.term}
    if isinstance(node, (Phrase, Synonym)):
        return set(node.terms)
    if isinstance(node, DisMax):
        out: set[str] = set()
        for c in node.clauses:
            out |= collect_terms(c)
        return out
    out = set()
    for part in (node.must, node.should, node.must_not, node.filter):
        for c in part:
            out |= collect_terms(c)
    return out


def collect_term_leaves(node) -> set[str]:
    """Distinct terms appearing as Term leaves only (phrase terms excluded
    unless they also occur as a standalone Term) — the set whose postings
    the Boolean scorer must decode for per-term BM25."""
    if isinstance(node, Term):
        return {node.term}
    if isinstance(node, (Phrase, Synonym)):
        return set()
    if isinstance(node, DisMax):
        out: set[str] = set()
        for c in node.clauses:
            out |= collect_term_leaves(c)
        return out
    out = set()
    for part in (node.must, node.should, node.must_not, node.filter):
        for c in part:
            out |= collect_term_leaves(c)
    return out


def collect_fields(node) -> set:
    """Field names used by Term/Phrase/Synonym leaves (None = default)."""
    if isinstance(node, (Term, Phrase, Synonym)):
        return {node.field}
    if isinstance(node, DisMax):
        out: set = set()
        for c in node.clauses:
            out |= collect_fields(c)
        return out
    out = set()
    for part in (node.must, node.should, node.must_not, node.filter):
        for c in part:
            out |= collect_fields(c)
    return out


def collect_phrases(node) -> list["Phrase"]:
    """All Phrase leaves in the tree (order: depth-first, clause order)."""
    if isinstance(node, (Term, Synonym)):
        return []
    if isinstance(node, Phrase):
        return [node]
    if isinstance(node, DisMax):
        out: list[Phrase] = []
        for c in node.clauses:
            out.extend(collect_phrases(c))
        return out
    out = []
    for part in (node.must, node.should, node.must_not, node.filter):
        for c in part:
            out.extend(collect_phrases(c))
    return out


def collect_synonyms(node) -> list["Synonym"]:
    """All Synonym leaves in the tree (depth-first, clause order)."""
    if isinstance(node, (Term, Phrase)):
        return []
    if isinstance(node, Synonym):
        return [node]
    if isinstance(node, DisMax):
        out: list[Synonym] = []
        for c in node.clauses:
            out.extend(collect_synonyms(c))
        return out
    out = []
    for part in (node.must, node.should, node.must_not, node.filter):
        for c in part:
            out.extend(collect_synonyms(c))
    return out


def _is_pure(node, kind: str) -> bool:
    if not isinstance(node, Bool):
        return False
    others = {"must", "should", "must_not", "filter"} - {kind}
    return (
        all(not getattr(node, o) for o in others)
        and node.min_should_match <= (1 if kind == "should" else 0)
        and node.boost == 1.0
    )


def rewrite(node):
    """BooleanQuery#rewrite analog — conservative, score-preserving in
    float32 (only boost==1 splices and exact single-clause collapses, so the
    rewritten tree is bit-identical to the original under eval_node)."""
    if isinstance(node, DisMax):
        # DisjunctionMaxQuery#rewrite: single-clause DMQ collapses to the
        # clause (tie is then unobservable); boost folds only when exact
        clauses = tuple(rewrite(c) for c in node.clauses)
        if len(clauses) == 1 and node.boost == 1.0:
            return clauses[0]
        return DisMax(clauses=clauses, tie=node.tie, boost=node.boost)
    if not isinstance(node, Bool):
        # Term/Phrase/Synonym and any extension leaf (e.g. the Monitor's
        # multi-term leaves) pass through untouched
        return node
    must = tuple(rewrite(c) for c in node.must)
    should = tuple(rewrite(c) for c in node.should)
    must_not = tuple(rewrite(c) for c in node.must_not)
    filt = tuple(rewrite(c) for c in node.filter)

    # splice pure-MUST children into the MUST list (conjunction flatten)
    flat_must: list = []
    for c in must:
        if _is_pure(c, "must"):
            flat_must.extend(c.must)
        else:
            flat_must.append(c)
    # splice pure-SHOULD children into the SHOULD list (disjunction flatten)
    # only when the outer node is itself an unconstrained disjunction
    # (msm <= 1): the inner clause-count change is then unobservable.
    flat_should: list = []
    if node.min_should_match <= 1:
        for c in should:
            if _is_pure(c, "should"):
                flat_should.extend(c.should)
            else:
                flat_should.append(c)
    else:
        flat_should = list(should)

    out = Bool(
        must=tuple(flat_must),
        should=tuple(flat_should),
        must_not=must_not,
        filter=filt,
        min_should_match=node.min_should_match,
        boost=node.boost,
    )
    # single-clause collapse: bool(must=[x]) or bool(should=[x], msm<=1)
    # with no other clauses. Fold boosts only when exact (one side is 1.0).
    lone = None
    if len(out.must) == 1 and not (out.should or out.must_not or out.filter):
        lone = out.must[0]
    elif (
        len(out.should) == 1
        and not (out.must or out.must_not or out.filter)
        and out.min_should_match <= 1
    ):
        lone = out.should[0]
    if lone is not None:
        if out.boost == 1.0:
            return lone
        if isinstance(lone, Term) and lone.boost == 1.0:
            return Term(lone.term, out.boost, lone.field)
        if isinstance(lone, Bool) and lone.boost == 1.0:
            return Bool(
                must=lone.must,
                should=lone.should,
                must_not=lone.must_not,
                filter=lone.filter,
                min_should_match=lone.min_should_match,
                boost=out.boost,
            )
    return out


def eval_node(
    node,
    tscores: dict[str, np.ndarray],
    tmasks: dict[str, np.ndarray],
    span: int,
    pscores: dict | None = None,
    pmasks: dict | None = None,
    sscores: dict | None = None,
    smasks: dict | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Evaluate a query tree over one bucket's dense doc space.

    ``tscores[t]``: float32[span] BM25 scores (0 where absent);
    ``tmasks[t]``: bool[span] term presence. ``pscores``/``pmasks``: the
    same, keyed by Phrase node (precomputed by the cogrouped scorer).
    Returns (mask, score) for the node. Accumulation: float32, MUST
    clauses in list order then SHOULD clauses in list order (the pinned
    cross-oracle contract).
    """
    if isinstance(node, Term):
        s = tscores.get(node.term)
        m = tmasks.get(node.term)
        if s is None:
            z = np.zeros(span, dtype=np.float32)
            return np.zeros(span, dtype=bool), z
        if node.boost != 1.0:
            s = (s * np.float32(node.boost)).astype(np.float32)
        return m, s
    if isinstance(node, Phrase):
        s = None if pscores is None else pscores.get(node)
        if s is None:
            return np.zeros(span, dtype=bool), np.zeros(span, dtype=np.float32)
        m = pmasks[node]
        if node.boost != 1.0:
            s = (s * np.float32(node.boost)).astype(np.float32)
        return m, s
    if isinstance(node, Synonym):
        s = None if sscores is None else sscores.get(node)
        if s is None:
            return np.zeros(span, dtype=bool), np.zeros(span, dtype=np.float32)
        m = smasks[node]
        if node.boost != 1.0:
            s = (s * np.float32(node.boost)).astype(np.float32)
        return m, s

    if isinstance(node, DisMax):
        if not node.clauses:
            return np.zeros(span, dtype=bool), np.zeros(span, dtype=np.float32)
        mask = np.zeros(span, dtype=bool)
        best = np.zeros(span, dtype=np.float32)
        total = np.zeros(span, dtype=np.float32)
        for c in node.clauses:
            cm, cs = eval_node(
                c, tscores, tmasks, span, pscores, pmasks, sscores, smasks
            )
            cs = np.where(cm, cs, np.float32(0.0)).astype(np.float32)
            mask |= cm
            np.maximum(best, cs, out=best)
            total = (total + cs).astype(np.float32)  # f32 fold, clause order
        if node.tie == 0.0:
            score = best
        else:
            rest = (total - best).astype(np.float32)
            rest = (rest * np.float32(node.tie)).astype(np.float32)
            score = (best + rest).astype(np.float32)
        score = np.where(mask, score, np.float32(0.0)).astype(np.float32)
        if node.boost != 1.0:
            score = (score * np.float32(node.boost)).astype(np.float32)
        return mask, score

    # Bool node
    if not (node.must or node.should or node.filter):
        # no positive clause -> matches nothing (Lucene: MatchNoDocsQuery)
        return np.zeros(span, dtype=bool), np.zeros(span, dtype=np.float32)

    mask = np.ones(span, dtype=bool)
    score = np.zeros(span, dtype=np.float32)

    for c in node.must:
        cm, cs = eval_node(c, tscores, tmasks, span, pscores, pmasks, sscores, smasks)
        mask &= cm
        score += cs  # float32 in-place, clause order
    for c in node.filter:
        cm, _ = eval_node(c, tscores, tmasks, span, pscores, pmasks, sscores, smasks)
        mask &= cm
    for c in node.must_not:
        cm, _ = eval_node(c, tscores, tmasks, span, pscores, pmasks, sscores, smasks)
        mask &= ~cm

    if node.should:
        n_should = np.zeros(span, dtype=np.int32)
        for c in node.should:
            cm, cs = eval_node(c, tscores, tmasks, span, pscores, pmasks, sscores, smasks)
            n_should += cm
            # SHOULD contributes score only where it matches; cs is already
            # 0 off-match for Terms, but a nested Bool's score must be
            # masked (its sub-scores can be nonzero where the node fails
            # its own msm/must_not constraints).
            score += np.where(cm, cs, np.float32(0.0)).astype(np.float32)
        msm = node.min_should_match
        if not (node.must or node.filter):
            msm = max(1, msm)
        if msm > 0:
            mask &= n_should >= msm

    # scores of docs outside the mask are meaningless; zero them so parent
    # SHOULD-masking and the final top-k see a clean array
    score = np.where(mask, score, np.float32(0.0)).astype(np.float32)
    if node.boost != 1.0:
        score = (score * np.float32(node.boost)).astype(np.float32)
    return mask, score
