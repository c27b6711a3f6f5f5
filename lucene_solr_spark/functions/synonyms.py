"""Index-time SynonymGraphFilter analog — multi-token synonym injection.

Reference semantics being re-expressed (SURVEY.md §2.H "SynonymGraphFilter"):
  analysis/synonym/SynonymGraphFilter.java — graph-aware synonym injection:
    a rule whose input spans L tokens emits output tokens that span the SAME
    region of the token graph, so phrase queries match across the rewrite
    ("ny subway" finds a doc indexed from "new york subway").
  analysis/synonym/SolrSynonymParser.java — the synonyms.txt rule format:
    "i1 i2 => o1, o2"  explicit mapping (inputs replaced by outputs)
    "w1, w2, w3"       equivalence set (expand=true: each wi emits all wj)

Where Lucene must FLATTEN the graph before indexing (FlattenGraphFilter —
positionLength is not representable in its postings format, famously making
index-time multi-token synonyms lossy), this engine stores the graph
EXACTLY: each token is an edge (start_node -> end_node) over the doc's
token-boundary nodes 0..n, and the positions table carries both endpoints
(pos_bin = packed starts, end_bin = packed ends). Ordinary tokens are edges
(i -> i+1); a contraction "new york => ny" emits ny as the single edge
(i -> i+2); a multi-token output threads fresh intermediate nodes (> n) so
its internal adjacency is preserved without disturbing original positions.
Exact phrase matching then is path-chaining over edges
(phrase.py#_exact_freqs_graph) — no flattening, no loss.

Token-graph construction is per-doc Python over the already-tokenized list
(same batch-side discipline as the stemmer UDFs in analysis.py); everything
downstream stays in the indexer's vectorized numpy flow.
"""

from __future__ import annotations

import numpy as np

# Fresh-node id scheme: injected internal boundary nodes are addressed as
#   FRESH_BASE + site*_OUT_SLOTS*_CHAIN + out_idx*_CHAIN + (chain_pos - 1)
# so any consumer can recover, from the START node alone, the injection
# site and the token's chain position — i.e. the position Lucene's
# FlattenGraphFilter would assign (site + chain_pos, the classic
# "sausage"). That keeps exact matching lossless (path-chaining over
# unique node ids) while giving sloppy/highlight paths a faithful
# flattened view (see flatten_starts).
#
# Bounds (explicit, erroring — not silently wrong): docs are limited to
# FRESH_BASE tokens (Lucene itself caps positions at IndexWriter.MAX_POSITION),
# a site to _OUT_SLOTS fresh-allocating outputs, an output to _CHAIN+1 tokens.
FRESH_BASE = 1 << 21
_OUT_SLOTS = 16
_CHAIN = 16


def flatten_starts(starts: np.ndarray) -> np.ndarray:
    """Start nodes -> FlattenGraphFilter-style positions: an original (or
    first-of-chain) token keeps its boundary position; the j-th token of an
    injected chain lands at site + j. Lossy by design — this is the view
    Lucene indexes after flattening, used here ONLY where exact graph
    matching is impossible (slop>0, multi-phrase, highlighting)."""
    starts = np.asarray(starts, dtype=np.int64)
    rel = starts - FRESH_BASE
    return np.where(
        starts < FRESH_BASE,
        starts,
        rel // (_OUT_SLOTS * _CHAIN) + rel % _CHAIN + 1,
    )


class SynonymRules:
    """Compiled synonym rules: first-input-token -> [(input_tuple, outputs)],
    longest input first. ``outputs`` is a list of token tuples."""

    def __init__(self, by_first: dict[str, list[tuple[tuple[str, ...], list[tuple[str, ...]]]]]):
        self.by_first = by_first
        self.max_len = max(
            (len(inp) for rules in by_first.values() for inp, _ in rules),
            default=0,
        )

    def __bool__(self) -> bool:
        return bool(self.by_first)


def expand_query_synonyms(terms: list[str], rules: SynonymRules):
    """QUERY-TIME SynonymGraphFilter analog — the common Solr deployment
    (apply the rules in the query analyzer so synonyms change without
    reindexing). The analyzed query token sequence is scanned greedy
    leftmost-longest (same matcher as the index-time path); each match
    site rewrites to:

      * single-token outputs -> ONE ``Synonym`` leaf (SynonymQuery.java
        semantics: blended df = max over members, freq = sum — built by
        Lucene's QueryBuilder for same-position alternatives),
      * multi-token outputs  -> a ``Phrase`` leaf each (QueryBuilder's
        graph phrase branch),
      * several alternatives -> an OR ``Bool`` over those leaves.

    Unmatched tokens stay plain ``Term`` leaves; multiple sites combine as
    SHOULD clauses (default-OR operator). Returns a query.py IR node ready
    for Searcher.topk_query."""
    from ..operators.query import Bool, Phrase, Synonym, Term

    sites: list = []
    i, n = 0, len(terms)
    while i < n:
        rule = None
        cands = rules.by_first.get(terms[i])
        if cands:
            for inp, outs in cands:
                L = len(inp)
                if i + L <= n and tuple(terms[i : i + L]) == inp:
                    rule = (inp, outs, L)
                    break
        if rule is None:
            sites.append(Term(terms[i]))
            i += 1
            continue
        inp, outs, L = rule
        singles = sorted({o[0] for o in outs if len(o) == 1})
        multis = [o for o in outs if len(o) > 1]
        parts: list = []
        if singles:
            parts.append(
                Synonym(tuple(singles)) if len(singles) > 1 else Term(singles[0])
            )
        parts.extend(Phrase(tuple(m)) for m in multis)
        if not parts:
            i += L
            continue
        sites.append(parts[0] if len(parts) == 1 else Bool(should=tuple(parts)))
        i += L
    if not sites:
        from ..operators.query import Bool as _B

        return _B()
    if len(sites) == 1:
        return sites[0]
    from ..operators.query import Bool as _B

    return _B(should=tuple(sites))


def parse_synonym_rules(lines: list[str], expand: bool = True) -> SynonymRules:
    """Solr synonyms.txt format. ``"a b => c"`` replaces input with outputs;
    ``"x, y z"`` is an equivalence set — with expand=True every member maps
    to ALL members (originals re-emitted via the output list), with
    expand=False every member maps to the first."""
    by_first: dict[str, list[tuple[tuple[str, ...], list[tuple[str, ...]]]]] = {}

    def add(inp: tuple[str, ...], outs: list[tuple[str, ...]]) -> None:
        if not inp:
            return
        by_first.setdefault(inp[0], []).append((inp, outs))

    for raw in lines:
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if "=>" in line:
            lhs, rhs = line.split("=>", 1)
            inputs = [tuple(p.split()) for p in lhs.split(",") if p.strip()]
            outputs = [tuple(p.split()) for p in rhs.split(",") if p.strip()]
            for inp in inputs:
                add(inp, outputs)
        else:
            members = [tuple(p.split()) for p in line.split(",") if p.strip()]
            if len(members) < 2:
                continue
            targets = members if expand else members[:1]
            for inp in members:
                add(inp, list(targets))
    for rules in by_first.values():
        rules.sort(key=lambda r: -len(r[0]))  # longest input wins
    return SynonymRules(by_first)


def apply_synonym_graph(
    tokens: list[str], rules: SynonymRules
) -> tuple[list[str], np.ndarray, np.ndarray]:
    """Token list -> graph edges (terms, starts, ends), sorted by start.

    Scan is greedy leftmost-longest (SynonymMap.Builder semantics); matched
    input tokens are consumed (replaced by the rule's outputs — originals
    survive only if the rule's output list contains the input sequence, as
    equivalence sets do under expand=true). An output sequence equal to the
    input re-uses the original boundary nodes; other outputs span
    (i -> i+L) with fresh intermediate nodes numbered above n so multi-token
    outputs keep internal adjacency without colliding with original
    positions."""
    n = len(tokens)
    if n >= FRESH_BASE:
        raise ValueError(
            f"doc has {n} tokens >= FRESH_BASE ({FRESH_BASE}); synonym-graph "
            "indexing caps per-doc positions (IndexWriter.MAX_POSITION analog)"
        )
    terms: list[str] = []
    starts: list[int] = []
    ends: list[int] = []
    i = 0
    while i < n:
        rule = None
        cands = rules.by_first.get(tokens[i])
        if cands:
            for inp, outs in cands:
                L = len(inp)
                if i + L <= n and tuple(tokens[i : i + L]) == inp:
                    rule = (inp, outs, L)
                    break
        if rule is None:
            terms.append(tokens[i])
            starts.append(i)
            ends.append(i + 1)
            i += 1
            continue
        inp, outs, L = rule
        out_idx = 0  # fresh-allocating outputs at this site
        for out in outs:
            if not out:
                continue
            if out == inp:
                # original path: keep boundary nodes i..i+L
                for j, t in enumerate(out):
                    terms.append(t)
                    starts.append(i + j)
                    ends.append(i + j + 1)
                continue
            m = len(out)
            if m > 1:
                if m - 1 > _CHAIN:
                    raise ValueError(
                        f"synonym output {out} longer than {_CHAIN + 1} tokens"
                    )
                if out_idx >= _OUT_SLOTS:
                    raise ValueError(
                        f"more than {_OUT_SLOTS} multi-token outputs at one site"
                    )
            prev = i
            for j, t in enumerate(out):
                if j == m - 1:
                    nxt = i + L
                else:
                    nxt = FRESH_BASE + (i * _OUT_SLOTS + out_idx) * _CHAIN + j
                terms.append(t)
                starts.append(prev)
                ends.append(nxt)
                prev = nxt
            if m > 1:
                out_idx += 1
        i += L
    s = np.asarray(starts, dtype=np.int64)
    e = np.asarray(ends, dtype=np.int64)
    order = np.argsort(s, kind="stable")
    return [terms[int(j)] for j in order], s[order], e[order]
