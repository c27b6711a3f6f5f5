"""Pure-Python scalar BM25 oracle — the pinned Lucene-semantics stand-in.

/root/reference was empty and no Lucene binary exists in the sandbox
(SURVEY.md provenance note), so this oracle IS the executable ground truth
for rank-identity (BASELINE.json#north_star). It is deliberately scalar and
independent of the engine's vectorized code paths: its own ``re`` tokenizer,
its own scalar SmallFloat, per-doc Python loops. pytest asserts the Spark
engine is rank- and float32-score-identical to it.

Semantics pinned per SURVEY.md §4.3 / FIXTURES.md §4-5:
- tokenizer spec v1 (NFC, \\w runs, snake/camel/digit splits, lowercase)
- BM25: idf = ln(1+(N-df+0.5)/(df+0.5)); tf_part = f/(f+k1*(1-b+b*dl/avgdl));
  k1=1.2 b=0.75; NO (k1+1) numerator (Lucene 8, LUCENE-8563)
- dl byte4-quantized via SmallFloat intToByte4/byte4ToInt; the denominator
  addend precomputed float32 per the 256-entry cache
- float32 scores, lexicographic term summation order
- tie-break: score desc, doc_id asc
"""

from __future__ import annotations

import math
import re
import unicodedata
from collections import Counter

import numpy as np

K1 = 1.2
B = 0.75

_WORD_SPLIT = re.compile(r"\W+")
_RULES = [
    (re.compile(r"_"), " "),
    (re.compile(r"([A-Z]+)([A-Z][a-z])"), r"\1 \2"),
    (re.compile(r"([a-z])([A-Z])"), r"\1 \2"),
    (re.compile(r"([A-Za-z])([0-9])"), r"\1 \2"),
    (re.compile(r"([0-9])([A-Za-z])"), r"\1 \2"),
]


def tokenize(text: str) -> list[str]:
    s = unicodedata.normalize("NFC", text or "")
    s = _WORD_SPLIT.sub(" ", s)
    for pat, rep in _RULES:
        s = pat.sub(rep, s)
    return [t for t in s.lower().split() if t]


def int_to_int4(i: int) -> int:
    if i < 8:
        return i
    shift = i.bit_length() - 4
    return ((shift + 1) << 3) | ((i >> shift) & 7)


def int4_to_int(i: int) -> int:
    if i < 8:
        return i
    return ((i & 7) | 8) << ((i >> 3) - 1)


def int_to_byte4(i: int) -> int:
    return i if i < 24 else 24 + int_to_int4(i - 24)


def byte4_to_int(b: int) -> int:
    return b if b < 24 else 24 + int4_to_int(b - 24)


class OracleIndex:
    """Scalar inverted index + BM25 top-k over (doc_id, text) pairs."""

    def __init__(self, docs: list[tuple[int, str]]):
        self.tf: dict[str, dict[int, int]] = {}
        self.norm_byte: dict[int, int] = {}
        self.tokens: dict[int, list[str]] = {}
        sum_ttf = 0
        n_docs = 0
        for doc_id, text in docs:
            toks = tokenize(text)
            self.tokens[doc_id] = toks
            n_docs += 1  # every doc has the field (possibly empty), like docCount
            sum_ttf += len(toks)
            self.norm_byte[doc_id] = int_to_byte4(len(toks))
            for t, f in Counter(toks).items():
                self.tf.setdefault(t, {})[doc_id] = f
        self.N = n_docs
        self.avgdl = sum_ttf / n_docs if n_docs else 0.0
        # 256-entry float32 denominator-addend cache
        self.cache = np.array(
            [
                np.float32(K1)
                * (
                    np.float32(1 - B)
                    + np.float32(B)
                    * np.float32(byte4_to_int(bb))
                    / np.float32(self.avgdl or 1.0)
                )
                for bb in range(256)
            ],
            dtype=np.float32,
        )

    def idf(self, term: str) -> float:
        df = len(self.tf.get(term, {}))
        return math.log(1.0 + (self.N - df + 0.5) / (df + 0.5))

    def score_disjunction(self, query_text: str) -> dict[int, np.float32]:
        """Sum-of-BM25 over unique query terms, lexicographic term order."""
        terms = sorted(set(tokenize(query_text)))
        scores: dict[int, np.float32] = {}
        for t in terms:
            postings = self.tf.get(t)
            if not postings:
                continue
            idf_t = np.float32(self.idf(t))
            for doc_id, f in postings.items():
                add = self.cache[self.norm_byte[doc_id]]
                s = np.float32(idf_t * (np.float32(f) / (np.float32(f) + add)))
                scores[doc_id] = np.float32(scores.get(doc_id, np.float32(0.0)) + s)
        return scores

    def topk(self, query_text: str, k: int = 10) -> list[tuple[int, float]]:
        scores = self.score_disjunction(query_text)
        ranked = sorted(scores.items(), key=lambda kv: (-float(kv[1]), kv[0]))
        return [(d, float(s)) for d, s in ranked[:k]]

    def topk_phrase(
        self, phrase_text: str, k: int = 10, slop: int = 0
    ) -> list[tuple[int, float]]:
        """Phrase BM25 (PhraseQuery analog): freq = number of phrase
        occurrences (slop=0 exact; slop>0 fractional sloppy freq via the
        classic SloppyPhraseScorer greedy walk, no repeats), idf = sum over
        phrase positions (duplicates counted), same float32 norm-cache
        tf_part as single terms."""
        seq = tokenize(phrase_text)
        if not seq:
            return []
        idf_sum = np.float32(sum(self.idf(t) for t in seq))
        n = len(seq)
        out = []
        for doc_id, toks in self.tokens.items():
            if slop == 0:
                freq = sum(
                    1 for i in range(len(toks) - n + 1) if toks[i : i + n] == seq
                )
            else:
                freq = self._sloppy_freq_doc(toks, seq, slop)
            if not freq:
                continue
            add = self.cache[self.norm_byte[doc_id]]
            s = np.float32(
                idf_sum * (np.float32(freq) / (np.float32(freq) + add))
            )
            out.append((doc_id, float(s)))
        out.sort(key=lambda kv: (-kv[1], kv[0]))
        return out[:k]

    def topk_multi_phrase(self, slots: list, k: int = 10) -> list[tuple[int, float]]:
        """MultiPhraseQuery analog: slot i accepts any member of slots[i]
        (exact adjacency); freq = number of starts where every slot is
        satisfied; idf = sum over PRESENT (slot, member) terms."""
        slots = [tuple(s) for s in slots]
        if not slots or any(not s for s in slots):
            return []
        if any(all(t not in self.tf for t in s) for s in slots):
            return []
        idf_sum = np.float32(
            sum(self.idf(t) for s in slots for t in s if t in self.tf)
        )
        n = len(slots)
        out = []
        for doc_id, toks in self.tokens.items():
            freq = sum(
                1
                for i in range(len(toks) - n + 1)
                if all(toks[i + j] in slots[j] for j in range(n))
            )
            if not freq:
                continue
            add = self.cache[self.norm_byte[doc_id]]
            s = np.float32(idf_sum * (np.float32(freq) / (np.float32(freq) + add)))
            out.append((doc_id, float(s)))
        out.sort(key=lambda kv: (-kv[1], kv[0]))
        return out[:k]

    @staticmethod
    def _sloppy_freq_doc(toks: list[str], seq: list[str], slop: int) -> float:
        """Scalar SloppyPhraseScorer#phraseFreq walk incl. repeat groups:
        one leg per phrase position over RAW token positions; legs of the
        same term must occupy distinct raw positions (init claims in
        offset order; an advancing leg skips positions held by siblings).
        The walk advances the minimum adjusted position; when it passes
        the runner-up, a candidate match ends with matchLength = end -
        min; matches with matchLength <= slop add 1/(1+matchLength)."""
        n = len(seq)
        raw_legs = [[p for p, t in enumerate(toks) if t == term] for term in seq]
        if any(not leg for leg in raw_legs):
            return 0.0
        if n == 1:
            return float(len(raw_legs[0]))
        by_term: dict[str, list[int]] = {}
        for i, t in enumerate(seq):
            by_term.setdefault(t, []).append(i)
        groups = [g for g in by_term.values() if len(g) > 1]
        group_of = {i: tuple(j for j in g if j != i) for g in groups for i in g}
        idx = [0] * n
        for g in groups:  # init: lower-offset legs keep their positions
            used: set[int] = set()
            for i in g:
                while idx[i] < len(raw_legs[i]) and raw_legs[i][idx[i]] in used:
                    idx[i] += 1
                if idx[i] >= len(raw_legs[i]):
                    return 0.0
                used.add(raw_legs[i][idx[i]])

        def advance(i: int) -> bool:
            others = {raw_legs[j][idx[j]] for j in group_of.get(i, ())}
            idx[i] += 1
            while idx[i] < len(raw_legs[i]) and raw_legs[i][idx[i]] in others:
                idx[i] += 1
            return idx[i] < len(raw_legs[i])

        import heapq as _hq

        heap = [(raw_legs[i][idx[i]] - i, i) for i in range(n)]
        _hq.heapify(heap)
        end = max(p for p, _ in heap)
        freq = 0.0
        pos, leg_i = _hq.heappop(heap)
        match_length = end - pos
        while True:
            if not advance(leg_i):
                break
            pos = raw_legs[leg_i][idx[leg_i]] - leg_i
            end = max(end, pos)
            nxt = heap[0][0]
            if pos > nxt:
                if match_length <= slop:
                    freq += 1.0 / (1.0 + match_length)
                _hq.heappush(heap, (pos, leg_i))
                pos, leg_i = _hq.heappop(heap)
                match_length = end - pos
            else:
                ml = end - pos
                if ml < match_length:
                    match_length = ml
        if match_length <= slop:
            freq += 1.0 / (1.0 + match_length)
        return freq

    # -- Boolean query tree (scalar mirror of operators/query.py) -----------
    # Shares only the IR dataclasses (Term/Bool) with the engine; the
    # evaluation below is an independent per-doc Python recursion with the
    # pinned float32 accumulation contract (MUST clauses in list order, then
    # SHOULD clauses in list order, boost multiply after).

    def _term_scores(self, term: str, boost: float) -> tuple[set, dict]:
        postings = self.tf.get(term, {})
        idf_t = np.float32(self.idf(term))
        scores = {}
        for doc_id, f in postings.items():
            add = self.cache[self.norm_byte[doc_id]]
            s = np.float32(idf_t * (np.float32(f) / (np.float32(f) + add)))
            if boost != 1.0:
                s = np.float32(s * np.float32(boost))
            scores[doc_id] = s
        return set(postings), scores

    def _phrase_scores(self, node) -> tuple[set, dict]:
        """Phrase clause inside a Boolean tree: scored like a pseudo-term
        (freq = exact/sloppy phrase occurrences, idf = sum over phrase
        positions), boost applied after — mirrors operators/query.py
        eval_node's Phrase branch."""
        seq = list(node.terms)
        if not seq:
            return set(), {}
        idf_sum = np.float32(sum(self.idf(t) for t in seq))
        n = len(seq)
        scores: dict = {}
        for doc_id, toks in self.tokens.items():
            if node.slop == 0:
                freq = sum(
                    1 for i in range(len(toks) - n + 1) if toks[i : i + n] == seq
                )
            else:
                freq = self._sloppy_freq_doc(toks, seq, node.slop)
            if not freq:
                continue
            add = self.cache[self.norm_byte[doc_id]]
            s = np.float32(idf_sum * (np.float32(freq) / (np.float32(freq) + add)))
            if node.boost != 1.0:
                s = np.float32(s * np.float32(node.boost))
            scores[doc_id] = s
        return set(scores), scores

    def _synonym_scores(self, node) -> tuple[set, dict]:
        """Synonym clause (SynonymQuery.java): freq = SUM of member tfs in
        the doc, idf from the blended df = MAX over members — one tf
        saturation, mirroring eval_node's Synonym branch."""
        members = sorted(set(node.terms))
        present = [t for t in members if self.tf.get(t)]
        if not present:
            return set(), {}
        df_blend = max(len(self.tf[t]) for t in present)
        idf_b = np.float32(
            math.log(1.0 + (self.N - df_blend + 0.5) / (df_blend + 0.5))
        )
        fsum: dict[int, int] = {}
        for t in present:
            for doc_id, f in self.tf[t].items():
                fsum[doc_id] = fsum.get(doc_id, 0) + f
        scores = {}
        for doc_id, f in fsum.items():
            add = self.cache[self.norm_byte[doc_id]]
            s = np.float32(idf_b * (np.float32(f) / (np.float32(f) + add)))
            if node.boost != 1.0:
                s = np.float32(s * np.float32(node.boost))
            scores[doc_id] = s
        return set(scores), scores

    def eval_bool(self, node) -> tuple[set, dict]:
        """Returns (matching doc_ids, {doc_id: float32 score})."""
        from lucene_solr_spark.operators.query import (
            Bool,
            DisMax,
            Phrase,
            Synonym,
            Term,
        )

        if isinstance(node, Term):
            return self._term_scores(node.term, node.boost)
        if isinstance(node, Phrase):
            return self._phrase_scores(node)
        if isinstance(node, Synonym):
            return self._synonym_scores(node)
        if isinstance(node, DisMax):
            res = [self.eval_bool(c) for c in node.clauses]
            cand = set()
            for m, _ in res:
                cand |= m
            out = {}
            for d in sorted(cand):
                vals = [
                    s[d] if d in m else np.float32(0.0) for m, s in res
                ]
                best = max(vals, key=float) if vals else np.float32(0.0)
                total = np.float32(0.0)
                for v in vals:  # f32 left fold in clause order
                    total = np.float32(total + v)
                if node.tie == 0.0:
                    acc = best
                else:
                    rest = np.float32(total - best)
                    rest = np.float32(rest * np.float32(node.tie))
                    acc = np.float32(best + rest)
                if node.boost != 1.0:
                    acc = np.float32(acc * np.float32(node.boost))
                out[d] = acc
            return cand, out
        assert isinstance(node, Bool)
        if not (node.must or node.should or node.filter):
            return set(), {}
        must_res = [self.eval_bool(c) for c in node.must]
        should_res = [self.eval_bool(c) for c in node.should]

        if node.must:
            cand = set.intersection(*(m for m, _ in must_res))
        elif node.filter:
            cand = None  # determined by filter below
        else:
            cand = None
        for c in node.filter:
            m, _ = self.eval_bool(c)
            cand = m if cand is None else (cand & m)
        if cand is None:  # pure-should node: candidates from should matches
            cand = set()
            for m, _ in should_res:
                cand |= m
        for c in node.must_not:
            m, _ = self.eval_bool(c)
            cand -= m

        msm = node.min_should_match
        if not (node.must or node.filter):
            msm = max(1, msm)
        if msm > 0 and node.should:
            cand = {
                d for d in cand
                if sum(1 for m, _ in should_res if d in m) >= msm
            }
        elif not node.should:
            pass

        out = {}
        for d in sorted(cand):
            acc = np.float32(0.0)
            for m, s in must_res:
                acc = np.float32(acc + s.get(d, np.float32(0.0)))
            for m, s in should_res:
                if d in m:
                    acc = np.float32(acc + s[d])
            if node.boost != 1.0:
                acc = np.float32(acc * np.float32(node.boost))
            out[d] = acc
        return cand, out

    def topk_bool(self, node, k: int = 10) -> list[tuple[int, float]]:
        _, scores = self.eval_bool(node)
        ranked = sorted(scores.items(), key=lambda kv: (-float(kv[1]), kv[0]))
        return [(d, float(s)) for d, s in ranked[:k]]

    def topk_conjunction(self, query_text: str, k: int = 10) -> list[tuple[int, float]]:
        """AND semantics: only docs containing ALL query terms."""
        terms = sorted(set(tokenize(query_text)))
        if not terms:
            return []
        doc_sets = [set(self.tf.get(t, {})) for t in terms]
        docs = set.intersection(*doc_sets) if doc_sets else set()
        scores = self.score_disjunction(query_text)
        ranked = sorted(
            ((d, scores[d]) for d in docs), key=lambda kv: (-float(kv[1]), kv[0])
        )
        return [(d, float(s)) for d, s in ranked[:k]]
