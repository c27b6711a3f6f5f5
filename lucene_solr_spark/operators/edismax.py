"""eDisMax query parser + scorer — the default user-facing Solr parser.

Reference surface being re-expressed (SURVEY.md §2.J "Query parser / DSL"):
  solr/core/.../search/ExtendedDismaxQParser.java — user query across qf
    fields (per-field boosts), mm (minimum-should-match spec), tie,
    phrase-field boosts pf/pf2/pf3, graceful bad-syntax fallback
  solr/core/.../util/SolrPluginUtils.java#calculateMinShouldMatch — the
    mm spec grammar (int / negative / percent / conditional "k<v" pairs)
  search/DisjunctionMaxQuery.java — per-term max over fields + tie·rest

Spark restatement: ONE per-bucket applyInPandas pass over the union of
the qf fields' posting blocks and the pf fields' positional postings
(every field segment shares the doc-space bucket grid, so the leaf sees
everything about a doc range with no shuffle join). Per-bucket top-k,
then a global TakeOrderedAndProject — the same scatter/gather shape as
the single-field scorer, so the plan scales with bucket count, not
corpus size.

Pinned scoring (float32 like the rest of the engine):
  clause list = the user query's term occurrences in sequence order
  (required '+' and optional bare terms score; '-' terms only gate);
  per clause: dmx_t = max_f s_{f,t} + tie · (sum_f s_{f,t} − max_f)
  with s_{f,t} = BM25(field stats) · qf_boost_f, fields reduced in
  sorted(qf) order; doc passes iff all required clauses hit, no
  prohibited clause hits, and ≥ mm optional clauses hit (mm computed
  from the spec against the optional-clause count; with no required
  clauses at least 1 optional must hit);
  score = f32 left fold of passing clause dmx values in clause order,
  then + each phrase-boost clause in (pf, pf2, pf3) order, fields in
  sorted order within each: p = f32(f32(idf_sum_f · tf_sat_f) · boost),
  where the phrase freq is exact adjacency over that field's positions
  (operators/phrase.py#bucket_phrase_freqs — the same kernel as
  PhraseQuery) and idf_sum/norms are that field's statistics.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.analysis import tokenize_text
from ..sources.catalog import Segment
from . import bm25
from .phrase import bucket_phrase_freqs, phrase_offsets
from .search import _decode_block

_TOPK_SCHEMA = "doc_id long, score float"


# ---------------------------------------------------------------------------
# Param parsing (ExtendedDismaxQParser front end)
# ---------------------------------------------------------------------------


def parse_field_boosts(spec: str) -> dict[str, float]:
    """qf/pf syntax: ``"title^2 body"`` -> {"title": 2.0, "body": 1.0}."""
    out: dict[str, float] = {}
    for part in (spec or "").split():
        if "^" in part:
            f, b = part.split("^", 1)
            out[f] = float(b)
        else:
            out[part] = 1.0
    return out


def calculate_mm(spec: str | int | None, n_optional: int) -> int:
    """SolrPluginUtils#calculateMinShouldMatch: int ("3"), negative
    ("-2" = all but 2), percent ("75%" floor), negative percent
    ("-25%" = all but floor(25%)), and conditional pairs
    ("2<-25% 9<3": if n > k apply v of the LARGEST matching k, else all
    required). Result clamped to [0, n_optional]."""
    n = n_optional
    if spec is None or spec == "":
        return 0
    spec = str(spec).strip()
    if "<" in spec:
        best_k, best_v = None, None
        for part in spec.split():
            k_s, v = part.split("<", 1)
            k = int(k_s)
            if n > k and (best_k is None or k > best_k):
                best_k, best_v = k, v
        if best_k is None:
            return n  # clause count at/below every k -> all required
        return calculate_mm(best_v, n)
    if spec.endswith("%"):
        pct = int(spec[:-1].lstrip("+-"))
        part = (n * pct) // 100
        val = n - part if spec.startswith("-") else part
    else:
        v = int(spec)
        val = n + v if v < 0 else v
    return max(0, min(n, val))


def parse_user_query(
    q: str,
) -> tuple[list[str], list[str], list[str], list[str]]:
    """User query -> (required, optional, prohibited, scoring-sequence)
    analyzed term lists. The first three are per-occur lists; the fourth
    is the scoring terms (required + optional) in USER QUERY ORDER — the
    sequence eDisMax builds pf phrases and the score fold from. Supports
    +term / -term / NOT / AND / OR (classic translation: AND marks both
    neighbors required). Anything else — quotes, parens, stray syntax —
    is ESCAPED, not rejected: edismax's documented fallback strips the
    special characters and treats the rest as plain terms."""
    req: list[str] = []
    opt: list[str] = []
    neg: list[str] = []
    seq: list[str] = []
    pending: str | None = None
    and_next = False
    slots: list[tuple[str, list[str]]] = []  # (occur, analyzed terms)
    for raw in (q or "").split():
        if raw in ("AND", "&&"):
            if slots and slots[-1][0] == "opt":
                slots[-1] = ("req", slots[-1][1])
            and_next = True
            continue
        if raw in ("OR", "||"):
            and_next = False
            continue
        if raw == "NOT":
            pending = "neg"
            continue
        occ = pending or ("req" if and_next else "opt")
        pending, and_next = None, False
        body = raw
        if body.startswith("+"):
            occ, body = "req", body[1:]
        elif body.startswith("-"):
            occ, body = "neg", body[1:]
        # graceful fallback: strip query-syntax characters, analyze the rest
        body = re.sub(r'["()\[\]{}^~:*?]', " ", body)
        terms = tokenize_text(body)
        if terms:
            slots.append((occ, terms))
    for occ, terms in slots:
        {"req": req, "opt": opt, "neg": neg}[occ].extend(terms)
        if occ != "neg":
            seq.extend(terms)
    return req, opt, neg, seq


def _shingles(seq: list[str], size: int) -> list[list[str]]:
    if size <= 0 or len(seq) < size:
        return []
    if size >= len(seq):
        return [list(seq)]
    return [list(seq[i : i + size]) for i in range(len(seq) - size + 1)]


# ---------------------------------------------------------------------------
# Scorer
# ---------------------------------------------------------------------------


def edismax_topk(
    spark: SparkSession,
    segments: dict[str, Segment],
    params: dict,
    k: int = 10,
) -> DataFrame:
    """Top-k for an edismax request. ``params`` keys: q (user query),
    qf ("field^boost ..."), optional pf / pf2 / pf3, tie (float), mm
    (min-should-match spec). Every field's segment must share the corpus
    doc-id assignment and bucket_docs (asserted); pf fields need
    positional postings."""
    qf = parse_field_boosts(params.get("qf", ""))
    fields = sorted(qf)
    assert fields and all(f in segments for f in fields), "qf field missing a segment"
    bd = {segments[f].stats.bucket_docs for f in fields}
    assert len(bd) == 1, f"segments disagree on bucket_docs: {bd}"
    tie32 = np.float32(float(params.get("tie", 0.0)))

    # clause_seq: the scoring clauses in USER QUERY ORDER (required and
    # optional interleaved as typed — the order eDisMax scores in and
    # builds pf phrases from)
    req, opt, neg, clause_seq = parse_user_query(params.get("q", ""))
    if not clause_seq:
        return spark.createDataFrame([], _TOPK_SCHEMA)
    mm_eff = calculate_mm(params.get("mm"), len(opt))
    if not req and opt:
        mm_eff = max(mm_eff, 1)  # BooleanQuery: some SHOULD must match

    # phrase-boost clauses: (field, terms, boost, slop) in pinned order;
    # ps/ps2/ps3 set the slop of the corresponding phrase tier (edismax's
    # phrase-slop params — SloppyPhraseMatcher semantics, fractional freq)
    phrase_terms = clause_seq  # pf phrases follow the user's term order
    pclauses: list[tuple[str, list[str], np.float32, int]] = []
    for key, size, ps_key in (("pf", 0, "ps"), ("pf2", 2, "ps2"), ("pf3", 3, "ps3")):
        spec = params.get(key)
        if not spec:
            continue
        slop = int(params.get(ps_key, params.get("ps", 0)) or 0)
        seqs = (
            [phrase_terms] if size == 0 else _shingles(phrase_terms, size)
        )
        seqs = [s for s in seqs if len(s) >= 2]
        for f, b in sorted(parse_field_boosts(spec).items()):
            assert f in segments, f"{key} field {f!r} missing a segment"
            assert segments[f].has_table("positions"), (
                f"{key} field {f!r} was built without positions"
            )
            for seq in seqs:
                pclauses.append((f, seq, np.float32(b), slop))

    # ---- driver-side stats pre-pass (Weight analog): ONE terms-dict
    # collect per involved field, shared by the clause idfs AND the
    # phrase-boost idf sums -------------------------------------------------
    all_terms = sorted(set(clause_seq) | set(neg))
    pf_fields = sorted({f for f, _s, _b, _sl in pclauses})
    idfs: dict[tuple[str, str], np.float32] = {}
    raw_df: dict[tuple[str, str], int] = {}
    caches: dict[str, np.ndarray] = {}
    for f in sorted(set(fields) | set(pf_fields)):
        seg = segments[f]
        caches[f] = bm25.norm_cache(seg.stats.avgdl)
        rows = (
            seg.table(spark, "terms")
            .filter(F.col("term").isin(all_terms))
            .select("term", "df")
            .collect()
        )
        for r in rows:
            raw_df[(f, r["term"])] = int(r["df"])
            if f in qf:
                idfs[(f, r["term"])] = np.float32(
                    bm25.idf(seg.stats.n_docs, int(r["df"]))
                )
    # phrase idf sums per (field, phrase): f64 sum of present terms, one
    # f32 cast (PhraseWeight / BM25Similarity#idfExplain discipline)
    pidf: list[np.float32] = []
    for f, seq, _b, _sl in pclauses:
        if any((f, t) not in raw_df for t in seq):
            pidf.append(None)  # a phrase term absent from the field
        else:
            n_docs_f = segments[f].stats.n_docs
            pidf.append(
                np.float32(
                    sum(bm25.idf(n_docs_f, raw_df[(f, t)]) for t in seq)
                )
            )
    boosts = {f: np.float32(qf[f]) for f in fields}
    hit_any = {t for (_f, t) in idfs}
    if any(t not in hit_any for t in req):
        return spark.createDataFrame([], _TOPK_SCHEMA)
    matched_terms = sorted({t for t in all_terms if t in hit_any})

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        post = pdf[pdf["kind"] == 0]
        empty = pd.DataFrame(
            {"doc_id": np.array([], dtype=np.int64),
             "score": np.array([], dtype=np.float32)}
        )
        if len(post) == 0:
            return empty
        base = int(post["first_doc"].min())
        span = int(post["last_doc"].max()) - base + 1
        per: dict[tuple[str, str], tuple[np.ndarray, np.ndarray]] = {}
        for (f, t), g in post.groupby(["field", "term"], sort=False):
            sarr = np.zeros(span, dtype=np.float32)
            marr = np.zeros(span, dtype=bool)
            for row in g.itertuples():
                ids, freqs, norms = _decode_block(row)
                rel = ids - base
                sarr[rel] = bm25.score_block(
                    freqs, norms, idfs[(f, t)], caches[f]
                )
                marr[rel] = True
            per[(f, t)] = ((sarr * boosts[f]).astype(np.float32), marr)

        # per-term dismax combine (sorted field order, pinned f32)
        dmx: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for t in matched_terms:
            fs = [per[(f, t)] for f in fields if (f, t) in per]
            if not fs:
                continue
            if len(fs) == 1:
                dmx[t] = fs[0]
                continue
            stack = np.stack([sv for sv, _ in fs])
            mx = stack.max(axis=0)
            sm = np.zeros_like(mx)
            for sv, _ in fs:  # sequential in field order (pinned float32)
                sm += sv
            dmx[t] = (
                (mx + tie32 * (sm - mx)).astype(np.float32),
                np.logical_or.reduce([mv for _, mv in fs]),
            )

        # clause gate: req all hit, neg none hit, >= mm_eff of opt hit
        ok = np.ones(span, dtype=bool)
        for t in req:
            ok &= dmx[t][1] if t in dmx else False
        if neg:
            bad = np.zeros(span, dtype=bool)
            for t in neg:
                if t in dmx:
                    bad |= dmx[t][1]
            ok &= ~bad
        if opt:
            nm = np.zeros(span, dtype=np.int32)
            for t in opt:  # each optional clause occurrence counts
                if t in dmx:
                    nm += dmx[t][1]
            ok &= nm >= mm_eff
        if not ok.any():
            return empty

        # f32 left fold over scoring clauses in clause order
        acc = np.zeros(span, dtype=np.float32)
        for t in clause_seq:
            if t in dmx:
                acc += dmx[t][0]

        # phrase boosts ride the SAME bucket (positions rows, kind == 1)
        pos = pdf[pdf["kind"] == 1]
        for ci, (f, seq, b, slop) in enumerate(pclauses):
            if pidf[ci] is None:
                continue
            sub = pos[(pos["field"] == f) & (pos["term"].isin(set(seq)))]
            if len(sub) == 0:
                continue
            ids, freqs, norms = bucket_phrase_freqs(
                sub, phrase_offsets(seq), slop
            )
            if ids.size == 0:
                continue
            fr = freqs.astype(np.float32)
            p = (pidf[ci] * (fr / (fr + caches[f][norms]))).astype(np.float32)
            rel = ids - base
            # a pf-only field can carry docs outside the qf postings span
            # of this bucket; those can't pass the clause gate anyway
            inb = (rel >= 0) & (rel < span)
            add = np.zeros(span, dtype=np.float32)
            add[rel[inb]] = (p[inb] * b).astype(np.float32)
            acc += add

        nz = np.nonzero(ok & (acc != 0))[0]
        if nz.size == 0:
            # mm can pass with zero-score docs (all-stopword edge); keep
            # the matched set faithful anyway
            nz = np.nonzero(ok)[0]
            if nz.size == 0:
                return empty
        scores = acc[nz]
        order = np.lexsort((nz, -scores))[: min(k, nz.size)]
        return pd.DataFrame(
            {"doc_id": (nz[order] + base).astype(np.int64),
             "score": scores[order]}
        )

    # ---- one union frame: posting blocks + pf positional rows -------------
    null_bin = F.lit(None).cast("binary")
    parts = []
    for f in fields:
        parts.append(
            segments[f]
            .table(spark, "postings")
            .filter(F.col("term").isin(matched_terms))
            .select(
                F.lit(0).alias("kind"),
                F.lit(f).alias("field"),
                "term", "bucket", "first_doc", "last_doc",
                "doc_bin", "freq_bin", "norm_bin",
                F.lit(None).cast("long").alias("doc_id"),
                F.lit(None).cast("int").alias("norm_byte"),
                null_bin.alias("pos_bin"),
                null_bin.alias("end_bin"),
            )
        )
    for f in sorted({f for f, _s, _b, _sl in pclauses}):
        ptbl = segments[f].table(spark, "positions")
        pterms = sorted(
            {t for pf_f, seq, _b, _sl in pclauses if pf_f == f for t in seq}
        )
        has_end = "end_bin" in ptbl.columns
        parts.append(
            ptbl.filter(F.col("term").isin(pterms)).select(
                F.lit(1).alias("kind"),
                F.lit(f).alias("field"),
                "term", "bucket",
                F.lit(None).cast("long").alias("first_doc"),
                F.lit(None).cast("long").alias("last_doc"),
                null_bin.alias("doc_bin"),
                null_bin.alias("freq_bin"),
                null_bin.alias("norm_bin"),
                "doc_id",
                F.col("norm_byte").cast("int").alias("norm_byte"),
                "pos_bin",
                (F.col("end_bin") if has_end else null_bin).alias("end_bin"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    per_bucket = u.groupBy("bucket").applyInPandas(score_bucket, _TOPK_SCHEMA)
    return per_bucket.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
