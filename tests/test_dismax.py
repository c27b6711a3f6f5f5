"""DisMax multi-field scoring (DisjunctionMaxQuery / Solr dismax qf+tie)
— engine per-bucket kernel over per-field segments vs a scalar oracle.

Two fields derived from the same synth corpus: ``body`` = full content,
``title`` = the first 8 tokens (heavy term overlap, so the tie-breaker
formula is actually exercised)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.corpus import synth_corpus
from lucene_solr_spark.operators.dismax import dismax_topk
from lucene_solr_spark.operators.indexer import assign_doc_ids, build_index

from .oracle import OracleIndex, tokenize

N_DOCS = 150
TITLE_TOKENS = 8


@pytest.fixture(scope="module")
def corpus(spark):
    c = synth_corpus(spark, N_DOCS, partitions=4)
    return assign_doc_ids(c, ["repo", "path", "commit"]).persist()


def _title_content(content: str) -> str:
    return " ".join(tokenize(content)[:TITLE_TOKENS])


@pytest.fixture(scope="module")
def segments(spark, corpus):
    body = build_index(spark, corpus, out_dir=None, bucket_docs=64)
    # title = first TITLE_TOKENS analyzed tokens; built via a driver-side
    # mapping to reuse the EXACT pinned tokenizer (fixture-only, tiny)
    rows = corpus.select(
        "doc_id", "repo", "path", "commit", "lang", "content"
    ).collect()
    tdf = spark.createDataFrame(
        [
            (r["doc_id"], r["repo"], r["path"], r["commit"], r["lang"],
             _title_content(r["content"]))
            for r in rows
        ],
        "doc_id long, repo string, path string, commit string, lang string, content string",
    )
    title = build_index(spark, tdf, out_dir=None, bucket_docs=64)
    return {"body": body, "title": title}


@pytest.fixture(scope="module")
def oracles(corpus):
    rows = corpus.select("doc_id", "content").collect()
    body = OracleIndex([(int(r["doc_id"]), r["content"]) for r in rows])
    title = OracleIndex(
        [(int(r["doc_id"]), _title_content(r["content"])) for r in rows]
    )
    return {"body": body, "title": title}


def oracle_dismax(oras, query: str, qf: dict, tie: float, k: int):
    """Scalar mirror of operators/dismax.py: float32, field order =
    sorted(qf), term order lexicographic."""
    terms = sorted(set(tokenize(query)))
    fields = sorted(qf)
    tie32 = np.float32(tie)
    per_field_scores = {
        f: {t: oras[f]._term_scores(t, 1.0)[1] for t in terms} for f in fields
    }
    docs = set()
    for f in fields:
        for t in terms:
            docs |= set(per_field_scores[f][t])
    out = []
    for d in sorted(docs):
        acc = np.float32(0.0)
        hit = False
        for t in terms:
            vals = []
            present = False
            for f in fields:
                s = per_field_scores[f][t].get(d)
                if s is None:
                    s = np.float32(0.0)
                else:
                    present = True
                vals.append(np.float32(s * np.float32(qf[f])))
            if not present:
                continue
            hit = True
            mx = max(vals)
            sm = np.float32(0.0)
            for v in vals:  # field order, float32 pairwise — engine's np.sum
                sm = np.float32(sm + v)
            dmx = np.float32(mx + np.float32(tie32 * np.float32(sm - mx)))
            acc = np.float32(acc + dmx)
        if hit:
            out.append((d, float(acc)))
    out.sort(key=lambda kv: (-kv[1], kv[0]))
    return out[:k]


CASES = [
    ("import return", {"body": 1.0, "title": 2.0}, 0.3),
    ("import", {"body": 1.0, "title": 3.0}, 0.0),
    ("def public self", {"body": 0.5, "title": 1.5}, 1.0),
    ("import zzzunknown", {"body": 1.0, "title": 1.0}, 0.5),
    ("return", {"body": 1.0}, 0.0),  # single field degenerates to plain BM25
]


@pytest.mark.parametrize("q,qf,tie", CASES)
def test_dismax_matches_oracle(spark, segments, oracles, q, qf, tie):
    got = [
        (int(r["doc_id"]), np.float32(r["score"]))
        for r in dismax_topk(spark, segments, q, qf, tie=tie, k=10).collect()
    ]
    want = [(d, np.float32(s)) for d, s in oracle_dismax(oracles, q, qf, tie, 10)]
    assert got == want, f"{q!r} qf={qf} tie={tie}: {got[:3]} vs {want[:3]}"
    assert got, f"vacuous dismax case {q!r}"


def test_tie_monotone(spark, segments):
    """tie=1 (sum over fields) must score >= tie=0 (pure max) per doc."""
    a = {
        int(r["doc_id"]): r["score"]
        for r in dismax_topk(
            spark, segments, "import return", {"body": 1.0, "title": 1.0}, tie=0.0, k=200
        ).collect()
    }
    b = {
        int(r["doc_id"]): r["score"]
        for r in dismax_topk(
            spark, segments, "import return", {"body": 1.0, "title": 1.0}, tie=1.0, k=200
        ).collect()
    }
    assert set(a) == set(b) and a
    assert all(b[d] >= a[d] - 1e-6 for d in a)
