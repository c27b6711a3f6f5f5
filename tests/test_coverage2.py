"""Session-5 coverage extras: payload scoring pinned to the engine's packed
positions table, and the Soundex-variant chain pinned to a plain-Python
reference implementation."""

from __future__ import annotations

import re

import numpy as np
from pyspark.sql import functions as F

from lucene_solr_spark.corpus import documents_as_corpus
from lucene_solr_spark.functions.analysis import tokenize_text
from lucene_solr_spark.functions.packing import delta_decode, unpack_ints
from lucene_solr_spark.operators.indexer import build_index
from lucene_solr_spark.plans import coverage2_queries as c2

from .conftest import SF_DIR

TERM = "spark"


def test_payload_score_matches_engine_positions(spark):
    """The payload_score_topk row (array fold over tokens) must equal the
    same sum computed from the engine's .pos-file analog: delta+FOR packed
    positions decoded per (term, doc)."""
    seg = build_index(
        spark, documents_as_corpus(spark, SF_DIR), out_dir=None, with_positions=True
    )
    rows = (
        seg.table(spark, "positions")
        .filter(F.col("term") == TERM)
        .select("doc_id", "pos_bin")
        .collect()
    )
    engine = {}
    for r in rows:
        pos = delta_decode(unpack_ints(r["pos_bin"])).astype(np.int64)
        engine[r["doc_id"]] = round(float(np.sum(1000.0 / (1.0 + pos))), 6)
    assert engine, "probe term missing from positions table"

    top = {
        r["doc_id"]: r["payload_score"]
        for r in c2.payload_score_topk(spark, SF_DIR).collect()
    }
    assert top
    for doc_id, score in top.items():
        assert engine[doc_id] == score, (doc_id, engine[doc_id], score)


def _soundex_ref(term: str) -> str:
    rest = term[1:]
    rest = "".join(ch for ch in rest if ch not in c2._SOUNDEX_DROP)
    tr = str.maketrans(c2._SOUNDEX_FROM, c2._SOUNDEX_TO)
    digits = rest.translate(tr)
    digits = re.sub(r"(\d)\1+", r"\1", digits)
    return term[0].upper() + (digits[:3].ljust(3, "0"))


def test_soundex_chain_matches_reference(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50).collect()
    vocab = sorted(
        {
            t
            for r in docs
            for t in tokenize_text(r["text"])
            if re.fullmatch(r"[a-z]+", t)
        }
    )
    assert vocab
    sdf = spark.createDataFrame([(t,) for t in vocab], "term string").select(
        "term", c2._soundex_col("term").alias("code")
    )
    got = {r["term"]: r["code"] for r in sdf.collect()}
    for t in vocab:
        assert got[t] == _soundex_ref(t), (t, got[t], _soundex_ref(t))
