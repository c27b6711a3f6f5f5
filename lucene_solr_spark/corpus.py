"""Deterministic synthetic source-code corpus + adapters (seed=42, no wall-clock).

Produces the production input shape from BASELINE.json#input_hint:
``(repo:string, path:string, commit:string, lang:string, content:string)``
plus ``content_sha256`` stamped at ingest (the per-row invariant asserted
through the pipeline). Token distribution is Zipf(alpha=1.2) over a ~20k-term
vocabulary with forced hot tokens (``import``, ``return``, ``def``,
``public``, ``self``) so term-frequency skew per north_star is exercised.

Generation is per-row deterministic (rng keyed by (seed, row id)), so any
partitioning / parallelism yields byte-identical rows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
VOCAB_SIZE = 20_000
HOT_TOKENS = ["import", "return", "def", "public", "self"]
_LANGS = ["python", "java", "go", "js", "c"]
_LANG_W = [0.35, 0.25, 0.15, 0.15, 0.10]
_EXT = {"python": "py", "java": "java", "go": "go", "js": "js", "c": "c"}


def _vocab() -> list[str]:
    rng = np.random.default_rng(SEED)
    syll = ["get", "set", "map", "list", "node", "util", "parse", "index",
            "term", "query", "doc", "read", "write", "hash", "merge", "scan",
            "sort", "file", "path", "key", "val", "buf", "ctx", "cfg", "io"]
    words = []
    for i in range(VOCAB_SIZE):
        k = rng.integers(1, 4)
        w = "".join(rng.choice(syll) for _ in range(k)) + (str(i % 97) if rng.random() < 0.15 else "")
        words.append(w)
    return words


_VOCAB = _vocab()
_ZIPF_P = (1.0 / np.arange(1, VOCAB_SIZE + 1) ** 1.2)
_ZIPF_P /= _ZIPF_P.sum()


def _gen_rows(ids: np.ndarray) -> pd.DataFrame:
    rows = []
    for i in ids:
        rng = np.random.default_rng([SEED, int(i)])
        n_tok = int(rng.integers(20, 401))
        toks = list(np.array(_VOCAB)[rng.choice(VOCAB_SIZE, size=n_tok, p=_ZIPF_P)])
        # hot tokens in a large fraction of docs (skew per north_star)
        for h, p in zip(HOT_TOKENS, [0.7, 0.65, 0.5, 0.35, 0.3]):
            if rng.random() < p:
                k = int(rng.integers(1, 6))
                pos = rng.integers(0, len(toks), size=k)
                for q in pos:
                    toks[int(q)] = h
        lang = _LANGS[int(rng.choice(len(_LANGS), p=_LANG_W))]
        # ~12 tokens per "line of code"
        lines = [" ".join(toks[j : j + 12]) for j in range(0, len(toks), 12)]
        content = "\n".join(lines)
        rows.append(
            {
                "repo": f"org{int(i) % 7}/repo{int(i) % 53}",
                "path": f"src/m{int(i) % 17}/f{int(i)}.{_EXT[lang]}",
                "commit": hashlib.sha1(f"{SEED}:{int(i)}".encode()).hexdigest(),
                "lang": lang,
                "content": content,
            }
        )
    return pd.DataFrame(rows)


def synth_corpus(spark: SparkSession, n_docs: int, partitions: int = 8) -> DataFrame:
    """Distributed deterministic corpus of ``n_docs`` source files."""
    base = spark.range(0, n_docs, 1, partitions)

    def gen(batches):
        for pdf in batches:
            yield _gen_rows(pdf["id"].to_numpy())

    schema = "repo string, path string, commit string, lang string, content string"
    df = base.mapInPandas(gen, schema=schema)
    return stamp_sha256(df)


def stamp_sha256(df: DataFrame) -> DataFrame:
    """Stamp the per-row invariant column (input_hint: sha256(content))."""
    return df.withColumn("content_sha256", F.sha2(F.col("content"), 256))


def documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapter: driver testdata ``documents`` table -> engine corpus shape
    (FIXTURES.md §2). doc_id is carried through as the pre-assigned id."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = d.select(
        F.col("doc_id"),
        F.lit("testdata").alias("repo"),
        F.col("doc_id").cast("string").alias("path"),
        F.lit("v0").alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
    return stamp_sha256(df)
