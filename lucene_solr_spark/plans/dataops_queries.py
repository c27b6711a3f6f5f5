"""Driver-facing training-data pipeline queries (dedup / ANN / text analysis)
with DuckDB oracle mirrors. Registered into the same REGISTRY/ORACLES as
driver_queries (imported by __spark_entry__).

Cross-engine determinism notes:
- hashes: md5 hex; numeric hash = first 15 hex chars as base-16 BIGINT
  (Spark conv(...,16,10) == DuckDB ('0x'||s)::BIGINT, both 60-bit positive).
- LSH hyperplanes: fixed-seed ±1 matrices embedded as literals in BOTH the
  Spark plan and the oracle SQL.
- floating point: cosine formulas written with the same operation shapes,
  rounded to 6 decimals on both sides.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ..functions.analysis import duckdb_tokenize_sql
from ..functions.textstats import (
    BPE_CHUNK_PATTERN,
    LANG_MARKERS,
    STOPWORDS_EN,
    bpe_chunk_count,
    doc_digest,
    lang_id_struct,
    quality_features,
    winnow_fingerprint,
    ws_token_count,
)
from ..operators import ann, dedup
from .driver_queries import ORACLES, REGISTRY, _read, _tokens, register

_TOKARR_CTE = f"tokarr AS (SELECT doc_id, {duckdb_tokenize_sql('text')} AS t FROM documents)"
_TOKS_FLAT_CTE = (
    f"{_TOKARR_CTE}, toks AS (SELECT doc_id, unnest(t) AS term FROM tokarr)"
)
_SHINGLES_CTE = f"""{_TOKARR_CTE},
sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
       FROM tokarr, (SELECT unnest(range(1, 4000)) AS i) ix WHERE i + 2 <= len(t))"""


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------

@register(
    "dedup_exact_stats",
    """SELECT count(*) AS n_groups, max(n_dups) AS max_group, sum(n_dups)::BIGINT AS n_docs
FROM (SELECT md5(text) AS h, count(*) AS n_dups, min(doc_id) FROM documents GROUP BY 1)
AS g(h, n_dups, keeper)""",
)
def dedup_exact_stats(spark, sf_dir):
    """Exact dedup (hash-groupBy) summary: group count / max multiplicity."""
    d = _read(spark, sf_dir, "documents")
    groups = d.groupBy(F.md5("text").alias("h")).agg(
        F.count("*").alias("n_dups"), F.min("doc_id").alias("keeper")
    )
    return groups.agg(
        F.count("*").alias("n_groups"),
        F.max("n_dups").alias("max_group"),
        F.sum("n_dups").alias("n_docs"),
    )


_MINHASH_SQL = f"""
WITH {_SHINGLES_CTE},
mh AS (SELECT doc_id, seed, min(('0x' || substr(md5(seed::VARCHAR || ':' || shingle), 1, 15))::BIGINT) AS mh
       FROM sh CROSS JOIN (SELECT unnest(range(0, 12)) AS seed) s GROUP BY 1, 2),
banded AS (SELECT doc_id, seed // 3 AS band,
                  md5(string_agg(mh::VARCHAR, ',' ORDER BY mh::VARCHAR)) AS band_key
           FROM mh GROUP BY 1, 2),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM banded a JOIN banded b ON a.band = b.band AND a.band_key = b.band_key
         WHERE a.doc_id < b.doc_id),
card AS (SELECT doc_id, count(*) AS card FROM sh GROUP BY 1),
inter AS (SELECT c.doc_a, c.doc_b, count(*) AS i FROM cand c
          JOIN sh sa ON sa.doc_id = c.doc_a JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
          GROUP BY 1, 2)
SELECT doc_a, doc_b, round(i / (ca.card + cb.card - i), 6) AS jaccard
FROM inter JOIN card ca ON doc_a = ca.doc_id JOIN card cb ON doc_b = cb.doc_id
WHERE round(i / (ca.card + cb.card - i), 6) >= 0.8
ORDER BY doc_a, doc_b
"""


@register("dedup_minhash_lsh", _MINHASH_SQL)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup pipeline (shingle -> 12 minhashes -> 4 bands ->
    bucket join -> exact-Jaccard verify >= 0.8)."""
    toks = _tokens(spark, sf_dir)
    return dedup.minhash_lsh_dedup(
        toks, tokens_col="tokens", k=3, n_hashes=12, bands=4, threshold=0.8
    )


_NGRAM_SQL = f"""
WITH {_SHINGLES_CTE},
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM sh a JOIN sh b ON a.shingle = b.shingle WHERE a.doc_id < b.doc_id),
card AS (SELECT doc_id, count(*) AS card FROM sh GROUP BY 1),
inter AS (SELECT c.doc_a, c.doc_b, count(*) AS i FROM cand c
          JOIN sh sa ON sa.doc_id = c.doc_a JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
          GROUP BY 1, 2)
SELECT doc_a, doc_b, round(i / (ca.card + cb.card - i), 6) AS jaccard
FROM inter JOIN card ca ON doc_a = ca.doc_id JOIN card cb ON doc_b = cb.doc_id
WHERE round(i / (ca.card + cb.card - i), 6) >= 0.8
ORDER BY doc_a, doc_b
"""


@register("dedup_ngram_jaccard", _NGRAM_SQL)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact token-3-gram Jaccard >= 0.8 via inverted-index self-join
    (ground truth for MinHash recall)."""
    toks = _tokens(spark, sf_dir)
    return dedup.ngram_jaccard_pairs(toks, tokens_col="tokens", k=3, threshold=0.8)


_SIMHASH_SQL = f"""
WITH {_TOKS_FLAT_CTE},
tf AS (SELECT doc_id, term, count(*) AS freq FROM toks GROUP BY 1, 2),
th AS (SELECT doc_id, freq, ('0x' || substr(md5(term), 1, 15))::BIGINT AS h FROM tf),
bits AS (SELECT doc_id, b, sum(freq * (((h >> b) & 1) * 2 - 1)) AS s
         FROM th CROSS JOIN (SELECT unnest(range(0, 32)) AS b) bb GROUP BY 1, 2),
sim AS (SELECT doc_id, sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS simhash
        FROM bits GROUP BY 1),
banded AS (SELECT doc_id, simhash, band, (simhash >> (band * 8)::INT) & 255 AS band_val
           FROM sim CROSS JOIN (SELECT unnest(range(0, 4)) AS band) bd),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.simhash AS sa, b.simhash AS sb
         FROM banded a JOIN banded b ON a.band = b.band AND a.band_val = b.band_val
         WHERE a.doc_id < b.doc_id)
SELECT doc_a, doc_b, bit_count(xor(sa, sb)) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= 3 ORDER BY doc_a, doc_b
"""


@register("dedup_simhash", _SIMHASH_SQL)
def dedup_simhash(spark, sf_dir):
    """SimHash (32-bit, freq-weighted) + banded hamming<=3 near-dup pairs."""
    toks = _tokens(spark, sf_dir)
    sim = dedup.simhash(toks, tokens_col="tokens", n_bits=32)
    return dedup.simhash_near_pairs(sim, max_hamming=3, n_bits=32, bands=4)


# ---------------------------------------------------------------------------
# Similarity search (embeddings)
# ---------------------------------------------------------------------------

def _duck_cos(a: str, b: str) -> str:
    return (
        f"(list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))))"
    )


@register(
    "ann_cosine_topk",
    f"""WITH probe AS (SELECT embedding::DOUBLE[] AS p FROM embeddings WHERE vec_id = 0)
SELECT vec_id, round({_duck_cos('embedding::DOUBLE[]', 'p')}, 6) AS cos_sim
FROM embeddings, probe
ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""",
)
def ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k (exactness baseline; JVM-side fold)."""
    emb = _read(spark, sf_dir, "embeddings")
    probe = [float(x) for x in emb.filter("vec_id = 0").collect()[0]["embedding"]]
    return ann.cosine_topk(emb, probe, k=10)


def _planes_sql_literal(planes: list[list[float]]) -> list[str]:
    return ["[" + ", ".join(f"{x:.1f}" for x in p) + "]" for p in planes]


_PLANES = ann.lsh_planes(64, 8)
_PL_SQL = _planes_sql_literal(_PLANES)
_BUCKET_SQL = " + ".join(
    f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {_PL_SQL[j]}) > 0 THEN {1 << j} ELSE 0 END)"
    for j in range(8)
)


@register(
    "ann_lsh_bucket_hist",
    f"""SELECT ({_BUCKET_SQL})::BIGINT AS bucket, count(*) AS n_vecs
FROM embeddings GROUP BY 1 ORDER BY 1""",
)
def ann_lsh_bucket_hist(spark, sf_dir):
    """Sign-LSH bucketization histogram (fixed-seed hyperplane literals)."""
    emb = _read(spark, sf_dir, "embeddings")
    return (
        ann.lsh_bucketize(emb, n_planes=8, dim=64)
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"))
        .orderBy("bucket")
    )


# ---- materialized ANN indexes (built once per sf_dir under /tmp; the
# 100 TB layout: bucket/cell partition columns written at build time, every
# probe is a partition-pruned read — never a hash computation over the scan)

_ANN_TABLES, _ANN_PLANES = 12, 3
_ANN_CACHE: dict = {}


def _lsh_index_path(spark, sf_dir: str) -> str:
    key = ("lsh", sf_dir)
    if key not in _ANN_CACHE:
        import hashlib as _h

        path = "/tmp/spark_graft_ann/" + _h.md5(sf_dir.encode()).hexdigest()[:8] + "/lsh"
        ann.lsh_index(
            _read(spark, sf_dir, "embeddings"),
            path,
            n_tables=_ANN_TABLES,
            n_planes=_ANN_PLANES,
            dim=64,
        )
        _ANN_CACHE[key] = path
    return _ANN_CACHE[key]


def _tbl_bucket_sql(col: str, t: int) -> str:
    planes = ann.lsh_planes(64, _ANN_PLANES, seed=ann.LSH_SEED + t)
    lits = _planes_sql_literal(planes)
    return "(" + " + ".join(
        f"(CASE WHEN list_dot_product({col}, {lits[j]}) > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(_ANN_PLANES)
    ) + ")"


_LSH_MATCH_SQL = " OR ".join(
    f"({_tbl_bucket_sql('e.embedding::DOUBLE[]', t)} = {_tbl_bucket_sql('probe.p', t)})"
    for t in range(_ANN_TABLES)
)


@register(
    "ann_lsh_topk",
    f"""WITH probe AS (SELECT embedding::DOUBLE[] AS p FROM embeddings WHERE vec_id = 0),
cand AS (SELECT e.vec_id, e.embedding::DOUBLE[] AS v FROM embeddings e, probe
         WHERE {_LSH_MATCH_SQL})
SELECT vec_id, round({_duck_cos('v', 'p')}, 6) AS cos_sim
FROM cand, probe ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""",
)
def ann_lsh_topk(spark, sf_dir):
    """ANN via the MATERIALIZED multi-table LSH index: 12 tables x 3
    planes, each table partitioned by its bucket column; the probe reads
    one partition per table (PartitionFilters in the plan), unions
    candidates, exact-cosine re-ranks. The oracle recomputes the identical
    bucket semantics inline."""
    emb = _read(spark, sf_dir, "embeddings")
    probe = [float(x) for x in emb.filter("vec_id = 0").collect()[0]["embedding"]]
    path = _lsh_index_path(spark, sf_dir)
    return ann.lsh_probe(
        spark, path, probe, k=10, n_tables=_ANN_TABLES, n_planes=_ANN_PLANES
    )


# IVF with import-time literal centroids (seeded gaussian): the coarse
# quantizer is data-independent so BOTH engines share it as literals — the
# sampled-k-means trainer (ann.train_centroids) is exercised with recall
# gates in pytest where a scalar oracle can follow the training.
_IVF_CELLS_N, _IVF_NPROBE = 8, 2
_IVF_CENTS = (
    np.random.default_rng(ann.LSH_SEED).normal(0.0, 1.0, size=(_IVF_CELLS_N, 64))
    .round(4)
    .tolist()
)


def _cents_values_sql() -> str:
    rows = ", ".join(
        "(" + str(i) + ", [" + ", ".join(f"{x:.4f}" for x in c) + "]::DOUBLE[])"
        for i, c in enumerate(_IVF_CENTS)
    )
    return f"cents(cell, c) AS (VALUES {rows})"


_IVF_ASSIGN_SQL = (
    "(SELECT cell FROM cents ORDER BY list_distance(c, e.embedding::DOUBLE[]), cell LIMIT 1)"
)


@register(
    "ann_ivf_cells",
    f"""WITH {_cents_values_sql()}
SELECT {_IVF_ASSIGN_SQL} AS cell, count(*) AS n_vecs
FROM embeddings e GROUP BY 1 ORDER BY 1""",
)
def ann_ivf_cells(spark, sf_dir):
    """IVF coarse-quantizer assignment histogram (literal centroids)."""
    emb = _read(spark, sf_dir, "embeddings")
    return (
        ann.ivf_assign(emb, _IVF_CENTS)
        .groupBy("cell")
        .agg(F.count("*").alias("n_vecs"))
        .orderBy("cell")
    )


@register(
    "ann_ivf_topk",
    f"""WITH {_cents_values_sql()},
probe AS (SELECT embedding::DOUBLE[] AS p FROM embeddings WHERE vec_id = 0),
pcells AS (SELECT cell FROM cents, probe ORDER BY list_distance(c, p), cell LIMIT {_IVF_NPROBE}),
a AS (SELECT vec_id, embedding::DOUBLE[] AS v, {_IVF_ASSIGN_SQL} AS cell FROM embeddings e)
SELECT vec_id, round({_duck_cos('v', 'p')}, 6) AS cos_sim
FROM a, probe WHERE a.cell IN (SELECT cell FROM pcells)
ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""",
)
def ann_ivf_topk(spark, sf_dir):
    """nprobe IVF search over the MATERIALIZED cell-partitioned index:
    probe reads only the nprobe nearest cells (partition pruning), exact
    cosine re-rank inside them."""
    emb = _read(spark, sf_dir, "embeddings")
    key = ("ivf", sf_dir)
    if key not in _ANN_CACHE:
        import hashlib as _h

        path = "/tmp/spark_graft_ann/" + _h.md5(sf_dir.encode()).hexdigest()[:8] + "/ivf"
        ann.ivf_index(emb, _IVF_CENTS, path)
        _ANN_CACHE[key] = path
    probe = [float(x) for x in emb.filter("vec_id = 0").collect()[0]["embedding"]]
    return ann.ivf_topk(
        spark, _ANN_CACHE[key], _IVF_CENTS, probe, k=10, nprobe=_IVF_NPROBE
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

def _duck_marker_hits(markers: list[str]) -> str:
    lst = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter(t, x -> list_contains([{lst}], x)))"


_LANGS_SORTED = sorted(LANG_MARKERS)
_HIT_COLS = ", ".join(
    f"{_duck_marker_hits(LANG_MARKERS[lang])} AS h_{lang}" for lang in _LANGS_SORTED
)
# argmax with lexicographic tie-break (matches Spark array_min of
# struct(-hits, lang))
_PRED_CASE = (
    "CASE "
    + " ".join(
        "WHEN "
        + " AND ".join(
            f"h_{lang} >= h_{other}" for other in _LANGS_SORTED[i + 1 :]
        )
        + f" THEN '{lang}'"
        for i, lang in enumerate(_LANGS_SORTED[:-1])
    )
    + f" ELSE '{_LANGS_SORTED[-1]}' END"
)


@register(
    "lang_id_counts",
    f"""WITH {_TOKARR_CTE},
hits AS (SELECT doc_id, {_HIT_COLS} FROM tokarr)
SELECT {_PRED_CASE} AS pred_lang, count(*) AS n_docs
FROM hits GROUP BY 1 ORDER BY 1""",
)
def lang_id_counts(spark, sf_dir):
    """Language-ID heuristic (marker-token voting): predicted-language counts."""
    toks = _tokens(spark, sf_dir)
    return (
        toks.select(lang_id_struct(F.col("tokens")).alias("lid"))
        .groupBy(F.col("lid.pred_lang").alias("pred_lang"))
        .agg(F.count("*").alias("n_docs"))
        .orderBy("pred_lang")
    )


_STOP_LST = ", ".join(f"'{w}'" for w in STOPWORDS_EN)


@register(
    "quality_score_hist",
    f"""WITH {_TOKARR_CTE},
feat AS (SELECT d.doc_id,
  length(d.text) AS n_chars,
  len(a.t) AS n_tokens,
  length(d.text) - length(regexp_replace(d.text, '[^\\w\\s]', '', 'g')) AS n_punct,
  len(list_filter(a.t, x -> list_contains([{_STOP_LST}], x))) AS stop_hits
  FROM documents d JOIN tokarr a USING (doc_id)),
q AS (SELECT doc_id,
  0.4 * least(n_tokens / 100.0, 1.0)
  + 0.3 * (1.0 - (CASE WHEN n_chars > 0 THEN n_punct / n_chars::DOUBLE ELSE 0.0 END))
  + 0.3 * (CASE WHEN n_tokens > 0 THEN stop_hits / n_tokens::DOUBLE ELSE 0.0 END) AS quality
  FROM feat)
SELECT round(quality, 1) AS qbucket, count(*) AS n_docs FROM q GROUP BY 1 ORDER BY 1""",
)
def quality_score_hist(spark, sf_dir):
    """Quality scoring (length/punct/stopword features): score histogram."""
    toks = _tokens(spark, sf_dir)
    q = toks.select(
        quality_features(F.col("text"), F.col("tokens"))["quality"].alias("quality")
    )
    return (
        q.groupBy(F.round(F.col("quality"), 1).alias("qbucket"))
        .agg(F.count("*").alias("n_docs"))
        .orderBy("qbucket")
    )


@register(
    "token_counts",
    f"""SELECT doc_id,
  CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END AS ws_tokens,
  len(regexp_extract_all(text, '{BPE_CHUNK_PATTERN}')) AS bpe_chunks
FROM documents ORDER BY doc_id""",
)
def token_counts(spark, sf_dir):
    """Token counting: whitespace tokens + BPE-ish <=4-char subword chunks."""
    d = _read(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        ws_token_count(F.col("text")).alias("ws_tokens"),
        bpe_chunk_count(F.col("text")).cast("long").alias("bpe_chunks"),
    ).orderBy("doc_id")


@register(
    "doc_fingerprints",
    f"""WITH {_TOKARR_CTE},
w AS (SELECT doc_id,
        CASE WHEN len(t) >= 5 THEN i ELSE 1 END AS i,
        CASE WHEN len(t) >= 5 THEN t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]
             ELSE array_to_string(t, ' ') END AS win
      FROM tokarr, (SELECT unnest(range(1, 4000)) AS i) ix
      WHERE i + 4 <= len(t) OR (len(t) < 5 AND i = 1))
SELECT d.doc_id, md5(d.text) AS digest, min(md5(w.win)) AS winnow_fp
FROM documents d JOIN w ON d.doc_id = w.doc_id
GROUP BY 1, 2 ORDER BY d.doc_id""",
)
def doc_fingerprints(spark, sf_dir):
    """Document fingerprinting: full digest + winnowing-lite 5-gram min-hash."""
    toks = _tokens(spark, sf_dir)
    return toks.select(
        "doc_id",
        doc_digest(F.col("text")).alias("digest"),
        winnow_fingerprint(F.col("tokens"), k=5).alias("winnow_fp"),
    ).orderBy("doc_id")


# make linters see the imports as used
_ = (REGISTRY, ORACLES)


# ---------------------------------------------------------------------------
# Multimodal plumbing (binary columns; decode stubbed — rows-only checks)
# ---------------------------------------------------------------------------

@register(
    "multimodal_decode_meta",
    # The fake codec's header fields are a pure function of documents.text
    # (w = chars%64+1, h = chars%48+1, payload = utf-8 byte length), so the
    # DECODED metadata is SQL-expressible even though the binary itself isn't:
    # the oracle checks the whole synth->encode->Arrow-decode round trip.
    """SELECT doc_id AS media_id,
       true AS valid,
       (length(text) % 64 + 1)::INTEGER AS width,
       (length(text) % 48 + 1)::INTEGER AS height,
       octet_length(encode(text))::BIGINT AS payload_bytes
FROM documents ORDER BY media_id""",
)
def multimodal_decode_meta(spark, sf_dir):
    """Binary media column -> header decode via Arrow-batched mapInPandas
    (deterministic fake codec; real decoder is an import-gated stub)."""
    from ..sources import multimodal as mm

    d = _read(spark, sf_dir, "documents")
    media = mm.synth_media(d)
    return mm.decode_meta(media).orderBy("media_id")


@register(
    "multimodal_resize_stats",
    # resize_stub keeps the 12-byte header + every k-th payload byte where
    # k = max(payload_bytes // 32, 1); len(body[::k]) == ceil(len/k).
    """WITH m AS (SELECT octet_length(encode(text))::BIGINT AS len FROM documents),
r AS (SELECT len, greatest(len // 32, 1) AS k FROM m)
SELECT count(*)::BIGINT AS n_media,
       max(12 + (len + k - 1) // k)::INTEGER AS max_bytes
FROM r""",
)
def multimodal_resize_stats(spark, sf_dir):
    """binary->binary resize transform; output size stats."""
    from ..sources import multimodal as mm

    d = _read(spark, sf_dir, "documents")
    small = mm.resize_stub(mm.synth_media(d), max_side=32)
    return small.select(
        F.count("*").alias("n_media"),
        F.max(F.length("media_small")).alias("max_bytes"),
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicates (operators/dedup.py#embedding_cosine_pairs
# exact baseline + #embedding_near_dup_lsh banded scale path)
# ---------------------------------------------------------------------------

_ND_THRESH = 0.4
_PLANES16 = ann.lsh_planes(64, 16)
_PL16_SQL = _planes_sql_literal(_PLANES16)
_SIG16_SQL = " + ".join(
    f"(CASE WHEN list_dot_product(v, {_PL16_SQL[j]}) > 0 THEN {1 << j} ELSE 0 END)"
    for j in range(16)
)


@register(
    "dedup_embedding_cosine",
    f"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({_duck_cos('a.v', 'b.v')}, 6) AS cos_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round({_duck_cos('a.v', 'b.v')}, 6) >= {_ND_THRESH}
ORDER BY cos_sim DESC, vec_a ASC, vec_b ASC LIMIT 20""",
)
def dedup_embedding_cosine(spark, sf_dir):
    """Exact embedding near-dup pairs (cosine >= 0.4), top-20 by
    similarity — the O(n^2) ground-truth baseline."""
    emb = _read(spark, sf_dir, "embeddings")
    return (
        dedup.embedding_cosine_pairs(emb, threshold=_ND_THRESH)
        .orderBy(F.desc("cos_sim"), F.asc("vec_a"), F.asc("vec_b"))
        .limit(20)
    )


@register(
    "dedup_embedding_lsh",
    f"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sig AS (SELECT vec_id, ({_SIG16_SQL})::BIGINT AS sig FROM e),
banded AS (SELECT vec_id, sig, band, (sig >> (band * 4)) & 15 AS band_val
           FROM sig, (SELECT unnest(range(4)) AS band) bx),
cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         FROM banded a JOIN banded b
           ON a.band = b.band AND a.band_val = b.band_val
          AND a.vec_id < b.vec_id)
SELECT c.vec_a, c.vec_b, round({_duck_cos('ea.v', 'eb.v')}, 6) AS cos_sim
FROM cand c JOIN e ea ON ea.vec_id = c.vec_a JOIN e eb ON eb.vec_id = c.vec_b
WHERE round({_duck_cos('ea.v', 'eb.v')}, 6) >= {_ND_THRESH}
ORDER BY cos_sim DESC, vec_a ASC, vec_b ASC LIMIT 20""",
)
def dedup_embedding_lsh(spark, sf_dir):
    """Banded sign-LSH near-dup (16 planes, 4 bands, verified by exact
    cosine) — the scale path: the self-join runs on the tiny (band,
    band_val) key, vectors rejoin for candidates only. Oracle mirrors the
    identical plane literals, so recall loss is reproduced exactly."""
    emb = _read(spark, sf_dir, "embeddings")
    return (
        dedup.embedding_near_dup_lsh(
            emb, threshold=_ND_THRESH, n_planes=16, bands=4, dim=64
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_a"), F.asc("vec_b"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Sessionization (session windows with a 30-min inactivity gap) — the
# batch mirror of the stateful-streaming operator
# (streaming/sessionize.py). Exact: microsecond arithmetic both sides.
# ---------------------------------------------------------------------------

_SESSION_GAP_US = 30 * 60 * 1_000_000


@register(
    "sessionize_events",
    f"""WITH lagd AS (
  SELECT user_id, epoch_us(ts) AS tus,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events),
marks AS (SELECT user_id, tus,
                 CASE WHEN prev IS NULL OR tus - prev > {_SESSION_GAP_US}
                      THEN 1 ELSE 0 END AS new_s
          FROM lagd),
sess AS (SELECT user_id, tus,
                sum(new_s) OVER (PARTITION BY user_id ORDER BY tus
                                 ROWS UNBOUNDED PRECEDING) AS sid
         FROM marks)
SELECT user_id, count(*) AS n_events,
       (max(tus) - min(tus))::BIGINT AS duration_us,
       min(tus)::BIGINT AS start_us
FROM sess GROUP BY user_id, sid
ORDER BY n_events DESC, user_id ASC, start_us ASC LIMIT 10""",
)
def sessionize_events(spark, sf_dir):
    """Top-10 sessions by event count: per-user 30-min-gap session
    windows via lag + running sum (one shuffle on user_id; all window
    work stays partition-local)."""
    from pyspark.sql import Window

    # ts is TIMESTAMP_NTZ; session tz is pinned UTC, so the cast matches
    # DuckDB's naive-as-UTC epoch_us exactly
    e = _read(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
        "ts",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marks = e.withColumn("prev", F.lag("tus").over(w)).withColumn(
        "new_s",
        F.when(
            F.col("prev").isNull() | (F.col("tus") - F.col("prev") > _SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    wcum = Window.partitionBy("user_id").orderBy("tus").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = marks.withColumn("sid", F.sum("new_s").over(wcum))
    return (
        sess.groupBy("user_id", "sid")
        .agg(
            F.count("*").alias("n_events"),
            (F.max("tus") - F.min("tus")).cast("long").alias("duration_us"),
            F.min("tus").cast("long").alias("start_us"),
        )
        .drop("sid")
        .orderBy(F.desc("n_events"), F.asc("user_id"), F.asc("start_us"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Incremental dedup: probe a new batch against the existing corpus index
# (operators/dedup.py#minhash_lsh_incremental). Split is deterministic:
# doc_id % 4 == 0 is the "arriving batch", the rest is the indexed base.
# ---------------------------------------------------------------------------

_INCR_SQL = f"""
WITH {_SHINGLES_CTE},
mh AS (SELECT doc_id, seed, min(('0x' || substr(md5(seed::VARCHAR || ':' || shingle), 1, 15))::BIGINT) AS mh
       FROM sh CROSS JOIN (SELECT unnest(range(0, 12)) AS seed) s GROUP BY 1, 2),
banded AS (SELECT doc_id, seed // 3 AS band,
                  md5(string_agg(mh::VARCHAR, ',' ORDER BY mh::VARCHAR)) AS band_key
           FROM mh GROUP BY 1, 2),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM banded a JOIN banded b ON a.band = b.band AND a.band_key = b.band_key
         WHERE a.doc_id % 4 = 0 AND b.doc_id % 4 <> 0),
card AS (SELECT doc_id, count(*) AS card FROM sh GROUP BY 1),
inter AS (SELECT c.doc_a, c.doc_b, count(*) AS i FROM cand c
          JOIN sh sa ON sa.doc_id = c.doc_a JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
          GROUP BY 1, 2)
SELECT doc_a AS new_doc, doc_b AS base_doc, round(i / (ca.card + cb.card - i), 6) AS jaccard
FROM inter JOIN card ca ON doc_a = ca.doc_id JOIN card cb ON doc_b = cb.doc_id
WHERE round(i / (ca.card + cb.card - i), 6) >= 0.8
ORDER BY 1, 2
"""


@register("dedup_incremental_batch", _INCR_SQL)
def dedup_incremental_batch(spark, sf_dir):
    """Incremental near-dup: new batch (doc_id%4==0) probed against the
    existing base corpus's MinHash band-key index; O(batch) hash work."""
    toks = _tokens(spark, sf_dir)
    base = toks.filter(F.col("doc_id") % 4 != 0)
    batch = toks.filter(F.col("doc_id") % 4 == 0)
    return dedup.minhash_lsh_incremental(
        base, batch, tokens_col="tokens", k=3, n_hashes=12, bands=4, threshold=0.8
    )


# ---------------------------------------------------------------------------
# End-to-end pretraining data funnel: lang filter -> quality gate -> Gopher
# repetition gates -> exact dedup -> near-dup drop. One row of per-stage
# survivor counts — the standard pre-training curation pipeline composed
# from this module's individually-oracled operators.
# ---------------------------------------------------------------------------

_FUNNEL_Q = 0.5

_FUNNEL_SQL = f"""
WITH {_TOKARR_CTE},
hits AS (SELECT doc_id, {_HIT_COLS} FROM tokarr),
lang AS (SELECT doc_id FROM hits WHERE {_PRED_CASE} = 'en'),
feat AS (SELECT d.doc_id,
  length(d.text) AS n_chars,
  len(a.t) AS n_tokens,
  length(d.text) - length(regexp_replace(d.text, '[^\\w\\s]', '', 'g')) AS n_punct,
  len(list_filter(a.t, x -> list_contains([{_STOP_LST}], x))) AS stop_hits
  FROM documents d JOIN tokarr a USING (doc_id) JOIN lang USING (doc_id)),
q AS (SELECT doc_id FROM (SELECT doc_id,
  round(0.4 * least(n_tokens / 100.0, 1.0)
  + 0.3 * (1.0 - (CASE WHEN n_chars > 0 THEN n_punct / n_chars::DOUBLE ELSE 0.0 END))
  + 0.3 * (CASE WHEN n_tokens > 0 THEN stop_hits / n_tokens::DOUBLE ELSE 0.0 END), 6) AS qq
  FROM feat) WHERE qq >= {_FUNNEL_Q}),
rbase AS (SELECT a.doc_id, len(a.t) AS n_tokens,
                 len(list_distinct(a.t))::DOUBLE / len(a.t) AS uniq_ratio
          FROM tokarr a JOIN q USING (doc_id) WHERE len(a.t) > 0),
bi AS (SELECT a.doc_id, a.t[i] || ' ' || a.t[i+1] AS g
       FROM tokarr a JOIN q USING (doc_id), (SELECT unnest(range(1, 4000)) AS i) ix
       WHERE i + 1 <= len(a.t)),
bic AS (SELECT doc_id, g, count(*) AS c FROM bi GROUP BY 1, 2),
top2 AS (SELECT doc_id, max(c) AS mx FROM bic GROUP BY 1),
tri AS (SELECT a.doc_id, a.t[i] || ' ' || a.t[i+1] || ' ' || a.t[i+2] AS g
        FROM tokarr a JOIN q USING (doc_id), (SELECT unnest(range(1, 4000)) AS i) ix
        WHERE i + 2 <= len(a.t)),
tric AS (SELECT doc_id, g, count(*) AS c FROM tri GROUP BY 1, 2),
dup3 AS (SELECT doc_id, sum(CASE WHEN c > 1 THEN c ELSE 0 END)::DOUBLE / sum(c) AS frac
         FROM tric GROUP BY 1),
rep AS (SELECT b.doc_id FROM rbase b
        LEFT JOIN top2 ON top2.doc_id = b.doc_id
        LEFT JOIN dup3 ON dup3.doc_id = b.doc_id
        WHERE NOT ((2.0 * top2.mx / b.n_tokens) > 0.18
                   OR coalesce(dup3.frac, 0.0) > 0.02
                   OR b.uniq_ratio < 0.32)),
keep AS (SELECT min(d.doc_id) AS doc_id FROM documents d JOIN rep USING (doc_id)
         GROUP BY md5(d.text)),
shk AS (SELECT DISTINCT a.doc_id, a.t[i] || ' ' || a.t[i+1] || ' ' || a.t[i+2] AS shingle
        FROM tokarr a JOIN keep USING (doc_id), (SELECT unnest(range(1, 4000)) AS i) ix
        WHERE i + 2 <= len(a.t)),
ncand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM shk a JOIN shk b ON a.shingle = b.shingle WHERE a.doc_id < b.doc_id),
ncard AS (SELECT doc_id, count(*) AS card FROM shk GROUP BY 1),
ninter AS (SELECT c.doc_a, c.doc_b, count(*) AS i FROM ncand c
           JOIN shk sa ON sa.doc_id = c.doc_a
           JOIN shk sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
           GROUP BY 1, 2),
drops AS (SELECT DISTINCT doc_b AS doc_id FROM ninter
          JOIN ncard ca ON doc_a = ca.doc_id JOIN ncard cb ON doc_b = cb.doc_id
          WHERE round(i / (ca.card + cb.card - i), 6) >= 0.8)
SELECT (SELECT count(*) FROM documents)::BIGINT AS n_total,
       (SELECT count(*) FROM lang)::BIGINT AS n_lang,
       (SELECT count(*) FROM q)::BIGINT AS n_quality,
       (SELECT count(*) FROM rep)::BIGINT AS n_repetition,
       (SELECT count(*) FROM keep)::BIGINT AS n_exact,
       (SELECT count(*) FROM keep WHERE doc_id NOT IN (SELECT doc_id FROM drops))::BIGINT
           AS n_neardup
"""


@register("pretraining_funnel", _FUNNEL_SQL)
def pretraining_funnel(spark, sf_dir):
    """Pretraining curation funnel: per-stage survivor counts.

    lang==en -> quality >= 0.5 -> Gopher repetition gates -> exact dedup
    (keep min doc_id per md5) -> near-dup drop (exact 3-gram Jaccard >= 0.8,
    drop the larger doc_id of each pair; at 100 TB the last stage runs via
    the MinHash index instead — same drop rule).

    Scale shape: every stage is a filter or map-combined agg over doc-keyed
    data; stage counts are scalar aggs. No stage widens the data.
    """
    from ..functions.textstats import repetition_flags

    toks = _tokens(spark, sf_dir)
    scored = toks.select(
        "doc_id",
        "text",
        "tokens",
        lang_id_struct(F.col("tokens"))["pred_lang"].alias("pred_lang"),
        F.round(
            quality_features(F.col("text"), F.col("tokens"))["quality"], 6
        ).alias("q"),
    )
    s1 = scored.filter(F.col("pred_lang") == "en")
    s2 = s1.filter(F.col("q") >= _FUNNEL_Q)
    rep_pass = (
        repetition_flags(s2)
        .filter(~(F.col("f_top2") | F.col("f_dup3") | F.col("f_uniq")))
        .select("doc_id")
    )
    s3 = s2.join(rep_pass, "doc_id").persist()
    keep = s3.groupBy(F.md5("text").alias("h")).agg(F.min("doc_id").alias("doc_id"))
    s4 = s3.join(keep.select("doc_id"), "doc_id").persist()
    pairs = dedup.ngram_jaccard_pairs(s4, tokens_col="tokens", k=3, threshold=0.8)
    drops = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    s5 = s4.join(drops, "doc_id", "left_anti")

    def _n(df, name):
        return df.agg(F.count("*").cast("long").alias(name))

    return (
        _n(toks, "n_total")
        .crossJoin(_n(s1, "n_lang"))
        .crossJoin(_n(s2, "n_quality"))
        .crossJoin(_n(s3, "n_repetition"))
        .crossJoin(_n(s4, "n_exact"))
        .crossJoin(_n(s5, "n_neardup"))
    )
