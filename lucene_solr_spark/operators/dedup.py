"""Deduplication operators for large-scale training-data pipelines.

Spark-first designs (all shuffles keyed to avoid hot spots; candidate
generation via inverted/banded joins, never all-pairs at scale):

- exact_dedup: hash-groupBy on content digest (one shuffle, map-combined).
- minhash_lsh: shingle -> minhash signature -> banded bucket join ->
  exact-Jaccard verification of candidates only. The classic
  Broder/LSH pipeline; band buckets are the shuffle keys, so skew is
  bounded by bucket size, and verification joins are semi-joins on the
  candidate set.
- simhash: 60-bit sign-of-weighted-sum fingerprint + hamming-distance
  candidate pairing (document fingerprinting, Charikar 2002).
- ngram_jaccard: exact Jaccard over token shingles via inverted-index
  self-join (pairs must share >=1 shingle — no cartesian product).

Cross-engine determinism: hashes derive from md5 hex (identical in Spark
and DuckDB); numeric hash = first 15 hex chars parsed base-16 (60 bits,
fits BIGINT in both). Production would swap md5 for xxhash64 — the
structure is hash-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# first 15 md5 hex chars as a non-negative 60-bit BIGINT
def h60(col):
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


DUCK_H60 = "(('0x' || substr(md5({e}), 1, 15))::BIGINT)"


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: (content md5, group size, keeper = min id).
    One map-combined shuffle; at 100 TB this is the cheapest dedup pass and
    runs first to shrink the near-dup input."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
        .agg(
            F.count("*").alias("n_dups"),
            F.min(id_col).alias("keeper_id"),
        )
        .filter(F.col("n_dups") > 1)
        .orderBy("content_md5")
    )


def token_shingles(df: DataFrame, id_col: str, tokens_col: str, k: int = 3) -> DataFrame:
    """Distinct word k-gram shingles per doc: (id, shingle). Built with
    JVM-side higher-order fns (no Python in the hot path)."""
    n = F.size(tokens_col) - (k - 1)
    sh = F.when(n <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat_ws(" ", F.slice(F.col(tokens_col), i, k)),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(sh).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    shingles: DataFrame, n_hashes: int = 12
) -> DataFrame:
    """(doc_id, mh0..mh{n-1}): seed-salted md5-min over shingles, ALL seeds
    in one map-combined groupBy(doc_id) — the seed dimension rides as
    aggregate columns instead of exploded row copies, so the shuffle moves
    one row per doc, not n_hashes copies of every shingle (a ~n_hashes x
    shuffle-volume cut; values are identical, min per seed is unchanged)."""
    aggs = [
        F.min(h60(F.concat_ws(":", F.lit(str(s)), F.col("shingle")))).alias(f"mh{s}")
        for s in range(n_hashes)
    ]
    return shingles.groupBy("doc_id").agg(*aggs)


def band_key_rows(sigs: DataFrame, n_hashes: int = 12, bands: int = 4) -> DataFrame:
    """(doc_id, band, band_key) rows for a signature table. Band key = md5
    of the band's mh values as lexicographically sorted strings (identical
    to the exploded formulation's collect_list+sort key)."""
    r = n_hashes // bands
    keys = []
    for b in range(bands):
        vals = F.array(
            *[F.col(f"mh{s}").cast("string") for s in range(b * r, (b + 1) * r)]
        )
        keys.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws(",", F.array_sort(vals))).alias("band_key"),
            )
        )
    return sigs.select("doc_id", F.explode(F.array(*keys)).alias("bk")).select(
        "doc_id",
        F.col("bk.band").alias("band"),
        F.col("bk.band_key").alias("band_key"),
    )


def minhash_lsh_candidates(
    sigs: DataFrame, n_hashes: int = 12, bands: int = 4
) -> DataFrame:
    """Band the signature (rows = n_hashes/bands), bucket-join within bands.
    Output unique candidate (doc_a < doc_b) pairs."""
    banded = band_key_rows(sigs, n_hashes, bands)
    a = banded.select("band", "band_key", F.col("doc_id").alias("doc_a"))
    b = banded.select("band", "band_key", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_verify(
    candidates: DataFrame, shingles: DataFrame, threshold: float
) -> DataFrame:
    """Exact Jaccard for candidate pairs only (semi-join shaped; the
    all-pairs blowup never happens)."""
    card = shingles.groupBy("doc_id").agg(F.count("*").alias("card"))
    sa = shingles.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = shingles.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        candidates.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    ca = card.select(F.col("doc_id").alias("doc_a"), F.col("card").alias("ca"))
    cb = card.select(F.col("doc_id").alias("doc_b"), F.col("card").alias("cb"))
    return (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("ca") + F.col("cb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


def minhash_lsh_dedup(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    k: int = 3,
    n_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline -> verified (doc_a, doc_b, jaccard)."""
    sh = token_shingles(df, id_col, tokens_col, k).persist()
    sigs = minhash_signatures(sh, n_hashes)
    cands = minhash_lsh_candidates(sigs, n_hashes, bands)
    return jaccard_verify(cands, sh, threshold)


def minhash_lsh_incremental(
    base: DataFrame,
    batch: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    k: int = 3,
    n_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """Incremental dedup: probe a NEW batch against an EXISTING corpus.

    The production shape for continuous ingestion (a training-data pipeline
    operator; no Solr analog): the base corpus's
    band-key table is the persisted dedup index — built once, stored
    partitioned by (band, band_key) exactly like ``ann.lsh_index`` — and
    each arriving batch is shingled + min-hashed on its own (cost O(batch),
    never O(corpus)), then joined to the index on the tiny band keys. Only
    candidate pairs are exactly verified. At 100 TB the probe join is a
    shuffle of the batch side only; the index side is a bucket-pruned read.

    Returns (new_doc, base_doc, jaccard >= threshold) pairs ordered.
    """
    sh_base = token_shingles(base, id_col, tokens_col, k)
    sh_batch = token_shingles(batch, id_col, tokens_col, k)
    bk_base = band_key_rows(minhash_signatures(sh_base, n_hashes), n_hashes, bands)
    bk_batch = band_key_rows(minhash_signatures(sh_batch, n_hashes), n_hashes, bands)
    cand = (
        bk_batch.select("band", "band_key", F.col("doc_id").alias("doc_a"))
        .join(
            bk_base.select("band", "band_key", F.col("doc_id").alias("doc_b")),
            ["band", "band_key"],
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    verified = jaccard_verify(cand, sh_batch.unionByName(sh_base), threshold)
    return verified.select(
        F.col("doc_a").alias("new_doc"),
        F.col("doc_b").alias("base_doc"),
        "jaccard",
    ).orderBy("new_doc", "base_doc")


def ngram_jaccard_pairs(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard >= threshold (ground truth for the MinHash
    recall test) with PPJoin/AllPairs PREFIX FILTERING (Chaudhuri et al.
    2006, Xiao et al. 2008): candidates self-join only on each doc's
    rarest-first prefix of length |S| - ceil(t*|S|) + 1, then exact-verify.

    LOSSLESS: order shingles canonically (ascending global df, shingle).
    J(A,B) >= t implies |A∩B| >= t*|A| (from i >= t(|A|+|B|)/(1+t) and
    |B| >= i). Let x be the canonically-smallest common element: if x were
    outside prefix(A), ALL common elements would sit past position p(A),
    giving |A∩B| <= |A| - p(A) = ceil(t|A|) - 1 < t|A| — contradiction; so
    x lies in prefix(A), and symmetrically in prefix(B), and the
    prefix-prefix join finds the pair. Hot shingles (high df)
    land at the END of the canonical order, so they are excluded from most
    prefixes and the classic stopword pair-blowup of the naive
    inverted-index join never materializes. The prefix rank is a window
    partitioned BY DOC (keyed, scalable); the df join is shingle-keyed."""
    sh = token_shingles(df, id_col, tokens_col, k).persist()
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df_sh"))
    w = Window.partitionBy("doc_id").orderBy("df_sh", "shingle")
    ranked = (
        sh.join(dfreq, "shingle")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("card", F.count("*").over(Window.partitionBy("doc_id")))
    )
    prefix = ranked.filter(
        F.col("rn") <= F.col("card") - F.ceil(threshold * F.col("card")) + 1
    ).select("doc_id", "shingle")
    pairs = (
        prefix.select(F.col("doc_id").alias("doc_a"), "shingle")
        .join(prefix.select(F.col("doc_id").alias("doc_b"), "shingle"), "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return jaccard_verify(pairs, sh, threshold)


def simhash(df: DataFrame, tokens_col: str = "tokens", id_col: str = "doc_id",
            n_bits: int = 32) -> DataFrame:
    """Per-doc SimHash fingerprint: bit b = sign of sum over tokens of
    freq-weighted (bit_b(h60(token)) * 2 - 1). JVM-side only. All
    ``n_bits`` column sums ride ONE map-combined groupBy(doc_id) (the bit
    dimension as aggregate expressions, not exploded row copies — the
    shuffle moves one row per doc instead of n_bits copies of every
    (doc, term) row; identical fingerprints)."""
    tok = df.select(F.col(id_col).alias("doc_id"), F.explode(tokens_col).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("freq"))
    th = tf.withColumn("h", h60(F.col("term")))
    bit_sums = [
        F.sum(
            F.col("freq") * F.expr(f"(shiftright(h, {b}) & 1) * 2 - 1")
        ).alias(f"s{b}")
        for b in range(n_bits)
    ]
    wide = th.groupBy("doc_id").agg(*bit_sums)
    fp = None
    for b in range(n_bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fp = term if fp is None else (fp + term)
    return wide.select("doc_id", fp.alias("simhash"))


def simhash_near_pairs(
    sim: DataFrame, max_hamming: int = 3, n_bits: int = 32, bands: int = 4
) -> DataFrame:
    """Near-dup pairs by hamming distance, banded to avoid all-pairs:
    docs agreeing on at least one of ``bands`` bit-bands are candidates
    (any pair with hamming <= bands-1 must share a band; with
    max_hamming < bands this is exact)."""
    width = n_bits // bands
    mask = (1 << width) - 1
    banded = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[F.lit(i) for i in range(bands)])
        ).alias("band"),
    ).withColumn(
        "band_val",
        F.expr(f"shiftright(simhash, CAST(band * {width} AS INT)) & {mask}"),
    )
    a = banded.select("band", "band_val", F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"))
    b = banded.select("band", "band_val", F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"))
    pairs = (
        a.join(b, ["band", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
        .distinct()
    )
    return (
        pairs.withColumn(
            "hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicates (the vector-space analog of the textual
# near-dup pipelines above; complements MoreLikeThis/ANN for training-data
# curation at 100 TB).
# ---------------------------------------------------------------------------


def embedding_cosine_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_size: int = 1024,
) -> DataFrame:
    """EXACT embedding near-dup pairs: all (a < b) with cosine >= threshold.
    O(n^2) — the correctness baseline / ground truth for the LSH recall
    test, same role as ngram_jaccard_pairs for MinHash.

    Blocked-outer-product execution (the standard shape for exact
    all-pairs at scale): vectors hash into ~n/block_size blocks, every
    block pair (a <= b) becomes one task, and each task computes the
    full cosine matrix for its two blocks with numpy — n²/block_size²
    tasks, each a dense vectorized kernel, instead of n² per-pair
    expression evaluations (measured ~20x on the driver fixture; at
    100 TB this is a 2D-blocked cartesian where each side streams
    block-sized tiles). The accumulation loops add dimension-by-
    dimension in index order — the SAME float64 operation sequence as
    the JVM zip_with/aggregate fold and the DuckDB list_dot_product
    mirror, so results stay bit-identical; rounding stays JVM-side."""
    import numpy as np
    import pandas as pd

    n = emb.count()
    n_blocks = max(1, -(-n // block_size))
    base = emb.select(
        (F.col(id_col) % n_blocks).cast("int").alias("blk"),
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    packed = base.groupBy("blk").agg(
        F.collect_list(F.struct("id", "v")).alias("items")
    )
    grid = (
        packed.select(F.col("blk").alias("blk_a"), F.col("items").alias("items_a"))
        .join(
            packed.select(F.col("blk").alias("blk_b"), F.col("items").alias("items_b")),
            F.col("blk_a") <= F.col("blk_b"),
        )
        .repartition(max(32, n_blocks))
    )
    # rounding happens AFTER this pre-filter: raw values up to 0.5e-6
    # below the threshold still round up to it, so leave a full 1e-6
    slack = threshold - 1e-6

    def kernel(batches):
        for pdf in batches:
            for blk_a, blk_b, items_a, items_b in zip(
                pdf["blk_a"], pdf["blk_b"], pdf["items_a"], pdf["items_b"]
            ):
                ids_a = np.array([it["id"] for it in items_a], dtype=np.int64)
                ids_b = np.array([it["id"] for it in items_b], dtype=np.int64)
                A = np.array([it["v"] for it in items_a], dtype=np.float64)
                B = np.array([it["v"] for it in items_b], dtype=np.float64)
                dim = A.shape[1]
                dot = np.zeros((len(ids_a), len(ids_b)))
                sq_a = np.zeros(len(ids_a))
                sq_b = np.zeros(len(ids_b))
                # dimension-ordered accumulation == the fold's add order
                for k in range(dim):
                    dot += A[:, k][:, None] * B[:, k][None, :]
                    sq_a += A[:, k] * A[:, k]
                    sq_b += B[:, k] * B[:, k]
                cos = dot / (np.sqrt(sq_a)[:, None] * np.sqrt(sq_b)[None, :])
                # same-block tiles hold each unordered pair twice — keep
                # a<b only; cross-block tiles hold it once but the smaller
                # id may sit on EITHER side (ids hash to blocks), so keep
                # every pair and emit it (min, max)-normalized
                if blk_a == blk_b:
                    mask = ids_a[:, None] < ids_b[None, :]
                else:
                    mask = np.ones((len(ids_a), len(ids_b)), dtype=bool)
                ia, ib = np.nonzero(mask & (cos >= slack))
                yield pd.DataFrame(
                    {
                        "vec_a": np.minimum(ids_a[ia], ids_b[ib]),
                        "vec_b": np.maximum(ids_a[ia], ids_b[ib]),
                        "raw": cos[ia, ib],
                    }
                )

    out = grid.mapInPandas(kernel, "vec_a long, vec_b long, raw double")
    return (
        out.withColumn("cos_sim", F.round(F.col("raw"), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("vec_a", "vec_b", "cos_sim")
    )


def embedding_near_dup_lsh(
    emb: DataFrame,
    threshold: float = 0.4,
    n_planes: int = 16,
    bands: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SCALE path for embedding near-dup: sign-LSH signature (n_planes
    bits, fixed seed) split into ``bands`` bit-bands; pairs sharing ANY
    band bucket are candidates (banded self-join on the tiny (band,
    band_val) key — never all-pairs); candidates are verified with the
    exact cosine. Same band trick as minhash_lsh_candidates /
    simhash_near_pairs. Recall < 1 by construction: a pair at cosine s
    agrees on one plane with p = 1 - acos(s)/pi, shares a band with
    1-(1-p^width)^bands — measured against embedding_cosine_pairs in
    tests/test_dataops.py. At 100 TB the banded join shuffles only
    (id, sig) pairs; vectors rejoin for the candidate set only."""
    from .ann import lsh_bucket_col, lsh_planes

    planes = lsh_planes(dim, n_planes)
    sig = emb.select(
        F.col(id_col).alias("doc"),
        lsh_bucket_col(F.col(vec_col).cast("array<double>"), planes).alias("sig"),
    )
    width = n_planes // bands
    mask = (1 << width) - 1
    banded = sig.select(
        "doc",
        F.explode(F.array(*[F.lit(i) for i in range(bands)])).alias("band"),
        F.col("sig"),
    ).withColumn(
        "band_val",
        F.expr(f"shiftright(sig, CAST(band * {width} AS INT)) & {mask}"),
    )
    a = banded.select("band", "band_val", F.col("doc").alias("vec_a"))
    b = banded.select("band", "band_val", F.col("doc").alias("vec_b"))
    cands = (
        a.join(b, ["band", "band_val"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    from .ann import cosine

    va = emb.select(F.col(id_col).alias("vec_a"), F.col(vec_col).cast("array<double>").alias("va"))
    vb = emb.select(F.col(id_col).alias("vec_b"), F.col(vec_col).cast("array<double>").alias("vb"))
    return (
        cands.join(va, "vec_a")
        .join(vb, "vec_b")
        .withColumn("cos_sim", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("vec_a", "vec_b", "cos_sim")
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iters: int = 25,
) -> DataFrame:
    """Cluster verified near-dup pairs into connected components:
    component id = min doc id reachable through the pair graph.

    This is the step the LSH pipelines stop short of: pair lists
    ((a,b), (b,c)) must collapse to groups ({a,b,c}) before "keep one
    per group" can run. Iterative min-label propagation: each round,
    every node takes the min of its own label and its neighbors'
    labels; converges in O(graph diameter) rounds (near-dup components
    are short chains in practice; the Kang/CIKM "hash-to-min" and
    large-star/small-star variants give O(log n) rounds if diameter
    ever bites at 100 TB — same join shape, so the swap is local).

    Scale design: each round is ONE shuffle join keyed by node id over
    the (src, dst) edge list — no adjacency collected to the driver;
    convergence is checked with a count() of changed labels (a cheap
    map-side-combined action); ``localCheckpoint`` truncates the plan
    so lineage doesn't grow per round. Reference: Solr has no CC
    operator — this mirrors the dedup clustering stage of web-scale
    corpus pipelines (e.g. the MinHash dedup in Gopher/RefinedWeb).

    Returns (doc_id, component) for every node that appears in a pair.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist()
    )
    # label(x) starts at min(x, min neighbor) — one round folded in
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("nmin"))
        .select(
            F.col("src").alias("node"),
            F.least(F.col("src"), F.col("nmin")).alias("label"),
        )
        .localCheckpoint()
    )
    # labels only ever decrease, so sum(label) strictly decreases until
    # the fixpoint — convergence needs one tiny agg, not a self-join
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iters):
        # neighbor labels -> node, take global min with own label
        msgs = edges.join(
            labels.withColumnRenamed("node", "dst"), "dst"
        ).select(F.col("src").alias("node"), "label")
        labels = (
            msgs.union(labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    edges.unpersist()
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("component"))


# ---------------------------------------------------------------------------
# Cross-dataset bloom dedup — dedupe an incoming corpus against a huge
# reference corpus WITHOUT a full shuffle join. Reference analogy:
# codecs/bloom/FuzzySet.java applied at the corpus level (the standard
# web-scale recipe: CCNet / RefinedWeb-style cross-snapshot dedup).
#
# One pass over the reference builds a bitset over its doc hashes
# (mapInPandas partial bitsets, OR-reduced on the driver; ~14.4 bits/key
# at fp=1e-3 — 1.8 GB per billion keys, broadcast ONCE instead of
# shuffling the full reference every batch; beyond a few billion keys,
# range-partition the reference and run this per range — same code).
# Membership is checked executor-side against the broadcast bits; docs the
# bloom clears are EXACT non-duplicates (no false negatives), and only the
# maybe-dup sliver pays the verification join.
# ---------------------------------------------------------------------------


def bloom_reference(
    df: DataFrame, key_col: str, fp: float = 1e-3
):
    """Build a bloom over ``df[key_col]`` (strings). Returns a TermBloom."""
    import numpy as np
    import pandas as pd

    from ..functions.bloom import TermBloom, _hashes, _params

    n = df.count()
    m, k = _params(max(n, 1), fp)

    def partial(batches):
        bits = np.zeros(m // 8, dtype=np.uint8)
        any_rows = False
        for pdf in batches:
            for v in pdf[key_col]:
                any_rows = True
                for h in _hashes(str(v), k, m):
                    bits[h >> 3] |= 1 << (h & 7)
        if any_rows:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    parts = df.select(key_col).mapInPandas(partial, "bits binary").collect()
    acc = np.zeros(m // 8, dtype=np.uint8)
    for r in parts:
        acc |= np.frombuffer(r["bits"], dtype=np.uint8)
    return TermBloom(acc, m, k)


def bloom_dedup_against(
    spark,
    reference: DataFrame,
    incoming: DataFrame,
    key_col: str,
    fp: float = 1e-3,
) -> DataFrame:
    """Annotate ``incoming`` with ``maybe_dup`` (bloom hit against the
    reference's keys). ``filter(~maybe_dup)`` rows are guaranteed-new; only
    maybe-dup rows need the exact verification join."""
    import pandas as pd

    from ..functions.bloom import _hashes

    bloom = bloom_reference(reference, key_col, fp)
    bits, m, k = bloom.bits, bloom.n_bits, bloom.n_hashes
    bbits = spark.sparkContext.broadcast(bits)

    @F.pandas_udf("boolean")
    def maybe(vals):
        b = bbits.value

        def chk(v):
            for h in _hashes(str(v), k, m):
                if not (b[h >> 3] >> (h & 7)) & 1:
                    return False
            return True

        return vals.map(chk)

    return incoming.withColumn("maybe_dup", maybe(F.col(key_col)))
