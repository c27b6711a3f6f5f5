"""Similarity search over embedding columns (array<float>).

- cosine_topk: brute-force cosine top-k — the exactness baseline. Dot
  products via JVM-side higher-order functions (F.zip_with + F.aggregate):
  stays in whole-stage codegen, no Python.
- lsh_bucketize / lsh_topk: random-hyperplane (sign) LSH — the scale path.
  Hyperplane matrix is generated from a fixed seed and EMBEDDED as literals
  (deterministic, reproducible cross-engine; at 100 TB the planes are a
  broadcast literal either way). Probe searches only its bucket: candidate
  set shrinks ~2^n_planes-fold; recall tested against brute force.
- ivf_assign / ivf_topk: IVF-style coarse quantizer — centroid list passed
  in (e.g. from a sampled k-means), assignment = argmin distance via
  broadcast join; probe scans nprobe nearest cells only.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LSH_SEED = 42


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(emb: DataFrame, probe: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k against a literal probe vector.
    Fully JVM-side; one narrow scan + TakeOrderedAndProject."""
    p = F.array(*[F.lit(float(x)) for x in probe])
    return (
        emb.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col).cast("array<double>"), p), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def euclidean_topk(emb: DataFrame, probe: list[float], k: int = 10,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force L2 top-k against a literal probe vector, scored with
    Lucene's EUCLIDEAN similarity-to-score transform 1/(1+d^2)
    (index/VectorSimilarityFunction.java#EUCLIDEAN, the score used by
    KnnFloatVectorQuery). d^2 is expanded to dot products
    (v.v - 2 v.p + p.p) so the oracle's list_dot_product mirrors the
    operation shape exactly. JVM-side fold; TakeOrderedAndProject."""
    p = F.array(*[F.lit(float(x)) for x in probe])
    v = F.col(vec_col).cast("array<double>")
    d2 = _dot(v, v) - F.lit(2.0) * _dot(v, p) + _dot(p, p)
    return (
        emb.select(
            F.col(id_col),
            F.round(F.lit(1.0) / (F.lit(1.0) + d2), 6).alias("l2_score"),
        )
        .orderBy(F.desc("l2_score"), F.asc(id_col))
        .limit(k)
    )


def byte_quantize_expr(vec_col):
    """int8 floor-quantization as a Column: floor(x*127) clamped to
    [-128, 127] per element (array<float|double> in, array<long> out).
    THE pinned quantizer — vector_byte_dot_topk and the
    vector_quantized_recall gate must share it so the gate measures the
    quantizer that ships. SQL mirror: DUCK_BYTE_QUANT."""
    return F.transform(
        vec_col.cast("array<double>"),
        lambda x: F.greatest(
            F.lit(-128).cast("long"),
            F.least(F.lit(127).cast("long"), F.floor(x * 127.0)),
        ),
    )


# DuckDB rendering of byte_quantize_expr ({e} = the vector expression)
DUCK_BYTE_QUANT = (
    "list_transform({e}::DOUBLE[], "
    "x -> greatest(-128, least(127, floor(x * 127.0)))::BIGINT)"
)


def long_dot_expr(a, b):
    """Integer dot product of two array<long> Columns (exact, JVM fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def lsh_planes(dim: int, n_planes: int = 8, seed: int = LSH_SEED) -> list[list[float]]:
    """Deterministic ±1 hyperplanes (reproducible literals, both engines)."""
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 2, size=(n_planes, dim)) * 2.0 - 1.0).tolist()


def lsh_bucket_col(vec_col, planes: list[list[float]]):
    """Sign-LSH bucket id: bit j = (dot(v, plane_j) > 0)."""
    acc = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(vec_col, p) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        acc = acc + bit
    return acc.cast("long")


def lsh_bucketize(emb: DataFrame, n_planes: int = 8, dim: int = 64,
                  vec_col: str = "embedding") -> DataFrame:
    planes = lsh_planes(dim, n_planes)
    return emb.withColumn(
        "bucket", lsh_bucket_col(F.col(vec_col).cast("array<double>"), planes)
    )


def _probe_bucket(probe: list[float], planes: list[list[float]]) -> int:
    pv = np.array(probe)
    bucket = 0
    for j, plane in enumerate(planes):
        if float(np.dot(pv, np.array(plane))) > 0:
            bucket |= 1 << j
    return bucket


def lsh_topk(
    emb: DataFrame,
    probe: list[float],
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table sign-LSH ANN: candidates = union over ``n_tables``
    independent hash tables of the probe's bucket; exact cosine re-rank on
    the candidate set only. At 100 TB each table's bucket is a
    partition-prunable key, so the scan touches ~n_tables/2^n_planes of the
    data instead of all of it; recall grows as 1-(1-s^p)^L."""
    v = F.col(vec_col).cast("array<double>")
    cond = None
    for t in range(n_tables):
        planes = lsh_planes(len(probe), n_planes, seed=LSH_SEED + t)
        match_t = lsh_bucket_col(v, planes) == _probe_bucket(probe, planes)
        cond = match_t if cond is None else (cond | match_t)
    p = F.array(*[F.lit(float(x)) for x in probe])
    return (
        emb.filter(cond)
        .select(
            F.col(id_col),
            F.round(cosine(v, p), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def lsh_index(
    emb: DataFrame,
    out_path: str,
    n_tables: int = 4,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
) -> None:
    """Materialize the classic multi-table LSH layout: ``n_tables`` copies
    of the table, PARTITIONED BY (table, bucket). A probe then reads
    exactly one partition per table (Spark partition pruning / Iceberg
    partition transform at scale) instead of computing hashes over the
    full dataset per query — the fix for the round-1 full-scan-filter
    shape. Storage cost n_tables x is the standard LSH trade. All tables
    are written in ONE job (the table id rides an exploded struct column),
    so build cost is one pass over the data, not n_tables sequential
    writes."""
    v = F.col(vec_col).cast("array<double>")
    pairs = []
    for t in range(n_tables):
        planes = lsh_planes(dim, n_planes, seed=LSH_SEED + t)
        pairs.append(
            F.struct(
                F.lit(t).alias("table"), lsh_bucket_col(v, planes).alias("bucket")
            )
        )
    cols = list(emb.columns)
    df = emb.withColumn("tb", F.explode(F.array(*pairs))).select(
        F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket"), *cols
    )
    df.write.mode("overwrite").partitionBy("table", "bucket").parquet(out_path)


def lsh_probe(
    spark,
    index_path: str,
    probe: list[float],
    k: int = 10,
    n_tables: int = 4,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a materialized LSH index: ONE scan whose filter is the OR of
    the probe's (table, bucket) pairs — both are partition columns, so the
    plan shows PartitionFilters and reads exactly one partition per table
    (no hash computation on the scan side); dedup, exact cosine re-rank."""
    cond = None
    for t in range(n_tables):
        planes = lsh_planes(len(probe), n_planes, seed=LSH_SEED + t)
        b = _probe_bucket(probe, planes)
        m = (F.col("table") == t) & (F.col("bucket") == b)
        cond = m if cond is None else (cond | m)
    cands = (
        spark.read.parquet(index_path)
        .filter(cond)
        .select(id_col, vec_col)
        .dropDuplicates([id_col])
    )
    p = F.array(*[F.lit(float(x)) for x in probe])
    return (
        cands.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col).cast("array<double>"), p), 6).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def ivf_assign(emb: DataFrame, centroids: list[list[float]],
               vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest centroid (coarse quantizer).
    Centroids are a broadcast-sized literal table; argmin via array sort."""
    dists = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col(vec_col).cast("array<double>"),
                        F.array(*[F.lit(float(x)) for x in c]),
                        lambda x, y: (x - y) * (x - y),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("d"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return emb.withColumn("cell", F.array_min(dists)["cell"])


def sample_centroids(emb: DataFrame, n: int = 8, vec_col: str = "embedding") -> list[list[float]]:
    """Deterministic centroid seed: first n vectors by id (stand-in for a
    sampled k-means; interface point for a real trainer)."""
    rows = emb.orderBy("vec_id").limit(n).select(vec_col).collect()
    return [list(map(float, r[0])) for r in rows]


def train_centroids(
    emb: DataFrame,
    n_cells: int = 8,
    iters: int = 10,
    sample_n: int = 4096,
    seed: int = LSH_SEED,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Sample-based Lloyd's k-means coarse quantizer (the FAISS-style IVF
    training shape: train on a bounded deterministic sample driver-side,
    assign the full dataset distributed). Deterministic: sample = first
    ``sample_n`` rows by id, numpy with a fixed seed, empty clusters keep
    their previous centroid."""
    rows = emb.orderBy(id_col).limit(sample_n).select(vec_col).collect()
    X = np.array([list(map(float, r[0])) for r in rows], dtype=np.float64)
    rng = np.random.default_rng(seed)
    cents = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(cents.shape[0]):
            m = assign == c
            if m.any():
                cents[c] = X[m].mean(axis=0)
    return cents.tolist()


def nearest_cells(
    probe: list[float], centroids: list[list[float]], nprobe: int
) -> list[int]:
    """The nprobe nearest coarse cells to the probe (ties -> lower index)."""
    p = np.asarray(probe, dtype=np.float64)
    C = np.asarray(centroids, dtype=np.float64)
    d2 = ((C - p[None, :]) ** 2).sum(axis=1)
    return [int(i) for i in np.argsort(d2, kind="stable")[:nprobe]]


def ivf_index(
    emb: DataFrame,
    centroids: list[list[float]],
    out_path: str,
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF layout: cell assignment computed ONCE at build,
    stored partitioned by cell (the inverted-file)."""
    ivf_assign(emb, centroids, vec_col=vec_col).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(out_path)


def ivf_topk(
    spark,
    index_path: str,
    centroids: list[list[float]],
    probe: list[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """nprobe IVF search: read only the nprobe nearest cells' partitions
    (partition pruning), exact cosine re-rank inside them. nprobe =
    n_cells degenerates to exact brute force."""
    cells = nearest_cells(probe, centroids, nprobe)
    p = F.array(*[F.lit(float(x)) for x in probe])
    return (
        spark.read.parquet(index_path)
        .filter(F.col("cell").isin(cells))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col).cast("array<double>"), p), 6).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Product quantization (FAISS IndexIVFPQ shape; Jégou et al. 2011 "Product
# Quantization for Nearest Neighbor Search"). The embedding is split into
# ``m`` subvectors; each is vector-quantized against its own ``ksub``-entry
# codebook -> an m-byte code replaces the 4*dim-byte vector (32x at
# m=8/dim=64). Search = ADC: the probe precomputes a per-subspace lookup
# table of distances to every codebook entry (driver-side, m*ksub floats);
# a candidate's approximate distance is the sum of m table lookups — pure
# JVM column math over the code column, never touching the raw vectors.
# ---------------------------------------------------------------------------


def train_pq_codebooks(
    emb: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 10,
    sample_n: int = 4096,
    seed: int = LSH_SEED,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Per-subspace Lloyd's k-means on a bounded deterministic sample
    (the FAISS training shape). Returns codebooks[m][ksub][dsub]."""
    rows = emb.orderBy(id_col).limit(sample_n).select(vec_col).collect()
    X = np.array([list(map(float, r[0])) for r in rows], dtype=np.float64)
    dsub = X.shape[1] // m
    rng = np.random.default_rng(seed)
    books = []
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        cents = S[rng.choice(len(S), size=min(ksub, len(S)), replace=False)].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(cents.shape[0]):
                mask = assign == c
                if mask.any():
                    cents[c] = S[mask].mean(axis=0)
        books.append(cents.tolist())
    return books


def _sub_dist(vec_col_expr, j: int, dsub: int, cent: list[float]):
    """Euclidean distance of subvector j to one codebook centroid —
    sqrt-of-fold, the same operation order as DuckDB's list_distance
    (cross-engine bit determinism for the oracle rows)."""
    sub = F.slice(vec_col_expr, j * dsub + 1, dsub)
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                sub,
                F.array(*[F.lit(float(x)) for x in cent]),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Add ``code`` (array<int>, length m): per-subspace argmin centroid.
    All JVM-side; ties break to the lower cell id."""
    v = F.col(vec_col).cast("array<double>")
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    code = F.array(
        *[
            F.array_min(
                F.array(
                    *[
                        F.struct(
                            _sub_dist(v, j, dsub, cent).alias("d"),
                            F.lit(c).alias("cell"),
                        )
                        for c, cent in enumerate(codebooks[j])
                    ]
                )
            )["cell"]
            for j in range(m)
        ]
    )
    return emb.withColumn("code", code)


def pq_adc_quantized(
    coded: DataFrame, codebooks: list[list[list[float]]], probe: list[float]
) -> DataFrame:
    """Add ``adc_q``: integer-quantized asymmetric distance
    sum_j round(1e6 * dist(probe_j, codebook_j[code_j])). Integer so the
    cross-subspace sum is order-independent (exact cross-engine equality);
    the LUT is computed driver-side and inlined as literals."""
    p = np.asarray(probe, dtype=np.float64)
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    luts = []
    for j in range(m):
        sub = p[j * dsub : (j + 1) * dsub]
        # same op order as the engine/oracle: sqrt of sequential fold
        row = []
        for cent in codebooks[j]:
            acc = 0.0
            for x, y in zip(sub, cent):
                acc = acc + (x - y) * (x - y)
            row.append(float(np.sqrt(acc)))
        luts.append(row)
    adc = None
    for j in range(m):
        lut = F.array(*[F.lit(x) for x in luts[j]])
        term = F.round(
            F.element_at(lut, F.element_at(F.col("code"), j + 1) + 1) * 1e6, 0
        ).cast("long")
        adc = term if adc is None else adc + term
    return coded.withColumn("adc_q", adc)


def pq_topk(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    probe: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k over PQ codes (no raw-vector math on the scan side)."""
    coded = pq_encode(emb, codebooks, vec_col=vec_col)
    return (
        pq_adc_quantized(coded, codebooks, probe)
        .select(id_col, "adc_q")
        .orderBy(F.asc("adc_q"), F.asc(id_col))
        .limit(k)
    )


def ivfpq_index(
    emb: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    out_path: str,
    vec_col: str = "embedding",
) -> None:
    """IVF-PQ layout: coarse cell partition + PQ code column, raw vector
    retained for the optional exact re-rank tail (FAISS's refine stage).
    At 100 TB the codes column is what the ADC scan reads — 32x smaller
    than the vectors; column pruning keeps the vectors on disk."""
    df = pq_encode(ivf_assign(emb, centroids, vec_col=vec_col), codebooks, vec_col)
    df.write.mode("overwrite").partitionBy("cell").parquet(out_path)


def ivfpq_topk(
    spark,
    index_path: str,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    probe: list[float],
    k: int = 10,
    nprobe: int = 2,
    rerank: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """nprobe IVF-PQ search: partition-pruned cell reads, ADC ranking over
    the code column only; optionally exact-cosine re-rank the top ``rerank``
    ADC candidates (reads the vector column for those rows alone)."""
    cells = nearest_cells(probe, centroids, nprobe)
    scan = spark.read.parquet(index_path).filter(F.col("cell").isin(cells))
    adc = (
        pq_adc_quantized(scan.select(id_col, "code"), codebooks, probe)
        .orderBy(F.asc("adc_q"), F.asc(id_col))
        .limit(max(k, rerank))
    )
    if not rerank:
        return adc.select(id_col, "adc_q").limit(k)
    p = F.array(*[F.lit(float(x)) for x in probe])
    cand = adc.select(id_col).join(scan.select(id_col, vec_col), id_col)
    return (
        cand.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col).cast("array<double>"), p), 6).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )
