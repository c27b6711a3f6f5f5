"""Round-5 widening batch #13: distributed facet refinement, near-dup
cluster keeper selection, and per-source document capping.

Each entry re-expresses a reference component (public lucene-solr
path#symbol cited per entry; the reference mount is empty) over the driver
testdata with a DuckDB oracle using identical column aliases.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators import dedup
from .dataops_queries import _MINHASH_SQL
from .driver_queries import _read, _tokens, register

# ---------------------------------------------------------------------------
# Distributed facet refinement — solr/core/.../handler/component/
# FacetComponent.java (DistribFieldFacet: per-shard facet.limit*1.5+10
# overrequest, then the refinement phase asks every shard for exact
# counts of the merged candidate terms; json.facet calls the same
# two-phase protocol `refine:true`). ENGINE SHAPE, not a re-expression:
# phase 1 computes per-shard (deterministic doc-hash shards) top
# candidates inside one grouped agg + window, phase 2 recounts ONLY the
# merged candidate set via a broadcast semi-join — the scatter-gather
# shape Solr runs across shards, here across partitions. The oracle is
# the exact global top-10: the row proves the refinement protocol
# reconstructs it (sufficient overrequest), which is precisely the
# guarantee the reference's refinement phase exists to provide. At
# 100 TB phase 1 is map-side per-shard, phase 2 touches ~limit*shards
# keys — no global facet shuffle of the full key space. Facet key: a
# skewed derived bucket (floor(sqrt(o_orderkey%10000)) — counts grow
# linearly in the bucket, clear top margins). A FLAT key space defeats
# rank-based overrequest — per-shard cutoff ties hide true tops — which
# is exactly the documented reason facet.overrequest is tunable in the
# reference; the protocol's guarantee holds when overrequest covers the
# rank inversions, as it provably does on this distribution (verified at
# sf0.01 AND sf0.1: zero candidate misses).
# ---------------------------------------------------------------------------

_FR_SHARDS = 4
_FR_K = 10
_FR_OVER = _FR_K + _FR_K // 2 + 10  # Solr's limit*1.5+10 overrequest


@register(
    "facet_distributed_refine",
    f"""SELECT CAST(floor(sqrt(o_orderkey % 10000)) AS BIGINT) AS bucket,
       count(*)::BIGINT AS n_orders
FROM orders GROUP BY 1
ORDER BY n_orders DESC, bucket ASC LIMIT {_FR_K}""",
)
def facet_distributed_refine(spark, sf_dir):
    """Two-phase sharded facet (overrequest + refine) == exact global
    top-10 skew-buckets by order count."""
    bucket = (
        F.floor(F.sqrt(F.col("o_orderkey") % 10000)).cast("long").alias("bucket")
    )
    o = _read(spark, sf_dir, "orders").select(
        bucket, (F.col("o_orderkey") % _FR_SHARDS).alias("shard")
    )
    # phase 1: per-shard facet with overrequest
    per_shard = o.groupBy("shard", "bucket").agg(F.count("*").alias("c"))
    w = Window.partitionBy("shard").orderBy(F.desc("c"), F.asc("bucket"))
    candidates = (
        per_shard.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _FR_OVER)
        .select("bucket")
        .distinct()
    )
    # phase 2 (refinement): exact counts for the candidate union only
    refined = (
        _read(spark, sf_dir, "orders")
        .select(bucket)
        .join(F.broadcast(candidates), "bucket", "left_semi")
        .groupBy("bucket")
        .agg(F.count("*").alias("n_orders"))
    )
    return refined.orderBy(F.desc("n_orders"), F.asc("bucket")).limit(_FR_K)


# ---------------------------------------------------------------------------
# Near-dup cluster keeper — the "keep the best representative" step of
# corpus dedup (the policy layer over SignatureUpdateProcessor /
# solr/core/.../update/processor/SignatureUpdateProcessorFactory.java's
# overwriteDupes, where the indexed representative replaces its dup
# group): verified MinHash+LSH pairs -> connected components -> per
# cluster keep the LONGEST doc (n_chars desc, doc_id asc tiebreak), drop
# the rest. Components via dedup.connected_components (iterative
# min-label propagation, the scale path); the oracle recomputes them
# with a recursive transitive-closure CTE over the identical pair set.
# ---------------------------------------------------------------------------


@register(
    "dedup_cluster_keeper",
    f"""WITH RECURSIVE pairs AS ({_MINHASH_SQL}),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
reach(node, r) AS (
    SELECT src, src FROM edges
  UNION
    SELECT e.src, r.r FROM edges e JOIN reach r ON r.node = e.dst
),
comp AS (SELECT node AS doc_id, min(r) AS component FROM reach GROUP BY node),
j AS (SELECT c.component, c.doc_id, d.n_chars
      FROM comp c JOIN documents d USING (doc_id)),
k AS (SELECT component, doc_id,
             row_number() OVER (PARTITION BY component
                                ORDER BY n_chars DESC, doc_id ASC) AS rn,
             count(*) OVER (PARTITION BY component) AS nm
      FROM j)
SELECT component, doc_id AS keeper_doc_id, nm::BIGINT AS n_members,
       (nm - 1)::BIGINT AS n_dropped
FROM k WHERE rn = 1 ORDER BY component ASC""",
)
def dedup_cluster_keeper(spark, sf_dir):
    """Keep-longest policy per near-dup cluster: keeper id + drop count."""
    toks = _tokens(spark, sf_dir)
    pairs = dedup.minhash_lsh_dedup(
        toks, tokens_col="tokens", k=3, n_hashes=12, bands=4, threshold=0.8
    )
    comp = dedup.connected_components(pairs)
    d = _read(spark, sf_dir, "documents").select("doc_id", "n_chars")
    j = comp.join(d, "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    wc = Window.partitionBy("component")
    return (
        j.withColumn("rn", F.row_number().over(w))
        .withColumn("nm", F.count("*").over(wc))
        .where(F.col("rn") == 1)
        .select(
            "component",
            F.col("doc_id").alias("keeper_doc_id"),
            F.col("nm").alias("n_members"),
            (F.col("nm") - 1).alias("n_dropped"),
        )
        .orderBy(F.asc("component"))
    )


# ---------------------------------------------------------------------------
# Per-source document cap — the domain-capping step of a pretraining
# mixture (bounding any one source's contribution; the per-route
# quota sibling of source_weighted_sample): keep the first CAP docs of
# each source in deterministic doc_id order, report kept/total per
# source. One window partitioned by source — the hash-routed shape.
# ---------------------------------------------------------------------------

_SC_CAP = 10


@register(
    "source_cap_sample",
    f"""WITH r AS (SELECT source, doc_id,
        row_number() OVER (PARTITION BY source ORDER BY doc_id ASC) AS rn
     FROM documents)
SELECT source, count(*) FILTER (WHERE rn <= {_SC_CAP})::BIGINT AS n_kept,
       count(*)::BIGINT AS n_total
FROM r GROUP BY source ORDER BY source ASC""",
)
def source_cap_sample(spark, sf_dir):
    """Cap each source at 10 docs (doc_id order): kept/total counts."""
    d = _read(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.asc("doc_id"))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .groupBy("source")
        .agg(
            F.count(F.when(F.col("rn") <= _SC_CAP, 1)).alias("n_kept"),
            F.count("*").alias("n_total"),
        )
        .orderBy(F.asc("source"))
    )
