"""Round-5 widening batch #14: distributed two-phase grouping, reverse
path hierarchy tokenization, and type-based token filtering.

Each entry re-expresses a reference component (public lucene-solr
path#symbol cited per entry; the reference mount is empty) over the driver
testdata with a DuckDB oracle using identical column aliases.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .driver_queries import _read, register

# ---------------------------------------------------------------------------
# Distributed two-phase grouping — solr/core/.../search/grouping/
# distributed/ (SearchGroupsFieldCommand = phase 1: each shard returns
# its top group heads; SearchGroupShardResponseProcessor merges them;
# TopGroupsFieldCommand = phase 2: shards return top docs WITHIN the
# merged groups), the protocol behind distributed group=true. ENGINE
# SHAPE: phase 1 ranks groups per deterministic doc-hash shard by the
# group head (max o_totalprice) with overrequest, phase 2 recomputes the
# global within-group top docs for ONLY the merged candidates via a
# broadcast semi-join. Output: top-5 groups by global head, 2 docs each,
# flattened in (group rank, doc rank) order — proven equal to the exact
# single-pass grouping. Same scale notes as facet_distributed_refine:
# phase 1 is per-shard map-side, phase 2 touches ~groups*shards keys.
# ---------------------------------------------------------------------------

_G2_SHARDS = 4
_G2_GROUPS = 5
_G2_OVER = 15
_G2_DOCS = 2

_G2_BUCKET_SQL = "CAST(floor(sqrt(o_orderkey % 10000)) AS BIGINT)"


@register(
    "group_distributed_twophase",
    f"""WITH b AS (SELECT {_G2_BUCKET_SQL} AS grp, o_orderkey, o_totalprice
           FROM orders),
gmax AS (SELECT grp, max(o_totalprice) AS head FROM b GROUP BY grp),
topg AS (SELECT grp, head FROM gmax ORDER BY head DESC, grp ASC LIMIT {_G2_GROUPS}),
docs AS (SELECT b.grp, topg.head, b.o_orderkey, b.o_totalprice,
                row_number() OVER (PARTITION BY b.grp
                                   ORDER BY b.o_totalprice DESC, b.o_orderkey ASC)
                  AS doc_rank
         FROM b JOIN topg USING (grp))
SELECT grp, o_orderkey, o_totalprice, doc_rank
FROM docs WHERE doc_rank <= {_G2_DOCS}
ORDER BY head DESC, grp ASC, doc_rank ASC""",
)
def group_distributed_twophase(spark, sf_dir):
    """Sharded group=true: phase-1 group heads + overrequest, merge,
    phase-2 within-group top docs — equals exact grouping."""
    bucket = (
        F.floor(F.sqrt(F.col("o_orderkey") % 10000)).cast("long").alias("grp")
    )
    b = _read(spark, sf_dir, "orders").select(
        bucket,
        "o_orderkey",
        "o_totalprice",
        (F.col("o_orderkey") % _G2_SHARDS).alias("shard"),
    )
    # phase 1: per-shard group heads, overrequested
    loc = b.groupBy("shard", "grp").agg(F.max("o_totalprice").alias("mp"))
    w1 = Window.partitionBy("shard").orderBy(F.desc("mp"), F.asc("grp"))
    cand = (
        loc.withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") <= _G2_OVER)
        .select("grp")
        .distinct()
    )
    # merge: global heads for candidates only; keep the final top groups
    merged = (
        b.join(F.broadcast(cand), "grp", "left_semi")
        .groupBy("grp")
        .agg(F.max("o_totalprice").alias("head"))
        .orderBy(F.desc("head"), F.asc("grp"))
        .limit(_G2_GROUPS)
    )
    # phase 2: within-group top docs for the merged groups
    docs = b.join(F.broadcast(merged), "grp")
    w2 = Window.partitionBy("grp").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        docs.withColumn("doc_rank", F.row_number().over(w2))
        .where(F.col("doc_rank") <= _G2_DOCS)
        .orderBy(F.desc("head"), F.asc("grp"), F.asc("doc_rank"))
        .select("grp", "o_orderkey", "o_totalprice", "doc_rank")
    )


# ---------------------------------------------------------------------------
# ReversePathHierarchyTokenizer — lucene/analysis/common/.../path/
# ReversePathHierarchyTokenizer.java: emits every SUFFIX of a
# delimited path (for a/b/c: a/b/c, b/c, c) — the "file extension /
# domain suffix" sibling of the forward PathHierarchyTokenizer row
# (path_hierarchy_facet shares the same derived source/lang/bucket
# path). Pure codegen explode + one map-combined count.
# ---------------------------------------------------------------------------


@register(
    "reverse_path_hierarchy",
    """WITH p AS (SELECT source AS a, lang AS b, 'b' || (doc_id % 4)::VARCHAR AS c
             FROM documents),
u AS (SELECT unnest([a || '/' || b || '/' || c, b || '/' || c, c]) AS path_suffix
      FROM p)
SELECT path_suffix, count(*)::BIGINT AS cnt FROM u
GROUP BY 1 ORDER BY cnt DESC, path_suffix ASC LIMIT 15""",
)
def reverse_path_hierarchy(spark, sf_dir):
    """Reverse path tokens: every suffix of source/lang/bucket, top-15."""
    d = _read(spark, sf_dir, "documents")
    c = F.concat(F.lit("b"), (F.col("doc_id") % 4).cast("string"))
    s3 = F.concat_ws("/", "source", "lang", c)
    s2 = F.concat_ws("/", "lang", c)
    return (
        d.select(F.explode(F.array(s3, s2, c)).alias("path_suffix"))
        .groupBy("path_suffix")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("path_suffix"))
        .limit(15)
    )


# ---------------------------------------------------------------------------
# TypeTokenFilter — lucene/analysis/core/TypeTokenFilter.java (solr
# <filter class="solr.TypeTokenFilterFactory" types="stoptypes.txt"/>):
# drop tokens whose lexical TYPE is in the stop set — here the classic
# "drop <NUM>" config over a mixed alpha/digit token stream (c_name
# 'Customer#000000042' -> ['Customer' <ALPHANUM>, '000000042' <NUM>]).
# The surviving stream plus per-type drop counts pin the filter.
# ---------------------------------------------------------------------------


@register(
    "type_token_filter",
    """WITH toks AS (
  SELECT unnest(regexp_extract_all(c_name, '[A-Za-z]+|[0-9]+')) AS tok FROM customer),
typed AS (SELECT tok, CASE WHEN regexp_matches(tok, '^[0-9]+$')
                           THEN '<NUM>' ELSE '<ALPHANUM>' END AS tok_type
          FROM toks)
SELECT tok_type, count(*)::BIGINT AS n_tokens,
       count(*) FILTER (WHERE tok_type = '<ALPHANUM>')::BIGINT AS n_kept
FROM typed GROUP BY tok_type ORDER BY tok_type ASC""",
)
def type_token_filter(spark, sf_dir):
    """TypeTokenFilter(stopTypes=[<NUM>]): per-type token counts and the
    kept (non-numeric) count."""
    cst = _read(spark, sf_dir, "customer")
    toks = cst.select(
        F.explode(
            F.regexp_extract_all("c_name", F.lit("[A-Za-z]+|[0-9]+"), F.lit(0))
        ).alias("tok")
    )
    typed = toks.select(
        F.when(F.col("tok").rlike("^[0-9]+$"), F.lit("<NUM>"))
        .otherwise(F.lit("<ALPHANUM>"))
        .alias("tok_type")
    )
    return (
        typed.groupBy("tok_type")
        .agg(
            F.count("*").alias("n_tokens"),
            F.count(F.when(F.col("tok_type") == "<ALPHANUM>", 1)).alias(
                "n_kept"
            ),
        )
        .orderBy(F.asc("tok_type"))
    )
