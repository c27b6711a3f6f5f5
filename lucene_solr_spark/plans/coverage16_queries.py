"""Round-5 widening batch #7: TextProfileSignature fuzzy dedup,
DocBasedVersionConstraints, collapse nullPolicy=collapse, and the
DrillStream export-sorted rollup.

Each entry re-expresses a reference component (public lucene-solr
path#symbol cited per entry; the reference mount is empty) over the driver
testdata with a DuckDB oracle using identical column aliases.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.analysis import duckdb_tokenize_sql
from .driver_queries import _read, _tokens, register

# ---------------------------------------------------------------------------
# TextProfileSignature — solr/core/src/java/org/apache/solr/update/
# processor/TextProfileSignature.java (from Nutch; the FUZZY sibling of
# Lookup3Signature, which `signature_dedup_update` already covers): a
# quantized term-frequency profile so near-identical docs (reordered /
# slightly edited) hash identically. Pinned spec, mirrored EXACTLY in the
# oracle:
#   freq     = per-doc term counts over the pinned tokenizer's stream
#   maxFreq  = max freq in the doc
#   quant    = round(maxFreq * QUANT_RATE) with QUANT_RATE = 0.01;
#              if quant < 2: quant = 2 if maxFreq > 4 else 1
#   keep     terms with freq >= quant; qfreq = (freq // quant) * quant
#   profile  = "term qfreq term qfreq ..." sorted by qfreq DESC, term ASC
#   sig      = md5(profile)
# The row reports corpus-level profile stats (doc count, distinct
# profiles, largest collision cluster) — exact in both engines.
# ---------------------------------------------------------------------------

_TPS_RATE = 0.01


@register(
    "text_profile_signature",
    f"""WITH toks AS (SELECT doc_id, unnest({duckdb_tokenize_sql('text')}) AS term
            FROM documents),
tf AS (SELECT doc_id, term, count(*) AS freq FROM toks GROUP BY doc_id, term),
mx AS (SELECT doc_id, max(freq) AS maxfreq FROM tf GROUP BY doc_id),
q AS (SELECT doc_id,
      CASE WHEN round(maxfreq * {_TPS_RATE}) >= 2
             THEN cast(round(maxfreq * {_TPS_RATE}) AS BIGINT)
           WHEN maxfreq > 4 THEN 2 ELSE 1 END AS quant FROM mx),
qf AS (SELECT tf.doc_id, tf.term, (tf.freq // q.quant) * q.quant AS qfreq
       FROM tf JOIN q ON q.doc_id = tf.doc_id WHERE tf.freq >= q.quant),
prof AS (SELECT doc_id,
         md5(string_agg(term || ' ' || qfreq, ' '
                        ORDER BY qfreq DESC, term ASC)) AS sig
         FROM qf GROUP BY doc_id),
clusters AS (SELECT sig, count(*) AS cnt FROM prof GROUP BY sig)
SELECT sum(cnt)::BIGINT AS n_docs, count(*)::BIGINT AS n_profiles,
       max(cnt)::BIGINT AS n_max_cluster
FROM clusters""",
)
def text_profile_signature(spark, sf_dir):
    """Quantized term-frequency profile signatures over the corpus."""
    toks = _tokens(spark, sf_dir)
    tf = (
        toks.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("freq"))
    )
    mx = tf.groupBy("doc_id").agg(F.max("freq").alias("maxfreq"))
    quant = (
        F.when(
            F.round(F.col("maxfreq") * _TPS_RATE) >= 2,
            F.round(F.col("maxfreq") * _TPS_RATE).cast("long"),
        )
        .when(F.col("maxfreq") > 4, F.lit(2))
        .otherwise(F.lit(1))
    )
    qf = (
        tf.join(mx.select("doc_id", quant.alias("quant")), "doc_id")
        .filter(F.col("freq") >= F.col("quant"))
        .select(
            "doc_id",
            "term",
            (F.expr("freq div quant") * F.col("quant")).alias("qfreq"),
        )
    )
    prof = qf.groupBy("doc_id").agg(
        F.md5(
            F.concat_ws(
                " ",
                F.expr(
                    "transform(sort_array(collect_list(struct(-qfreq AS nq, "
                    "term AS t, concat(term, ' ', qfreq) AS s))), x -> x.s)"
                ),
            )
        ).alias("sig")
    )
    clusters = prof.groupBy("sig").agg(F.count("*").alias("cnt"))
    return clusters.agg(
        F.sum("cnt").alias("n_docs"),
        F.count("*").alias("n_profiles"),
        F.max("cnt").alias("n_max_cluster"),
    )


# ---------------------------------------------------------------------------
# DocBasedVersionConstraints — solr/core/src/java/org/apache/solr/update/
# processor/DocBasedVersionConstraintsProcessorFactory.java: updates carry
# an EXTERNAL version field; an update is dropped unless its version is
# greater than the currently-stored one, so replaying a batch in ANY
# order converges to the max-version doc per id (distinct from
# `atomic_update_conflicts`, which pins Solr's internal
# _expected_version_ optimistic locking). Update batch synthesized from
# orders: id = o_custkey, version = o_orderkey, payload = o_totalprice.
# Spark shape: one map-combined max(struct(version, payload)) arg-max —
# replay-order independence by construction.
# ---------------------------------------------------------------------------


@register(
    "doc_version_constraints",
    """WITH winners AS (
  SELECT o_custkey AS id, o_orderkey AS version, o_totalprice AS payload,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderkey DESC) AS rn,
         count(*) OVER (PARTITION BY o_custkey) AS n_attempts
  FROM orders)
SELECT id, version, payload, (n_attempts - 1)::BIGINT AS n_dropped
FROM winners WHERE rn = 1
ORDER BY version DESC, id ASC LIMIT 10""",
)
def doc_version_constraints(spark, sf_dir):
    """Max-external-version wins per id; older updates dropped."""
    o = _read(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_custkey").alias("id"))
        .agg(
            F.max(
                F.struct(
                    F.col("o_orderkey").alias("version"),
                    F.col("o_totalprice").alias("payload"),
                )
            ).alias("win"),
            (F.count("*") - 1).alias("n_dropped"),
        )
        .select(
            "id",
            F.col("win.version").alias("version"),
            F.col("win.payload").alias("payload"),
            "n_dropped",
        )
        .orderBy(F.desc("version"), F.asc("id"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Collapse nullPolicy=collapse — solr CollapsingQParserPlugin.java: docs
# with a NULL collapse key form ONE collective group (vs nullPolicy=expand
# in `collapse_null_policy_expand`, where each is its own singleton).
# Same selector (min n_chars, doc_id tie-break) and the same nullif'd key
# so the two rows contrast exactly one knob.
# ---------------------------------------------------------------------------


@register(
    "collapse_null_policy_collapse",
    """WITH d AS (SELECT doc_id, n_chars, nullif(lang, 'de') AS grp FROM documents),
best AS (SELECT grp, doc_id, n_chars FROM (
  SELECT *, row_number() OVER (PARTITION BY grp
                               ORDER BY n_chars ASC, doc_id ASC) AS rn
  FROM d) WHERE rn = 1)
SELECT grp, doc_id, n_chars FROM best ORDER BY doc_id ASC LIMIT 50""",
)
def collapse_null_policy_collapse(spark, sf_dir):
    """min=n_chars collapse where the null-key docs collapse to ONE group."""
    d = _read(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", F.expr("nullif(lang, 'de')").alias("grp")
    )
    # nulls participate as one group: max over struct with inverted keys
    # (min n_chars == max of (-n_chars, -doc_id))
    best = (
        d.groupBy("grp")
        .agg(
            F.max(
                F.struct(
                    (-F.col("n_chars")).alias("nn"),
                    (-F.col("doc_id")).alias("nd"),
                )
            ).alias("top")
        )
        .select(
            "grp",
            (-F.col("top.nd")).alias("doc_id"),
            (-F.col("top.nn")).alias("n_chars"),
        )
    )
    return best.orderBy(F.asc("doc_id")).limit(50)


# ---------------------------------------------------------------------------
# DrillStream — solrj/io/stream/DrillStream.java + solr /export drill
# mode: the rollup expression runs INSIDE each shard over its
# export-sorted stream; DrillStream merges the shard outputs. Spark
# mapping in streaming/parallel.py#drill_rollup: repartitionByRange is
# the shard slicing (vs ParallelStream's hash route in
# `parallel_stream_rollup`), the open-group kernel is shared, and the
# merged output is globally key-ordered with no final combine. Rolled
# over orders by o_custkey (count + sum spend) — the ascending key head
# pins the global order drill guarantees and a hash route would not.
# ---------------------------------------------------------------------------


@register(
    "drill_stream_rollup",
    """SELECT o_custkey, count(*)::BIGINT AS n,
       round(sum(o_totalprice), 2) AS sum_o_totalprice
FROM orders GROUP BY o_custkey
ORDER BY o_custkey ASC LIMIT 10""",
)
def drill_stream_rollup(spark, sf_dir):
    """drill(orders, sort=o_custkey, rollup over=o_custkey, count, sum)."""
    from ..streaming.parallel import drill_rollup

    o = _read(spark, sf_dir, "orders")
    rolled = drill_rollup(o, "o_custkey", ["o_totalprice"], workers=4)
    return (
        rolled.select(
            "o_custkey",
            "n",
            F.round("sum_o_totalprice", 2).alias("sum_o_totalprice"),
        )
        .orderBy(F.asc("o_custkey"))
        .limit(10)
    )
