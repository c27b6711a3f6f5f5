"""Semantic pins for the coverage19 batch: MinHashFilter's k-smallest
contract, the keyword-repeat / stemmer-override chain semantics, capture
groups, postings-decoded termfreq, euclidean KNN, and merge/unique
stream order."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod  # noqa: F401  (registers the catalog)
from lucene_solr_spark.plans import coverage19_queries as c19

from .conftest import SF_DIR


def test_minhash_filter_k_smallest(spark):
    """Every doc emits at most hashSetSize distinct minhash tokens, and
    the kept hashes are exactly the k smallest of the doc's shingle-hash
    set (recomputed independently here)."""
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20).collect()

    import hashlib

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    per_doc_expected = {}
    for r in d:
        toks = r.text.split(" ")
        hs = {h60(" ".join(toks[i : i + 3])) for i in range(len(toks) - 2)}
        per_doc_expected[r.doc_id] = set(sorted(hs)[: c19._MH_K])
    # engine side: rebuild the kept set per doc (same plan fragment)
    doc_df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sh = (
        doc_df.where(F.col("doc_id").isin(*per_doc_expected))
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(1, size(split(text,' ')) - 2),"
                        " i -> concat_ws(' ', slice(split(text,' '), i, 3)))"
                    )
                )
            ).alias("shingle"),
        )
        .select(
            "doc_id",
            F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10)
            .cast("long")
            .alias("mh"),
        )
        .distinct()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.asc("mh"))
    kept = (
        sh.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= c19._MH_K)
        .collect()
    )
    got: dict = {}
    for r in kept:
        got.setdefault(r.doc_id, set()).add(r.mh)
    assert got == per_doc_expected


def test_keyword_repeat_emits_surface_and_stem():
    """The chain's per-token emission: surface+stem pair when the stemmer
    acts, single token when it's a no-op (RemoveDuplicates collapse)."""
    stem_sql = c19._KR_STEM_SQL
    # spot-check the stemmer rule itself via DuckDB (same SQL both engines)
    import duckdb

    con = duckdb.connect()
    for tok, want in [
        ("values", "value"),
        ("keys", "key"),
        ("as", "as"),  # len < 3 -> unchanged
        ("class", "class"),  # 'ss' suffix protected
        ("campus", "campus"),  # 'us' suffix protected
        ("thes", "the"),
    ]:
        got = con.execute(
            f"SELECT {stem_sql.format(t=repr(tok))}"
        ).fetchone()[0]
        assert got == want, (tok, got, want)


def test_stemmer_override_beats_stemmer():
    """Override mapping and keyword protection take precedence over the
    minimal stemmer."""
    import duckdb

    con = duckdb.connect()
    for tok, want in [
        ("windows", "window-os"),  # override dictionary wins
        ("keys", "keys"),  # keyword-marked: stemmer skipped
        ("values", "value"),  # everything else stems
    ]:
        got = con.execute(
            f"SELECT {c19._SO_CASE.format(t=repr(tok))}"
        ).fetchone()[0]
        assert got == want, (tok, got, want)


def test_pattern_capture_groups(spark):
    rows = {r.tok: r.n for r in c19.pattern_capture_tokens(spark, SF_DIR).collect()}
    n_part = spark.read.parquet(f"{SF_DIR}/part.parquet").count()
    assert rows["Brand"] == n_part  # group 1 fires once per row
    digit_total = sum(n for t, n in rows.items() if t != "Brand")
    assert digit_total <= n_part  # top-20 window over per-brand counts
    assert all(t == "Brand" or t.isdigit() for t in rows)


def test_termfreq_matches_retokenization(spark):
    """Postings-decoded tf == tf recomputed from raw text; df constant
    equals the number of docs containing the term."""
    got = c19.function_query_termfreq(spark, SF_DIR).collect()
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
        .where(F.col("t") == c19._TFQ_TERM)
        .groupBy("doc_id")
        .agg(F.count("*").alias("tf"))
    )
    want_rows = tf.orderBy(F.desc("tf"), F.asc("doc_id")).limit(20).collect()
    assert [(r.doc_id, r.tf) for r in got] == [
        (r.doc_id, r.tf) for r in want_rows
    ]
    df_true = tf.count()
    assert all(r.df == df_true for r in got)


def test_euclidean_probe_is_top_hit(spark):
    rows = c19.vector_euclidean_topk(spark, SF_DIR).collect()
    assert rows[0].vec_id == 0 and rows[0].l2_score == 1.0  # d=0 -> score 1
    scores = [r.l2_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(0.0 < s <= 1.0 for s in scores)


def test_merge_stream_is_sorted_interleave(spark):
    rows = c19.merge_stream_sorted(spark, SF_DIR).collect()
    keys = [(r.o_orderdate, r.o_orderkey) for r in rows]
    assert keys == sorted(keys)
    assert {r.pri for r in rows} <= {"1-URGENT", "2-HIGH"}


def test_unique_stream_first_tuple_wins(spark):
    rows = c19.unique_stream_first(spark, SF_DIR).collect()
    assert len({r.o_custkey for r in rows}) == len(rows)  # one per key
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    first = (
        o.where(F.col("o_custkey") == rows[0].o_custkey)
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .first()
    )
    assert (rows[0].o_orderkey, rows[0].o_orderdate) == (
        first.o_orderkey,
        first.o_orderdate,
    )
