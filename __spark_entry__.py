"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship top-k BM25 query through the REAL engine
  (tokenize -> inverted-index build -> WAND scorer) on sf0.001.
- ``queries()``: one entry per implemented operator (SURVEY.md §2), each
  (spark, sf_dir) -> DataFrame.
- ``oracle_sql()``: matching DuckDB SQL (identical column aliases; matched
  double-precision formulas). Entries without SQL are genuinely
  non-SQL-expressible or approximate-by-design; the driver records a
  rows-only check for those.

Implementations live in lucene_solr_spark/plans/driver_queries.py.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from lucene_solr_spark.plans.driver_queries import ORACLES, REGISTRY  # noqa: E402
import lucene_solr_spark.plans.dataops_queries  # noqa: E402,F401  (registers entries)
import lucene_solr_spark.plans.solr_queries  # noqa: E402,F401  (registers entries)
import lucene_solr_spark.plans.extra_queries  # noqa: E402,F401  (registers entries)
import lucene_solr_spark.plans.coverage_queries  # noqa: E402,F401  (registers entries)
import lucene_solr_spark.plans.coverage2_queries  # noqa: E402,F401  (registers entries)
import lucene_solr_spark.plans.coverage3_queries  # noqa: E402,F401  (registers entries)
import lucene_solr_spark.plans.coverage4_queries  # noqa: E402,F401  (registers entries)
import lucene_solr_spark.plans.coverage5_queries  # noqa: E402,F401  (registers entries)
import lucene_solr_spark.plans.coverage6_queries  # noqa: E402,F401  (registers entries)
import lucene_solr_spark.plans.coverage7_queries  # noqa: E402,F401  (registers entries)
import lucene_solr_spark.plans.coverage8_queries  # noqa: E402,F401  (registers entries)
import lucene_solr_spark.plans.coverage9_queries  # noqa: E402,F401  (registers entries)
import lucene_solr_spark.plans.coverage10_queries  # noqa: E402,F401  (registers entries)
import lucene_solr_spark.plans.coverage11_queries  # noqa: E402,F401  (registers entries)
import lucene_solr_spark.plans.coverage12_queries  # noqa: E402,F401  (registers entries)
import lucene_solr_spark.plans.coverage13_queries  # noqa: E402,F401  (registers entries)
import lucene_solr_spark.plans.coverage14_queries  # noqa: E402,F401  (registers entries)
import lucene_solr_spark.plans.coverage15_queries  # noqa: E402,F401  (registers entries)
import lucene_solr_spark.plans.coverage16_queries  # noqa: E402,F401  (registers entries)
import lucene_solr_spark.plans.coverage17_queries  # noqa: E402,F401  (registers entries)
import lucene_solr_spark.plans.coverage18_queries  # noqa: E402,F401  (registers entries)
import lucene_solr_spark.plans.coverage19_queries  # noqa: E402,F401  (registers entries)
import lucene_solr_spark.plans.coverage20_queries  # noqa: E402,F401  (registers entries)
import lucene_solr_spark.plans.coverage21_queries  # noqa: E402,F401  (registers entries)
import lucene_solr_spark.plans.coverage22_queries  # noqa: E402,F401  (registers entries)
import lucene_solr_spark.plans.coverage23_queries  # noqa: E402,F401  (registers entries)
import lucene_solr_spark.plans.coverage24_queries  # noqa: E402,F401  (registers entries)
import lucene_solr_spark.plans.coverage25_queries  # noqa: E402,F401  (registers entries)
import lucene_solr_spark.plans.coverage26_queries  # noqa: E402,F401  (registers entries)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 through the real engine:
    pinned tokenizer -> FOR-packed postings -> float32 BM25 + block-max WAND
    -> top-k with late-materialized display fields."""
    from lucene_solr_spark.corpus import documents_as_corpus
    from lucene_solr_spark.operators.indexer import build_index
    from lucene_solr_spark.operators.search import Searcher

    corpus = documents_as_corpus(spark, "/root/testdata/sf0.001")
    seg = build_index(spark, corpus, out_dir=None, bucket_docs=256)
    searcher = Searcher(spark, seg)
    return searcher.topk_with_fields("spark join order batch window", k=10, mode="wand")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(REGISTRY)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
