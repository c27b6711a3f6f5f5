"""Physical-plan guards — the scan-pruning contracts that make the design
scale (SURVEY.md §4.2): the query-term filter must reach the parquet scan
(row-group min/max stats over the term-sorted postings table are our FST
terms-index analog), and the scorer plan must stay narrow until after the
top-k limit (two-phase retrieval / late materialization)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.corpus import synth_corpus
from lucene_solr_spark.operators.indexer import build_index
from lucene_solr_spark.operators.search import Searcher


@pytest.fixture(scope="module")
def disk_seg(spark, tmp_path_factory):
    c = synth_corpus(spark, 80, partitions=4)
    return build_index(
        spark, c, out_dir=str(tmp_path_factory.mktemp("plans")), bucket_docs=64
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_term_filter_pushed_to_parquet_scan(spark, disk_seg):
    plan = _plan(
        disk_seg.table(spark, "postings").filter(
            F.col("term").isin(["import", "return"])
        )
    )
    assert "PushedFilters: [In(term, [import,return])]" in plan


def test_topk_plan_is_narrow_until_limit(spark, disk_seg):
    """The scoring plan reads only postings columns (no docmap fields) and
    ends in a TakeOrderedAndProject — display fields join after the limit."""
    s = Searcher(spark, disk_seg)
    plan = _plan(s.topk("import return", k=5))
    assert "TakeOrderedAndProject" in plan
    # the only table scanned is postings — no docmap/terms scan in the
    # scoring plan (terms stats were a collected pre-pass)
    assert "/postings" in plan
    assert "/docmap" not in plan and "/terms" not in plan
    for docmap_col in ("repo#", "lang#", "content_sha256#"):
        assert docmap_col not in plan, f"docmap column {docmap_col} in scorer plan"


def test_docmap_scan_prunes_columns(spark, disk_seg):
    """Column pruning: selecting two docmap columns must not read the rest."""
    plan = _plan(disk_seg.table(spark, "docmap").select("doc_id", "lang"))
    i = plan.find("ReadSchema")
    schema = plan[i : i + 200]
    assert "doc_id" in schema and "lang" in schema
    assert "content_sha256" not in schema
