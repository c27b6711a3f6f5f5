"""Segment invariant checker — CheckIndex analog.

Reference: lucene/core/src/java/org/apache/lucene/index/CheckIndex.java
(postings sorted, df/ttf consistent, norms present, skip data valid).
Checks run as Spark jobs (distributed), raising AssertionError on violation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..functions.packing import delta_decode, unpack_ints
from ..sources.catalog import Segment


def check_segment(spark: SparkSession, seg: Segment) -> dict:
    """Validate segment invariants; returns a summary dict."""
    postings = seg.table(spark, "postings")
    terms = seg.table(spark, "terms")
    docmap = seg.table(spark, "docmap")

    # terms dict consistent with block rows
    agg = postings.groupBy("term").agg(
        F.sum("n_docs").alias("df2"), F.sum("sum_freq").alias("ttf2")
    )
    bad = (
        terms.join(agg, "term", "full")
        .filter(
            (F.col("df") != F.col("df2"))
            | (F.col("ttf") != F.col("ttf2"))
            | F.col("df").isNull()
            | F.col("df2").isNull()
        )
        .count()
    )
    assert bad == 0, f"terms dict inconsistent with postings for {bad} terms"

    # norms present for every doc; sum(dl) == sumTotalTermFreq
    n_docs = docmap.count()
    assert n_docs == seg.stats.n_docs
    s = docmap.agg(F.sum("dl").alias("s"), F.count("norm_byte").alias("c")).collect()[0]
    assert int(s["s"] or 0) == seg.stats.sum_ttf, "sum(dl) != sumTotalTermFreq"
    assert int(s["c"]) == n_docs, "missing norms"

    # per-block: docIDs strictly ascending, within [first_doc, last_doc],
    # within the block's bucket, freqs >= 1, impacts are true maxima bounds
    def _check(batch_iter):
        n = 0
        for pdf in batch_iter:
            for row in pdf.itertuples():
                ids = delta_decode(unpack_ints(row.doc_bin)).astype(np.int64)
                freqs = unpack_ints(row.freq_bin)
                norms = np.frombuffer(row.norm_bin, dtype=np.uint8)
                assert len(ids) == row.n_docs == len(freqs) == len(norms)
                assert (np.diff(ids) > 0).all(), "docIDs not strictly ascending"
                assert ids[0] == row.first_doc and ids[-1] == row.last_doc
                assert (freqs >= 1).all()
                assert int(freqs.max()) == row.max_freq
                assert int(freqs.sum()) == row.sum_freq
                n += 1
            yield pd.DataFrame({"ok": [n]})

    checked = (
        postings.mapInPandas(_check, "ok long").agg(F.sum("ok")).collect()[0][0]
    )

    # doc ids unique & dense-ish
    dup = docmap.groupBy("doc_id").count().filter("count > 1").count()
    assert dup == 0, "duplicate doc_ids"

    return {
        "n_docs": n_docs,
        "n_terms": seg.stats.n_terms,
        "blocks_checked": int(checked or 0),
    }
