"""Phase-level profile of build_index on the bench corpora — where do the
6.6 s of index_build_docs go? Runs each phase as its own timed action.
Usage: python tools_profile_build.py [sf_dir] [shuffle_n]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
SHUF = int(sys.argv[2]) if len(sys.argv) > 2 else 0


def main() -> None:
    import os

    from pyspark.sql import functions as F

    from lucene_solr_spark.corpus import documents_as_corpus
    from lucene_solr_spark.operators.indexer import (
        _BLOCK_SCHEMA,
        _TF_SCHEMA,
        _build_blocks_partition,
        _tf_stage_fn,
        build_index,
    )
    from lucene_solr_spark.session import get_spark

    n_cpus = os.cpu_count() or 8
    spark = get_spark(
        app_name="profile",
        master=f"local[{n_cpus}]",
        shuffle_partitions=SHUF or max(n_cpus * 2, 16),
    )
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    corpus = documents_as_corpus(spark, SF)
    n = corpus.count()
    print(f"docs={n} shuffle_n={shuffle_n} input_parts={corpus.rdd.getNumPartitions()}")

    docs = corpus.select("doc_id", "content")

    t = time.time()
    tf = docs.mapInPandas(_tf_stage_fn(False), _TF_SCHEMA)
    tf_count = tf.count()
    print(f"tokenize+tf only: {time.time()-t:.2f}s ({tf_count} tf rows)")

    t = time.time()
    blocks = (
        docs.mapInPandas(_tf_stage_fn(False), _TF_SCHEMA)
        .withColumn("bucket", (F.col("doc_id") / F.lit(8192)).cast("long"))
        .repartition(shuffle_n, "term", "bucket")
        .mapInPandas(_build_blocks_partition, _BLOCK_SCHEMA)
    )
    print(f"tf+shuffle+blocks: {time.time()-t:.2f}s ({blocks.count()} blocks)")

    for label, kwargs in [
        ("full build (defaults)", {}),
        ("full build shuffle=8", {"term_partitions": 8}),
        ("full build shuffle=16", {"term_partitions": 16}),
        ("full build (defaults, warm)", {}),
    ]:
        t = time.time()
        seg = build_index(spark, corpus, out_dir=None, bucket_docs=8192, **kwargs)
        print(f"{label}: {time.time()-t:.2f}s (terms={seg.stats.n_terms})")
        for df in seg.dfs.values():
            try:
                df.unpersist()
            except Exception:
                pass


if __name__ == "__main__":
    main()
