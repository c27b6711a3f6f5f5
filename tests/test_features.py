"""FeatureField scoring functions + boost query (operators/features.py) —
document/FeatureField.java analog: f32 parity vs numpy, SHOULD semantics
for docs missing the feature."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.corpus import synth_corpus
from lucene_solr_spark.operators import features as ff
from lucene_solr_spark.operators.indexer import assign_doc_ids, build_index
from lucene_solr_spark.operators.search import Searcher


@pytest.fixture(scope="module")
def vals_df(spark):
    vals = [0.5, 1.0, 3.75, 100.0, 12345.0]
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "doc_id long, value double"
    ), np.array(vals, dtype=np.float32)


def test_feature_fns_f32_parity(spark, vals_df):
    df, v = vals_df
    f32 = np.float32
    got = (
        df.select(
            "doc_id",
            ff.log_feature(F.col("value"), 2.0, 1.5).alias("log"),
            ff.saturation_feature(F.col("value"), 0.5, 200.0).alias("sat"),
            ff.sigmoid_feature(F.col("value"), 1.0, 2.0, 10.0).alias("sig"),
        )
        .orderBy("doc_id")
        .collect()
    )
    exp_log = (f32(2.0) * np.log(f32(1.5) + v).astype(np.float32)).astype(np.float32)
    exp_sat = (f32(0.5) * (v / (v + f32(200.0)).astype(np.float32))).astype(np.float32)
    sa = np.power(v, f32(2.0)).astype(np.float32)
    ka = f32(10.0 ** 2.0)
    exp_sig = (f32(1.0) * (sa / (sa + ka).astype(np.float32))).astype(np.float32)
    for i, r in enumerate(got):
        assert np.float32(r["log"]) == exp_log[i], ("log", i)
        assert np.float32(r["sat"]) == exp_sat[i], ("sat", i)
        assert np.float32(r["sig"]) == exp_sig[i], ("sig", i)


def test_feature_boost_missing_docs_unboosted(spark):
    corpus = assign_doc_ids(
        synth_corpus(spark, 80, partitions=4), ["repo", "path", "commit"]
    )
    seg = build_index(spark, corpus, out_dir=None, bucket_docs=64)
    s = Searcher(spark, seg)
    base = {
        int(r["doc_id"]): np.float32(r["score"])
        for r in s.topk("import", k=40, mode="exhaustive").collect()
    }
    some = sorted(base)[::2]  # boost only half the docs
    feats = spark.createDataFrame(
        [(d, "pr", 1000.0) for d in some], "doc_id long, feature string, value double"
    )
    out = ff.feature_boost_topk(
        spark, s, "import", feats, "pr", fn="saturation", k=40,
        weight=1.0, a=1.0,
    ).collect()
    boost = np.float32(1.0) * np.float32(
        np.float32(1000.0) / np.float32(np.float32(1000.0) + np.float32(1.0))
    )
    for r in out:
        d = int(r["doc_id"])
        want = (
            np.float32(base[d] + boost) if d in some else base[d]
        )
        assert np.float32(r["score"]) == want


def test_unknown_feature_fn_raises(spark, vals_df):
    df, _ = vals_df
    with pytest.raises(KeyError):
        ff.FEATURE_FNS["nope"]
