"""Training-data ops: MinHash recall vs exact Jaccard, LSH-ANN recall vs
brute force, multimodal binary plumbing round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.functions.analysis import tokenize_udf
from lucene_solr_spark.operators import ann, dedup
from lucene_solr_spark.sources import multimodal as mm

from .conftest import SF01_DIR


@pytest.fixture(scope="module")
def toks(spark):
    d = spark.read.parquet(f"{SF01_DIR}/documents.parquet")
    return d.select("doc_id", "text", tokenize_udf(F.col("text")).alias("tokens")).persist()


def test_minhash_finds_planted_near_dups(spark, toks):
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(toks, threshold=0.8).collect()
    }
    mh = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_dedup(toks, threshold=0.8).collect()
    }
    assert exact, "corpus should contain planted near-dups"
    # every verified minhash pair is a true pair (no false positives by construction)
    assert mh <= exact
    # high recall at J>=0.8 with 4 bands x 3 rows
    recall = len(mh) / len(exact)
    assert recall >= 0.9, f"minhash recall too low: {recall} ({len(mh)}/{len(exact)})"


def test_simhash_pairs_overlap_exact(spark, toks):
    sim = dedup.simhash(toks, n_bits=32)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.simhash_near_pairs(sim, max_hamming=3, n_bits=32).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(toks, threshold=0.9).collect()
    }
    # simhash at hamming<=3 should recover most J>=0.9 dups
    if exact:
        recall = len(pairs & exact) / len(exact)
        assert recall >= 0.7, f"simhash recall {recall}"


def test_lsh_ann_recall_vs_bruteforce(spark):
    emb = spark.read.parquet(f"{SF01_DIR}/embeddings.parquet")
    probe = [float(x) for x in emb.filter("vec_id = 0").collect()[0]["embedding"]]
    brute = [r["vec_id"] for r in ann.cosine_topk(emb, probe, k=10).collect()]
    # this corpus has weak angular structure (top cos ~0.37), so buckets must
    # be coarse: 3 planes x 12 tables -> P(candidate) = 1-(1-s^3)^12 ~ 0.97
    lsh = [r["vec_id"] for r in ann.lsh_topk(emb, probe, k=10, n_planes=3, n_tables=12).collect()]
    assert brute[0] == 0  # probe most similar to itself
    assert 0 in lsh
    overlap = len(set(brute) & set(lsh)) / 10
    assert overlap >= 0.7, f"LSH recall@10 too low: {overlap}"


def test_lsh_index_probe_equals_filter_path(spark, tmp_path):
    """The materialized index probe (partition-pruned reads) must return
    exactly what the on-the-fly filter path returns — same planes, same
    candidates, same re-rank."""
    emb = spark.read.parquet(f"{SF01_DIR}/embeddings.parquet")
    probe = [float(x) for x in emb.filter("vec_id = 0").collect()[0]["embedding"]]
    path = str(tmp_path / "lsh")
    ann.lsh_index(emb, path, n_tables=12, n_planes=3, dim=64)
    via_index = [
        (r["vec_id"], r["cos_sim"])
        for r in ann.lsh_probe(spark, path, probe, k=10, n_tables=12, n_planes=3).collect()
    ]
    via_filter = [
        (r["vec_id"], r["cos_sim"])
        for r in ann.lsh_topk(emb, probe, k=10, n_planes=3, n_tables=12).collect()
    ]
    assert via_index == via_filter


def test_lsh_probe_plan_partition_pruned(spark, tmp_path):
    """Scale contract: the probe's scan must carry PartitionFilters on the
    bucket column — no hyperplane math on the scan side."""
    emb = spark.read.parquet(f"{SF01_DIR}/embeddings.parquet")
    probe = [float(x) for x in emb.filter("vec_id = 1").collect()[0]["embedding"]]
    path = str(tmp_path / "lshp")
    ann.lsh_index(emb, path, n_tables=2, n_planes=3, dim=64)
    df = ann.lsh_probe(spark, path, probe, k=5, n_tables=2, n_planes=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    assert "aggregate(" not in plan.split("Scan parquet")[1][:400]


def test_ivf_kmeans_and_nprobe_recall(spark, tmp_path):
    emb = spark.read.parquet(f"{SF01_DIR}/embeddings.parquet")
    probe = [float(x) for x in emb.filter("vec_id = 0").collect()[0]["embedding"]]
    cents = ann.train_centroids(emb, n_cells=8, iters=5, sample_n=500)
    assert len(cents) == 8 and len(cents[0]) == 64
    # deterministic: retrain gives identical centroids
    assert cents == ann.train_centroids(emb, n_cells=8, iters=5, sample_n=500)
    path = str(tmp_path / "ivf")
    ann.ivf_index(emb, cents, path)
    brute = [r["vec_id"] for r in ann.cosine_topk(emb, probe, k=10).collect()]
    # nprobe = all cells degenerates to exact brute force
    full = [
        r["vec_id"]
        for r in ann.ivf_topk(spark, path, cents, probe, k=10, nprobe=8).collect()
    ]
    assert full == brute
    # nprobe=3 keeps decent recall on this corpus
    part = [
        r["vec_id"]
        for r in ann.ivf_topk(spark, path, cents, probe, k=10, nprobe=3).collect()
    ]
    overlap = len(set(part) & set(brute)) / 10
    assert 0 in part and overlap >= 0.5, f"IVF recall@10 too low: {overlap}"


def test_multimodal_binary_roundtrip(spark):
    d = spark.read.parquet(f"{SF01_DIR}/documents.parquet").limit(50)
    media = mm.synth_media(d)
    meta = mm.decode_meta(media).collect()
    assert len(meta) == 50
    assert all(r["valid"] for r in meta)
    src = {r["doc_id"]: len(r["text"]) for r in d.collect()}
    for r in meta:
        assert r["width"] == src[r["media_id"]] % 64 + 1
        assert r["payload_bytes"] == src[r["media_id"]]
    small = mm.resize_stub(media).collect()
    assert all(len(r["media_small"]) <= 12 + 64 for r in small)


@pytest.mark.skipif(mm.HAVE_PIL, reason="codec present — gate inactive")
def test_real_decode_is_gated(spark):
    with pytest.raises(NotImplementedError):
        mm.decode_image_real(b"IMG0" + b"\0" * 20)


@pytest.mark.skipif(not mm.HAVE_PIL, reason="no image codec in this environment")
def test_real_decode_when_codec_present(spark):
    """Feature-detected real decode: PNGs authored by PIL round-trip through
    the same mapInPandas plumbing as the fake codec (VERDICT r02 ask #7)."""
    import io

    from PIL import Image

    def png(w, h):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), (1, 2, 3)).save(buf, format="PNG")
        return buf.getvalue()

    rows = [(1, png(8, 5)), (2, png(3, 7)), (3, b"not an image")]
    media = spark.createDataFrame(rows, "media_id long, media binary")
    meta = {r["media_id"]: r for r in mm.decode_meta_real(media).collect()}
    assert (meta[1]["width"], meta[1]["height"], meta[1]["valid"]) == (8, 5, True)
    assert (meta[2]["width"], meta[2]["height"]) == (3, 7)
    assert meta[3]["valid"] is False


def test_embedding_near_dup_lsh_vs_exact(spark):
    """Banded sign-LSH near-dup: verified pairs are a SUBSET of the exact
    O(n^2) pairs (verification is exact cosine) with measured recall."""
    emb = spark.read.parquet(f"{SF01_DIR}/embeddings.parquet")
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in dedup.embedding_cosine_pairs(emb, threshold=0.4).collect()
    }
    lsh = {
        (r["vec_a"], r["vec_b"])
        for r in dedup.embedding_near_dup_lsh(
            emb, threshold=0.4, n_planes=16, bands=4
        ).collect()
    }
    assert exact, "fixture broken: no exact pairs at threshold"
    assert lsh <= exact, "LSH produced a pair the exact baseline lacks"
    recall = len(lsh) / len(exact)
    assert recall >= 0.5, f"embedding LSH recall too low: {recall}"


def test_embedding_lsh_candidates_shrink(spark):
    """The banded join must generate far fewer candidate pairs than n^2 —
    the property that makes the scale path viable."""
    emb = spark.read.parquet(f"{SF01_DIR}/embeddings.parquet")
    n = emb.count()
    sig = dedup.embedding_near_dup_lsh(emb, threshold=-1.0, n_planes=16, bands=4)
    n_cand = sig.count()  # threshold -1 keeps every candidate pair
    assert n_cand < (n * (n - 1) // 2) * 0.5, (
        f"banding did not prune: {n_cand} of {n*(n-1)//2}"
    )


def test_connected_components_chain_and_clique(spark):
    """Min-label propagation: a 6-node chain (needs several rounds), a
    triangle, and an isolated pair all collapse to min-id components."""
    pairs = spark.createDataFrame(
        # chain 1-2-3-4-5-6, triangle 10-11-12 (as pairs), pair 20-21
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),
         (10, 11), (11, 12), (10, 12), (20, 21)],
        "doc_a long, doc_b long",
    )
    comp = {
        r["doc_id"]: r["component"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert {k for k in comp} == {1, 2, 3, 4, 5, 6, 10, 11, 12, 20, 21}
    assert all(comp[n] == 1 for n in (1, 2, 3, 4, 5, 6))
    assert all(comp[n] == 10 for n in (10, 11, 12))
    assert comp[20] == comp[21] == 20


def test_connected_components_converges_under_iteration_cap(spark):
    """A path graph of length > default rounds still converges because
    labels hop one edge per round from the min end — cap is a backstop,
    not a correctness bound, for diameters seen in dedup graphs."""
    n = 12
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )
    comp = dedup.connected_components(pairs, max_iters=25).collect()
    assert {r["component"] for r in comp} == {0}
    assert len(comp) == n + 1


def test_embedding_cosine_pairs_block_invariance(spark):
    """The blocked-outer-product kernel must return the identical pair set
    for ANY block size (pairs can straddle blocks in either id order)."""
    emb = spark.read.parquet(f"{SF01_DIR}/embeddings.parquet")
    ref = sorted(
        map(tuple, dedup.embedding_cosine_pairs(emb, threshold=0.4, block_size=10_000).collect())
    )
    assert ref, "fixture broken: no pairs"
    for bs in (7, 64, 251):
        got = sorted(
            map(tuple, dedup.embedding_cosine_pairs(emb, threshold=0.4, block_size=bs).collect())
        )
        assert got == ref, f"block_size={bs}: {len(got)} vs {len(ref)} pairs"


def test_incremental_lsh_matches_split_of_exact_pairs(spark, toks):
    """Incremental probe (batch = doc_id%4==0 vs base) must return exactly
    the cross-split subset of the full exact near-dup pairs that minhash
    banding recalls — and every returned pair crosses the split."""
    base = toks.filter(F.col("doc_id") % 4 != 0)
    batch = toks.filter(F.col("doc_id") % 4 == 0)
    inc = dedup.minhash_lsh_incremental(base, batch, threshold=0.8).collect()
    assert inc, "split should cut at least one planted near-dup pair"
    exact = {
        frozenset((r["doc_a"], r["doc_b"]))
        for r in dedup.ngram_jaccard_pairs(toks, threshold=0.8).collect()
    }
    for r in inc:
        assert r["new_doc"] % 4 == 0 and r["base_doc"] % 4 != 0
        assert frozenset((r["new_doc"], r["base_doc"])) in exact
    # recall vs the cross-split exact ground truth
    cross = {p for p in exact if any(x % 4 == 0 for x in p) and any(x % 4 != 0 for x in p)}
    got = {frozenset((r["new_doc"], r["base_doc"])) for r in inc}
    assert len(got) / len(cross) >= 0.9


def test_pretraining_funnel_monotone(spark):
    import __spark_entry__ as entry_mod

    row = entry_mod.queries()["pretraining_funnel"](spark, SF01_DIR).collect()[0]
    seq = [row["n_total"], row["n_lang"], row["n_quality"],
           row["n_repetition"], row["n_exact"], row["n_neardup"]]
    assert seq == sorted(seq, reverse=True)
    assert seq[-1] > 0 and seq[0] > seq[-1]
