"""Character offsets in the index + offset-based highlighting
(IndexOptions...AND_OFFSETS / CompressingTermVectorsWriter offsets /
UnifiedHighlighter offset source / TermVectorComponent tv.offsets).

Pins:
- the offset-aware scanner emits EXACTLY the pinned tokenizer's token
  sequence, and every (start, end) is byte-exact into the NFC source;
- the engine round-trips offsets through the packed index streams;
- a case where re-tokenized display gets the char span WRONG (substring
  search hits 'remerge'; camel splits lose original case/adjacency) and
  offsets get it right;
- the corpus-shape assumption behind the DuckDB offsets oracle.
"""

from __future__ import annotations

import random
import string
import unicodedata

import pandas as pd
import pytest

from lucene_solr_spark.functions.analysis import (
    tokenize_offsets,
    tokenize_pandas,
)

ADVERSARIAL = [
    "", " ", "___", "HTTPServer", "camelCase snake_case utf8 8bit",
    "MyHTTPServer_Handler runs fast", "a1B2c XY Zab", "ABCDef ABc aB",
    "héllo Aé WÖrld", "x__y_ _z", "a,b;;c..d", "A9b 9A 99 a9 9a",
    "remerge merge", "İstanbul ößÜ", "HTTPSx9YZab", "_leading trailing_",
]


def _rand_cases(n=400, seed=7):
    rng = random.Random(seed)
    alphabet = string.ascii_letters + string.digits + "_ .,;-éÉßÖü"
    return [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        for _ in range(n)
    ]


@pytest.mark.parametrize("text", ADVERSARIAL)
def test_offsets_tokenizer_parity_adversarial(text):
    want = list(tokenize_pandas(pd.Series([text])).iloc[0])
    toks, starts, ends = tokenize_offsets(text)
    assert toks == want
    t = unicodedata.normalize("NFC", text)
    for tok, s, e in zip(toks, starts, ends):
        assert t[int(s):int(e)].lower() == tok


def test_offsets_tokenizer_parity_random():
    cases = _rand_cases()
    want = tokenize_pandas(pd.Series(cases))
    for text, w in zip(cases, want):
        toks, starts, ends = tokenize_offsets(text)
        assert toks == list(w), text
        t = unicodedata.normalize("NFC", text)
        assert all(
            t[int(s):int(e)].lower() == tok
            for tok, s, e in zip(toks, starts, ends)
        ), text


def test_offsets_oracle_corpus_shape():
    """The DuckDB offsets oracle (plans/coverage10_queries.py) computes
    offsets by cumulative split-token lengths, valid ONLY if the documents
    text is single-space-separated tokens each pure-alpha or pure-digit
    (so pinned tokens == split tokens and offsets are cumulative)."""
    import duckdb

    con = duckdb.connect()
    for sf in ("0.001", "0.01"):
        pq = f"/root/testdata/sf{sf}/documents.parquet"
        bad = con.execute(
            f"SELECT count(*) FROM read_parquet('{pq}') WHERE NOT "
            "regexp_full_match(text, '[a-z0-9]+( [a-z0-9]+)*')"
        ).fetchone()[0]
        mixed = con.execute(
            "SELECT count(*) FROM (SELECT unnest(string_split(text, ' ')) "
            f"AS tok FROM read_parquet('{pq}')) WHERE NOT "
            "(regexp_full_match(tok, '[a-z]+') OR "
            "regexp_full_match(tok, '[0-9]+'))"
        ).fetchone()[0]
        assert bad == 0 and mixed == 0, sf


@pytest.fixture(scope="module")
def off_seg(spark):
    from lucene_solr_spark.operators.indexer import build_index

    rows = [
        (0, "r", "p0", "c", "py", "MyHTTPServer_Handler runs the fast HTTPServer"),
        (1, "r", "p1", "c", "py", "remerge merge the merge"),
        (2, "r", "p2", "c", "py", "utf8 decode 8bit camelCase data"),
        (3, "r", "p3", "c", "py", ""),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, repo string, path string, commit string, "
        "lang string, content string",
    )
    seg = build_index(
        spark, df, out_dir=None, bucket_docs=256,
        with_positions=True, with_offsets=True,
    )
    seg._texts = {r[0]: r[5] for r in rows}
    return seg


def test_index_offsets_byte_exact(spark, off_seg):
    from lucene_solr_spark.functions.packing import delta_decode, unpack_ints

    n = 0
    for r in off_seg.table(spark, "positions").collect():
        pos = delta_decode(unpack_ints(r.pos_bin))
        so = delta_decode(unpack_ints(r.soff_bin))
        ln = unpack_ints(r.eoff_bin)
        assert len(pos) == len(so) == len(ln)
        text = off_seg._texts[r.doc_id]
        for st, l in zip(so.tolist(), ln.tolist()):
            assert text[st:st + l].lower() == r.term
            n += 1
    assert n > 10


def test_offsets_right_where_retokenization_wrong(spark, off_seg):
    """The production reason offsets exist: display spans that analysis
    transforms make unrecoverable.

    - substring search (the naive re-analysis shortcut) finds 'merge' at
      char 2 INSIDE 'remerge'; the index offsets point at char 8, the
      real token.
    - a camel/underscore hit ('http' in 'MyHTTPServer_Handler') has no
      lowercase-token occurrence in the original text at all; offsets
      recover the original-case span 'HTTP' exactly."""
    from lucene_solr_spark.operators.highlight import highlight_offsets

    got = {
        r["doc_id"]: r.asDict()
        for r in highlight_offsets(spark, off_seg, "merge", context=10).collect()
    }
    text1 = off_seg._texts[1]
    assert text1.find("merge") == 2  # the naive path would mark 're[merge]'
    assert got[1]["start_off"] == 8 and got[1]["end_off"] == 13
    assert got[1]["snippet"] == "remerge <em>merge</em> the merge"[: len(got[1]["snippet"])]

    got_http = {
        r["doc_id"]: r.asDict()
        for r in highlight_offsets(spark, off_seg, "http", context=10).collect()
    }
    assert "http" not in off_seg._texts[0]  # lowercase token absent from source
    assert got_http[0]["snippet"].startswith("My<em>HTTP</em>Server")
    assert got_http[0]["n_hits"] == 2


def test_highlight_offsets_edges(spark, off_seg):
    from lucene_solr_spark.operators.highlight import highlight_offsets

    assert highlight_offsets(spark, off_seg, "", doc_ids=[0]).count() == 0
    assert highlight_offsets(spark, off_seg, "zzzabsent").count() == 0
    assert highlight_offsets(spark, off_seg, "merge", doc_ids=[]).count() == 0
    # hit at position 0: empty left context, marker at char 0
    first = highlight_offsets(spark, off_seg, "remerge", context=10).collect()
    assert first[0]["start_off"] == 0
    assert first[0]["snippet"].startswith("<em>remerge</em>")


def test_offsets_require_positions_and_plain_chain(spark):
    from lucene_solr_spark.functions.synonyms import parse_synonym_rules
    from lucene_solr_spark.operators.indexer import build_index

    df = spark.createDataFrame(
        [(0, "r", "p", "c", "py", "a b")],
        "doc_id long, repo string, path string, commit string, "
        "lang string, content string",
    )
    with pytest.raises(ValueError, match="requires with_positions"):
        build_index(spark, df, out_dir=None, with_offsets=True)
    with pytest.raises(ValueError, match="plain analysis chain"):
        build_index(
            spark, df, out_dir=None, with_positions=True, with_offsets=True,
            synonyms=parse_synonym_rules(["a => b"]),
        )


def test_plain_highlight_rejects_offsetless_segment(spark):
    """A positions-only build has no offset streams: highlight_offsets
    must refuse loudly, not silently mis-highlight."""
    from lucene_solr_spark.operators.highlight import highlight_offsets
    from lucene_solr_spark.operators.indexer import build_index

    df = spark.createDataFrame(
        [(0, "r", "p", "c", "py", "just plain text")],
        "doc_id long, repo string, path string, commit string, "
        "lang string, content string",
    )
    seg = build_index(spark, df, out_dir=None, with_positions=True)
    with pytest.raises(ValueError, match="no stored offsets"):
        highlight_offsets(spark, seg, "plain")


def test_offsets_survive_merge(spark, off_seg):
    """soff/eoff are doc-internal, so a k-way merge with doc-id remap must
    keep every span byte-exact; a mixed merge (one source offset-less)
    drops offsets (FieldInfos lowest-common-IndexOptions)."""
    from lucene_solr_spark.functions.packing import delta_decode, unpack_ints
    from lucene_solr_spark.operators.indexer import build_index
    from lucene_solr_spark.operators.merge import merge_segments

    rows = [
        (0, "r", "q0", "c", "py", "other WindowMerge text"),
        (1, "r", "q1", "c", "py", "snake_case merge again"),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, repo string, path string, commit string, "
        "lang string, content string",
    )
    seg2 = build_index(
        spark, df, out_dir=None, bucket_docs=256,
        with_positions=True, with_offsets=True,
    )
    merged = merge_segments(spark, [off_seg, seg2], out_dir=None)
    pos = merged.table(spark, "positions")
    assert "soff_bin" in pos.columns
    # old texts by NEW doc id: remap is dense over (segment order, old id)
    texts = list(off_seg._texts.values()) + [r[5] for r in rows]
    n = 0
    for r in pos.collect():
        so = delta_decode(unpack_ints(r.soff_bin))
        ln = unpack_ints(r.eoff_bin)
        for st, l in zip(so.tolist(), ln.tolist()):
            assert texts[r.doc_id][st:st + l].lower() == r.term
            n += 1
    assert n > 15

    plain = build_index(
        spark, df, out_dir=None, bucket_docs=256, with_positions=True
    )
    mixed = merge_segments(spark, [off_seg, plain], out_dir=None)
    assert "soff_bin" not in mixed.table(spark, "positions").columns
