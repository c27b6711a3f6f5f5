"""Solr Cell / Tika-analog extraction (sources/extraction.py): magic-byte
type detection, text/HTML extraction, PDF feature gate, and the Arrow
pipeline over a deterministic mixed-type payload column."""

from __future__ import annotations

import pytest

from lucene_solr_spark.sources.extraction import (
    detect_type,
    extract_documents,
    extract_text,
    synth_payloads,
)


@pytest.mark.parametrize(
    "data,want",
    [
        (b"%PDF-1.7 blah", "application/pdf"),
        (b"PK\x03\x04whatever", "application/zip"),
        (b"\x89PNG\r\n\x1a\n....", "image/png"),
        (b"\xff\xd8\xff\xe0JFIF", "image/jpeg"),
        (b"GIF89a", "image/gif"),
        (b"  <!DOCTYPE HTML><html>", "text/html"),
        (b"<html><body>hi</body></html>", "text/html"),
        (b"plain old text", "text/plain"),
        (b"\x00\x01\x02\xfe\xff", "application/octet-stream"),
        (b"", "text/plain"),
    ],
)
def test_detect_type(data, want):
    assert detect_type(data) == want


def test_extract_plain_and_html():
    assert extract_text(b"hello world", "text/plain") == "hello world"
    got = extract_text(
        b"<html><body><p>key order</p></body></html>", "text/html"
    )
    assert got.split() == ["key", "order"]


def test_pdf_gate_raises_clearly():
    with pytest.raises(NotImplementedError):
        extract_text(b"%PDF-1.4 secret", "application/pdf")


def test_images_have_no_text_stream():
    assert extract_text(b"\x89PNGxxxx", "image/png") is None


def test_pipeline_counts_do_not_drop_gated_types(spark):
    df = spark.createDataFrame(
        [(i, f"doc {i} words") for i in range(8)], "doc_id long, text string"
    )
    out = extract_documents(synth_payloads(df)).collect()
    assert len(out) == 8  # ignoreTikaException: nothing dropped
    by_id = {r.doc_id: r for r in out}
    assert by_id[0].content_type == "text/plain" and by_id[0].text == "doc 0 words"
    assert by_id[1].content_type == "text/html" and "doc 1 words" in by_id[1].text
    assert by_id[2].content_type == "application/pdf" and by_id[2].text is None
    assert by_id[3].content_type == "image/png" and by_id[3].text is None
    assert all(r.n_bytes > 0 for r in out)


def test_detect_type_multibyte_split_at_sniff_boundary():
    # a UTF-8 payload whose 1024-byte sniff prefix cuts a multibyte char in
    # half must still sniff as text/plain (the dangling partial sequence is
    # trimmed before deciding), not fall to application/octet-stream
    body = b"a" * 1023 + "é".encode("utf-8") + b" trailing text"
    assert body[:1024][-1:] != b"a"  # the é straddles the boundary
    assert detect_type(body) == "text/plain"
    # genuinely binary data past the boundary is still binary
    assert detect_type(b"a" * 1023 + b"\xff\xfe\xfd" * 10) == (
        "application/octet-stream"
    )
