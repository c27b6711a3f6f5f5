"""Document content extraction — the Solr Cell / Tika analog.

Reference surface being re-expressed (SURVEY.md §2.A sources):
  solr/contrib/extraction/.../ExtractingRequestHandler.java +
    ExtractingDocumentLoader.java — binary documents (PDF/Office/HTML/
    plain text) pushed to /update/extract are type-detected, their text
    and metadata extracted (via Apache Tika) and indexed
  Tika's org.apache.tika.detect.MagicDetector — content-type detection
    by leading magic bytes

Spark restatement: payloads are an opaque ``binary`` column; detection
and extraction run as ONE mapInPandas pass (Arrow batches, bytes never
hit the driver). Magic-byte type detection and text/plain + HTML
extraction are REAL; PDF/Office body extraction needs a parser this
container doesn't ship, so those types are feature-gated exactly like
the image codec in sources/multimodal.py — detected and counted, text
extraction raising a clear NotImplementedError unless a parser import
succeeds. The plumbing (schema, batching, partitioning) is the 100 TB
shape either way.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EXTRACT_SCHEMA = (
    "doc_id long, content_type string, n_bytes long, text string"
)

_MAGIC = [
    (b"%PDF-", "application/pdf"),
    (b"PK\x03\x04", "application/zip"),  # docx/xlsx/jar ride zip
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
]

_TAG = re.compile(rb"<[^>]+>")


def detect_type(data: bytes) -> str:
    """MagicDetector analog: leading-bytes sniff, then an HTML heuristic,
    else text/plain for decodable payloads, octet-stream otherwise."""
    if data is None:
        return "application/octet-stream"
    for magic, mime in _MAGIC:
        if data.startswith(magic):
            return mime
    head = data[:256].lstrip().lower()
    if head.startswith((b"<!doctype html", b"<html")):
        return "text/html"
    prefix = data[:1024]
    try:
        prefix.decode("utf-8")
        return "text/plain"
    except UnicodeDecodeError as e:
        # the 1024-byte window may split a multibyte character: if the
        # undecodable sequence is a TRUNCATED-BUT-VALID multibyte prefix
        # (proper lead byte, continuation bytes, expected length running
        # past the cut) and the payload continues past the window, retry
        # without the dangling partial sequence so a valid UTF-8 text isn't
        # misclassified by the sniff boundary. A bad lead byte (e.g. 0xFF)
        # is real binary, not a boundary artifact, and stays binary.
        if len(data) > 1024 and e.end >= len(prefix) and e.start >= 1021:
            lead = prefix[e.start]
            need = (
                2 if 0xC2 <= lead <= 0xDF
                else 3 if 0xE0 <= lead <= 0xEF
                else 4 if 0xF0 <= lead <= 0xF4
                else 0
            )
            tail = prefix[e.start + 1:]
            if (
                need
                and e.start + need > len(prefix)
                and all(0x80 <= b <= 0xBF for b in tail)
            ):
                try:
                    prefix[: e.start].decode("utf-8")
                    return "text/plain"
                except UnicodeDecodeError:
                    pass
        return "application/octet-stream"


def extract_text(data: bytes, content_type: str) -> str | None:
    """Tika parse analog for the types this container can honestly
    handle: text/plain decodes; text/html strips tags (the reference's
    HtmlParser produces the same visible-text stream for simple
    markup). PDF needs a parser — feature-gated."""
    if content_type == "text/plain":
        return data.decode("utf-8", errors="replace")
    if content_type == "text/html":
        return _TAG.sub(b" ", data).decode("utf-8", errors="replace")
    if content_type == "application/pdf":
        try:
            import pypdf  # noqa: F401
        except ImportError:
            raise NotImplementedError(
                "PDF parser not available in this environment"
            ) from None
        raise NotImplementedError("PDF extraction path not wired")
    return None  # images / unknown binaries carry no text stream


def extract_documents(payloads: DataFrame) -> DataFrame:
    """(doc_id, data binary) -> (doc_id, content_type, n_bytes, text):
    the ExtractingDocumentLoader pipeline as one Arrow-batched pass.
    Unextractable types yield text NULL (counted, not dropped — the
    handler's ignoreTikaException=true discipline)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "content_type": [], "n_bytes": [], "text": []}
            for row in pdf.itertuples():
                data = bytes(row.data) if row.data is not None else b""
                ct = detect_type(data)
                try:
                    text = extract_text(data, ct)
                except NotImplementedError:
                    text = None  # ignoreTikaException=true
                out["doc_id"].append(int(row.doc_id))
                out["content_type"].append(ct)
                out["n_bytes"].append(len(data))
                out["text"].append(text)
            yield pd.DataFrame(out)

    return payloads.select("doc_id", "data").mapInPandas(
        run, _EXTRACT_SCHEMA
    )


def synth_payloads(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Deterministic mixed-type payload column for tests/rows: doc_id%4
    rotates plain text / HTML / fake-PDF / fake-PNG — JVM-side binary
    construction, no UDF."""
    text_b = F.encode(F.col(text_col), "utf-8")
    html_b = F.encode(
        F.concat(
            F.lit("<html><body><p>"), F.col(text_col), F.lit("</p></body></html>")
        ),
        "utf-8",
    )
    pdf_b = F.concat(F.lit(b"%PDF-1.4 "), text_b)
    png_b = F.concat(F.lit(b"\x89PNG\r\n\x1a\n"), text_b)
    m = F.col(id_col) % 4
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.when(m == 0, text_b)
        .when(m == 1, html_b)
        .when(m == 2, pdf_b)
        .otherwise(png_b)
        .alias("data"),
    )
