"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for 100 TB multimodal training data: media lives in ``binary``
columns (or object-store pointers) beside typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs
over ``mapInPandas`` so bytes never round-trip through Python row objects.

The image/audio codec libraries are NOT in this container, so the actual
decode is stubbed (``decode_image_real`` raises NotImplementedError unless
PIL appears); everything Spark-side — schema, batch shape, partitioning,
UDF signatures — is real and tested with a deterministic fake codec that
parses our synthetic header format:

  bytes 0..3   magic b"IMG0"
  bytes 4..7   width  (little-endian uint32)
  bytes 8..11  height (little-endian uint32)
  bytes 12..   payload (fake pixel bytes)
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"IMG0"

try:  # real codec gate: absent in this container by design
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except Exception:
    HAVE_PIL = False


def synth_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media: header (magic, w, h derived from the row) +
    utf-8 payload. Pure JVM-side construction (concat of binary literals)."""
    w = (F.length(text_col) % 64 + 1).cast("int")
    h = (F.length(text_col) % 48 + 1).cast("int")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.col(text_col),
        w.alias("_w"),
        h.alias("_h"),
    ).select(
        "media_id",
        F.concat(
            F.lit(MAGIC),
            _le32("_w"),
            _le32("_h"),
            F.encode(F.col(text_col), "utf-8"),
        ).alias("media"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.col("_w").alias("width"),
            F.col("_h").alias("height"),
        ).alias("meta"),
    )


def _le32(col: str):
    return F.expr(
        f"concat(char({col} % 256), char(int({col} / 256) % 256), char(0), char(0))"
    ).cast("binary")


def decode_image_real(data: bytes) -> tuple[int, int, str]:
    """Real decode path — feature-detected: lights up automatically when a
    codec (PIL) is importable, raises a clear NotImplementedError otherwise.
    Returns (width, height, mode). The Spark-side wiring
    (decode_meta_real) consumes this per blob inside Arrow batches."""
    if not HAVE_PIL:
        raise NotImplementedError("image codec (PIL) not available in this environment")
    import io

    from PIL import Image

    with Image.open(io.BytesIO(data)) as im:
        return int(im.width), int(im.height), str(im.mode)


def decode_meta_real(media_df: DataFrame) -> DataFrame:
    """Real-codec variant of decode_meta: identical Spark plumbing
    (mapInPandas over the binary column, Arrow batches), but each blob goes
    through the actual image decoder. Callable only when HAVE_PIL — callers
    should branch on that flag (the pytest does: skipif(not HAVE_PIL))."""
    if not HAVE_PIL:
        raise NotImplementedError("image codec (PIL) not available in this environment")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "valid": [], "width": [], "height": [], "mode": []}
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                out["media_id"].append(mid)
                try:
                    w, h, mode = decode_image_real(bytes(blob))
                    out["valid"].append(True)
                except Exception:
                    w, h, mode = 0, 0, ""
                    out["valid"].append(False)
                out["width"].append(w)
                out["height"].append(h)
                out["mode"].append(mode)
            yield pd.DataFrame(out)

    return media_df.mapInPandas(
        run, "media_id long, valid boolean, width int, height int, mode string"
    )


def decode_meta(media_df: DataFrame) -> DataFrame:
    """mapInPandas 'decode': parse headers from the binary column in Arrow
    batches (numpy over bytes — the real decoder drops in here)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["media"]
            ok = blobs.map(lambda b: bytes(b[:4]) == MAGIC)
            w = blobs.map(lambda b: struct.unpack("<I", bytes(b[4:8]))[0])
            h = blobs.map(lambda b: struct.unpack("<I", bytes(b[8:12]))[0])
            nbytes = blobs.map(len)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "valid": ok,
                    "width": w.astype(np.int32),
                    "height": h.astype(np.int32),
                    "payload_bytes": (nbytes - 12).astype(np.int64),
                }
            )

    return media_df.mapInPandas(
        run, "media_id long, valid boolean, width int, height int, payload_bytes long"
    )


def resize_stub(media_df: DataFrame, max_side: int = 32) -> DataFrame:
    """'Resize' = deterministic downsample of the fake payload (every k-th
    byte), demonstrating binary->binary Arrow batch transforms."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def shrink(b: bytes) -> bytes:
                body = bytes(b[12:])
                k = max(len(body) // max_side, 1)
                return bytes(b[:12]) + body[::k]

            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "media_small": pdf["media"].map(shrink)}
            )

    return media_df.mapInPandas(run, "media_id long, media_small binary")
