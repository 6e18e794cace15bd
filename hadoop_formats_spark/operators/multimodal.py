"""Multimodal (image/audio/video) column support (SURVEY §2.3).

Media travel as opaque ``binary`` columns with typed metadata —
``BytesWritable`` is the natural SequenceFile carrier
(``Writable.hs:97-99``).  The Spark-side plumbing (schema, Arrow batch
shape, ``mapInPandas`` signatures, partitioning) is real and tested;
the actual pixel/sample decode is stubbed behind an import gate
because no image/audio libraries exist in this container — swap
``_decode_image_stub`` for a PIL/libav call in production.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC_TAG = b"IMG0"

META_SCHEMA = "doc_id bigint, tag string, payload_len int, header_ok boolean"
FEATURE_SCHEMA = "doc_id bigint, feat_mean double, feat_dim int"


def pack_binary(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Build a fake media column: 4-byte magic tag + UTF-8 payload.
    Stands in for real image bytes; deterministic from the source row."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.concat(
            F.lit(MAGIC_TAG), F.encode(F.col(payload_col), "utf-8")
        ).alias("media"),
    )


def extract_metadata(df: DataFrame) -> DataFrame:
    """Parse typed metadata out of the binary column with an
    Arrow-batched ``mapInPandas`` (the shape a real header parser —
    EXIF, WAV header, mp4 atoms — would take)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = pdf["media"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "tag": media.map(
                        lambda b: bytes(b[:4]).decode("ascii", "replace")
                    ),
                    "payload_len": media.map(lambda b: len(b) - 4).astype("int32"),
                    "header_ok": media.map(lambda b: bytes(b[:4]) == MAGIC_TAG),
                }
            )

    return df.mapInPandas(parse, META_SCHEMA)


def decode_features(df: DataFrame, *, allow_stub: bool = True) -> DataFrame:
    """Decode media → feature vector summary.

    Real decode is NOT implemented in this container (no PIL/libav);
    with ``allow_stub`` a deterministic fake (mean payload byte / 255)
    exercises the full distributed plumbing: Arrow batches in,
    vectorized numpy work, Arrow batches out."""

    try:
        import PIL.Image  # noqa: F401

        have_decoder = True
    except ImportError:
        have_decoder = False

    if not have_decoder and not allow_stub:
        raise NotImplementedError(
            "media decode requires an image library (PIL) not present in "
            "this environment; pass allow_stub=True for the deterministic "
            "fake decode"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = pdf["media"].map(lambda b: bytes(b[4:]))
            means = payloads.map(
                lambda b: float(np.frombuffer(b, dtype=np.uint8).mean()) / 255.0
                if b
                else 0.0
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "feat_mean": means.round(6),
                    "feat_dim": payloads.map(len).astype("int32"),
                }
            )

    return df.mapInPandas(decode, FEATURE_SCHEMA)
