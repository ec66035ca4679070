"""Multimodal-column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The decode step is STUBBED (no image/audio libraries in this container):
``decode_image_stub`` computes deterministic fake features from the raw
bytes so the Spark-side plumbing — schema, batch iteration, partition
shape — is real and testable, and a real decoder (PIL/torchaudio/ffmpeg)
drops in by replacing one function. ``decode_image_real`` raises
NotImplementedError behind an import-guard to mark the integration point.

Scale notes: binary payloads ride in Parquet pages like any column;
``mapInPandas`` streams Arrow record batches (bounded memory per batch,
``spark.sql.execution.arrow.maxRecordsPerBatch``), and the feature
extraction is embarrassingly parallel — zero shuffles.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["attach_binary_payload", "extract_binary_features", "decode_image_real"]

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, byte_sum long, mean_byte double, format string"
)


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Model documents as multimodal rows: an opaque binary payload column
    + metadata. (Fixtures have no real media; the payload is the UTF-8
    encoding of the text, which keeps every byte-level assertion
    oracle-checkable.)"""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
    )


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        buf = pdf["payload"]
        n_bytes = buf.map(len).astype("int64")
        byte_sum = buf.map(
            lambda b: int(np.frombuffer(b, dtype=np.uint8).sum())
        ).astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": n_bytes,
                "byte_sum": byte_sum,
                "mean_byte": byte_sum / n_bytes,
                "format": pdf["media_type"],
            }
        )


def extract_binary_features(payloads: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column — the
    real mapInPandas pipeline a decoder plugs into."""
    return payloads.mapInPandas(_feature_batches, schema=FEATURE_SCHEMA)


def decode_image_real(payloads: DataFrame) -> DataFrame:
    """Integration point for a real image decoder (resize / pixel stats /
    frame sampling). Requires PIL or cv2 — not available in this
    container, by design."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "real image decode requires PIL/cv2; container ships neither — "
            "swap _feature_batches for a decoder when deploying"
        ) from e
    raise NotImplementedError("wire the PIL decode into _feature_batches")
