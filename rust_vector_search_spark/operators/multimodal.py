"""Multimodal-column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The container ships no image libraries (PIL/cv2), so the REAL decode
path implemented here is a pure-stdlib codec for the uncompressed 24-bit
BMP format (``struct`` header parse + numpy pixel-array slice): documents
are encoded into genuine BMP payloads (54-byte BITMAPFILEHEADER +
BITMAPINFOHEADER, 4-byte-aligned bottom-up rows) and the feature
extractor parses the header, slices the pixel array, and computes pixel
statistics — exercising every step a PIL-backed decoder would (magic
check, header fields, stride math, channel layout) without a dependency.
``decode_image_real`` remains the integration point for compressed
formats (JPEG/PNG need a codec library).

Scale notes: binary payloads ride in Parquet pages like any column;
``mapInPandas`` streams Arrow record batches (bounded memory per batch,
``spark.sql.execution.arrow.maxRecordsPerBatch``), and both encode and
decode are embarrassingly parallel — zero shuffles.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = [
    "attach_binary_payload",
    "encode_bmp",
    "decode_bmp",
    "encode_bmp_payload",
    "extract_binary_features",
    "decode_image_real",
]

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, byte_sum long, mean_byte double, "
    "width long, height long, format string"
)

_BMP_WIDTH = 64  # 24bpp ⇒ 192-byte rows, already 4-byte aligned (no stride pad)


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


def encode_bmp(data: bytes, width: int = _BMP_WIDTH) -> bytes:
    """Pack raw bytes into a REAL uncompressed 24-bit BMP: bytes become
    BGR pixel components row by row, zero-padded to fill the last row
    (and each row to 4-byte alignment), rows stored bottom-up per the
    format. Pure stdlib."""
    row_data = width * 3
    stride = (row_data + 3) & ~3
    height = max(1, -(-len(data) // row_data))
    padded = data + b"\x00" * (height * row_data - len(data))
    rows = [
        padded[r * row_data : (r + 1) * row_data].ljust(stride, b"\x00")
        for r in range(height)
    ]
    pixel_array = b"".join(reversed(rows))  # bottom-up row order
    offset = 14 + 40
    file_header = struct.pack("<2sIHHI", b"BM", offset + len(pixel_array), 0, 0, offset)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_array),
        2835, 2835, 0, 0,
    )
    return file_header + info_header + pixel_array


def decode_bmp(payload: bytes) -> tuple[int, int, int, int]:
    """Parse an uncompressed 24-bit BMP and return
    (width, height, n_pixel_bytes, pixel_byte_sum) over the unpadded
    pixel data (stride padding excluded). Raises ValueError on anything
    that isn't a plain 24bpp BI_RGB bitmap."""
    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    (offset,) = struct.unpack_from("<I", payload, 10)
    _, width, height, _, bpp, compression = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant: bpp={bpp} compression={compression}")
    row_data = width * 3
    stride = (row_data + 3) & ~3
    arr = np.frombuffer(
        payload, dtype=np.uint8, count=stride * abs(height), offset=offset
    ).reshape(abs(height), stride)[:, :row_data]
    return width, abs(height), int(arr.size), int(arr.sum(dtype=np.int64))


def _encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "payload": pdf["payload"].map(encode_bmp),
                "media_type": "image/bmp",
            }
        )


def encode_bmp_payload(payloads: DataFrame) -> DataFrame:
    """Re-encode raw binary payloads as genuine 24-bit BMP images
    (Arrow-batched; the encode is the write half of the codec the
    feature extractor decodes)."""
    return payloads.mapInPandas(
        _encode_batches, schema="doc_id long, payload binary, media_type string"
    )


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    def _stats(row):
        buf, media = row
        if media == "image/bmp":
            w, h, n, s = decode_bmp(buf)
            return n, s, w, h
        n = len(buf)
        s = int(np.frombuffer(buf, dtype=np.uint8).sum()) if n else 0
        return n, s, 0, 0

    for pdf in batches:
        stats = [
            _stats(t) for t in zip(pdf["payload"], pdf["media_type"])
        ]
        n_bytes = pd.Series([t[0] for t in stats], dtype="int64")
        byte_sum = pd.Series([t[1] for t in stats], dtype="int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": n_bytes,
                "byte_sum": byte_sum,
                "mean_byte": byte_sum / n_bytes,
                "width": pd.Series([t[2] for t in stats], dtype="int64"),
                "height": pd.Series([t[3] for t in stats], dtype="int64"),
                "format": pdf["media_type"],
            }
        )


def extract_binary_features(payloads: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column. BMP
    payloads go through the real header-parse/pixel-slice decode;
    other media types get raw byte statistics."""
    return payloads.mapInPandas(_feature_batches, schema=FEATURE_SCHEMA)


def decode_image_real(payloads: DataFrame) -> DataFrame:
    """Integration point for COMPRESSED image formats (JPEG/PNG resize /
    frame sampling) — these need a codec library (PIL or cv2) the
    container doesn't ship. Uncompressed BMP is fully handled in-repo by
    ``decode_bmp``."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "compressed-format decode requires PIL/cv2; container ships "
            "neither — swap decode_bmp for a PIL decode when deploying"
        ) from e
    raise NotImplementedError("wire the PIL decode into _feature_batches")
