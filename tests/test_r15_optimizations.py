"""Focused pins for the r15 optimization-round internals changes:
each test targets a rewrite that must be behavior-identical (guide §1 —
optimizations may not change what an operator computes)."""

import struct
import zlib

import numpy as np
import pytest


def test_star_components_converge_on_fixpoint_input(spark):
    """r15 removed the pre-loop checksum job: convergence now compares
    CONSECUTIVE round checksums. An input that is ALREADY a star
    fixpoint must still converge (one extra confirmation round) and
    label components identically."""
    from rust_vector_search_spark.operators.dedup import (
        connected_components_star,
    )

    # a star: 1..4 all paired with 0 (u>v orientation = the fixpoint)
    pairs = spark.createDataFrame(
        [(i, 0) for i in range(1, 5)], "doc_id_a long, doc_id_b long"
    )
    got = {
        (r.node, r.component_id)
        for r in connected_components_star(pairs, max_iters=5).collect()
    }
    assert got == {(0, 0), (1, 0), (2, 0), (3, 0), (4, 0)}


def test_jpeg_lut_decoder_truncated_scan_raises():
    """The 16-bit-lookahead huffman decoder must keep the bit-serial
    walk's error class when the entropy stream ends mid-scan."""
    from rust_vector_search_spark.operators.jpegcodec import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    px = np.full((8, 16), 77, dtype=np.uint8)  # 2 blocks -> entropy > 1 byte
    good = encode_jpeg_gray(px)
    # drop the last entropy byte but keep the EOI marker
    truncated = good[:-3] + b"\xff\xd9"
    with pytest.raises(ValueError, match="jpeg"):
        decode_jpeg_gray(truncated)


def test_png_fast_path_matches_general_unfilter():
    """r15 added a vectorized unfilter for the rotating None/Sub/Up
    pattern our encoder writes; the general per-row loop remains for
    other filter sequences. Same pixels through both paths must yield
    identical stats."""
    from rust_vector_search_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(11)
    data = bytes(rng.integers(0, 256, 7 * 64 + 13, dtype=np.uint8))
    fast = decode_png(encode_png(data))  # rotating pattern -> fast path

    # same pixels, all-None filters -> general loop (pattern != r % 3)
    width = 64
    height = max(1, -(-len(data) // width))
    padded = np.frombuffer(
        data + b"\x00" * (height * width - len(data)), dtype=np.uint8
    ).reshape(height, width)
    lines = np.zeros((height, width + 1), dtype=np.uint8)
    lines[:, 1:] = padded
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    payload = (
        sig
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(lines.tobytes(), 6))
        + chunk(b"IEND", b"")
    )
    general = decode_png(payload)
    assert fast == general
