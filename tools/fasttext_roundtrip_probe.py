#!/usr/bin/env python3
"""fastText .vec round-trip at scale (VERDICT r1 missing #4): the
container has no network for the real wiki-news-300d-1M corpus, so this
generates an equivalently-shaped synthetic corpus (N x 300-d float32,
seeded), writes it through the .vec SINK, reads it back through the
.vec READER, and verifies count + header + bit-exact float parity on a
sample, then runs a micro-kNN through the reader output.

Usage: python tools/fasttext_roundtrip_probe.py [n_rows]   (default 100_000)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dim = 300

    from rust_vector_search_spark.operators.knn import knn_exact
    from rust_vector_search_spark.session import get_spark
    from rust_vector_search_spark.sources.fasttext import (
        read_fasttext_header,
        read_fasttext_vec,
        write_fasttext_vec,
    )

    spark = get_spark(app_name="fasttext_roundtrip")
    work = tempfile.mkdtemp(prefix="ft_probe_")
    try:
        print(f"generating {n} x {dim}-d words (seed 7) ...", flush=True)
        rng = np.random.default_rng(7)
        import pandas as pd

        chunks = []
        for lo in range(0, n, 20_000):
            hi = min(lo + 20_000, n)
            X = rng.standard_normal((hi - lo, dim)).astype(np.float32)
            chunks.append(
                pd.DataFrame(
                    {
                        "word": [f"w{i}" for i in range(lo, hi)],
                        "embedding": list(X),
                    }
                )
            )
        src = spark.createDataFrame(pd.concat(chunks))

        path = f"{work}/corpus.vec"
        t0 = time.time()
        write_fasttext_vec(src, path, dim=dim)
        t_write = time.time() - t0
        print(f"RESULT sink: {t_write:.1f}s", flush=True)

        t0 = time.time()
        count, hdr_dim = read_fasttext_header(spark, path)
        back = read_fasttext_vec(spark, path, dim=dim).localCheckpoint(eager=True)
        n_back = back.count()
        t_read = time.time() - t0
        print(
            f"RESULT reader: {t_read:.1f}s  header=({count},{hdr_dim}) rows={n_back}",
            flush=True,
        )
        assert (count, hdr_dim, n_back) == (n, dim, n), (count, hdr_dim, n_back)

        # bit-exact float parity on a 1000-word sample (float32 -> str ->
        # float32 must be lossless through the sink/reader pair)
        sample = {
            r.word: r.embedding
            for r in back.filter(F.col("vec_id") % (n // 1000) == 0).collect()
        }
        orig = {
            r.word: r.embedding
            for r in src.join(
                spark.createDataFrame(
                    [(w,) for w in sample], "word string"
                ),
                "word",
                "left_semi",
            ).collect()
        }
        bad = [
            w
            for w in sample
            if not np.array_equal(
                np.asarray(sample[w], dtype=np.float32),
                np.asarray(orig[w], dtype=np.float32),
            )
        ]
        assert not bad, f"{len(bad)} words differ, e.g. {bad[:3]}"
        print(f"RESULT parity: {len(sample)} sampled words bit-exact", flush=True)

        # the reference pipeline's O13 shape on reader output
        q = back.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        t0 = time.time()
        got = knn_exact(back, q, k=10).count()
        print(f"RESULT micro-kNN on reader output: {got} rows {time.time()-t0:.1f}s")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
