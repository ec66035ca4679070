"""fastText .vec reader (O1, /root/reference/src/main.rs:11-40) and
fixture loader tests."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_vector_search_spark.sources import (  # noqa: E402
    load_table,
    read_fasttext_vec,
)
from rust_vector_search_spark.sources.fasttext import read_fasttext_header  # noqa: E402

from conftest import SF_SMOKE  # noqa: E402


@pytest.fixture(scope="module")
def vec_file(tmp_path_factory):
    """A tiny .vec fixture in the reference's format: '<count> <dim>'
    header then 'word f1 .. fN' lines (src/main.rs:21-38)."""
    p = tmp_path_factory.mktemp("vec") / "mini.vec"
    rows = [
        ("alpha", [1.0, 2.0, 3.0]),
        ("beta", [4.0, 5.0, 6.0]),
        ("gamma", [-1.5, 0.25, 9.0]),
        ("delta", [0.0, 0.0, 1.0]),
    ]
    with open(p, "w") as f:
        f.write(f"{len(rows)} 3\n")
        for w, v in rows:
            f.write(w + " " + " ".join(str(x) for x in v) + "\n")
    return str(p)


def test_header(spark, vec_file):
    count, dim = read_fasttext_header(spark, vec_file)
    assert (count, dim) == (4, 3)


def test_read_vec(spark, vec_file):
    df = read_fasttext_vec(spark, vec_file, dim=3)
    rows = {r.word: (r.vec_id, r.embedding) for r in df.collect()}
    assert set(rows) == {"alpha", "beta", "gamma", "delta"}
    assert rows["alpha"][0] == 0  # ids follow line order
    assert rows["delta"][0] == 3
    assert rows["gamma"][1] == [-1.5, 0.25, 9.0]
    assert dict(df.dtypes) == {
        "vec_id": "bigint",
        "word": "string",
        "embedding": "array<float>",
    }


def test_dim_filter(spark, tmp_path):
    p = tmp_path / "ragged.vec"
    p.write_text("2 3\nok 1 2 3\nbad 1 2\n")
    df = read_fasttext_vec(spark, str(p), dim=3)
    assert [r.word for r in df.collect()] == ["ok"]


def test_reference_sample_corpus(spark):
    """The reference ships a 100×300 sample (data/test.vec:1) — read it
    as an input fixture (data, not code)."""
    path = "/root/reference/data/test.vec"
    if not os.path.exists(path):
        pytest.skip("reference sample not present")
    count, dim = read_fasttext_header(spark, path)
    df = read_fasttext_vec(spark, path, dim=dim)
    assert (count, dim) == (100, 300)
    # the shipped sample actually holds 99 body rows — its header over-
    # counts by one (verified: wc -l = 100 incl. header)
    assert df.count() == 99


def test_load_all_fixture_tables(spark):
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        df = load_table(spark, SF_SMOKE, t)
        assert df.count() > 0
    assert dict(load_table(spark, SF_SMOKE, "events").dtypes)["ts"] == "timestamp"


def test_no_timestamp_ntz_survives_load(spark):
    """Regression (round-4): driver-regenerated fixtures ship timestamp[us]
    without timezone, which Spark reads as TIMESTAMP_NTZ — a dtype that
    unix_micros and withWatermark reject. load_table must normalize every
    timestamp column to plain TIMESTAMP so no consumer ever sees NTZ."""
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        for col, dtype in load_table(spark, SF_SMOKE, t).dtypes:
            assert dtype != "timestamp_ntz", f"{t}.{col} leaked TIMESTAMP_NTZ"


def test_ntz_parquet_normalized(spark, tmp_path):
    """A parquet written with an explicit NTZ column must come back as
    TIMESTAMP through the events loader regardless of fixture vintage."""
    import shutil

    sfdir = tmp_path / "sf"
    sfdir.mkdir()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        shutil.copy(f"{SF_SMOKE}/{t}.parquet", sfdir / f"{t}.parquet")
    spark.sql(
        "SELECT 1L AS event_id, TIMESTAMP_NTZ '2024-01-02 03:04:05' AS ts, "
        "7L AS user_id, 'click' AS event_type, 1.5D AS value, '{}' AS props"
    ).write.parquet(str(sfdir / "events.parquet"))
    df = load_table(spark, str(sfdir), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    import pyspark.sql.functions as F

    micros = df.select(F.unix_micros("ts").alias("us")).collect()[0].us
    # UTC session: 2024-01-02T03:04:05Z exactly
    assert micros == 1704164645000000


def test_vec_write_read_roundtrip(spark, tmp_path):
    from rust_vector_search_spark.sources.fasttext import write_fasttext_vec

    src = spark.createDataFrame(
        [(0, "aa", [1.0, 2.5]), (1, "bb", [-0.5, 3.0])],
        "vec_id long, word string, embedding array<float>",
    )
    out = str(tmp_path / "roundtrip.vec")
    write_fasttext_vec(src, out, dim=2)
    back = read_fasttext_vec(spark, out, dim=2)
    rows = {r.word: r.embedding for r in back.collect()}
    assert rows == {"aa": [1.0, 2.5], "bb": [-0.5, 3.0]}


def test_golden_micro_knn(spark):
    """SURVEY §5.4 golden micro-fixture: hand-computed nearest
    neighbors on a 4-point corpus with exact distances."""
    from rust_vector_search_spark.operators.knn import knn_exact
    import pyspark.sql.functions as F

    corpus = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 2.0]), (3, [3.0, 4.0])],
        "vec_id long, embedding array<float>",
    )
    q = corpus.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = [(r.vec_id, r.dist) for r in knn_exact(corpus, q, k=3).orderBy("rnk").collect()]
    assert got == [(1, 1.0), (2, 4.0), (3, 25.0)]
