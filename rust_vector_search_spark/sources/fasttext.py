"""fastText ``.vec`` reader — operator O1 (`/root/reference/src/main.rs:11-40`).

Format: line 1 is a ``"<count> <dim>"`` header (the reference skips it,
``src/main.rs:21-22``); every other line is ``word f1 f2 … fN``
(whitespace-separated, ``src/main.rs:24-38``).

Spark-first shape: a distributed text scan + pure column expressions —
no Python loop over lines (the reference parses single-threaded,
``src/main.rs:24``; at the 1M-row wiki-news corpus a distributed scan is
already the right call, and at 100 TB it is the only call). Ids are
assigned by line order like the reference's sequential counter
(``src/main.rs:20, 31``) via ``zipWithIndex`` — a two-pass distributed
numbering (count per partition, then offset), NOT a global sort, so it
scales linearly with partitions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def read_fasttext_vec(
    spark: SparkSession, path: str, dim: int | None = None
) -> DataFrame:
    """Returns ``(vec_id BIGINT, word STRING, embedding ARRAY<FLOAT>)``.

    ``dim`` enforces the fixed dimensionality the reference gets from its
    const generic (``src/main.rs:139``, hard parse failure at
    ``src/main.rs:33-37``); wrong-arity rows are filtered out here.
    """
    lines = spark.read.text(path).rdd.map(lambda r: r[0]).zipWithIndex()
    numbered = spark.createDataFrame(lines, "value string, _line_no long")
    body = numbered.filter(F.col("_line_no") > 0)
    parts = body.select(
        (F.col("_line_no") - F.lit(1)).alias("vec_id"),
        F.split(F.trim(F.col("value")), r"\s+").alias("_parts"),
    )
    out = parts.select(
        "vec_id",
        F.element_at("_parts", 1).alias("word"),
        F.transform(
            F.slice("_parts", 2, 1_000_000), lambda x: x.cast("float")
        ).alias("embedding"),
    )
    if dim is not None:
        out = out.filter(F.size("embedding") == dim)
    return out


def read_fasttext_header(spark: SparkSession, path: str) -> tuple[int, int]:
    """Parse the ``"<count> <dim>"`` header line (``src/main.rs:21-22``)."""
    first = spark.read.text(path).limit(1).collect()[0][0].split()
    return int(first[0]), int(first[1])


def write_fasttext_vec(df: DataFrame, path: str, dim: int) -> None:
    """Sink twin of the reader: write (word, embedding) back to the
    fastText ``.vec`` text format (header line + space-separated rows,
    ``/root/reference/src/main.rs:21-38``). Rows are written distributed
    (one part-file per partition, header in part 0 via a union trick is
    fragile — instead the header is its own tiny file read first by the
    reader's header probe; for strict single-file output coalesce(1))."""
    import pyspark.sql.functions as F

    n = df.count()
    spark = df.sparkSession
    lines = df.select(
        F.concat_ws(
            " ",
            F.col("word"),
            F.concat_ws(" ", F.transform("embedding", lambda x: x.cast("string"))),
        ).alias("value")
    )
    header = spark.createDataFrame([(f"{n} {dim}",)], "value string")
    header.coalesce(1).unionByName(lines.coalesce(1)).coalesce(1).write.mode(
        "overwrite"
    ).text(path)
