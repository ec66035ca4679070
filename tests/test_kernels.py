"""Property tests for the vector kernel expressions (SURVEY §5.3):
distance symmetry, identity, dot/norm consistency, plane-side semantics
— mirroring the invariants of /root/reference/src/vector.rs and
src/hyperplane.rs that the reference never tests."""

from __future__ import annotations

import math
import os
import sys

import pyspark.sql.functions as F
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_vector_search_spark.functions.vector import (  # noqa: E402
    avg_vec,
    cosine_sim,
    dot,
    l2_norm,
    point_is_above,
    sq_euc_dist,
    sub_vec,
)

from conftest import SF_SMOKE  # noqa: E402


@pytest.fixture(scope="module")
def pairs(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    a = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("ida"), F.col("embedding").alias("va")
    )
    b = emb.filter((F.col("vec_id") >= 20) & (F.col("vec_id") < 40)).select(
        F.col("vec_id").alias("idb"), F.col("embedding").alias("vb")
    )
    return a.crossJoin(b)


def test_distance_symmetry(pairs):
    rows = pairs.select(
        sq_euc_dist("va", "vb").alias("d_ab"), sq_euc_dist("vb", "va").alias("d_ba")
    ).collect()
    assert rows and all(r.d_ab == r.d_ba for r in rows)


def test_distance_identity(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(50)
    rows = emb.select(sq_euc_dist("embedding", "embedding").alias("d")).collect()
    assert all(r.d == 0.0 for r in rows)


def test_dot_vs_norm(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(50)
    rows = emb.select(
        dot("embedding", "embedding").alias("dd"), l2_norm("embedding").alias("n")
    ).collect()
    assert all(math.isclose(math.sqrt(r.dd), r.n, rel_tol=1e-12) for r in rows)


def test_cosine_bounds_and_self(pairs, spark):
    rows = pairs.select(cosine_sim("va", "vb").alias("c")).collect()
    assert all(-1.0 - 1e-9 <= r.c <= 1.0 + 1e-9 for r in rows)
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(20)
    selfc = emb.select(cosine_sim("embedding", "embedding").alias("c")).collect()
    assert all(math.isclose(r.c, 1.0, rel_tol=1e-9) for r in selfc)


def test_sub_avg_consistency(pairs):
    # midpoint m of (a,b): m - a == (b - a) / 2 elementwise
    rows = pairs.limit(30).select(
        F.zip_with(
            sub_vec("va", avg_vec("va", "vb")),  # a - m
            sub_vec("vb", avg_vec("va", "vb")),  # b - m
            lambda x, y: x + y,
        ).alias("z")
    ).collect()
    for r in rows:
        assert all(abs(v) < 1e-9 for v in r.z)


def test_plane_side_partition_covers_all(spark):
    """Every point is on exactly one side (ties above) — mirrors the
    reference's above/below partition (src/lib.rs:39-46)."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    two = emb.orderBy("vec_id").limit(2).collect()
    a, b = two[0].embedding, two[1].embedding
    coeffs = F.array(*[F.lit(float(y) - float(x)) for x, y in zip(a, b)])
    mid = [(float(x) + float(y)) / 2.0 for x, y in zip(a, b)]
    const = -sum(c * m for c, m in zip([float(y) - float(x) for x, y in zip(a, b)], mid))
    flags = emb.select(
        point_is_above(coeffs, F.lit(const), F.col("embedding")).alias("above")
    )
    n_total = flags.count()
    n_above = flags.filter("above").count()
    n_below = flags.filter("NOT above").count()
    assert n_above + n_below == n_total
    assert 0 < n_above < n_total  # a real split separates the two pivots
