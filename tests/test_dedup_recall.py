"""Near-duplicate RECALL: the fixture corpus has no real near-dups, so
these tests inject them — mutated copies of documents/vectors — and
assert each dedup operator finds the planted pairs. This is the
functional claim ("catches near-duplicates") that oracle value-parity
alone can't establish."""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_vector_search_spark.operators.dedup import (  # noqa: E402
    embedding_cosine_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_join,
    simhash_near_dup_pairs,
)

from conftest import SF_SMOKE  # noqa: E402

N_PLANTED = 20
OFFSET = 100_000


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    """First N docs duplicated with a small mutation: last 2 words
    replaced — high-but-not-1.0 similarity."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    dups = (
        docs.filter(F.col("doc_id") < N_PLANTED)
        .withColumn("doc_id", F.col("doc_id") + OFFSET)
        .withColumn(
            "text",
            F.concat(
                F.regexp_replace(F.col("text"), r"\s+\S+\s+\S+$", ""),
                F.lit(" zz1 zz2"),
            ),
        )
    )
    return docs.unionByName(dups).cache()


def _planted_found(pairs, a_col="doc_id_a", b_col="doc_id_b"):
    found = {
        (r[a_col], r[b_col])
        for r in pairs.filter(F.col(b_col) >= OFFSET).collect()
    }
    return sum(
        1 for i in range(N_PLANTED) if (i, i + OFFSET) in found
    )


def test_minhash_finds_planted_near_dups(docs_with_dups):
    pairs = minhash_lsh_pairs(docs_with_dups, num_hashes=16, bands=16, shingle_n=3)
    strong = pairs.filter(F.col("jaccard") >= 0.5)
    assert _planted_found(strong) >= int(N_PLANTED * 0.9)


def test_simhash_finds_planted_near_dups(docs_with_dups):
    """The 2-word mutation lands planted pairs at hamming 0–6 of 32;
    8×4-bit pigeonhole blocking guarantees recall for hamming ≤ 7."""
    pairs = simhash_near_dup_pairs(docs_with_dups, max_hamming=6, chunks=8)
    assert _planted_found(pairs) >= int(N_PLANTED * 0.9)


def test_ngram_jaccard_finds_planted_near_dups(docs_with_dups):
    pairs = ngram_jaccard_join(docs_with_dups, shingle_n=1, threshold=0.8)
    assert _planted_found(pairs) >= int(N_PLANTED * 0.9)


def test_exact_dedup_collapses_identical_copies(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    clones = docs.filter(F.col("doc_id") < N_PLANTED).withColumn(
        "doc_id", F.col("doc_id") + OFFSET
    )
    both = docs.unionByName(clones)
    kept = exact_dedup(both, ["text"], "doc_id")
    assert kept.count() == docs.count()
    # first occurrence (lower id) survives
    assert kept.filter(F.col("doc_id") >= OFFSET).count() == 0


def test_cosine_pairs_find_planted_vector_dups(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    dups = (
        emb.filter(F.col("vec_id") < N_PLANTED)
        .withColumn("vec_id", F.col("vec_id") + OFFSET)
        .withColumn(
            "embedding",
            F.transform("embedding", lambda x: x * F.lit(1.001).cast("float")),
        )
    )
    both = emb.unionByName(dups)
    pairs = embedding_cosine_pairs(both, threshold=0.999)
    found = {
        (r.vec_id_a, r.vec_id_b) for r in pairs.filter(F.col("vec_id_b") >= OFFSET).collect()
    }
    hits = sum(1 for i in range(N_PLANTED) if (i, i + OFFSET) in found)
    assert hits == N_PLANTED  # scaling preserves cosine exactly (≈1.0)
