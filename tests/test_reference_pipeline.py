"""End-to-end on the reference's OWN data format: fastText .vec →
dedup → forest build → kNN with word labels — the full main() pipeline
of /root/reference/src/main.rs:138-175, run through this engine."""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_vector_search_spark.operators.index import build_rp_forest  # noqa: E402
from rust_vector_search_spark.operators.knn import knn_exact  # noqa: E402
from rust_vector_search_spark.operators.search import search_rp_forest  # noqa: E402
from rust_vector_search_spark.sources import read_fasttext_vec  # noqa: E402

REF_VEC = "/root/reference/data/test.vec"


@pytest.fixture(scope="module")
def corpus(spark):
    if not os.path.exists(REF_VEC):
        pytest.skip("reference sample not present")
    return read_fasttext_vec(spark, REF_VEC, dim=300).cache()


def test_full_pipeline_on_reference_corpus(spark, corpus):
    """Mirrors main(): load, build (reference defaults scaled to the
    99-row sample), then neighbor queries for probe words with √distance
    display (src/main.rs:157-160, 81-93)."""
    probe_words = corpus.limit(4).select("word").collect()
    probes = [r.word for r in probe_words]

    queries = corpus.filter(F.col("word").isin(probes)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    forest = build_rp_forest(corpus, num_trees=8, max_node_size=5, seed=42)
    approx = search_rp_forest(forest, corpus, queries, k=10)
    exact = knn_exact(corpus, queries, k=10)

    labels = corpus.select("vec_id", "word")
    shown = (
        approx.join(labels, "vec_id")
        .withColumn("euclidean", F.sqrt("dist"))
        .select("query_id", "word", "euclidean", "rnk")
    )
    rows = shown.collect()
    assert len(rows) == 4 * 10
    assert all(r.euclidean >= 0 for r in rows)

    # recall vs exact on the reference corpus (dense 300-d fastText
    # vectors have real neighborhood structure, unlike the synthetic
    # fixture — expect high recall)
    hits = (
        exact.select("query_id", "vec_id")
        .join(approx.select("query_id", "vec_id"), ["query_id", "vec_id"], "left_semi")
        .count()
    )
    assert hits / exact.count() >= 0.9


def test_dedup_matches_reference_contract(spark, corpus):
    """build dedups exactly like src/lib.rs:87-88 (minus the row-0 bug):
    the 99-row sample has no duplicate vectors, so all rows survive."""
    forest = build_rp_forest(corpus, num_trees=2, max_node_size=5, seed=1)
    assert forest.leaves.select("vec_id").distinct().count() == corpus.count()
    # leaf-size invariant with the reference's MAX_NODE_SIZE=5
    assert (
        forest.leaves.groupBy("tree_id", "leaf_path").count()
        .filter(F.col("count") > 5).count() == 0
    )
