"""PySpark-native analytics engine with the query/data-processing
capabilities of ``blueyellowpink/rust-vector-search`` (an Annoy-style
random-projection-tree ANN index over f32 vectors), rebuilt Spark-first.

Reference: /root/reference (read-only snapshot). This is NOT a port — the
reference tells us WHAT to compute (dedup, RP-forest ANN index, top-k
search, all-pairs kNN; see SURVEY.md §2); the HOW here is DataFrame/SQL
plans optimized by Catalyst, designed for a 1000-executor cluster over
~100 TB even though tests run on local mode.

Layout:
    sources/     fixture parquet loaders + fastText ``.vec`` reader (O1)
    functions/   vector + text kernel Column expressions (zero UDFs)
    operators/   dedup, exact kNN, RP-forest index, approx search,
                 similarity joins, text analysis, multimodal plumbing
    plans/       the oracle-checked query registry (driver contract)
    streaming/   incremental index maintenance, streaming dedup
"""

__version__ = "0.1.0"
