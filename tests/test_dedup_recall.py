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


def test_ngram_jaccard_prefix_filter_candidate_bounded(spark):
    """Adversarial low-vocab fixture (VERDICT r1 #8): every doc shares
    the same 5 stop-tokens, plus 2 unique tokens. A naive inverted-index
    join pairs ALL n(n-1)/2 docs through the stopwords; prefix filtering
    must (a) return the exact J >= t pair set, (b) generate candidates
    only through prefix (rare) tokens — near-zero here."""
    import pyspark.sql.functions as FF
    from pyspark.sql.window import Window

    n = 200
    stop = "the a of and to"
    rows = [(i, f"{stop} tok{i}a tok{i}b") for i in range(n)]
    # two planted near-dup pairs that DO share rare tokens
    rows.append((n, f"{stop} tok0a tok0b"))        # J = 1.0 with doc 0
    rows.append((n + 1, f"{stop} tok1a uniq{n+1}"))  # J = 6/8 with doc 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r.doc_id_a, r.doc_id_b)
        for r in ngram_jaccard_join(docs, shingle_n=1, threshold=0.75).collect()
    }
    assert got == {(0, n), (1, n + 1)}, got

    # candidate volume: replicate the prefix-index join and count —
    # must be O(planted), not O(n^2) (naive join yields ~n^2/2 pairs)
    from rust_vector_search_spark.operators.dedup import word_shingles

    sh = docs.select("doc_id", word_shingles(FF.col("text"), 1).alias("sh"))
    tok = sh.select(
        "doc_id", FF.size("sh").alias("n_sh"), FF.explode("sh").alias("s")
    )
    dfreq = tok.groupBy("s").agg(FF.count(FF.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(FF.col("df").asc(), FF.col("s").asc())
    prefix = (
        tok.join(dfreq, "s")
        .withColumn("rk", FF.row_number().over(w))
        .filter(FF.col("rk") <= FF.floor(FF.lit(0.25) * FF.col("n_sh")).cast("int") + 1)
    )
    a = prefix.select(FF.col("doc_id").alias("da"), "s")
    b = prefix.select(FF.col("doc_id").alias("db"), "s")
    n_cand = (
        a.join(b, "s").filter(FF.col("da") < FF.col("db"))
        .select("da", "db").distinct().count()
    )
    assert n_cand <= 10, f"prefix candidates {n_cand} (naive would be ~{n*(n-1)//2})"


def test_simhash_pigeonhole_guarantee_hamming_4_to_8(spark):
    """Property (ADVICE r1): with chunks derived from max_hamming the
    blocked join must find EVERY pair within the radius. Planted
    fingerprints at hamming 4..8 over 32 bits, fed straight into
    simhash_blocked_pairs."""
    import random

    from rust_vector_search_spark.operators.dedup import simhash_blocked_pairs

    rng = random.Random(7)
    rows = []
    expected = set()
    next_id = 0
    for h in range(4, 9):
        for _ in range(10):
            base = rng.getrandbits(32)
            bits = rng.sample(range(32), h)
            mut = base
            for bit in bits:
                mut ^= 1 << bit
            a, b = next_id, next_id + 1
            next_id += 2
            rows += [(a, base), (b, mut)]
            expected.add((min(a, b), max(a, b), h))
    fps = spark.createDataFrame(rows, "doc_id long, simhash long")
    for max_h in (4, 6, 8):
        got = {
            (r.doc_id_a, r.doc_id_b, r.hamming)
            for r in simhash_blocked_pairs(fps, max_hamming=max_h).collect()
        }
        want = {p for p in expected if p[2] <= max_h}
        missing = want - got
        assert not missing, f"max_hamming={max_h}: missed {missing}"


def test_substring_spans_find_planted_passages(spark):
    """Substring-level exact dedup (Lee et al.): a 12-token passage
    planted verbatim in two otherwise-unique documents must come back as
    one maximal span per document covering exactly the passage; documents
    without shared n-token windows must produce no spans."""
    from rust_vector_search_spark.operators.dedup import substring_dup_spans

    passage = " ".join(f"p{i}" for i in range(12))  # 12 shared tokens
    filler_a = " ".join(f"a{i}" for i in range(10))
    filler_b = " ".join(f"b{i}" for i in range(7))
    filler_c = " ".join(f"c{i}" for i in range(25))
    docs = spark.createDataFrame(
        [
            (1, f"{filler_a} {passage}"),          # passage at tokens 10..21
            (2, f"{passage} {filler_b}"),          # passage at tokens 0..11
            (3, filler_c),                          # no shared content
            (4, "short doc only"),                  # below window size
        ],
        "doc_id long, text string",
    )
    n = 8
    spans = {
        r.doc_id: (r.span_start, r.span_end, r.n_windows)
        for r in substring_dup_spans(docs, n_tokens=n).collect()
    }
    # 12-token passage ⇒ 12 - n + 1 = 5 duplicated windows per doc
    assert spans == {
        1: (10, 21, 12 - n + 1),
        2: (0, 11, 12 - n + 1),
    }


def test_decontaminate_spans_flags_benchmark_overlap(spark):
    """Benchmark decontamination: a train document quoting a 12-token
    benchmark passage gets exactly one maximal span over the quote;
    train-train overlap alone is NOT contamination (only benchmark
    membership counts); clean and short train docs produce no rows."""
    from rust_vector_search_spark.operators.dedup import decontaminate_spans

    passage = " ".join(f"p{i}" for i in range(12))
    shared_train = " ".join(f"t{i}" for i in range(9))  # train-only dup
    filler_a = " ".join(f"a{i}" for i in range(10))
    train = spark.createDataFrame(
        [
            (1, f"{filler_a} {passage}"),       # quote at tokens 10..21
            (2, f"{shared_train} x y z q r s"),  # train-train overlap only
            (3, f"{shared_train} u v w m n o"),
            (4, "short doc only"),
        ],
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame(
        [(100, f"{passage} extra benchmark tail words")],
        "doc_id long, text string",
    )
    n = 8
    for bc in (True, False):
        spans = {
            r.doc_id: (r.span_start, r.span_end, r.n_windows)
            for r in decontaminate_spans(
                train, benchmark, n_tokens=n, broadcast_benchmark=bc
            ).collect()
        }
        assert spans == {1: (10, 21, 12 - n + 1)}, f"broadcast={bc}: {spans}"


def test_substring_dedup_clean_keeps_one_copy(spark):
    """Excised-corpus semantics: the lowest-id owner of a duplicated
    passage keeps it verbatim; every other document loses exactly the
    passage tokens; an exact duplicate of a lower-id doc comes back
    empty; untouched docs round-trip byte-identical."""
    from rust_vector_search_spark.operators.dedup import substring_dedup_clean

    passage = " ".join(f"p{i}" for i in range(12))
    filler_a = " ".join(f"a{i}" for i in range(10))
    filler_b = " ".join(f"b{i}" for i in range(7))
    clean_doc = " ".join(f"c{i}" for i in range(25))
    docs = spark.createDataFrame(
        [
            (1, f"{passage} {filler_b}"),   # owner: keeps everything
            (2, f"{filler_a} {passage}"),   # loses the 12 passage tokens
            (3, f"{passage} {filler_b}"),   # exact dup of doc 1 -> empty
            (4, clean_doc),                  # untouched
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_tokens_kept, r.n_tokens_cut, r.clean_text)
        for r in substring_dedup_clean(docs, n_tokens=8).collect()
    }
    assert got[1] == (19, 0, f"{passage} {filler_b}")
    assert got[2] == (10, 12, filler_a)
    assert got[3] == (0, 19, "")
    assert got[4] == (25, 0, clean_doc)


def test_simhash_duplicate_ids_one_row_per_input_row(spark):
    """The documented simhash contract (VERDICT r6 #8): duplicate
    ``id_col`` values yield one fingerprint PER ROW — never a merged
    per-id fingerprint — and identical text always fingerprints
    identically regardless of which duplicate row carries it."""
    from rust_vector_search_spark.operators.dedup import simhash

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (1, "alpha beta gamma"),          # exact dup, same id
            (1, "totally different words"),   # same id, different text
            (2, "alpha beta gamma"),          # same text, different id
        ],
        "doc_id long, text string",
    )
    rows = simhash(df).collect()
    assert len(rows) == 4  # one row per input row, ids NOT merged
    by_id = {}
    for r in rows:
        by_id.setdefault(r.doc_id, []).append(r.simhash)
    assert sorted(by_id) == [1, 2]
    assert len(by_id[1]) == 3 and len(by_id[2]) == 1
    # identical text ⇒ identical fingerprint across rows and ids
    same_text_fps = {by_id[2][0], *(
        s for s in by_id[1] if by_id[1].count(s) >= 2
    )}
    assert len(same_text_fps) == 1
