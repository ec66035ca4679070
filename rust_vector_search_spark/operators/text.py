"""Text-analysis operators for the training-data-pipeline surface:
token counting, quality scoring, language-ID heuristic, document
fingerprinting. All pure Catalyst expressions (regexp/split/HOF) — no
Python in the per-row path, so they run inside whole-stage codegen and
scale as map-side work with zero shuffles (the fingerprint bottom-k
included: a per-row sorted-slice, not a window).

The reference has only a whitespace split (``/root/reference/src/main.rs:24-27``);
this module is the SURVEY §2.2 "string functions / text analysis" surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = [
    "token_stats",
    "quality_score",
    "repetition_score",
    "lang_id",
    "doc_fingerprint",
    "STOPWORDS_EN",
]

# tiny language-marker lexicons for the heuristic classifier; the fixture
# corpus is synthetic English-ish word bags, real deployments swap these
# for per-language frequency tables.
STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "it"]
_MARKERS = {
    "en": STOPWORDS_EN,
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pas"],
}

# word-or-single-punctuation token, the BPE-ish pre-tokenizer shape
BPE_ISH_PATTERN = r"[a-zA-Z0-9_]+|[^a-zA-Z0-9_\s]"


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace + regex token counts and char length per document."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        F.length(t).alias("n_chars_computed"),
        F.size(F.split(t, " ")).cast("long").alias("n_ws_tokens"),
        F.regexp_count(t, F.lit(BPE_ISH_PATTERN)).cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(F.split(t, " "))).cast("long").alias("n_distinct_words"),
    )


def _stopword_hits(words: Column, stopwords: list[str]) -> Column:
    return F.size(
        F.filter(words, lambda w: w.isin(*[F.lit(s) for s in stopwords]))
    ).cast("long")


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality signals: length, mean word length, stopword
    ratio, punctuation ratio, all-cap ratio → a composite [0,1] score.
    Mirrors the C4/Gopher-style rule filters used on LLM training data."""
    t = F.col(text_col)
    words = F.split(t, " ")
    n_words = F.size(words).cast("double")
    n_chars = F.length(t).cast("double")
    punct = (n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))).cast("double")
    stop_hits = _stopword_hits(words, STOPWORDS_EN).cast("double")
    mean_word_len = (n_chars - (n_words - 1)) / n_words
    stop_ratio = stop_hits / n_words
    punct_ratio = punct / n_chars
    score = (
        F.when(n_words < 5, F.lit(0.0))
        .otherwise(
            F.least(F.lit(1.0), n_words / F.lit(100.0)) * F.lit(0.5)
            + F.least(F.lit(1.0), stop_ratio * F.lit(5.0)) * F.lit(0.3)
            + (F.lit(1.0) - F.least(F.lit(1.0), punct_ratio * F.lit(10.0))) * F.lit(0.2)
        )
    )
    return docs.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        score.alias("quality_score"),
    )


def repetition_score(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals over word bigrams: the fraction of
    bigram occurrences that are duplicates and the share held by the
    single most frequent bigram — the filters that catch boilerplate and
    looping generations in training corpora.

    Deliberately ZERO-shuffle: instead of explode → groupBy(doc_id,
    bigram) (a wordcount-shaped shuffle whose volume is the corpus token
    count), everything is a per-row Catalyst HOF — bigrams built by
    `transform` over an index `sequence`, the duplicate count from
    `array_distinct`, and the max-frequency bigram from a single
    `aggregate` fold over the SORTED bigram array (longest equal-run).
    At 100 TB this is pure map-side work inside whole-stage codegen."""
    words = F.split(F.col(text_col), " ")
    # zip_with over two shifted slices, NOT transform-over-indices with
    # element_at: the word array is an argument of slice/zip_with, so the
    # split evaluates a constant number of times per row instead of once
    # per bigram element (see operators.dedup.word_shingles)
    m = F.size(words) - F.lit(1)
    bigrams = F.when(
        F.size(words) >= 2,
        F.zip_with(
            F.slice(words, 1, m),
            F.slice(words, 2, m),
            lambda x, y: F.concat(x, F.lit(" "), y),
        ),
    ).otherwise(F.array().cast("array<string>"))
    with_b = docs.select(F.col(id_col), bigrams.alias("bgs"))
    total = F.size("bgs").cast("long")
    nd = F.size(F.array_distinct("bgs")).cast("long")
    # longest equal-run of the sorted array = max bigram frequency
    mx = F.expr(
        "aggregate(array_sort(bgs), "
        "named_struct('prev', cast(null as string), 'run', 0L, 'best', 0L), "
        "(acc, x) -> named_struct("
        "  'prev', x, "
        "  'run', IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1, 1L), "
        "  'best', greatest(acc.best, "
        "    IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1, 1L))), "
        "acc -> acc.best)"
    )
    return with_b.select(
        F.col(id_col),
        total.alias("n_bigrams"),
        F.when(total > 0, (total - nd).cast("double") / total.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("dup_bigram_ratio"),
        F.when(total > 0, mx.cast("double") / total.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("top_bigram_ratio"),
        F.when(
            (total > 0)
            & ((total - nd).cast("double") / total.cast("double") > 0.3),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("repetitive"),
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language heuristic: count per-language stopword hits,
    argmax with deterministic (count desc, lang asc) tie-break; 'und'
    (undetermined) when nothing matches."""
    words = F.split(F.col(text_col), " ")
    hits = {lang: _stopword_hits(words, ws) for lang, ws in _MARKERS.items()}
    best_hits = F.greatest(*hits.values())
    # fixed precedence en > de > fr on ties — trivially mirrored in SQL
    pred = (
        F.when(best_hits <= 0, F.lit("und"))
        .when(hits["en"] == best_hits, F.lit("en"))
        .when(hits["de"] == best_hits, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return docs.select(
        F.col(id_col), pred.alias("lang_pred"), best_hits.alias("marker_hits")
    )


def doc_fingerprint(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    k: int = 4,
) -> DataFrame:
    """Winnowing-style fingerprint: the k smallest md5 hashes of the
    document's word n-gram shingles (a deterministic bottom-k sketch —
    same family as the rolling-hash winnowing used for code/doc dedup).
    Returns (id, fp_rank, fp_hash) exploded rows.

    ZERO-shuffle: the bottom-k is a per-row sorted-slice HOF (hash →
    distinct → sort → slice k → posexplode) — the earlier explode →
    dropDuplicates → rank-window form paid two per-doc shuffles for
    what is row-local math. Identical output (shingles are already
    distinct per doc; ascending md5 order defines the ranks)."""
    from .dedup import word_shingles

    bottom = F.slice(
        F.array_sort(
            F.transform(
                word_shingles(F.col(text_col), shingle_n), lambda s: F.md5(s)
            )
        ),
        1,
        k,
    )
    return (
        docs.select(F.col(id_col), F.posexplode(bottom).alias("_pos", "fp_hash"))
        .select(
            id_col,
            (F.col("_pos") + 1).cast("long").alias("fp_rank"),
            "fp_hash",
        )
    )
