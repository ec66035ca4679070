"""Training-mix curation operators: temperature-weighted resampling
across strata (the multilingual/multi-source α-sampling of XLM-R /
mBERT / the LLaMA data recipe) and token-budget-capped selection — the
two ops that turn a deduplicated corpus into an actual training mix.

Both are built to the repo's determinism bar: no RNG (selection order
is an md5 rank over the key, the same engine-portable trick as
stratified_sample_orders), and the only floating math is sqrt /
division / multiplication in a pinned evaluation order, so a DuckDB
oracle replays quota computation bit-exactly.

Scale shape (100 TB): stratum statistics are one partial+final
aggregation to a HANDFUL of rows (one per language/source); the global
normalizer folds that tiny set in a fixed order on a single row (no
driver collect — a one-row cross join carries it back); the selection
itself is ONE md5-ranked window per stratum (the same single shuffle a
stratified sample pays; a heavily skewed stratum is a known window
hotspot — mitigate with the salted-window pattern of
plans/relational.salted_agg_orders_by_status if one language is >50%
of the corpus). Quotas join back in broadcast.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window

__all__ = [
    "temperature_quotas",
    "temperature_mixture_sample",
    "token_budget_sample",
    "sequence_pack_layout",
]


def _md5_rank(stratum_col: str, id_col: str) -> Window:
    return Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )


def temperature_quotas(
    df: DataFrame,
    stratum_col: str,
    n_target: int,
    # α = 0.5 hard-wired as sqrt: IEEE-754 sqrt is correctly rounded and
    # therefore bit-identical across engines; a general pow(x, α) is NOT
    # (libm powf differs) and would break oracle replay
) -> DataFrame:
    """Per-stratum selection quotas under temperature α = 0.5:
    ``w_s = √n_s / Σ_t √n_t``, ``quota_s = min(n_s, ⌊n_target · w_s⌋)``
    — low-resource strata are upweighted relative to their share, the
    standard multilingual sampling scheme.

    Returns (stratum, n_rows, quota). The normalizer Σ√n is folded over
    the stratum list in stratum-sorted order on ONE row (fixed order ⇒
    bit-reproducible; strata are few, the row is tiny) and carried back
    by a single-row cross join — never a driver collect."""
    counts = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    counts = counts.withColumn("sw", F.sqrt(F.col("n_rows").cast("double")))
    total = counts.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("stratum"), F.col("sw")))),
            F.lit(0.0),
            lambda acc, s: acc + s["sw"],
        ).alias("total_sw")
    )
    quota = F.least(
        F.col("n_rows"),
        F.floor(F.lit(float(n_target)) * (F.col("sw") / F.col("total_sw"))),
    )
    return counts.crossJoin(F.broadcast(total)).select(
        "stratum", "n_rows", quota.alias("quota")
    )


def temperature_mixture_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    n_target: int,
) -> DataFrame:
    """Temperature-resampled training mix: keep the ``quota_s`` rows of
    each stratum with the smallest md5 rank (deterministic 'random'
    order — no RNG, any engine reproduces the exact selection).

    Returns the selected (id, stratum) rows. One aggregation for the
    quotas + one md5-ranked window per stratum; quotas broadcast."""
    quotas = temperature_quotas(df, stratum_col, n_target).select(
        F.col("stratum").alias(stratum_col), "quota"
    )
    ranked = df.select(id_col, stratum_col).withColumn(
        "_rn", F.row_number().over(_md5_rank(stratum_col, id_col))
    )
    return (
        ranked.join(F.broadcast(quotas), stratum_col)
        .filter(F.col("_rn") <= F.col("quota"))
        .select(id_col, stratum_col)
    )


def token_budget_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    tokens_col: Column | str,
    budget: int,
) -> DataFrame:
    """Token-budget-capped selection: walk each stratum in md5 order and
    keep rows while the RUNNING token total stays ≤ ``budget`` — the
    'fill each source's token allowance' primitive of a training-mix
    builder (quota by tokens, not documents, so verbose sources don't
    dominate by length). Token counts are integers, the running sum is
    an integer window cumsum — exact in any engine.

    Returns (id, stratum, n_tokens, cum_tokens) for the kept rows. Cost:
    one window shuffle on the stratum key, nothing else."""
    tokens = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    base = df.select(
        id_col, stratum_col, tokens.cast("long").alias("n_tokens")
    )
    w = _md5_rank(stratum_col, id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return base.withColumn("cum_tokens", F.sum("n_tokens").over(w)).filter(
        F.col("cum_tokens") <= budget
    )


def sequence_pack_layout(
    df: DataFrame,
    shard_col: str,
    id_col: str,
    tokens_col: Column | str,
    seq_len: int,
) -> DataFrame:
    """GPT-style sequence packing LAYOUT: concatenate each shard's
    documents in stable ``id`` order into one token stream and cut it
    into fixed ``seq_len`` training sequences, documents spanning
    boundaries (the standard concat-and-chunk packing of GPT/LLaMA
    pretraining — zero padding waste). This computes the layout table a
    sequence writer consumes: where every document's tokens land.

    Returns per document:
      (id, shard, n_tokens, start_offset  — global token offset in the
       shard's stream, seq_first / seq_last — the sequence ids the doc
       spans, offset_in_seq — the doc's start position inside
       seq_first).

    All integer arithmetic over ONE window cumsum per shard (the same
    single exchange a stratified op pays) — exact in any engine, and
    embarrassingly scalable: shards are independent, and within a
    shard the layout is a prefix sum, not a sequential walk. Empty
    documents (0 tokens) get seq_last = seq_first − 0-width spans
    handled as seq_last = floor(max(cum_before, cum_after − 1)/L) so
    they attach to their boundary without claiming a sequence."""
    tokens = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    base = df.select(
        id_col, shard_col, tokens.cast("long").alias("n_tokens")
    )
    w = Window.partitionBy(shard_col).orderBy(F.col(id_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum_after = F.sum("n_tokens").over(w)
    out = base.withColumn(
        "start_offset", (cum_after - F.col("n_tokens"))
    ).withColumn(
        "_end_tok",
        F.col("start_offset") + F.greatest(F.col("n_tokens") - 1, F.lit(0)),
    )
    # integer division (DIV), not floor(double/) — exact past 2^53 tokens
    L = int(seq_len)
    return out.select(
        id_col,
        shard_col,
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset DIV {L}").alias("seq_first"),
        F.expr(f"_end_tok DIV {L}").alias("seq_last"),
        (F.col("start_offset") % L).alias("offset_in_seq"),
    )
