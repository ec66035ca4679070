"""Structured Streaming operators — the incremental face of the engine.

The reference is strictly batch (its index is immutable after
``build_index``, ``/root/reference/src/lib.rs:81-103``, and dies with the
process). At pipeline scale, new documents/vectors arrive continuously;
these operators give the engine an incremental ingest path:

  - ``streaming_windowed_counts``: watermarked tumbling-window aggregation
    over an event stream (late data dropped past the watermark);
  - ``streaming_dedup``: exact dedup across micro-batches — the streaming
    twin of O3 (``src/lib.rs:64-79``) via ``dropDuplicates`` with state
    bounded by a watermark;
  - ``incremental_index_ingest``: ``foreachBatch`` that routes each new
    micro-batch of vectors through the FROZEN forest's hyperplanes and
    appends them to ``index_leaves`` — the standard "append now, rebuild
    periodically" ANN maintenance pattern (hyperplanes stay fixed; leaf
    quality degrades slowly and a periodic batch rebuild resets it).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.index import RPForest
from ..operators.search import node_table_broadcastable, route_queries
from ..session import hadoop_path_exists as _hadoop_path_exists

__all__ = [
    "streaming_windowed_counts",
    "streaming_dedup",
    "streaming_first_per_key",
    "streaming_interval_join",
    "incremental_index_ingest",
    "streaming_lsh_dedup_ingest",
    "streaming_embedding_dedup_ingest",
    "stateful_sessionizer",
    "stateful_user_counters",
]


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    interval: str = "6 hours",
    watermark: str = "90 days",
) -> DataFrame:
    """Stream-stream INNER interval join: right-side rows within
    ``[left_ts, left_ts + interval]`` of a matching key. Both sides are
    watermarked and the join carries the event-time range constraint,
    which is what lets Structured Streaming bound and clean each side's
    state to the interval + watermark delay instead of keeping every
    row forever — the production shape for joining two unbounded
    streams (clicks to purchases, requests to responses).

    The inner-join OUTPUT is a pure function of the data — watermarks
    only bound state retention and late-data admission, never add rows
    — so with a watermark that admits the whole fixture the emitted set
    equals the batch interval join and a batch SQL oracle can replay it
    exactly. Column ambiguity is the caller's concern: project both
    sides to distinct names before joining (the streaming self-join of
    one source needs two independent readStream lineages)."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {interval}"))
    )
    # keep one copy of the (equal) key so the output is unambiguous
    return lw.join(rw, cond, "inner").drop(rw[key])


def streaming_windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts per event_type with late-data watermark.

    The value sum is decimal-cast (order-independent exact addition) so
    the emitted rows are bit-deterministic across runs — with a static
    source + availableNow trigger the append-mode output is then a pure
    function of the data (windows closed by the final watermark), which
    makes this streaming pipeline ORACLE-CHECKABLE by batch SQL."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            F.col("w").start.alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(
    stream: DataFrame, key_cols: list[str], ts_col: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exact dedup (O3's semantics across micro-batches):
    keeps the first arrival per key; state is bounded by the watermark
    (dropDuplicatesWithinWatermark) so it runs forever at scale."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def streaming_first_per_key(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Deterministic streaming first-EVENT-per-key: a stateful min
    aggregation over (ts, tiebreak) structs, run in COMPLETE output mode.

    Why this exists next to ``streaming_dedup``: dropDuplicates* keeps
    whichever row REACHES the state partition first, and arrival order
    across file splits / task parallelism is not guaranteed — the
    survivor is engine-schedule-dependent. The min-(ts, tiebreak) row is
    a pure function of the data, identical under any arrival order, any
    parallelism, any micro-batch split — which is what makes this form
    oracle-checkable (batch twin: row_number over (ts, tiebreak) = 1).

    State is one struct per key (bounded by key cardinality, not event
    count); for unbounded key spaces use ``streaming_dedup`` and accept
    the arrival-order survivor."""
    firsts = F.min(F.struct(ts_col, tiebreak_col)).alias("_first")
    return (
        stream.groupBy(*key_cols)
        .agg(firsts)
        .select(
            *key_cols,
            F.col(f"_first.{ts_col}").alias(ts_col),
            F.col(f"_first.{tiebreak_col}").alias(tiebreak_col),
        )
    )


def incremental_index_ingest(
    vectors_stream: DataFrame,
    forest: RPForest,
    leaves_path: str,
    checkpoint_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    route_strategy: str = "auto",
    monitor_path: "str | None" = None,
    rebuild_fill_ratio: float = 0.5,
    retention_path: "str | None" = None,
    retention_corpus_path: "str | None" = None,
    retention_every: int = 1,
    retention_budget_frac: "float | None" = None,
    retention_check_payload: "bool | None" = None,
) -> StreamingQuery:
    """Append new vectors to the forest's leaves: each micro-batch is
    routed through the frozen hyperplanes (same predicate as queries,
    O6) and written to the leaf table partition-wise.

    ``route_strategy`` passes through to ``route_queries`` — "join"
    keeps the whole ingest JVM-side (no Arrow crossing), which the
    driver-window parity row uses to stay inside a default driver
    heap late in a 50-query session.

    ``monitor_path`` (VERDICT r11 #6) wires the maintenance TRIGGER
    into the loop the trigger was built for: after each batch's
    append, the health signals are read over the post-append leaf
    table (``needs_rebuild`` against ``forest.fresh_health`` — load
    the forest from a saved index so the baseline is present) and ONE
    slim row is appended to ``monitor_path`` as Parquet:

      (batch_id, n_rows, current_fill, fresh_fill, fill_vs_fresh,
       overgrown_leaves, needs_rebuild)

    so maintenance is scheduled by SIGNAL, not by probe script: the
    operational consumer polls the monitor table and runs
    ``resplit_overgrown_leaves`` when ``overgrown_leaves`` climbs (the
    ingest-side decay — appends only ever OVERFILL leaves, so
    ``fill_vs_fresh`` rises and the rebuild trigger correctly stays
    quiet) or rebuilds when ``needs_rebuild`` fires. Costs one
    payload-free leaf scan + one tiny write per micro-batch — opt-in;
    None (the default) keeps the append-only fast path exactly as
    before. The routed batch is counted from the slim routed triples
    (num_trees × batch rows), not the raw stream.

    The monitor reads ``leaves_path`` as the index's WHOLE leaf table
    (the persisted index's ``{path}/leaves`` dir, base + appends — the
    standard ingest layout); pointing ingest at a side table of only
    the new rows makes the appends valid but the monitor's fill
    readings meaningless, since the base leaves would be missing from
    the scan.

    ``retention_path`` (r12b) adds the ROUTING-QUALITY drift signal the
    occupancy columns structurally cannot give under ingest (appends
    RAISE fill — the trigger correctly stays quiet while hot leaves
    overflow): point it at an index dir where ``save_recall_baseline``
    has anchored a cached truth, and every ``retention_every``-th batch
    the monitor row also carries

      (retention, retention_exhausted, retention_inserted)

    — the cached ``estimate_recall`` in ``strict=False`` mode over the
    post-append index: the fraction of the ANCHOR-TIME true neighbors a
    production search still returns today. Under ingest this is
    retention, not current recall (a new arrival can be a genuinely
    closer neighbor and displace a baseline one — that displacement and
    routing decay both lower the number; re-anchor at maintenance
    points to re-baseline). ``retention_corpus_path`` must name the
    parquet dir holding the CURRENT corpus vectors (base + arrivals —
    the upstream table the stream feeds from), because the exact
    re-rank needs every candidate's payload; the columns are null on
    batches the cadence skips. Cost per read: one forest search of the
    anchored sample + two id-column joins (survivor semi-join +
    membership anti-join) — the recurring term of the cached check, no
    corpus vector scan.

    MONITOR SCHEMA IS STABLE (ADVICE r12 #3): every monitored stream
    writes the same 11 columns — the 7 occupancy columns plus
    (retention, retention_exhausted, retention_inserted,
    retention_status) — with the retention columns null when retention
    is disabled or the cadence skips a batch, so a monitor dir never
    mixes footers and a plain ``spark.read.parquet`` always resolves
    every column. A pre-existing ``monitor_path`` whose schema differs
    (e.g. a 7-column pre-r13 dir) FAILS AT STREAM START with a
    migration hint, never silently on batch N. ``retention_status`` is
    null on a clean read; ``"error: ..."`` when a retention read
    failed (the failure is CONTAINED — a monitoring signal must never
    take down production ingestion (ADVICE r12 #2): the row lands
    with null retention columns and the stream keeps appending);
    ``"deferred: time budget"`` when ``retention_budget_frac`` skipped
    a due read.

    RETENTION CADENCE SIZING (VERDICT r12 #2): one retention read
    costs roughly one cached health check — see BASELINE.md's r13
    cadence table for the measured walls at the 250k and 1M × 300-d
    points (dominated by the forest search of the anchored sample) —
    so ``retention_every=1`` on sub-minute micro-batches makes the
    read the stream's bottleneck. Size it so the read amortizes below
    a few percent of batch wall (e.g. 40 s reads on 20 s batches →
    ``retention_every=60`` ≈ 3% overhead), or set
    ``retention_budget_frac`` (e.g. ``0.05``) and the stream
    self-regulates: a due read runs only when the LAST read's wall is
    at most ``frac`` × the batch wall accumulated since that read —
    deferred rows are marked, never silently dropped, and the first
    due read always runs (no history yet).

    ``retention_check_payload`` (VERDICT r13 #7) selects the read's
    membership test: id-only, or id+content-hash. The DEFAULT (None,
    since r15) is a capability probe at stream start — hardened
    whenever the anchor carries ``corpus_ids`` (every anchor written
    since r13), id-only on pre-r13 anchors. An id-only read trusts the
    documented id-immutability contract — a stream that RECYCLES an id
    (delete then re-insert a different vector under the same id) would
    count the impostor as a surviving anchored neighbor. Hardened,
    each read anti-joins (vec_id, xxhash64(id, vec)) against the
    anchor's ``corpus_ids`` table, so a recycled or mutated row counts
    as foreign AND drops out of the certified survivors — the anchored
    neighbor it replaced reads as deleted, so retention moves instead
    of the impostor certifying under the stolen id (r14 self-review
    closed exactly that gap). Costs one corpus hash projection per read
    (persisted across the check's consumers, then freed; the anchored
    table is 16 B/row). ``True`` REQUIRES the r13 anchor layout
    (``corpus_ids`` present — refused at stream START, not on batch N);
    ``False`` opts back into the cheaper id-only read on any anchor."""

    # the frozen forest's stats never change, so decide ONCE whether the
    # index is deep (node table past the broadcast gate): only then does
    # a lazy batch count help — it lets bounded micro-batches take the
    # tree-local route instead of the per-level join-chain. On a shallow
    # index the broadcast fast path would evaluate the thunk merely for
    # partition right-sizing, costing one count job per micro-batch the
    # r8 design was explicitly free of — so pass no count there.
    deep_index = not node_table_broadcastable(forest)

    monitor_schema = (
        "batch_id long, n_rows long, current_fill double, "
        "fresh_fill double, fill_vs_fresh double, "
        "overgrown_leaves long, needs_rebuild boolean, "
        "retention double, retention_exhausted long, "
        "retention_inserted long, retention_status string"
    )
    if retention_budget_frac is not None:
        if retention_path is None:
            raise ValueError(
                "incremental_index_ingest: retention_budget_frac is set "
                "but retention_path is not — there is no retention read "
                "to budget"
            )
        if not (0.0 < float(retention_budget_frac) <= 1.0):
            raise ValueError(
                f"incremental_index_ingest: retention_budget_frac must "
                f"be in (0, 1], got {retention_budget_frac}"
            )
    if monitor_path is not None:
        # schema fail-fast (ADVICE r12 #3): a pre-existing monitor dir
        # with a different column set would otherwise mix parquet
        # footers and plain reads would resolve an arbitrary one —
        # refuse at stream start, not on batch N. An existing-but-empty
        # dir has no footers to conflict with (the schema-inference
        # error is the only read error treated as absence here).
        spark0 = forest.leaves.sparkSession
        if _hadoop_path_exists(spark0, monitor_path):
            from pyspark.errors import AnalysisException

            existing = None
            try:
                existing = spark0.read.parquet(monitor_path).schema
            except AnalysisException:
                pass
            from pyspark.sql.types import StructType

            expected = StructType.fromDDL(monitor_schema)
            if existing is not None and [
                (f.name, f.dataType) for f in existing.fields
            ] != [(f.name, f.dataType) for f in expected.fields]:
                raise ValueError(
                    f"incremental_index_ingest: monitor_path="
                    f"{monitor_path} already holds a table with schema "
                    f"{existing.simpleString()}, but monitored streams "
                    f"write the stable 11-column schema "
                    f"{expected.simpleString()} — point at a fresh dir, "
                    f"or migrate the old rows once (read with "
                    f"mergeSchema=true, select the 11 columns with "
                    f"nulls filled and these exact types, rewrite)"
                )

    retention_k = None
    if retention_path is not None:
        # fail FAST at stream start, not on batch 17: the retention read
        # needs a monitor row to land in, an anchored truth to certify
        # against, and a corpus dir for the exact re-rank payloads
        if monitor_path is None:
            raise ValueError(
                "incremental_index_ingest: retention_path requires "
                "monitor_path — the retention columns live on the "
                "monitor row"
            )
        if retention_corpus_path is None:
            raise ValueError(
                "incremental_index_ingest: retention_path requires "
                "retention_corpus_path (the parquet dir holding the "
                "current corpus vectors — base + arrivals)"
            )
        if int(retention_every) < 1:
            raise ValueError(
                f"incremental_index_ingest: retention_every must be "
                f">= 1, got {retention_every}"
            )
        try:
            meta = (
                forest.leaves.sparkSession.read
                .parquet(f"{retention_path}/recall_truth/meta")
                .collect()[0]
            )
        except Exception as exc:
            raise ValueError(
                f"incremental_index_ingest: retention_path="
                f"{retention_path} carries no anchored recall baseline "
                f"({retention_path}/recall_truth/meta unreadable) — run "
                f"save_recall_baseline there first"
            ) from exc
        retention_k = int(meta.k)
        _has_anchor_ids = _hadoop_path_exists(
            forest.leaves.sparkSession,
            f"{retention_path}/recall_truth/corpus_ids",
        )
        if retention_check_payload is None:
            # capability probe (VERDICT r14 #7): every anchor written
            # since r13 carries corpus_ids, so the hardened id+content-
            # hash membership is the DEFAULT wherever the anchor can
            # support it; only a pre-r13 anchor falls back to id-only
            # (the prior default), and only an explicit False opts the
            # cheaper check back in
            retention_check_payload = _has_anchor_ids
        elif retention_check_payload and not _has_anchor_ids:
            raise ValueError(
                f"incremental_index_ingest: retention_check_payload=True "
                f"needs the anchored corpus_ids table, but "
                f"{retention_path}/recall_truth/corpus_ids does not "
                f"exist (pre-r13 anchor) — re-anchor with "
                f"save_recall_baseline to record content hashes"
            )
    elif retention_check_payload:
        raise ValueError(
            "incremental_index_ingest: retention_check_payload is set "
            "but retention_path is not — there is no retention read to "
            "harden"
        )

    if monitor_path is not None and forest.fresh_health is None:
        # surfaced ONCE at stream start, not guessed per batch: without
        # a baseline the monitor's ratio columns are permanently inert
        # (fill_vs_fresh null, needs_rebuild always False) — a consumer
        # polling needs_rebuild would never see a firing no matter how
        # degraded the index gets. overgrown_leaves still works.
        import warnings

        warnings.warn(
            "incremental_index_ingest: monitor_path is set but the "
            "forest carries no health baseline (in-memory build or "
            "pre-r11 index) — monitor rows will have fill_vs_fresh "
            "null and needs_rebuild false FOREVER. Load the forest "
            "from a saved index (save_index persists the baseline) "
            "for a live rebuild trigger.",
            RuntimeWarning,
            stacklevel=2,
        )

    # retention-budget closure state: survives across micro-batches of
    # THIS query (foreachBatch runs driver-side); one stream = one state
    _ret_state = {"last_cost": None, "wall_accum": 0.0}

    def _route_and_append(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        as_queries = batch.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
        )
        routed = route_queries(
            forest,
            as_queries,
            route_strategy=route_strategy,
            n_queries=(lambda: as_queries.count())
            if (route_strategy == "auto" and deep_index)
            else None,
        ).select(
            "tree_id",
            F.col("leaf_path"),
            F.col("query_id").alias("vec_id"),
        )
        if monitor_path is None:
            routed.write.mode("append").partitionBy("tree_id").parquet(
                leaves_path
            )
            return
        # monitored path: cache the routed triples so the count and the
        # append share ONE routing computation, then read the health
        # signals over the POST-append leaf table and emit one slim
        # monitor row (see docstring). persist/unpersist, NOT
        # localCheckpoint: checkpoint blocks are reclaimed only after a
        # driver GC (the release_driver_blocks hazard), which
        # accumulates storage across the hundreds of micro-batches of a
        # long-running stream; unpersist releases deterministically.
        import dataclasses
        import time

        from ..operators.index import needs_rebuild

        t_batch = time.perf_counter()
        routed = routed.persist()
        try:
            n_rows = routed.count()
            routed.write.mode("append").partitionBy("tree_id").parquet(
                leaves_path
            )
        finally:
            routed.unpersist()
        spark = batch.sparkSession
        post = dataclasses.replace(
            forest, leaves=spark.read.parquet(leaves_path)
        )
        v = needs_rebuild(post, rebuild_fill_ratio)
        ret = ret_ex = ret_ins = ret_status = None
        # t_mark: where the NON-retention clock resumes for this batch —
        # re-stamped after a read (or the defer decision) so the
        # post-decision remainder (needs_rebuild already ran; the
        # monitor write below) still enters the denominator via the
        # single accumulation after the write. Without it every cadence
        # batch silently dropped its pre-read and post-read wall and the
        # budget gate over-deferred vs the documented
        # "frac x accumulated batch wall" contract (ADVICE r13)
        t_mark = t_batch
        if retention_path is not None and batch_id % retention_every == 0:
            # time-budget gate: the accumulated NON-retention batch wall
            # since the last read is the denominator the read amortizes
            # over; a read costlier than frac x that wall is deferred
            # (marked, never silent) until enough batches have run
            now = time.perf_counter()
            accum = _ret_state["wall_accum"] + (now - t_batch)
            last_cost = _ret_state["last_cost"]
            if (
                retention_budget_frac is not None
                and last_cost is not None
                and last_cost > float(retention_budget_frac) * accum
            ):
                ret_status = "deferred: time budget"
                _ret_state["wall_accum"] = accum
                t_mark = now
            else:
                from ..operators.search import estimate_recall

                t_read = time.perf_counter()
                try:
                    r = estimate_recall(
                        post,
                        spark.read.parquet(retention_corpus_path),
                        k=retention_k,
                        id_col=id_col,
                        vec_col=vec_col,
                        truth_path=retention_path,
                        strict=False,
                        check_payload=retention_check_payload,
                    )
                except Exception as exc:  # noqa: BLE001 — containment:
                    # a monitoring signal must never take down
                    # production ingestion (ADVICE r12 #2): the append
                    # already landed; record the failure on the row
                    # (all-queries-exhausted, a momentarily unreadable
                    # corpus dir, ...) and keep the stream alive.
                    # The FAILED attempt's wall is still a read cost —
                    # record it so the time budget can defer a
                    # persistently-failing expensive read instead of
                    # re-paying it every cadence batch (r13 review)
                    ret_status = f"error: {exc}"[:400]
                    _ret_state["last_cost"] = (
                        time.perf_counter() - t_read
                    )
                    _ret_state["wall_accum"] = 0.0
                else:
                    ret = float(r["recall"])
                    ret_ex = int(r["n_exhausted"])
                    ret_ins = int(r["inserted_at_least"])
                    _ret_state["last_cost"] = (
                        time.perf_counter() - t_read
                    )
                    _ret_state["wall_accum"] = 0.0
                # the read itself is the one cost EXCLUDED from the
                # denominator; everything after it counts again
                t_mark = time.perf_counter()
        row = (
            int(batch_id), int(n_rows),
            float(v["current_fill"]),
            None if v["fresh_fill"] is None else float(v["fresh_fill"]),
            None
            if v["fill_vs_fresh"] is None
            else float(v["fill_vs_fresh"]),
            int(v["overgrown_leaves"]),
            bool(v["needs_rebuild"]),
            ret, ret_ex, ret_ins, ret_status,
        )
        spark.createDataFrame(
            [row], schema=monitor_schema
        ).coalesce(1).write.mode("append").parquet(monitor_path)
        # one accumulation point for ALL paths (non-cadence, deferred,
        # post-read): the batch's full non-retention wall — including
        # the monitor write just above — enters the next read's budget
        _ret_state["wall_accum"] += time.perf_counter() - t_mark

    return (
        vectors_stream.writeStream.foreachBatch(_route_and_append)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def streaming_lsh_dedup_ingest(
    docs_stream: DataFrame,
    index_path: str,
    flags_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 16,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.2,
) -> StreamingQuery:
    """Incremental near-duplicate dedup against a PERSISTENT two-part
    LSH index — the streaming twin of the batch MinHash-LSH family (the
    pattern a continuously-ingesting training pipeline runs: new
    documents must dedup against the whole historical corpus without
    rescanning it). The index holds ``{index_path}/bands``
    (doc_id, band, band_key) for candidacy and
    ``{index_path}/shingles`` (doc_id, xxhash64 shingle array) for
    verification — the same block-then-verify contract as
    ``minhash_lsh_pairs``, never candidacy alone.

    Per micro-batch, in order:
      1. compute the batch's MinHash signatures ONCE (one md5 per
         shingle, affine permutations); derive band keys + shingle
         hashes from the checkpointed signatures;
      2. PROBE the band keys against STRICTLY-EARLIER batches of the
         bands index (an equi-join on (band, band_key) — only ids and
         16-byte keys move); candidates sharing ANY band with an
         earlier document proceed to verification;
      3. VERIFY candidates with exact shingle-set Jaccard against the
         shingles index (long-array intersect — the payload join is
         bounded by the candidate count, exactly as in the batch
         operator); flags (min verified historical id, distinct
         verified match count, best jaccard) land in ``flags_path``.
         Documents too short to shingle get an explicit clean row —
         every arrival appears in the flags output exactly once;
      4. write the batch's own band keys + shingle hashes into the
         index — becoming history for every later batch.

    IDEMPOTENT under foreachBatch's at-least-once retries: every write
    OVERWRITES a ``batch=<id>`` subdirectory (a rerun replaces its own
    partial output instead of appending duplicates), and the probe
    filters the index to ``batch < current`` (a rerun that already
    wrote its own keys cannot see them, preserving the intra-batch
    contract). Probe-before-append therefore makes the flags a pure
    function of (data, batch split); intra-batch duplicates are
    deliberately NOT flagged here — that is the batch LSH family's job
    (run it inside the batch if needed)."""
    from ..operators.dedup import minhash_band_keys, minhash_signature

    def _probe_and_append(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        sig = minhash_signature(
            batch, text_col, id_col, num_hashes, shingle_n
        ).localCheckpoint(eager=True)  # computed once: keys + shingles
        keys = minhash_band_keys(
            id_col=id_col, num_hashes=num_hashes, bands=bands, sig=sig
        )
        shh = sig.select(
            F.col(id_col),
            F.transform("shingles", lambda x: F.xxhash64(x)).alias("h"),
        )
        have_hist = _hadoop_path_exists(
            spark, f"{index_path}/bands"
        ) and _hadoop_path_exists(spark, f"{index_path}/shingles")
        # every arrival gets a flags row — including docs too short to
        # shingle (absent from sig), which are clean by definition
        doc_ids = batch.select(id_col).distinct()
        if have_hist:
            # explicit schemas: planning must not infer from footers —
            # a crashed attempt's PARTIAL batch=<id> files may be
            # corrupt, and the batch<current partition filter prunes
            # them from the scan only if no footer is read up front
            id_t = batch.schema[id_col].dataType.simpleString()
            hist_bands = spark.read.schema(
                f"{id_col} {id_t}, band int, band_key string, batch int"
            ).parquet(f"{index_path}/bands").filter(F.col("batch") < batch_id)
            hist_sh = spark.read.schema(
                f"{id_col} {id_t}, h array<long>, batch int"
            ).parquet(f"{index_path}/shingles").filter(
                F.col("batch") < batch_id
            )
            cand = (
                keys.join(
                    hist_bands.select(
                        F.col(id_col).alias("hist_doc_id"), "band", "band_key"
                    ),
                    ["band", "band_key"],
                )
                .select(id_col, "hist_doc_id")
                .dropDuplicates([id_col, "hist_doc_id"])
            )
            scored = (
                cand.join(shh, id_col)
                .join(
                    hist_sh.select(
                        F.col(id_col).alias("hist_doc_id"),
                        F.col("h").alias("hist_h"),
                    ),
                    "hist_doc_id",
                )
            )
            inter = F.size(F.array_intersect("h", "hist_h")).cast("double")
            union = (F.size("h") + F.size("hist_h")).cast("double") - inter
            hits = (
                scored.withColumn("jaccard", inter / union)
                .filter(F.col("jaccard") >= F.lit(jaccard_threshold))
                .groupBy(id_col)
                .agg(
                    F.min("hist_doc_id").alias("hist_min_match"),
                    F.countDistinct("hist_doc_id").alias("n_hist_matches"),
                    F.max("jaccard").alias("best_jaccard"),
                )
            )
            flags = doc_ids.join(hits, id_col, "left")
        else:
            # hist_min_match carries the id_col's OWN type (ADVICE r7):
            # the with-history branch types it as min(hist_doc_id), and
            # the per-batch flags dirs are read back as one dataset — a
            # hardcoded long would give a non-long id corpus mixed
            # column types across batch subdirs
            id_t = batch.schema[id_col].dataType.simpleString()
            flags = doc_ids.select(
                id_col,
                F.lit(None).cast(id_t).alias("hist_min_match"),
                F.lit(0).cast("long").alias("n_hist_matches"),
                F.lit(None).cast("double").alias("best_jaccard"),
            )
        flags = flags.select(
            id_col,
            "hist_min_match",
            F.coalesce("n_hist_matches", F.lit(0)).alias("n_hist_matches"),
            "best_jaccard",
            (F.coalesce("n_hist_matches", F.lit(0)) > 0).alias("is_near_dup"),
        )
        flags.write.mode("overwrite").parquet(f"{flags_path}/batch={batch_id}")
        keys.write.mode("overwrite").parquet(
            f"{index_path}/bands/batch={batch_id}"
        )
        shh.write.mode("overwrite").parquet(
            f"{index_path}/shingles/batch={batch_id}"
        )
        # the eager per-batch checkpoint is consumed once the index /
        # flags writes complete — drop its blocks NOW; on a long-running
        # stream they otherwise accumulate per micro-batch on executors
        # for the stream's lifetime (ADVICE r7)
        sig.unpersist()

    return (
        docs_stream.writeStream.foreachBatch(_probe_and_append)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def streaming_embedding_dedup_ingest(
    vec_stream: DataFrame,
    centroids: DataFrame,
    index_path: str,
    flags_path: str,
    checkpoint_path: str,
    threshold: float = 0.4,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> StreamingQuery:
    """Incremental embedding near-dup dedup against a persistent
    cell-bucketed index — the EMBEDDING twin of
    ``streaming_lsh_dedup_ingest`` (same probe-before-append contract,
    IVF cells instead of LSH bands): arriving vectors must near-dup
    against the whole historical corpus without an N² pair space or a
    full rescan.

    ``centroids`` (c_id, cv) is a FROZEN static frame — the same
    frozen-coordinate discipline as ``incremental_index_ingest``'s
    hyperplanes (cells stay stable as the index grows; re-centering is
    a periodic batch rebuild). Per micro-batch:
      1. probe: each arrival joins its ``nprobe`` nearest cells
         (broadcast centroids, deterministic (dist, c_id) order);
      2. candidates = historical vectors in those cells (equi-join on
         cell against the parquet index — never a cross join);
      3. exact cosine ≥ ``threshold`` flags, aggregated per arrival
         (min matching historical id, distinct match count), written
         to ``flags_path``;
      4. arrivals land in the index under their 1 nearest cell.

    IDEMPOTENT under foreachBatch's at-least-once retries: every write
    OVERWRITES a ``batch=<id>`` subdirectory and the probe filters the
    index to ``batch < current`` — a rerun replaces its own partial
    output and cannot see its own keys (same contract as
    ``streaming_lsh_dedup_ingest``).
    """
    import pyspark.sql.functions as F

    from ..functions.vector import cosine_sim
    from ..operators.ivf import _argmin_cell, _nearest_cells

    def _probe_and_append(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        pts = batch.select(F.col(id_col), F.col(vec_col)).localCheckpoint(
            eager=True
        )
        have_hist = _hadoop_path_exists(spark, index_path)
        ids = pts.select(id_col)
        if have_hist:
            # strictly-earlier batches only (a retried batch that
            # already wrote its own cell rows must not probe them);
            # explicit schema so planning never reads a crashed
            # attempt's partial footers
            id_t = batch.schema[id_col].dataType.simpleString()
            vec_t = batch.schema[vec_col].dataType.simpleString()
            hist = spark.read.schema(
                f"cell long, {id_col} {id_t}, {vec_col} {vec_t}, batch int"
            ).parquet(index_path).filter(F.col("batch") < batch_id)
            probe = _nearest_cells(
                pts, centroids, nprobe, id_col, vec_col
            ).select(F.col(id_col), F.col("c_id").alias("cell"))
            cand = (
                probe.join(
                    hist.select(
                        "cell",
                        F.col(id_col).alias("hist_id"),
                        F.col(vec_col).alias("hist_vec"),
                    ),
                    "cell",
                )
                .select(id_col, "hist_id", "hist_vec")
                .dropDuplicates([id_col, "hist_id"])
            )
            hits = (
                cand.join(pts, id_col)
                .filter(
                    cosine_sim(vec_col, "hist_vec") >= F.lit(threshold)
                )
                .groupBy(id_col)
                .agg(
                    F.min("hist_id").alias("hist_min_match"),
                    F.countDistinct("hist_id").alias("n_hist_matches"),
                )
            )
            flags = ids.join(hits, id_col, "left")
        else:
            # same typing rule as the LSH ingest: hist_min_match follows
            # the id_col's own type across every batch subdir
            id_t = batch.schema[id_col].dataType.simpleString()
            flags = ids.select(
                id_col,
                F.lit(None).cast(id_t).alias("hist_min_match"),
                F.lit(0).cast("long").alias("n_hist_matches"),
            )
        flags = flags.select(
            id_col,
            "hist_min_match",
            F.coalesce("n_hist_matches", F.lit(0)).alias("n_hist_matches"),
            (F.coalesce("n_hist_matches", F.lit(0)) > 0).alias("is_near_dup"),
        )
        # idempotent under at-least-once retries: each batch OVERWRITES
        # its own batch=<id> subdirectory instead of appending
        flags.write.mode("overwrite").parquet(f"{flags_path}/batch={batch_id}")
        own = _argmin_cell(pts, centroids, id_col, vec_col).select(
            F.col(id_col), F.col("c_id").alias("cell")
        )
        pts.join(own, id_col).select("cell", id_col, vec_col).write.mode(
            "overwrite"
        ).parquet(f"{index_path}/batch={batch_id}")
        # drop the per-batch checkpoint blocks once consumed (ADVICE r7)
        pts.unpersist()

    return (
        vec_stream.writeStream.foreachBatch(_probe_and_append)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def stateful_user_counters(stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    a per-user running event counter with explicit state — the
    arbitrary-stateful-processing escape hatch for operators Spark's
    built-in windows can't express (per-key ML state, CEP, custom
    sessionizers). State is a single long per user, carried across
    micro-batches by the state store."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _count(key, pdfs, state: GroupState):
        total = state.get[0] if state.exists else 0
        batch_rows = 0
        for pdf in pdfs:
            batch_rows += len(pdf)
        total += batch_rows
        state.update((total,))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events_total": [total],
             "n_events_batch": [batch_rows]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        _count,
        outputStructType="user_id long, n_events_total long, n_events_batch long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_sessionizer(
    stream: DataFrame, gap_minutes: int = 30, close_by_timeout: bool = False
) -> DataFrame:
    """Gap-based sessionization as a CUSTOM stateful streaming operator
    (applyInPandasWithState) — the arbitrary-stateful escape hatch shape
    (per-key state machine + explicit state schema) that built-in
    session windows can't generalize to (per-key model state, CEP,
    richer session payloads).

    Per user the state is one open session (start_us, last_us, n).
    Each micro-batch sorts its rows by (ts, event_id), folds them into
    the state VECTORIZED (gap flags = diff > gap, session ids = cumsum,
    per-id min/max/count — the per-row Python loop this replaces was a
    real throughput ceiling: at pipeline scale the state function runs
    once per key per batch over arbitrarily long event runs), and EMITS
    every session the batch closes (gap > gap_minutes).

    Two production modes for the still-open session:

    - ``close_by_timeout=False`` (default): emit an open-session
      SNAPSHOT flagged ``is_open`` each batch while keeping it in
      state. Runs in ``update`` output mode — a later batch may extend
      the session and re-emit it (legal in update, forbidden in
      append). Under a single availableNow batch (how the registry
      runs it — one coalesced source file ⇒ one micro-batch) each
      session is emitted exactly once and the emitted set is a pure
      function of the data, which is what the batch gaps-and-islands
      oracle replays; a multi-batch sink must keep the latest row per
      (user_id, session_start).
    - ``close_by_timeout=True``: emit ONLY closed sessions (every row
      final ⇒ append-mode-safe for any sink), and close idle open
      sessions via EVENT-TIME TIMEOUT — when the watermark passes
      last_event + gap the state times out, the session emits closed,
      and state is removed (bounded state under unbounded keys). The
      caller must put ``withWatermark`` on the stream; every batch
      with rows re-arms the timer at the new session end + gap.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def _epoch_us(series: "pd.Series") -> "pd.Series":
        vals = series.astype("int64")
        if str(series.dtype).endswith("[ns]"):
            vals = vals // 1000
        return vals

    def _sessions(key, pdfs, state: GroupState):
        import numpy as np

        out_start: list[int] = []
        out_end: list[int] = []
        out_n: list[int] = []
        out_open: list[bool] = []
        if close_by_timeout and state.hasTimedOut:
            # watermark passed last_event + gap: the open session is
            # final — emit it closed and drop the state
            st_start, st_last, st_n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": pd.to_datetime([st_start], unit="us"),
                    "session_end": pd.to_datetime([st_last], unit="us"),
                    "n_events": [st_n],
                    "is_open": [False],
                }
            )
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch.assign(_us=_epoch_us(batch["ts"])).sort_values(
                ["_us", "event_id"], kind="mergesort"
            )
            us = batch["_us"].to_numpy(dtype=np.int64)
            if state.exists:
                # prepend the carried open session as a synthetic run:
                # its last_us decides whether the first batch row
                # extends it or closes it, its (start, n) seed the fold
                st_start, st_last, st_n = state.get
            else:
                st_start, st_last, st_n = None, None, 0
            # gap reference = RUNNING MAX of everything seen before the
            # row (the stored last event and all earlier batch rows):
            # with a carried last_us AFTER a late batch row, the plain
            # previous-element reference would inflate the next row's
            # gap and spuriously split the session the late row joined.
            # The batch itself is sorted, so only st_last can exceed a
            # later element.
            prev = (
                np.maximum.accumulate(np.concatenate(([st_last], us)))[:-1]
                if st_last is not None
                else np.concatenate(([us[0]], us[:-1]))
            )
            new_sess = (us - prev) > gap_us
            if st_last is None:
                new_sess[0] = True
            sid = np.cumsum(new_sess)  # 0 = continuation of carried state
            # per-session aggregates in one pass each (no Python loop)
            ids, first_idx, counts = np.unique(
                sid, return_index=True, return_counts=True
            )
            # sorted order ⇒ session start = first element, end = last
            last_idx = first_idx + counts - 1
            starts = us[first_idx].astype(object)
            ends = us[last_idx]
            ns = counts.astype(object)
            if st_last is not None and ids[0] == 0:
                # carried session extended by this batch's leading run.
                # CLAMP both ends against the stored state: late
                # (out-of-order) rows are admitted into the open
                # session — the state store does not drop them, only
                # timeouts follow the watermark — and must never
                # REGRESS session_end below the stored last event (or
                # the re-armed timeout deadline with it) nor leave
                # session_start above an earlier late row. Lateness
                # beyond this (a late row that should MERGE two
                # already-split sessions) is out of scope — bound it
                # with the stream's watermark.
                starts[0] = min(st_start, int(us[first_idx[0]]))
                ends[0] = max(st_last, int(ends[0]))
                ns[0] = st_n + counts[0]
            elif st_last is not None:
                # carried session closed untouched by any batch row
                out_start.append(st_start)
                out_end.append(st_last)
                out_n.append(st_n)
                out_open.append(False)
            for i in range(len(ids) - 1):
                out_start.append(int(starts[i]))
                out_end.append(int(ends[i]))
                out_n.append(int(ns[i]))
                out_open.append(False)
            state.update((int(starts[-1]), int(ends[-1]), int(ns[-1])))
            if close_by_timeout:
                # append mode: the open session is NOT emitted — it
                # closes (and emits) when the watermark passes its
                # gap deadline. Re-arm the timer past the current
                # watermark (Spark rejects a stale timestamp when this
                # batch's rows are already older than the watermark).
                deadline_ms = (int(ends[-1]) + gap_us) // 1000
                state.setTimeoutTimestamp(
                    max(deadline_ms, state.getCurrentWatermarkMs() + 1)
                )
            else:
                # open-session snapshot: emitted for visibility
                # (update-mode semantics), kept in state so a later
                # batch can extend it
                out_start.append(int(starts[-1]))
                out_end.append(int(ends[-1]))
                out_n.append(int(ns[-1]))
                out_open.append(True)
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out_n),
                "session_start": pd.to_datetime(out_start, unit="us"),
                "session_end": pd.to_datetime(out_end, unit="us"),
                "n_events": out_n,
                "is_open": out_open,
            }
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        _sessions,
        outputStructType=(
            "user_id long, session_start timestamp, session_end timestamp, "
            "n_events long, is_open boolean"
        ),
        stateStructType="start_us long, last_us long, n long",
        outputMode="append" if close_by_timeout else "update",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if close_by_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )
