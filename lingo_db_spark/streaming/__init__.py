"""Structured Streaming extensions (beyond reference parity — lingo-db is
batch-only, SURVEY.md §1.1/§2.7; these are the streaming variants the
pipeline operators need).

Batch/stream symmetry: the transformations are written against plain
DataFrames, so the same logic runs over spark.read (batch) and
spark.readStream (incremental).  Tests and the registered query drive the
stream with trigger(availableNow=True) — processes all available input
then stops, giving deterministic, oracle-comparable results.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import types as T

from lingo_db_spark.catalog import TABLE_SCHEMAS
from lingo_db_spark.functions import dsum


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (declared schema — streaming
    sources never infer).  events.ts has shipped both as TIMESTAMP(NANOS)
    (read as raw nanos, converted exactly) and TIMESTAMP(MICROS) (direct);
    probe the batch footer once to pick the right declared schema.
    Watermarks require a timezone-aware event-time column (session TZ is
    pinned UTC)."""
    import os
    from lingo_db_spark.catalog import table_path
    raw_read = spark.read.parquet(table_path(sf_dir, "events"))
    nanos = dict(raw_read.dtypes)["ts"] == "bigint"
    raw = T.StructType([
        T.StructField(
            f.name,
            (T.LongType() if nanos else T.TimestampNTZType())
            if f.name == "ts" else f.dataType,
            f.nullable)
        for f in TABLE_SCHEMAS["events"].fields])
    path = table_path(sf_dir, "events")
    if os.path.isdir(path):
        # multi-file layout (scaled copies, real ingest): stream the
        # table directory itself
        df = spark.readStream.schema(raw).parquet(path)
    else:
        # driver layout: one file per table directly in sf_dir — glob
        # just that file
        df = (spark.readStream
              .schema(raw)
              .option("pathGlobFilter", os.path.basename(path))
              .parquet(sf_dir))
    if nanos:
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_event_counts(events: DataFrame,
                          window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts + value sums per event type.  On a stream
    the watermark bounds state: windows older than (max event time -
    watermark) are finalized and dropped — the knob that keeps state
    finite on an unbounded 100TB/day stream."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (src.groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 dsum("value").alias("total_value"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n_events", "total_value"))


def sessionize_stateful(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState: per
    user, count sessions (a session ends after a gap > gap_minutes) and
    events, carrying (n_sessions, n_events, last_ts) as explicit group
    state across micro-batches.  This is the arbitrary-state surface that
    session_window/windowed aggs can't express (e.g. state that mixes
    counters with the last-seen timestamp).

    State is O(1) per user — the 100TB/day posture: the stream never
    retains raw events, only the 3-number state per key.  Emits the
    current per-user totals each batch (update mode); with a bounded
    availableNow run the final batch's rows are the complete answer."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_s = float(gap_minutes) * 60.0

    def fn(key, pdfs, state: GroupState):
        ns, ne, last = state.get if state.exists else (0, 0, None)
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for t in pdf["ts"]:
                tt = t.timestamp()
                if last is None or tt - last > gap_s:
                    ns += 1
                ne += 1
                last = tt
        state.update((ns, ne, float(last) if last is not None else None))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [ns], "n_events": [ne]})

    return (events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id BIGINT, n_sessions BIGINT, n_events BIGINT",
        stateStructType="n_sessions BIGINT, n_events BIGINT, last_ts DOUBLE",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout))


def stream_interval_join(events: DataFrame, *,
                         left_type: str = "purchase",
                         right_type: str = "click",
                         lookback_minutes: int = 30,
                         watermark: str = "2 hours",
                         how: str = "inner") -> DataFrame:
    """Stream-stream interval join: for each LEFT event, every RIGHT event
    by the same user within the preceding lookback window.  The join-time
    constraint (r.ts in [l.ts - lookback, l.ts]) plus the watermarks is
    what lets Structured Streaming BOUND the join state: each side only
    buffers rows younger than watermark + lookback — without the interval
    condition a stream-stream join must retain both sides forever, which
    no 100TB/day stream survives.  Works identically on a batch frame
    (plain join, no state).

    how='left_outer' additionally emits null-padded rows for LEFT events
    with no matching right — but only once the left row's state expires.
    The exact end-of-stream cut (r14 diagnosis): the global watermark is
    the MIN over the two per-side watermark nodes, each observing only
    its own FILTERED side's max event time at millisecond precision
    (declaring the watermark before the filters does not help — Catalyst
    pushes the event-type filters back below the watermark nodes), and
    because matching rights satisfy r_ts <= l_ts a left row is retained
    until the watermark passes l_ts itself (no lookback adjustment).  So
    unmatched lefts with l_ts >= floor_ms(least(max left-side ts,
    max right-side ts)) - watermark_delay are NEVER emitted; the oracle
    for streaming_outer_interval_join pins exactly that closed form
    (verified against the observed emission counts at two SFs)."""
    lb = f"INTERVAL {int(lookback_minutes)} MINUTES"
    left = events.filter(F.col("event_type") == left_type)
    right = events.filter(F.col("event_type") == right_type)
    if events.isStreaming:
        left = left.withWatermark("ts", watermark)
        right = right.withWatermark("ts", watermark)
    l = left.select(F.col("event_id").alias("left_id"),
                    F.col("user_id").alias("l_user"),
                    F.col("ts").alias("l_ts"))
    r = right.select(F.col("event_id").alias("right_id"),
                     F.col("user_id").alias("r_user"),
                     F.col("ts").alias("r_ts"))
    return (l.join(r, (F.col("l_user") == F.col("r_user"))
                   & (F.col("r_ts") >= F.col("l_ts") - F.expr(lb))
                   & (F.col("r_ts") <= F.col("l_ts")), how)
            .select("left_id", "right_id"))


def stream_dedup(events: DataFrame, key_cols: tuple[str, ...],
                 watermark: str = "2 hours") -> DataFrame:
    """Streaming deduplication — the idempotent-ingestion operator an
    at-least-once pipeline puts in front of every sink: emit each key the
    first time it is seen, drop re-deliveries.  The watermark bounds the
    dedup state (keys older than max-event-time - watermark are evicted),
    which is what keeps state finite on an unbounded stream; within the
    watermark horizon the output equals batch SELECT DISTINCT over the
    keys.  Works identically on a batch DataFrame (plain distinct)."""
    if events.isStreaming:
        return (events.withWatermark("ts", watermark)
                .select("ts", *key_cols)
                .dropDuplicatesWithinWatermark(list(key_cols))
                .select(*key_cols))
    return events.select(*key_cols).dropDuplicates()


def run_stream_to_memory(sdf: DataFrame, output_mode: str = "complete",
                         name: str | None = None) -> DataFrame:
    """Execute a streaming DataFrame to completion (availableNow) into an
    in-memory sink; returns the result as a batch DataFrame."""
    name = name or f"stream_{uuid.uuid4().hex[:8]}"
    q = (sdf.writeStream.format("memory").queryName(name)
         .outputMode(output_mode).trigger(availableNow=True).start())
    q.awaitTermination()
    return sdf.sparkSession.table(name)


def run_stream_to_parquet(sdf: DataFrame, path: str, checkpoint: str) -> None:
    """Execute a streaming DataFrame (availableNow) into a parquet file
    sink with a checkpoint — the production sink shape.  The checkpoint's
    offset log + the sink's transaction log (_spark_metadata) give
    EXACTLY-ONCE file output: re-running over an unchanged source is a
    no-op, a crash mid-batch replays without duplicating committed
    files."""
    q = (sdf.writeStream.format("parquet")
         .option("path", path)
         .option("checkpointLocation", checkpoint)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()


def topk_stateful(events: DataFrame, k: int = 5) -> DataFrame:
    """Custom stateful streaming operator: RUNNING TOP-K by value per
    event_type, via applyInPandasWithState.  The group state is the
    current top-k (value, event_id) list — O(k) per key, never the raw
    stream: each micro-batch folds its rows into the k-element state and
    emits the refreshed ranking (update mode).  The streaming form of
    the bounded-heap top-k the batch engine plans as
    TakeOrderedAndProject (reference subop.create_heap,
    RelAlgToSubOp.cpp:1690-1737), here maintained incrementally forever.
    Ties break on lower event_id for cross-run determinism."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        # state rows are (value, event_id) tuples encoded as two arrays
        vals, ids = (list(state.get[0]), list(state.get[1])) \
            if state.exists else ([], [])
        cur = list(zip(vals, ids))
        for pdf in pdfs:
            cur.extend(zip(pdf["value"].astype(float),
                           pdf["event_id"].astype("int64")))
            cur.sort(key=lambda t: (-t[0], t[1]))
            del cur[k:]
        state.update(([float(v) for v, _ in cur],
                      [int(i) for _, i in cur]))
        yield pd.DataFrame({
            "event_type": [key[0]] * len(cur),
            "rank": list(range(1, len(cur) + 1)),
            "event_id": [i for _, i in cur],
            "value": [v for v, _ in cur],
        })

    return (events.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=("event_type STRING, rank BIGINT, "
                          "event_id BIGINT, value DOUBLE"),
        stateStructType="vals ARRAY<DOUBLE>, ids ARRAY<BIGINT>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout))
