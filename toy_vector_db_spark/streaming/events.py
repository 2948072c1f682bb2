"""Structured Streaming over the events stream.

Beyond-parity: the reference has NO streaming surface (SURVEY §2.10).
This module gives the events table a streaming twin of the batch
operators, plus a custom stateful operator:

- hourly_rollup_stream: windowed aggregate + watermark (late data
  tolerated up to the watermark; same bucketing as the batch
  events_hourly_rollup workload query)
- dedup_stream: exactly-once-per-event-id within the watermark
- sessionize_stream: custom stateful sessionization via
  applyInPandasWithState (per-user inactivity-gap sessions, the
  streaming twin of operators/sessions.py)

All sources/sinks are pluggable; tests drive a file source micro-batch
by micro-batch into a memory sink. On a cluster the same plans run
against Kafka with checkpointing — nothing here is local-mode-specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_DDL = ("event_id LONG, ts TIMESTAMP, user_id LONG, "
              "event_type STRING, value DOUBLE, props STRING")


def read_event_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int | None = 1) -> DataFrame:
    """File-source stream over parquet event files (schema fixed:
    streaming sources cannot infer). cap: max_files_per_trigger=1 is
    the test default (forces multi-batch paths); deployments size it
    to their micro-batch SLA, None drains everything in one batch.

    The physical ``ts`` encoding varies by writer — TIMESTAMP_NTZ
    (micros, the driver testdata), TIMESTAMP (tz-adjusted, our own
    fixtures), or nanos read back as LONG under
    ``spark.sql.legacy.parquet.nanosAsLong``. A one-off batch footer
    peek (metadata only, no data scan) picks the matching streaming
    schema, and ``ts`` is normalized to TIMESTAMP exactly like the
    batch reader (workload._t) — session tz is UTC in tests/bench, so
    the NTZ cast is lossless.

    If the path is empty or doesn't exist yet (files arriving later —
    a normal streaming setup), the peek falls back to the plain
    TIMESTAMP schema. The ``nanosAsLong`` legacy conf is scoped to the
    peek and restored afterwards, not leaked into the session."""
    prev_nanos = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        ts_type = dict(spark.read.parquet(path).dtypes).get("ts", "timestamp")
    except Exception:  # empty dir / no files yet: sniff nothing, assume spec
        ts_type = "timestamp"
    finally:
        if prev_nanos is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev_nanos)
    if ts_type == "bigint":
        # the stream scan itself also decodes nanos under this conf, so
        # for this (our-own-fixture) encoding it must stay set for the
        # stream's lifetime — the restore above only covers the common
        # TIMESTAMP/NTZ paths where the legacy flag is irrelevant
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        ts_ddl, fix = "ts LONG", F.expr("timestamp_micros(ts div 1000)")
    elif ts_type == "timestamp_ntz":
        ts_ddl, fix = "ts TIMESTAMP_NTZ", F.col("ts").cast("timestamp")
    else:
        ts_ddl, fix = "ts TIMESTAMP", None
    schema = EVENTS_DDL.replace("ts TIMESTAMP", ts_ddl, 1)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    return df.withColumn("ts", fix) if fix is not None else df


def hourly_rollup_stream(events: DataFrame,
                         watermark: str = "2 hours") -> DataFrame:
    """Per-hour, per-type counts/sums with late-data watermark —
    streaming twin of workload.events_hourly_rollup."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.unix_timestamp("win.start").alias("bucket_epoch"),
                    "event_type", "n_events", "sum_value"))


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Drop replayed event_ids arriving within the watermark window."""
    return events.withWatermark("ts", watermark) \
        .dropDuplicatesWithinWatermark(["event_id"])


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful operator: per-user session counting with
    inactivity-gap semantics, state = (last event time, session count).

    Emits (user_id, n_sessions, n_events) updates per micro-batch.
    Within a batch events are sorted by event time; across batches
    arrival order stands in for event order (the usual streaming
    sessionization approximation — exact ordering would need the
    watermark-delayed session window operator)."""
    import pandas as pd

    gap_us = gap_minutes * 60 * 1_000_000

    def update(key, pdfs, state: GroupState):
        if state.exists:
            last_us, n_sessions, n_events = state.get
        else:
            last_us, n_sessions, n_events = None, 0, 0
        for pdf in pdfs:
            for ts in pdf.sort_values("ts")["ts"]:
                t_us = int(pd.Timestamp(ts).value // 1_000)
                if last_us is None or t_us - last_us > gap_us:
                    n_sessions += 1
                last_us = t_us
                n_events += 1
        state.update((last_us, n_sessions, n_events))
        yield pd.DataFrame({"user_id": [key[0]], "n_sessions": [n_sessions],
                            "n_events": [n_events]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id LONG, n_sessions LONG, n_events LONG",
        stateStructType="last_us LONG, n_sessions LONG, n_events LONG",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)


def sessionize_stream_windows(events: DataFrame, gap_minutes: int = 30,
                              watermark: str | None = None) -> DataFrame:
    """Exact event-time sessionization via ``F.session_window`` — the
    engine-native stateful session operator. Unlike ``sessionize_stream``
    (arrival-order approximation across micro-batches), session windows
    merge on EVENT time, so out-of-order arrival within the watermark
    yields exactly the batch answer (operators/sessions.with_session_ids
    aggregated per session) — value-parity-gated in
    tests/test_streaming.py::test_session_window_stream_matches_batch.

    Emits one row per (user, session): start, end (= last event + gap),
    n_events. ``watermark=None`` (complete-mode drains, tests) keeps all
    session state; production append-mode sinks pass e.g. "2 hours" so
    closed sessions finalize and state is evicted.

    Boundary note: an event exactly ``gap_minutes`` after its
    predecessor starts a NEW session here (window [ts, ts+gap) is
    half-open) but extends the session in the batch operator (strict
    ``>`` on the gap) — divergence measurable only at exact-microsecond
    gap spacing."""
    gap = f"{gap_minutes} minutes"
    src = events.withWatermark("ts", watermark) if watermark else events
    return (src.groupBy("user_id", F.session_window("ts", gap).alias("win"))
            .agg(F.count("*").alias("n_events"))
            .select("user_id",
                    F.col("win.start").alias("session_start"),
                    F.col("win.end").alias("session_end"),
                    "n_events"))


def followup_pairs_stream(lhs: DataFrame, rhs: DataFrame,
                          gap_minutes: int = 30,
                          watermark: str = "2 hours") -> DataFrame:
    """Stream-STREAM interval self-join: for each event, the same
    user's follow-up events within ``gap_minutes`` — funnel /
    session-stitching analytics on two live feeds. The third and
    hardest Structured Streaming join family (stream-static and
    windowed aggregation are covered elsewhere): BOTH sides carry
    watermarks and the join condition bounds the event-time range, so
    Spark's state store retains each side only ``watermark`` deep —
    bounded state on unbounded streams. Emits (user_id, a_id, b_id,
    a_ts) in append mode as matches finalize."""
    a = lhs.withWatermark("ts", watermark).select(
        "user_id", F.col("event_id").alias("a_id"),
        F.col("ts").alias("a_ts"))
    b = rhs.withWatermark("ts", watermark).select(
        F.col("user_id").alias("__user_b"),
        F.col("event_id").alias("b_id"), F.col("ts").alias("b_ts"))
    cond = ((a["user_id"] == b["__user_b"])
            & (b["b_ts"] > a["a_ts"])
            & (b["b_ts"] <= a["a_ts"]
               + F.expr(f"INTERVAL {gap_minutes} MINUTES")))
    return a.join(b, cond).select("user_id", "a_id", "b_id")


def run_to_memory(df: DataFrame, name: str, output_mode: str = "complete"):
    """Drive a streaming frame into an in-memory table (tests/demos);
    returns the StreamingQuery — caller awaits processAllAvailable()."""
    return (df.writeStream.format("memory").queryName(name)
            .outputMode(output_mode).start())


def run_available_now(df: DataFrame, name: str,
                      output_mode: str = "complete") -> None:
    """Process everything currently in the source as a bounded stream
    (Trigger.AvailableNow), land it in the in-memory table ``name``,
    and return when the stream has drained. The batch-parity harness:
    with all input in the initial batch and complete output, a windowed
    aggregation must equal its batch twin exactly — which is how the
    workload query events_rollup_streaming shares the batch oracle."""
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode(output_mode).trigger(availableNow=True).start())
    q.awaitTermination()


def run_available_now_to_parquet(df: DataFrame, out_dir: str,
                                 checkpoint_dir: str) -> None:
    """Drain the source (Trigger.AvailableNow) into a parquet file sink
    with exactly-once checkpointing, returning when complete. Unlike
    the memory sink (whole result materialized in the DRIVER — fine for
    bounded aggregates, a scale-killer for table-sized output), the
    file sink writes executor-side and the result is read back as an
    ordinary distributed parquet scan."""
    q = (df.writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
