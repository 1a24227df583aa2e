"""Structured Streaming layer ([ext] — SURVEY.md §2.8).

The reference has no streaming (its docx lists it as roadmap); the
engine adds a thin streaming-capable layer running the same window
shapes as queries_events.py through readStream → writeStream:

- file source over the events parquet (stands in for Kafka),
- watermark for late data,
- tumbling-window aggregation,
- session windows,
- applyInPandasWithState custom stateful operator.

Each job drives a memory-sink query to completion synchronously
(processAllAvailable) and returns the result as a DataFrame — so the
driver's rows-only check can execute it like any batch query. At scale
the same code runs continuously with a real source/sink; only the
reader/writer configs change.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.catalog import table_path

# Session gap, defined ONCE (ADVICE r5): the streaming job builds the
# duration string from it and the oracle SQL in queries_multimodal
# builds its microsecond bound from it, so the two cannot silently
# diverge.
SESSION_GAP_MINUTES = 30
SESSION_GAP = f"{SESSION_GAP_MINUTES} minutes"
SESSION_GAP_US = SESSION_GAP_MINUTES * 60 * 1_000_000


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table. Schema comes from a
    batch read (streams cannot infer); the nanos→µs ts conversion
    mirrors the catalog's."""
    raw_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    # The file stream source requires a DIRECTORY path. Single-file
    # layout (current testdata): stream sf_dir with a glob selecting
    # just the events file. Directory layout (if a future generation
    # writes events.parquet/ of parts): stream that directory itself —
    # the glob would silently match ZERO files in that layout.
    import os

    p = table_path(sf_dir, "events")
    if os.path.isdir(p):
        stream = spark.readStream.schema(raw_schema).parquet(p)
    else:
        stream = (
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    if isinstance(raw_schema["ts"].dataType, T.LongType):
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif isinstance(raw_schema["ts"].dataType, T.TimestampNTZType):
        # µs-NTZ testdata generation: watermarks need LTZ; the session
        # timezone is pinned UTC so the cast is value-preserving.
        stream = stream.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return stream


def _run_to_memory(result: DataFrame, name: str, output_mode: str) -> None:
    """Drive the streaming query to completion into a memory sink.

    r17 (guide §2.2/§5): stateful streaming operators allocate one
    state-store instance (directory, commit files, task) per shuffle
    partition, and every tier here folds a DIMENSION-bounded state
    (event types × windows/buckets — thousands of keys at most), so
    running them at the batch engine's shuffle width paid 32 state
    stores' worth of per-batch commit overhead for tiny state: the
    PSI tier measured 3.9 s at 32 partitions vs 1.8 s at 4. The
    state width is its own knob (``spark.graft.streaming.statePartitions``
    conf or ``$SPARK_GRAFT_STREAM_PARTITIONS``, default 8 — sized to
    the state's key cardinality, NOT the input's core count; raise it
    in production when per-key state across 8 partitions no longer
    fits an executor). The batch shuffle width is restored after the
    stream stops, so only the streaming query plans at the narrower
    width; results are partitioning-independent aggregates either
    way."""
    import os

    spark = result.sparkSession
    old = spark.conf.get("spark.sql.shuffle.partitions")
    n_state = spark.conf.get(
        "spark.graft.streaming.statePartitions",
        os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "8"),
    )
    try:
        spark.conf.set("spark.sql.shuffle.partitions", n_state)
        q = (
            result.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window counts (1 h windows, 10 min
    watermark) — the streaming twin of events_tumbling_window."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "total_value",
        )
    )
    _run_to_memory(agg, "stream_tumbling", "complete")
    return spark.table("stream_tumbling")


def streaming_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked hourly OHLC bars per event type — the streaming twin
    of events_ohlc_bars. Open/close are min_by/max_by over the
    (event-time, event_id) struct, which ARE streaming-capable
    aggregates (unlike the window-rank formulation the batch query
    uses), so the whole bar is one watermarked aggregation; complete
    mode over the bounded source equals the batch result."""
    key = F.struct("ts", "event_id")
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.round(F.min_by("value", key), 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.max_by("value", key), 2).alias("close"),
            F.count("*").cast("bigint").alias("n_events"),
        )
        .select(
            "event_type",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "bar_start"
            ),
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )
    _run_to_memory(agg, "stream_ohlc", "complete")
    return spark.table("stream_ohlc")


# Burst threshold, defined ONCE (the SESSION_GAP rule): the batch
# trailing-frame audit (queries_events.events_rate_limit_audit) and
# the streaming sliding-window job below flag the same per-user rate.
RATE_LIMIT_THRESHOLD = 2
RATE_WINDOW = "1 hour"
RATE_SLIDE = "30 minutes"


def streaming_rate_limit_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked SLIDING-window rate audit: per-user event counts
    over 1-hour windows sliding every 30 minutes, emitting windows at
    or above the burst threshold — the streaming twin of
    events_rate_limit_audit (ROADMAP r8 #2). The batch audit's exact
    trailing RANGE frame is not streaming-expressible; the sliding
    bucket approximation is (every burst within one hour lands fully
    inside at least one sliding window), and with BUCKETED semantics
    chosen the job carries a full oracle: each event belongs to
    exactly two epoch-aligned 30-min-slide windows, so complete mode
    over the bounded source equals the batch unnest-regroup."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", RATE_WINDOW, RATE_SLIDE).alias("w"), "user_id")
        .agg(F.count("*").cast("bigint").alias("n_in_window"))
        .where(F.col("n_in_window") >= RATE_LIMIT_THRESHOLD)
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "user_id",
            "n_in_window",
        )
    )
    _run_to_memory(agg, "stream_rate_limit", "complete")
    return spark.table("stream_rate_limit")


def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked session windows (30 min gap) per user — streaming
    twin of events_session_window."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
        )
    )
    _run_to_memory(agg, "stream_sessions", "complete")
    return spark.table("stream_sessions")


_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)
_STATEFUL_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)


def _user_stats_fn(key, pdfs: Iterator[pd.DataFrame], state):
    """Custom stateful operator: running per-user count/sum/max kept in
    GroupState across micro-batches."""
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    # raw double out — rounding happens engine-side (F.round) after the
    # stateful op: Python round() is banker's on the binary value and
    # diverges from Spark/DuckDB at exact decimal halves
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "max_value": [mx],
        }
    )


def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once dedup: the events stream unioned with
    itself (every record arrives twice — the at-least-once delivery
    regime) is deduplicated on event_id with a watermark bounding the
    dedup state, then counted per event type. The result equals the
    batch per-type counts of the original stream, so this streaming
    job is fully ORACLE-checked, not just rows-only. State is
    O(events within watermark), the scale-safe configuration for
    at-least-once sources."""
    doubled = _events_stream(spark, sf_dir).union(_events_stream(spark, sf_dir))
    deduped = (
        doubled.withWatermark("ts", "10 minutes")
        .dropDuplicates(["event_id"])
        .select("event_id", "event_type")
    )
    _run_to_memory(deduped, "stream_dedup_events", "append")
    return (
        spark.table("stream_dedup_events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n_unique_events"))
    )


def streaming_click_purchase_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-stream INNER interval join: purchases joined to the
    same user's clicks within [click_ts, click_ts + 30 min]. Both
    sides are watermarked and the join condition is time-bounded, so
    each side's buffered state is evicted once the watermark passes —
    the only configuration whose state stays O(interval), not
    O(stream). Inner-join matches emit eagerly per micro-batch, so
    the availableNow run's output equals the batch interval join
    exactly (full DuckDB oracle, not rows-only)."""
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "10 minutes")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            """
            user_id = p_user AND
            p_ts >= c_ts AND
            p_ts <= c_ts + INTERVAL 30 MINUTES
            """
        ),
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        F.expr("(unix_micros(p_ts) - unix_micros(c_ts)) div 1000000")
        .cast("bigint")
        .alias("gap_seconds"),
    )
    _run_to_memory(joined, "stream_click_purchase", "append")
    return spark.table("stream_click_purchase")


def streaming_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState: arbitrary per-key state (running
    count/sum/max per user) — the custom-stateful-operator surface.
    Arrow-batched; state is a compact 3-field tuple per user, so state
    size is O(users), not O(events)."""
    result = (
        _events_stream(spark, sf_dir)
        .groupBy("user_id")
        .applyInPandasWithState(
            _user_stats_fn,
            outputStructType=_STATEFUL_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )
    _run_to_memory(result, "stream_user_stats", "update")
    return spark.table("stream_user_stats").select(
        "user_id",
        "n_events",
        F.round("total_value", 2).alias("total_value"),
        "max_value",
    )


class _UserActivityProcessor:
    """StatefulProcessor for transformWithStateInPandas (Spark 4.1
    arbitrary-state API, successor to applyInPandasWithState): per-user
    running profile held in two typed state variables — a ValueState
    (event count + max event time) and a MapState (per-event-type
    counts). State is O(users × event types); the RocksDB state store
    the operator requires spills it off-heap, which is what makes the
    100 TB keyspace story work on real clusters."""

    def init(self, handle) -> None:
        self._agg = handle.getValueState("agg", "n BIGINT, mx BIGINT")
        self._types = handle.getMapState("types", "t STRING", "c BIGINT")

    def handleInputRows(self, key, rows, timerValues):
        n, mx = (self._agg.get() or (0, None)) if self._agg.exists() else (0, None)
        batch_types: dict[str, int] = {}
        for pdf in rows:
            n += len(pdf)
            m = int(pdf["ts_us"].max())
            mx = m if mx is None else max(mx, m)
            for t, c in pdf["event_type"].value_counts().items():
                batch_types[t] = batch_types.get(t, 0) + int(c)
        for t, c in batch_types.items():
            prev = (
                self._types.getValue((t,))[0]
                if self._types.containsKey((t,))
                else 0
            )
            self._types.updateValue((t,), (prev + c,))
        self._agg.update((n, mx))
        n_types = sum(1 for _ in self._types.keys())
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_event_types": [n_types],
                "n_events": [n],
                "max_ts_us": [mx],
            }
        )

    def close(self) -> None:
        pass


_TWS_OUT_SCHEMA = (
    "user_id BIGINT, n_event_types BIGINT, n_events BIGINT, max_ts_us BIGINT"
)
_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _run_with_rocksdb(spark: SparkSession, result: DataFrame, name: str) -> None:
    """Drive an update-mode transformWithState sink under the RocksDB
    state-store provider, restoring the prior provider setting
    afterwards. Shared by every TWS tier (user-activity, KMV, CUSUM,
    PSI) — the set/try/finally/restore dance was previously
    copy-pasted per tier (r9 review)."""
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, _ROCKSDB_PROVIDER)
    try:
        _run_to_memory(result, name, "update")
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)


def _tws_protocol_available() -> bool:
    """transformWithState's Python state server speaks protobuf
    (pyspark.sql.streaming.proto.StateMessage_pb2); without the
    ``protobuf`` package the driver worker crashes at init. Gate on
    the import so environments without it take the
    applyInPandasWithState fallback with identical semantics."""
    import importlib.util

    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # no 'google' namespace package at all
        return False


def _user_activity_fallback_fn(key, pdfs: Iterator[pd.DataFrame], state):
    """applyInPandasWithState twin of _UserActivityProcessor: same
    per-user profile, state as one (n, mx, distinct-types array) row."""
    n, mx, types = (
        state.get if state.exists else (0, None, [])
    )
    seen = set(types)
    for pdf in pdfs:
        n += len(pdf)
        m = int(pdf["ts_us"].max())
        mx = m if mx is None else max(mx, m)
        seen.update(pdf["event_type"].unique().tolist())
    state.update((n, mx, sorted(seen)))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_event_types": [len(seen)],
            "n_events": [n],
            "max_ts_us": [mx],
        }
    )


def streaming_user_activity_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transformWithStateInPandas job: per-user distinct-event-type
    count, total events, and last event time. Counts and max over
    integers — exact across engines, so unlike the float-summing
    applyInPandasWithState twin this one carries a full DuckDB oracle.

    Where the TWS protobuf protocol isn't available (this container
    ships no ``protobuf``), the job runs the same semantics through
    applyInPandasWithState — output and oracle identical; only the
    state layout differs (typed ValueState+MapState vs one struct)."""
    result, tws = user_activity_transform(spark, sf_dir)
    if tws:
        _run_with_rocksdb(spark, result, "stream_user_activity_tws")
    else:
        _run_to_memory(result, "stream_user_activity_tws", "update")
    return spark.table("stream_user_activity_tws")


def user_activity_transform(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, bool]:
    """(unstarted transformed stream, uses_tws) — the per-user
    activity fold WITHOUT a sink (the psi_cube_transform pattern,
    r11), so the restart-recovery test can drive the production
    transform — the ValueState+MapState layout on the TWS path —
    through its own checkpointed sink."""
    src = _events_stream(spark, sf_dir).select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    if _tws_protocol_available():
        return (
            src.groupBy("user_id").transformWithStateInPandas(
                statefulProcessor=_UserActivityProcessor(),
                outputStructType=_TWS_OUT_SCHEMA,
                outputMode="Update",
                timeMode="None",
            ),
            True,
        )
    return (
        src.groupBy("user_id").applyInPandasWithState(
            _user_activity_fallback_fn,
            outputStructType=_TWS_OUT_SCHEMA,
            stateStructType="n BIGINT, mx BIGINT, types ARRAY<STRING>",
            outputMode="update",
            timeoutConf="NoTimeout",
        ),
        False,
    )


# approx_percentile sketch accuracy: rank error is bounded by
# n/QUANTILE_ACCURACY per group. The envelope audit
# (streaming_window_quantiles in queries_multimodal.py) derives its
# half-width from this bound and the observed group size, so raising
# corpus density widens the envelope instead of breaking the oracle.
QUANTILE_ACCURACY = 1000


def streaming_window_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked daily value-quantile sketches per event type:
    percentile_approx (a mergeable typed-imperative aggregate, the
    KLL-style sketch Spark ships) inside a streaming tumbling-window
    aggregation — the streaming side of the quantile-alignment audit.
    The registered query wraps this sink with a batch envelope check
    against exact rank picks."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.percentile_approx(
                "value", [0.5, 0.9], QUANTILE_ACCURACY
            ).alias("qs"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            "event_type",
            "n_events",
            F.element_at("qs", 1).alias("p50_approx"),
            F.element_at("qs", 2).alias("p90_approx"),
        )
    )
    _run_to_memory(agg, "stream_window_quantiles", "complete")
    return spark.table("stream_window_quantiles")


# --- streaming KMV bottom-k distinct tier (round 8) -------------------------
#
# The KMV sketch is a deterministic function of the key SET (bottom-k
# of md5 hashes), so unlike order-sensitive packing the streaming fold
# is EXACTLY the batch sketch no matter how the stream is batched —
# the property that lets this job carry the batch twin's full oracle.
# State per key is the ≤ k smallest distinct hashes: bounded at k
# strings regardless of key cardinality (the 100 TB story — the state
# store never sees the user set, only its bottom-k).


class _KMVProcessor:
    """StatefulProcessor: ValueState holding the sorted bottom-k hash
    array; each batch merges its hashes and re-truncates to k."""

    def __init__(self, k: int) -> None:
        self._k = k

    def init(self, handle) -> None:
        self._sk = handle.getValueState("sk", "hs ARRAY<STRING>")

    def handleInputRows(self, key, rows, timerValues):
        cur = list(self._sk.get()[0]) if self._sk.exists() else []
        s = set(cur)
        for pdf in rows:
            s.update(pdf["h"].tolist())
        merged = sorted(s)[: self._k]
        self._sk.update((merged,))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "kth_hash": [
                    merged[self._k - 1] if len(merged) >= self._k else None
                ],
            }
        )

    def close(self) -> None:
        pass


_KMV_OUT_SCHEMA = "event_type STRING, kth_hash STRING"


def streaming_kmv_distinct(
    spark: SparkSession, sf_dir: str, k: int
) -> DataFrame:
    """Streaming KMV distinct tier (ROADMAP second-draft #2): per
    event type, fold the stream's md5 key hashes into a bottom-k
    ValueState and emit the running k-th smallest hash — the sketch's
    whole state in one bounded array. The registered query
    (sketch family) turns the final kth hash into the (k−1)/u
    estimate with the exact arithmetic of the batch twin.

    kth_hash is NON-INCREASING across updates (bottom-k only ever
    shrinks), so the final sketch is min(kth_hash) per key even if
    availableNow splits the source into several batches. Falls back to
    applyInPandasWithState where the TWS protobuf protocol is absent,
    same semantics (one struct holding the array)."""
    result, tws = kmv_transform(spark, sf_dir, k)
    if tws:
        _run_with_rocksdb(spark, result, "stream_kmv_distinct")
    else:
        _run_to_memory(result, "stream_kmv_distinct", "update")
    return spark.table("stream_kmv_distinct")


def kmv_transform(
    spark: SparkSession, sf_dir: str, k: int
) -> tuple[DataFrame, bool]:
    """(unstarted transformed stream, uses_tws) — the bottom-k fold
    WITHOUT a sink (the psi_cube_transform pattern, r11), so the
    restart-recovery test can drive the production transform through
    its own checkpointed sink."""
    src = _events_stream(spark, sf_dir).select(
        "event_type",
        F.md5(
            F.concat(F.lit("kmv:"), F.col("user_id").cast("string")).cast(
                "binary"
            )
        ).alias("h"),
    )
    if _tws_protocol_available():
        return (
            src.groupBy("event_type").transformWithStateInPandas(
                statefulProcessor=_KMVProcessor(k),
                outputStructType=_KMV_OUT_SCHEMA,
                outputMode="Update",
                timeMode="None",
            ),
            True,
        )

    def _kmv_fallback_fn(key, pdfs: Iterator[pd.DataFrame], state):
        cur = list(state.get[0]) if state.exists else []
        s = set(cur)
        for pdf in pdfs:
            s.update(pdf["h"].tolist())
        merged = sorted(s)[:k]
        state.update((merged,))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "kth_hash": [
                    merged[k - 1] if len(merged) >= k else None
                ],
            }
        )

    return (
        src.groupBy("event_type").applyInPandasWithState(
            _kmv_fallback_fn,
            outputStructType=_KMV_OUT_SCHEMA,
            stateStructType="hs ARRAY<STRING>",
            outputMode="update",
            timeoutConf="NoTimeout",
        ),
        False,
    )


# --- streaming CUSUM change-point tier (round 9) -----------------------------
#
# The offline CUSUM statistic needs the series TOTAL, so it cannot be
# folded one-pass like KMV. What CAN stream is its sufficient
# statistic: the per-day count map. State per key is {day -> count} —
# bounded by the CALENDAR (the same metadata-scale argument the batch
# twin makes for its windows), never by the event stream. Each update
# merges the batch's day counts and recomputes the integer-exact
# argmax from the bounded map; because the final map equals the batch
# day counts regardless of batching, the LAST update per key equals
# the batch query exactly — full oracle, not an envelope. An update
# sequence number in state makes "last" well-defined in the update-
# mode sink without relying on single-batch execution.


def _day_sort_key(d):
    """Total order over day labels including None (NULL ts day): None
    first, matching Spark's nulls-first ASC window ordering in the
    batch twin."""
    return (d is not None, d or "")


def _cusum_peak(days: list, cnts: list):
    """Integer-exact offline CUSUM argmax over an ordered day series:
    S_rk = nd·cum_rk − rk·total (Python ints, arbitrary precision),
    pick by (|S| desc, day asc) — the batch twin's exact order
    (queries_events.py events_cusum_changepoint)."""
    nd = len(days)
    total = sum(cnts)
    cum = 0
    best_day, best_s, found = None, 0, False
    for rk, (d, c) in enumerate(zip(days, cnts), 1):
        cum += c
        s = nd * cum - rk * total
        if not found or abs(s) > abs(best_s):
            best_day, best_s, found = d, s, True
    return nd, best_day, best_s


def _cusum_fold(state_get, exists: bool, pdfs) -> tuple:
    """Shared fold body for both stateful APIs (the _psi_fold pattern,
    r9 review): merge the batch's day counts into the state map, bump
    seq, and return the new (days, cnts, seq) state tuple. NULL days
    (NULL ts) are counted as their own group — value_counts' default
    dropna would silently drop rows the batch twin counts."""
    if exists:
        days, cnts, seq = state_get
        m = dict(zip(days, (int(c) for c in cnts)))
    else:
        m, seq = {}, 0
    for pdf in pdfs:
        for d, c in pdf["day"].value_counts(dropna=False).items():
            d = None if pd.isna(d) else d
            m[d] = m.get(d, 0) + int(c)
    seq = int(seq) + 1
    days = sorted(m, key=_day_sort_key)
    return days, [m[d] for d in days], seq


_CUSUM_OUT_SCHEMA = (
    "event_type STRING, seq BIGINT, n_days BIGINT, "
    "change_day STRING, snum BIGINT"
)
_CUSUM_STATE_SCHEMA = "days ARRAY<STRING>, cnts ARRAY<LONG>, seq BIGINT"


class _CUSUMProcessor:
    """StatefulProcessor: ValueState holding the sorted (day, count)
    arrays + update sequence; each batch merges day counts and emits
    the recomputed change-point."""

    def init(self, handle) -> None:
        self._st = handle.getValueState("st", _CUSUM_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        st = self._st.get() if self._st.exists() else None
        days, cnts, seq = _cusum_fold(st, st is not None, rows)
        self._st.update((days, cnts, seq))
        nd, day, snum = _cusum_peak(days, cnts)
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "seq": [seq],
                "n_days": [nd],
                "change_day": [day],
                "snum": [snum],
            }
        )

    def close(self) -> None:
        pass


def _cusum_fallback_fn(key, pdfs: Iterator[pd.DataFrame], state):
    """applyInPandasWithState spelling of the CUSUM fold (no-protobuf
    environments) — same ``_cusum_fold``/``_cusum_peak`` body as the
    TWS processor."""
    st = state.get if state.exists else None
    days, cnts, seq = _cusum_fold(st, st is not None, pdfs)
    state.update((days, cnts, seq))
    nd, day, snum = _cusum_peak(days, cnts)
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "seq": [seq],
            "n_days": [nd],
            "change_day": [day],
            "snum": [snum],
        }
    )


def cusum_transform(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, bool]:
    """(unstarted transformed stream, uses_tws) — the CUSUM fold
    WITHOUT a sink (the psi_cube_transform pattern, r11), so the
    restart-recovery test can drive the production transform through
    its own checkpointed sink."""
    src = _events_stream(spark, sf_dir).select(
        "event_type",
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
            "day"
        ),
    )
    if _tws_protocol_available():
        return (
            src.groupBy("event_type").transformWithStateInPandas(
                statefulProcessor=_CUSUMProcessor(),
                outputStructType=_CUSUM_OUT_SCHEMA,
                outputMode="Update",
                timeMode="None",
            ),
            True,
        )
    return (
        src.groupBy("event_type").applyInPandasWithState(
            _cusum_fallback_fn,
            outputStructType=_CUSUM_OUT_SCHEMA,
            stateStructType=_CUSUM_STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        ),
        False,
    )


def streaming_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CUSUM change-point tier (ROADMAP r9 candidate #1):
    per event type, fold the stream into a calendar-bounded day-count
    map in ValueState and emit the recomputed integer-exact CUSUM
    argmax on every update. transformWithStateInPandas with an
    applyInPandasWithState fallback, like the KMV tier. The registered
    query (queries_events.py) keeps each key's max-seq row and applies
    the batch twin's exact display arithmetic, so it carries the batch
    twin's full oracle."""
    result, tws = cusum_transform(spark, sf_dir)
    if tws:
        _run_with_rocksdb(spark, result, "stream_cusum_changepoint")
    else:
        _run_to_memory(result, "stream_cusum_changepoint", "update")
    return spark.table("stream_cusum_changepoint")


# --- streaming PSI drift tier (round 9) --------------------------------------
#
# PSI vs the pooled reference is, like CUSUM, a two-pass statistic —
# but its SUFFICIENT statistic streams: the (day, bucket) count cube
# per event type (calendar x fixed-bucket bounded). The processor only
# FOLDS the cube; the PSI arithmetic stays in the registered query's
# Spark expressions (queries_quality.psi_from_cube), so the streamed
# report is bit-identical to the batch twin with no Python float
# rounding in the loop at all.


_PSI_TIER_OUT_SCHEMA = (
    "event_type STRING, seq BIGINT, day STRING, bucket BIGINT, c BIGINT"
)
_PSI_TIER_STATE_SCHEMA = (
    "days ARRAY<STRING>, buckets ARRAY<LONG>, cnts ARRAY<LONG>, seq BIGINT"
)


def _psi_fold(state_get, exists: bool, pdfs) -> tuple:
    """Shared fold body for both stateful APIs: merge the batch's
    (day, bucket) counts into the state cube, bump seq, and return the
    new state tuple. NULL days/buckets (NULL ts/value) are kept as
    their own groups — pandas groupby's default dropna would silently
    drop rows the batch twin's groupBy counts (r9 review)."""
    if exists:
        days, buckets, cnts, seq = state_get
        m = {
            (d, None if b is None else int(b)): int(c)
            for d, b, c in zip(days, buckets, cnts)
        }
    else:
        m, seq = {}, 0
    for pdf in pdfs:
        grp = pdf.groupby(["day", "bucket"], dropna=False).size()
        for (d, b), c in grp.items():
            k = (None if pd.isna(d) else d, None if pd.isna(b) else int(b))
            m[k] = m.get(k, 0) + int(c)
    seq = int(seq) + 1
    keys = sorted(
        m,
        key=lambda k: (_day_sort_key(k[0]), k[1] is not None, k[1] or 0),
    )
    return (
        [d for d, _ in keys],
        [b for _, b in keys],
        [m[k] for k in keys],
        seq,
    )


class _PSIProcessor:
    """StatefulProcessor: ValueState holding the (day, bucket, count)
    cube arrays + update sequence; each batch merges and re-emits the
    whole (bounded) cube."""

    def init(self, handle) -> None:
        self._st = handle.getValueState("st", _PSI_TIER_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        st = self._st.get() if self._st.exists() else None
        days, buckets, cnts, seq = _psi_fold(st, st is not None, rows)
        self._st.update((days, buckets, cnts, seq))
        yield pd.DataFrame(
            {
                "event_type": [key[0]] * len(days),
                "seq": [seq] * len(days),
                "day": days,
                "bucket": buckets,
                "c": cnts,
            }
        )

    def close(self) -> None:
        pass


def _psi_fallback_fn(key, pdfs: Iterator[pd.DataFrame], state):
    """applyInPandasWithState spelling of the PSI fold (no-protobuf
    environments) — same ``_psi_fold`` body as the TWS processor."""
    st = state.get if state.exists else None
    days, buckets, cnts, seq = _psi_fold(st, st is not None, pdfs)
    state.update((days, buckets, cnts, seq))
    yield pd.DataFrame(
        {
            "event_type": [key[0]] * len(days),
            "seq": [seq] * len(days),
            "day": days,
            "bucket": buckets,
            "c": cnts,
        }
    )


def _day_bucket_cube_attach(src: DataFrame) -> tuple[DataFrame, bool]:
    """Attach the (day, bucket) cube fold to a prepared
    (event_type, day, bucket) stream — ONE definition of the
    TWS/fallback branch shared by every cube-shaped tier (r14: the
    Benford digit cube reuses the PSI fold verbatim; the bucket
    column is opaque to the processor)."""
    if _tws_protocol_available():
        return (
            src.groupBy("event_type").transformWithStateInPandas(
                statefulProcessor=_PSIProcessor(),
                outputStructType=_PSI_TIER_OUT_SCHEMA,
                outputMode="Update",
                timeMode="None",
            ),
            True,
        )
    return (
        src.groupBy("event_type").applyInPandasWithState(
            _psi_fallback_fn,
            outputStructType=_PSI_TIER_OUT_SCHEMA,
            stateStructType=_PSI_TIER_STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        ),
        False,
    )


def psi_cube_transform(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, bool]:
    """(unstarted transformed stream, uses_tws) — the PSI cube fold
    WITHOUT a sink, so callers can attach their own (the registered
    query runs it to a memory table; the restart-recovery test runs
    it twice through one checkpointLocation). Split out in r11 so the
    recovery path of the state every derived tier shares is testable
    against the production transform, not a re-implementation."""
    from ..queries_quality import psi_bucket_col

    src = _events_stream(spark, sf_dir).select(
        "event_type",
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
            "day"
        ),
        psi_bucket_col().alias("bucket"),
    )
    return _day_bucket_cube_attach(src)


def benford_digit_col():
    """Leading decimal digit (1-9) of the value cents as a BIGINT;
    NULL when the value is NULL or below one cent — NULL stays its
    own cube group (the fold keeps it), and the gate query reports it
    as the excluded mass. Digit from the INTEGER cents' decimal
    string: no libm (the dq_benford_chi2_gate rule)."""
    cents = "CAST(floor(value * 100e0 + 0.5e0) AS BIGINT)"
    # a NULL value makes cents NULL, and NULL >= 1 is NULL, so the
    # CASE already yields NULL — no separate IS NOT NULL guard needed
    return F.expr(
        f"CASE WHEN {cents} >= 1"
        f" THEN CAST(substring(CAST({cents} AS STRING), 1, 1) AS BIGINT)"
        " END"
    )


def benford_cube_transform(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, bool]:
    """(unstarted transformed stream, uses_tws) — the Benford
    leading-digit cube: the SAME day-bucket fold as the PSI tier
    (shared processor, shared state schema, shared restart story)
    with bucket = leading digit of the event value's cents. State per
    key is calendar × (9 digits + the NULL/sub-cent group) — bounded
    by construction, the smallest cube of any tier."""
    src = _events_stream(spark, sf_dir).select(
        "event_type",
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
            "day"
        ),
        benford_digit_col().alias("bucket"),
    )
    return _day_bucket_cube_attach(src)


def streaming_benford_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Benford tier (round 14): fold the stream into the
    per-type (day, leading-digit) count cube in ValueState and
    re-emit with a sequence number — TWS with the
    applyInPandasWithState fallback, exactly like the PSI cube it
    shares its processor with. The registered gate query keeps each
    key's max-seq cube and runs the dq_benford_chi2_gate statistic
    over it."""
    result, tws = benford_cube_transform(spark, sf_dir)
    if tws:
        _run_with_rocksdb(spark, result, "stream_benford_cube")
    else:
        _run_to_memory(result, "stream_benford_cube", "update")
    return spark.table("stream_benford_cube")


def streaming_psi_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming PSI tier (ROADMAP r10 candidate #2, landed r9): per
    event type, fold the stream into the calendar-bounded
    (day, bucket) count cube in ValueState and re-emit the cube on
    every update with a sequence number. transformWithStateInPandas
    with an applyInPandasWithState fallback, like the KMV and CUSUM
    tiers. The registered query keeps each key's max-seq cube and runs
    psi_from_cube over it — the batch twin's exact expressions on the
    exact batch cube."""
    result, tws = psi_cube_transform(spark, sf_dir)
    if tws:
        _run_with_rocksdb(spark, result, "stream_psi_cube")
    else:
        _run_to_memory(result, "stream_psi_cube", "update")
    return spark.table("stream_psi_cube")


def psi_cube_day_totals(
    spark: SparkSession,
    sf_dir: str,
    alias: str = "c",
    day_as_date: bool = False,
    checkpoint: bool = False,
) -> DataFrame:
    """Per-type day totals off the streamed PSI cube's FINAL state —
    the shared front half of every derived streaming tier (Fano, ACF,
    volume anomaly, mix entropy, weekday strength, EWMA forecast,
    seasonal anomaly, OLS trend, day-over-day growth, Holt trend
    forecast):
    keep each key's
    max-seq cube emission and sum its buckets per (event_type, day).
    One definition of the latest-cube selection (r10 review: eight
    hand copies had accumulated). ``checkpoint=True`` localCheckpoints
    the metadata-scale result for reports that consume it in multiple
    branches (the dow-tier precedent; also required where the
    un-checkpointed multi-branch self-join fails analysis with
    conflicting cube references)."""
    from pyspark.sql import Window

    cube = streaming_psi_cube(spark, sf_dir)
    mw = Window.partitionBy("event_type")
    day_col = F.to_date("day").alias("day") if day_as_date else F.col("day")
    out = (
        cube.withColumn("max_seq", F.max("seq").over(mw))
        .where(F.col("seq") == F.col("max_seq"))
        .groupBy("event_type", day_col)
        .agg(F.sum("c").cast("bigint").alias(alias))
    )
    return out.localCheckpoint(eager=True) if checkpoint else out
