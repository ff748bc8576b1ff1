"""Structured Streaming front-end for continuously-arriving pages/events.

The reference is a pure batch tiler (SURVEY.md §2.7: no streaming
operators), but the engine's inputs are append-only tables, so streaming
ingestion composes naturally: a stream of crawled pages is geotagged
micro-batch by micro-batch with the same Arrow extractor, and event
streams get watermarked tumbling-window aggregates. Tile building stays
batch (foreachBatch), matching the reference's checkpoint/resume model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def stream_pages(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """readStream over an append-only page directory (parquet)."""
    return spark.readStream.schema(schema).parquet(path)


def geotag_stream(pages_stream: DataFrame) -> DataFrame:
    """Same extractor as batch (extract.geotag_pages works on streams —
    mapInPandas is stream-compatible)."""
    from .extract import geotag_pages
    return geotag_pages(pages_stream)


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts per event type — the streaming
    form of the batch `events_hourly` query."""
    ts_type = dict(events.dtypes).get("ts", "timestamp")
    if ts_type != "timestamp":  # watermarks require TIMESTAMP, not _NTZ
        events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.round(F.col("value") * 1000).cast("long"))
                 .alias("sum_value_milli"))
            .select(F.col("w.start").alias("hour"), "event_type", "n",
                    "sum_value_milli"))


_EPOCH0 = "2024-01-01 00:00:00"  # fixture epoch; any fixed origin works
# Unix seconds of _EPOCH0's wall-clock reading: pandas hands the stateful
# operator NAIVE session-local timestamps whose int64 view is
# "wall-clock-as-UTC", so subtracting this constant yields seconds since
# _EPOCH0 in the SAME wall clock — timezone-free, matching the batch twin
import datetime as _dt

_EPOCH0_UNIX_S = int(_dt.datetime.strptime(_EPOCH0, "%Y-%m-%d %H:%M:%S")
                     .replace(tzinfo=_dt.timezone.utc).timestamp())


def _ts_seconds_col(ts_col):
    """Whole seconds since a fixed origin, timezone-free on both
    TIMESTAMP and TIMESTAMP_NTZ (no unix_timestamp: that applies the
    session timezone to NTZ values and breaks cross-engine parity)."""
    return F.expr(
        f"timestampdiff(SECOND, TIMESTAMP_NTZ '{_EPOCH0}', "
        f"date_trunc('second', {ts_col}))")


def sessionize_events_batch(events: DataFrame,
                            gap_seconds: int = 1800) -> DataFrame:
    """Gap-based sessionization, batch form: a session is a maximal run
    of a user's events with inter-event gaps <= gap_seconds. Classic
    lag -> break-flag -> running-sum session ids, two window passes over
    one (user_id) shuffle. Output columns are all BIGINT (hash-stable)."""
    from pyspark.sql import Window

    t = _ts_seconds_col("ts")
    vm = F.round(F.col("value") * 1000).cast("long")
    w = Window.partitionBy("user_id").orderBy("t")
    brk = F.when(
        (F.col("t") - F.lag("t").over(w) > gap_seconds)
        | F.lag("t").over(w).isNull(), 1).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("t") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = (events.select("user_id", t.alias("t"), vm.alias("vm"))
                .withColumn("brk", brk)
                .withColumn("sid", F.sum("brk").over(run))
                .groupBy("user_id", "sid")
                .agg(F.min("t").alias("session_start"),
                     F.max("t").alias("session_end"),
                     F.count("*").alias("n_events"),
                     F.sum("vm").cast("long").alias("sum_value_milli"))
                .drop("sid"))
    return sessions


def sessionize_stream(events: DataFrame, gap_seconds: int = 1800,
                      watermark: str = "2 hours") -> DataFrame:
    """Gap-based sessionization as a CUSTOM STATEFUL streaming operator
    (applyInPandasWithState + event-time timeout). Outputs match
    sessionize_events_batch on a fully-flushed stream INCLUDING the
    absolute session_start/session_end values: both emit whole seconds
    since the fixed _EPOCH0 origin (timezone-free), so batch and stream
    results are joinable.

    ARRIVAL-ORDER CORRECTNESS: the state is the full set of OPEN
    sessions per user (sorted disjoint intervals), and each event
    interval-merges into it — extending a session backward, forward,
    opening a new one, or BRIDGING two neighbors into one. A session's
    set is the connected components of the events under gap-adjacency,
    which interval merging computes invariantly to insertion order, so
    any event Spark's watermark admits — including late, out-of-order
    microbatches — yields exactly the batch result. (A previous
    single-open-session formulation silently kept session_start pinned
    to the first-SEEN event and over-merged events older than
    start - gap; found by an adversarial maxFilesPerTrigger=1 probe,
    pinned in tests/test_streaming.py.) A session flushes only once the
    watermark passes last + gap, when no admissible event can attach."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ts_type = dict(events.dtypes).get("ts", "timestamp")
    if ts_type != "timestamp":
        events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    events = events.withWatermark("ts", watermark)

    out_schema = ("user_id long, session_start long, session_end long, "
                  "n_events long, sum_value_milli long")
    state_schema = ("starts array<long>, lasts array<long>, "
                    "ns array<long>, vms array<long>")
    gap = gap_seconds

    def fn(key, pdfs, state: GroupState):
        import bisect

        uid = int(key[0])
        if state.exists:
            starts, lasts, ns, vms = (list(x) for x in state.get)
        else:
            starts, lasts, ns, vms = [], [], [], []

        if not state.hasTimedOut:
            rows = pd.concat(list(pdfs), ignore_index=True)
            ts_s = (rows["ts"].astype("int64") // 1_000_000_000
                    - _EPOCH0_UNIX_S).to_numpy()
            ev_vm = rows["value"].mul(1000).round().astype("int64") \
                .to_numpy()
            for t, v in zip(ts_s, ev_vm):
                t, v = int(t), int(v)
                i = bisect.bisect_right(starts, t)
                # candidates: predecessor (starts[i-1] <= t) iff within
                # gap of its end; successor (starts[i] > t) iff within
                # gap of its start
                jp = i - 1 if (i > 0 and t <= lasts[i - 1] + gap) else None
                js = i if (i < len(starts)
                           and t >= starts[i] - gap) else None
                if jp is None and js is None:
                    starts.insert(i, t); lasts.insert(i, t)
                    ns.insert(i, 1); vms.insert(i, v)
                elif jp is not None and js is not None:
                    # t bridges two open sessions -> merge them
                    starts[jp] = min(starts[jp], t)
                    lasts[jp] = max(lasts[jp], lasts[js])
                    ns[jp] += ns[js] + 1
                    vms[jp] += vms[js] + v
                    del starts[js], lasts[js], ns[js], vms[js]
                else:
                    j = jp if jp is not None else js
                    starts[j] = min(starts[j], t)
                    lasts[j] = max(lasts[j], t)
                    ns[j] += 1
                    vms[j] += v

        # flush every session no admissible event can extend: an event
        # with ts below the watermark is dropped by the engine, so once
        # wm > last + gap the session is final
        wm_rel = (state.getCurrentWatermarkMs() // 1000) - _EPOCH0_UNIX_S
        out, keep = [], []
        for s in zip(starts, lasts, ns, vms):
            (out if s[1] + gap < wm_rel else keep).append(s)
        if out:
            yield pd.DataFrame(
                {"user_id": [uid] * len(out),
                 "session_start": [s[0] for s in out],
                 "session_end": [s[1] for s in out],
                 "n_events": [s[2] for s in out],
                 "sum_value_milli": [s[3] for s in out]})
        if keep:
            starts, lasts, ns, vms = (list(x) for x in zip(*keep))
            state.update((starts, lasts, ns, vms))
            # fires when the watermark passes the earliest gap horizon
            # (timeout stays in the engine's epoch-millis clock)
            state.setTimeoutTimestamp(
                (min(lasts) + _EPOCH0_UNIX_S + gap) * 1000)
        else:
            state.remove()

    return (events.groupBy("user_id")
            .applyInPandasWithState(fn, out_schema, state_schema, "append",
                                    GroupStateTimeout.EventTimeTimeout))


def run_geotag_stream_once(spark: SparkSession, src_path: str,
                           schema: str, out_path: str,
                           checkpoint: str) -> None:
    """availableNow micro-batch run: geotag everything currently in the
    source directory, write points parquet, exactly-once via checkpoint."""
    geo = geotag_stream(stream_pages(spark, src_path, schema))
    (geo.writeStream
     .format("parquet")
     .option("path", out_path)
     .option("checkpointLocation", checkpoint)
     .trigger(availableNow=True)
     .start()
     .awaitTermination())
