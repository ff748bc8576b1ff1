"""Structured Streaming smoke: availableNow geotag over a page directory,
and windowed event counts matching the batch query."""

from pyspark.sql import functions as F


def test_geotag_stream_once(spark, tmp_path):
    from tileigi_spark.fixtures import pages_df
    from tileigi_spark.streaming import run_geotag_stream_once

    src = str(tmp_path / "pages")
    pages_df(spark, 200).write.parquet(src)
    schema = ("url string, warc_ts timestamp, html binary, text string, "
              "lang string")
    out = str(tmp_path / "points")
    run_geotag_stream_once(spark, src, schema, out,
                           str(tmp_path / "ckpt"))
    got = spark.read.parquet(out)
    n = got.count()
    assert n > 100  # most fixture pages carry coords
    assert set(got.columns) >= {"url", "lat", "lon", "span", "way"}

    # exactly-once: re-running with the same checkpoint adds nothing
    run_geotag_stream_once(spark, src, schema, out, str(tmp_path / "ckpt"))
    assert spark.read.parquet(out).count() == n


def test_windowed_counts_match_batch(spark, tmp_path):
    from tileigi_spark.streaming import windowed_event_counts

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "events")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    agg = windowed_event_counts(stream)
    q = (agg.writeStream.format("memory").queryName("evt")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r["hour"], r["event_type"]): (r["n"], r["sum_value_milli"])
           for r in spark.sql("select * from evt").collect()}

    batch = (ev.groupBy(F.date_trunc("hour", "ts").alias("hour"),
                        "event_type")
             .agg(F.count("*").alias("n"),
                  F.sum(F.round(F.col("value") * 1000).cast("long"))
                  .alias("s")))
    expected = {(r["hour"], r["event_type"]): (r["n"], r["s"])
                for r in batch.collect()}
    # append mode with watermark may hold back the final windows; all
    # emitted rows must match the batch aggregate exactly
    assert got
    for k, v in got.items():
        assert expected[k] == v


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState gap sessions == batch lag/cumsum sessions,
    including ABSOLUTE session_start/session_end (both sides emit seconds
    since the fixed _EPOCH0 origin, so outputs are joinable)."""
    from tileigi_spark.streaming import (sessionize_events_batch,
                                         sessionize_stream)

    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .filter(F.col("user_id") < 8))
    # flush sentinel: one far-future event per user advances the watermark
    # past every real session's gap horizon so append mode emits them all
    last = ev.agg(F.max("ts")).collect()[0][0]
    import datetime
    flush = spark.createDataFrame(
        [(10**6 + u, last + datetime.timedelta(days=30), u, "flush",
          0.0, "{}") for u in range(8)],
        schema=ev.schema)
    src = str(tmp_path / "sess_events")
    ev.unionByName(flush).write.parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (sessionize_stream(stream, gap_seconds=1800)
         .writeStream.format("memory").queryName("sess")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql("select * from sess").collect()

    expected = sessionize_events_batch(ev, gap_seconds=1800).collect()

    def shape(rows):
        out = {}
        for r in rows:
            if r["n_events"] == 1 and r["sum_value_milli"] == 0:
                continue  # the flush sentinel session
            out.setdefault(r["user_id"], []).append(
                (r["session_start"], r["session_end"],
                 r["n_events"], r["sum_value_milli"]))
        return {k: sorted(v) for k, v in out.items()}

    assert shape(got) == shape(expected)


import pytest


@pytest.mark.parametrize("name,files", [
    # late event extends the open session's start backward
    ("late_extends_start", [[(1, 1000), (1, 1600)], [(1, 400)]]),
    # late event more than gap before start -> separate EARLIER session
    ("late_separate_session", [[(1, 5000), (1, 5600)], [(1, 100)]]),
    # late event bridges two open sessions into one (3-way merge)
    ("late_bridges", [[(1, 1000), (1, 5000)], [(1, 2800)]]),
    # multi-user, duplicate timestamps, reversed arrival order
    ("mixed", [[(1, 3000), (2, 100), (1, 3000)], [(1, 1100), (2, 2000)],
               [(1, 2050), (2, 150), (1, 100)]]),
])
def test_sessionize_stream_out_of_order_microbatches(spark, tmp_path,
                                                     name, files):
    """Late-within-watermark events arriving in LATER microbatches
    (maxFilesPerTrigger=1 forces one file per microbatch) must still
    reproduce the batch sessionization exactly — the regression class
    that broke the single-open-session formulation (it pinned
    session_start to the first-SEEN event and over-merged events older
    than start - gap). The interval-merge state is arrival-order
    invariant."""
    import datetime
    import time

    from tileigi_spark.streaming import (sessionize_events_batch,
                                         sessionize_stream)

    base = datetime.datetime(2025, 1, 1, 12, 0, 0)
    schema = ("event_id long, ts timestamp, user_id long, kind string, "
              "value double, meta string")
    src = str(tmp_path / "ooo_events")
    eid = 0
    for rows in files:
        batch = []
        for uid, offs in rows:
            batch.append((eid, base + datetime.timedelta(seconds=offs),
                          uid, "e", 1.0, "{}"))
            eid += 1
        spark.createDataFrame(batch, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        time.sleep(1.05)  # distinct mtimes -> deterministic file order
    users = {uid for rows in files for uid, _ in rows}
    spark.createDataFrame(
        [(10**6 + u, base + datetime.timedelta(days=30), u, "flush",
          0.0, "{}") for u in users], schema) \
        .coalesce(1).write.mode("append").parquet(src)

    allev = spark.read.parquet(src).filter(F.col("kind") != "flush")
    expected = sorted(
        (r["user_id"], r["session_start"], r["session_end"],
         r["n_events"], r["sum_value_milli"])
        for r in sessionize_events_batch(allev, gap_seconds=1800).collect())

    stream = (spark.readStream.schema(allev.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (sessionize_stream(stream, gap_seconds=1800)
         .writeStream.format("memory").queryName(f"ooo_{name}")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = sorted(
        (r["user_id"], r["session_start"], r["session_end"],
         r["n_events"], r["sum_value_milli"])
        for r in spark.sql(f"select * from ooo_{name}").collect()
        if not (r["n_events"] == 1 and r["sum_value_milli"] == 0))
    assert got == expected
