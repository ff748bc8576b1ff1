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
