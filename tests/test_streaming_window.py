"""Structured Streaming windowed aggregation with watermark (brief: streams).

The transformation itself is oracle-gated through relational.events_window;
these tests exercise the STREAMING execution: micro-batched file source,
complete-mode equality with the batch result, and append-mode watermark
semantics (only closed windows emitted).
"""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def _stream_dir(spark, events, tmp_path):
    d = str(tmp_path / "ev_stream")
    # two files -> two micro-batches with maxFilesPerTrigger=1
    events.filter("event_id % 2 = 0").coalesce(1).write.mode("append").parquet(d)
    events.filter("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(d)
    return d


def test_streaming_complete_matches_batch(spark, events, tmp_path):
    from voyagr_spark.streaming import windowed_event_counts

    d = _stream_dir(spark, events, tmp_path)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    q = (
        windowed_event_counts(stream, hours=6, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("win_complete")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(map(tuple, spark.sql("select * from win_complete").collect()))
    want = sorted(map(tuple, windowed_event_counts(events, 6).collect()))
    assert got == want


def test_streaming_append_emits_only_closed_windows(spark, events, tmp_path):
    from voyagr_spark.streaming import windowed_event_counts

    d = _stream_dir(spark, events, tmp_path)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    q = (
        windowed_event_counts(stream, hours=6, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("win_append")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(map(tuple, spark.sql("select * from win_append").collect()))
    want = sorted(map(tuple, windowed_event_counts(events, 6).collect()))
    # append emits a window only after the watermark passes its end: every
    # emitted row must equal its batch counterpart, and the final (still
    # open) window must be withheld
    assert set(got) < set(want)
    open_starts = {r[0] for r in set(want) - set(got)}
    assert len(open_starts) >= 1  # at least the last window is open
