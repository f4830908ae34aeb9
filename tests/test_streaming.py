"""Streaming semantics: streamed execution must converge to the batch
analog's result (C10a-C10e)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_utils_spark.sources.tables import load_table
from etl_utils_spark.streaming import windows as W


def _norm(rows):
    return sorted(tuple(r) for r in rows)


def test_stream_tumbling_equals_batch(spark, sf_dir):
    live = W.run_stream_to_batch(spark, W.tumbling_counts(W.read_events_stream(spark, sf_dir)))
    batch = W.tumbling_counts(load_table(spark, sf_dir, "events"))
    assert _norm(live.collect()) == _norm(batch.collect())


def test_stream_session_window_equals_batch_sessionize(spark, sf_dir):
    """Native session_window (stream) vs gaps-and-islands (batch) must
    agree on session bounds and sizes."""
    from etl_utils_spark.operators.sessionize import session_stats

    live = W.run_stream_to_batch(
        spark, W.session_window_stats(W.read_events_stream(spark, sf_dir))
    )
    batch = session_stats(load_table(spark, sf_dir, "events"), gap_seconds=1800)
    live_n = _norm(
        live.select("user_id", "session_start", "n_events", "sum_value").collect()
    )
    batch_n = _norm(
        batch.select("user_id", "session_start", "n_events", "sum_value").collect()
    )
    assert live_n == batch_n


def test_stream_dedup_removes_duplicates(spark, sf_dir):
    s = W.read_events_stream(spark, sf_dir)
    doubled = s.unionByName(s)
    out = W.run_stream_to_batch(
        spark,
        W.dedup_within_watermark(doubled).select("event_id"),
        output_mode="append",
    )
    n_events = load_table(spark, sf_dir, "events").count()
    assert out.count() == n_events
    assert out.distinct().count() == n_events


def test_watermark_is_noop_on_batch(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    assert W.with_watermark(e).count() == e.count()


def test_stream_ewma_state_carries_across_batches():
    """The EWMA recurrence must continue from carried state when a
    key's events arrive in separate micro-batches (the AvailableNow
    harness runs a single batch, so this is the only coverage of the
    cross-batch path)."""
    import pandas as pd

    from etl_utils_spark.streaming.stateful import _update_ewma

    class FakeState:
        def __init__(self):
            self._v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)

    state = FakeState()

    def batch(rows):
        pdf = pd.DataFrame(rows, columns=["event_id", "ts", "value"])
        return list(_update_ewma((7,), iter([pdf]), state))[0]

    out1 = batch([(1, 100, 10.0), (2, 200, 20.0)])
    assert list(out1["ewma"]) == [10.0, 15.0]
    assert state.get == (15.0,)
    # second micro-batch continues from the carried average
    out2 = batch([(3, 300, 35.0)])
    assert list(out2["ewma"]) == [0.5 * 35.0 + 0.5 * 15.0]
    assert list(out2["user_id"]) == [7]


def test_checkpoint_resume_exactly_once(spark, tmp_path):
    """A restarted stream with the SAME checkpoint must process only
    files that arrived since the last run — the exactly-once landing
    contract production backfills rely on.  Run 1 lands batch A; run 2
    (new file, same checkpoint) appends only batch B; run 3 (no new
    data) appends nothing."""
    import os

    from etl_utils_spark.streaming.sinks import to_parquet_sink

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def land(n, start):
        spark.range(start, start + n).selectExpr(
            "id", "id * 2 AS v"
        ).coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema("id bigint, v bigint").parquet(src)
        q = to_parquet_sink(stream, sink, ckpt)
        q.awaitTermination(120)

    land(100, 0)
    run_once()
    assert spark.read.parquet(sink).count() == 100

    land(50, 100)
    run_once()
    out = spark.read.parquet(sink)
    assert out.count() == 150  # batch B exactly once, A not reprocessed
    assert out.select("id").distinct().count() == 150

    run_once()  # no new files → no new rows
    assert spark.read.parquet(sink).count() == 150
