"""Watermarked windowed streaming == batch oracle.

The same logical plan (streaming/windows.windowed_event_counts) runs as
a file stream drained in chunks and as a plain batch query; with two
far-future sentinel drains to push the watermark past every real
window, the append-mode streamed output must equal the batch result over
the real events exactly. Also pins the late-data contract: a row later
than the watermark delay is dropped from an already-finalized window."""

import datetime as dt

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
COLS = ["event_id", "user_id", "event_type", "ts", "value"]


def _drain(spark, in_dir, out_dir, ckpt):
    from distributed_gpu_lsh_using_sycl_spark.streaming.windows import (
        windowed_stream)

    q = windowed_stream(spark, str(in_dir), str(out_dir), str(ckpt),
                        window="1 day", watermark_delay="1 hour")
    q.awaitTermination(120)


def _us(df):
    """Match the source parquet's microsecond timestamps (a fresh pandas
    frame defaults to ns, which Spark's streaming schema then rejects)."""
    df["ts"] = df["ts"].astype("datetime64[us]")
    return df


def _sentinel(ts):
    return _us(pd.DataFrame({"event_id": [10 ** 9], "user_id": [0],
                             "event_type": ["flush"], "ts": [ts],
                             "value": [0.0]}))


def test_windowed_stream_equals_batch(spark, tmp_path_factory):
    from distributed_gpu_lsh_using_sycl_spark.streaming.windows import (
        windowed_event_counts)

    base = tmp_path_factory.mktemp("winstream")
    in_dir, out_dir, ckpt = base / "in", base / "out", base / "ckpt"
    in_dir.mkdir()

    ev = pd.read_parquet(f"{SF}/events.parquet")[COLS].sort_values("ts")
    half = len(ev) // 2
    ev.iloc[:half].to_parquet(in_dir / "chunk0.parquet", index=False)
    ev.iloc[half:].to_parquet(in_dir / "chunk1.parquet", index=False)
    _drain(spark, in_dir, out_dir, ckpt)

    # two sentinel drains: drain N's batch advances the watermark, drain
    # N+1 emits the windows that advance finalized
    far = dt.datetime(2026, 1, 1)
    _sentinel(far).to_parquet(in_dir / "chunk2.parquet", index=False)
    _drain(spark, in_dir, out_dir, ckpt)
    _sentinel(far + dt.timedelta(days=2)).to_parquet(
        in_dir / "chunk3.parquet", index=False)
    _drain(spark, in_dir, out_dir, ckpt)

    got = (spark.read.parquet(str(out_dir))
           .filter("event_type <> 'flush'").toPandas())
    want = (windowed_event_counts(
        spark.read.parquet(f"{SF}/events.parquet").select(COLS),
        window="1 day", watermark_delay="1 hour").toPandas())

    key = ["window_start", "event_type"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(want_s) > 0
    pd.testing.assert_frame_equal(got_s[want_s.columns], want_s)


def test_late_beyond_watermark_is_dropped(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("latedrop")
    in_dir, out_dir, ckpt = base / "in", base / "out", base / "ckpt"
    in_dir.mkdir()

    t0 = dt.datetime(2024, 6, 1, 0, 30)
    on_time = _us(pd.DataFrame({
        "event_id": [1, 2], "user_id": [1, 1],
        "event_type": ["click", "click"],
        "ts": [t0, t0 + dt.timedelta(minutes=10)], "value": [1.0, 1.0]}))
    on_time.to_parquet(in_dir / "a.parquet", index=False)
    _drain(spark, in_dir, out_dir, ckpt)

    # push the watermark days past the first window...
    _sentinel(dt.datetime(2024, 6, 10)).to_parquet(
        in_dir / "b.parquet", index=False)
    _drain(spark, in_dir, out_dir, ckpt)
    # ...then a VERY late row into the finalized window + another advance
    late = _us(pd.DataFrame({"event_id": [3], "user_id": [1],
                             "event_type": ["click"], "ts": [t0],
                             "value": [1.0]}))
    late.to_parquet(in_dir / "c.parquet", index=False)
    _drain(spark, in_dir, out_dir, ckpt)
    _sentinel(dt.datetime(2024, 6, 20)).to_parquet(
        in_dir / "d.parquet", index=False)
    _drain(spark, in_dir, out_dir, ckpt)

    got = (spark.read.parquet(str(out_dir))
           .filter("event_type = 'click'").toPandas())
    assert len(got) == 1
    assert int(got["n_events"].iloc[0]) == 2  # the late third row is dropped
