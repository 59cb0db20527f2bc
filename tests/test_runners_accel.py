"""Runner (EVERY/RUNNERAT/RUNNERIN), ACCEL.* hints, retention caps, and
the new scalar helpers (humanduration, Haar DWT, lagged correlate)."""

import time

from pyspark.sql import Row
from pyspark.sql import functions as F

from warp10_platform_spark.core.accel import accel_cache, accel_nocache
from warp10_platform_spark.functions.timeutil import humanduration, parse_duration
from warp10_platform_spark.operators.reshape import (
    max_tick_sliding_window,
    max_time_sliding_window,
)
from warp10_platform_spark.streaming.runners import every, run_once, runner_at, runner_in


def _series(spark, n=10, gts_id=1):
    rows = [Row(gts_id=gts_id, ts=i * 1_000_000, event_id=i, v_double=float(i)) for i in range(n)]
    return spark.createDataFrame(rows)


def test_humanduration_units():
    assert humanduration(0) == "0"
    assert humanduration(95_400_000_000) == "1d2h30m"
    assert humanduration(-1_500_000) == "-1s500ms"
    assert humanduration(parse_duration("P2W")) == "2w"
    assert humanduration(61_000_001) == "1m1s1us"


def test_max_tick_sliding_window_keeps_last_n(spark):
    df = _series(spark, n=10)
    kept = max_tick_sliding_window(df, 3).select("ts").rdd.map(lambda r: r[0]).collect()
    assert sorted(kept) == [7_000_000, 8_000_000, 9_000_000]
    # n larger than the series keeps everything
    assert max_tick_sliding_window(df, 99).count() == 10


def test_max_time_sliding_window_span(spark):
    df = _series(spark, n=10)  # ticks 0..9s, max = 9s
    kept = max_time_sliding_window(df, 2_500_000).select("ts").rdd.map(lambda r: r[0]).collect()
    # strictly within (9s - 2.5s, 9s] → 7s, 8s, 9s
    assert sorted(kept) == [7_000_000, 8_000_000, 9_000_000]


def test_runner_schedule_arithmetic():
    assert runner_in(-5) == 0
    assert runner_in(42) == 42
    assert runner_at(1_000, now_us=400) == 600
    assert runner_at(1_000, now_us=2_000) == 0


def test_run_once_invokes_body(spark):
    calls = []
    run_once(spark, lambda s, tick: calls.append(tick))
    assert calls == [-1]


def test_every_ticks_at_interval(spark, tmp_path):
    ticks = []
    q = every(
        spark,
        lambda s, batch_id: ticks.append(batch_id),
        interval="1 seconds",
        queryName="runner_test",
        checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        deadline = time.time() + 30
        while len(ticks) < 2 and time.time() < deadline:
            time.sleep(0.5)
    finally:
        q.stop()
    assert len(ticks) >= 2  # the runner body re-ran on the cadence


def test_accel_cache_roundtrip(spark):
    df = _series(spark, n=5)
    cached = accel_cache(df)
    assert cached.storageLevel.useMemory
    assert cached.count() == 5
    un = accel_nocache(cached)
    assert not un.storageLevel.useMemory
