"""Runners — the reference's periodic-computation surface, Spark-first.

The reference schedules `.mc2` scripts from periodicity-named directories
(script/ScriptRunner.java:230-249, roles standalone/scheduler/worker) and
exposes EVERY (functions/EVERY.java:25), RUNNERAT (RUNNERAT.java:29) and
RUNNERIN (RUNNERIN.java:30) for in-script scheduling. The Spark analog is
a Structured Streaming rate source driving foreachBatch on a
processingTime trigger: each micro-batch tick re-runs the job callback,
giving the same "re-evaluate this script every N" contract with Spark's
own fault tolerance (checkpointed offsets) instead of a bespoke cron.

RUNNERAT/RUNNERIN are pure schedule arithmetic (next-fire computation) —
the scheduling decision the reference script makes inline.
"""

from __future__ import annotations

import time
from warp10_platform_spark.core import timeunits as _tuc
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def every(
    spark: SparkSession,
    fn: Callable[[SparkSession, int], None],
    interval: str = "10 seconds",
    queryName: str = "runner",
    checkpoint: str | None = None,
):
    """EVERY (functions/EVERY.java:25): re-run `fn(spark, tick)` on a
    fixed cadence. Returns the StreamingQuery — caller stops it. The rate
    source emits one row per interval so each micro-batch is one runner
    tick; fn failures fail the query like a runner script error would."""
    stream = spark.readStream.format("rate").option("rowsPerSecond", 1).load()

    def _batch(df: DataFrame, batch_id: int) -> None:
        fn(spark, batch_id)

    w = (
        stream.writeStream.foreachBatch(_batch)
        .trigger(processingTime=interval)
        .queryName(queryName)
    )
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    return w.start()


def runner_at(epoch_us: int, now_us: int | None = None) -> int:
    """RUNNERAT (functions/RUNNERAT.java:29): µs to wait until the given
    absolute tick (0 if already past)."""
    now = int(time.time() * _tuc.UNITS_PER_S) if now_us is None else now_us
    return max(0, epoch_us - now)


def runner_in(delay_us: int) -> int:
    """RUNNERIN (functions/RUNNERIN.java:30): clamp a relative delay to
    ≥0 µs — the reference treats negative delays as immediate."""
    return max(0, delay_us)


def run_once(spark: SparkSession, fn: Callable[[SparkSession, int], None]) -> None:
    """RUNNERNONCE analog: execute the runner body exactly once, now —
    used for backfill/catch-up of a periodic job."""
    fn(spark, -1)
