"""Event-time windowed arrival statistics with watermarked late-data
handling.

The reference's lifecycle is batch-with-resume; its closest "continuous
monitoring" analog (SURVEY.md §2.10) is: as validated sequence batches
land, keep per-source arrival statistics over event-time windows so a
stalled or drifting source is visible without a full rescan. This module
is the Structured-Streaming-native form of that: tumbling event-time
windows + a watermark bounding how long window state is retained.

Semantics (and why they survive 100 TB / unbounded streams):

* The aggregation is declared once and runs identically on a batch or a
  streaming DataFrame — the batch run is the oracle for the streaming run
  (pinned in tests/test_sources_streaming.py).
* ``withWatermark(event_time, delay)`` bounds state: a window closes when
  the max observed event time passes ``window.end + delay``; its row is
  emitted exactly once (append mode) and its state evicted. Without the
  watermark, state for every window ever seen accumulates forever — the
  unbounded-stream OOM the reference never had to face because it
  re-scanned directories.
* Rows arriving later than the watermark for an already-closed window
  are DROPPED, not misfiled: the emitted row for a closed window is
  final. The drop is observable (tests pin a late row excluded from the
  streamed result but present in the batch oracle over the same files,
  plus the state operator's numRowsDroppedByWatermark metric).
  Pinned nuance of this Spark build: WITHIN one trigger run the
  late-row filter is planned with the run-start watermark and does not
  tighten between micro-batches (only eviction/emission follows the
  advancing watermark); the filter engages across runs, where the
  watermark is restored from the checkpoint commit log. Late-data
  guarantees therefore ride the checkpointed restart cadence — exactly
  the batch-with-resume shape streaming/incremental.py runs.
* The group key is (window, source) — low cardinality per trigger, so
  the stateful exchange is small; the windows themselves partition time,
  so state size is O(open windows x sources), independent of input rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_source_bursts(
    df: DataFrame,
    event_time_col: str = "event_ts",
    gap: str = "10 minutes",
    watermark_delay: str = "5 minutes",
) -> DataFrame:
    """Per-source arrival BURSTS via session windows: consecutive
    arrivals closer than ``gap`` merge into one session; a quiet period
    longer than ``gap`` closes it. The session view answers the
    monitoring question tumbling windows can't — "how long did this
    source's ingest burst last, and how much landed in it" — without
    picking a bucket size.

    Works on batch (the test oracle) and streaming inputs; streaming
    append mode emits a session once the watermark passes its close, and
    session state is bounded the same way window state is. Scale shape:
    session merging is a stateful aggregation keyed by source — the
    exchange is the same hash-partition any groupBy(source) needs, and
    open-session state is O(sources)."""
    stream = df.isStreaming
    if stream:
        df = df.withWatermark(event_time_col, watermark_delay)
    w = F.session_window(event_time_col, gap)
    return (
        df.groupBy(w.alias("s"), "source")
        .agg(
            F.count(F.lit(1)).alias("n_seqs"),
            F.min(event_time_col).alias("first_event"),
            F.max(event_time_col).alias("last_event"),
        )
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "source",
            "n_seqs",
            "first_event",
            "last_event",
        )
    )


def windowed_source_stats(
    df: DataFrame,
    event_time_col: str = "event_ts",
    window_duration: str = "10 minutes",
    watermark_delay: str = "5 minutes",
) -> DataFrame:
    """Per-(event-time window, source) arrival statistics.

    Works on both batch and streaming inputs; on a streaming input the
    watermark makes append-mode emit each window once, finalized, and
    bounds the state store. Columns are aliased for the cross-engine
    value compare (window bounds surfaced as plain timestamps)."""
    stream = df.isStreaming
    if stream:
        df = df.withWatermark(event_time_col, watermark_delay)
    w = F.window(event_time_col, window_duration)
    return (
        df.groupBy(w.alias("w"), "source")
        .agg(
            F.count(F.lit(1)).alias("n_seqs"),
            F.sum("n_tok").cast("long").alias("sum_tok"),
            F.min("n_tok").cast("long").alias("min_tok"),
            F.max("n_tok").cast("long").alias("max_tok"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "source",
            "n_seqs",
            "sum_tok",
            "min_tok",
            "max_tok",
        )
    )
