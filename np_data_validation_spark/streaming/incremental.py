"""Incremental validation over a landing directory via Structured Streaming.

The reference is batch-with-resume (SURVEY.md §2.10) — its closest streaming
analog is "new session folders appear; validate the new ones". Here that is
a file-source stream + ``foreachBatch`` reusing the exact batch operators,
so streaming and batch share one code path (same verdict CASE, same
violation extraction). Checkpointing is Spark's own streaming checkpoint —
exactly-once per micro-batch file set.

``trigger(availableNow=True)`` drains everything currently in the directory
then stops — the scheduled-incremental-ingest pattern; drop it for a
continuously running validator.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from np_data_validation_spark.plans.engine import validate_batch
from np_data_validation_spark.schema import SEQUENCES


def validate_stream(
    spark: SparkSession,
    landing_dir: str,
    manifest: DataFrame,
    out_dir: str,
    hash_method: str = "pandas_udf",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start a streaming validation of parquet files arriving in
    ``landing_dir``; verdicts and violations append under ``out_dir``.
    Returns the StreamingQuery (caller awaits/stops)."""
    reader = spark.readStream.schema(SEQUENCES)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(landing_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        rolled, violations, _ = validate_batch(
            batch_df, manifest, hash_method=hash_method
        )
        rolled.write.mode("append").parquet(os.path.join(out_dir, "verdicts"))
        violations.write.mode("append").parquet(os.path.join(out_dir, "violations"))

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(out_dir, "_stream_checkpoint"))
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
