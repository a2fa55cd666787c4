"""Sources: every way a snapshot or manifest enters the engine.

Reference backends mapped (SURVEY.md §2.1):
* S1/S2 recursive folder scan  -> ``read_sequences`` (recursiveFileLookup)
* S5/S6 shelve/Mongo stores    -> parquet/Iceberg manifest table (the keyed
  store IS the partitioned table; ``read_manifest``)
* S7 JSON flat-file DB         -> ``manifest_from_json`` (explicit schema,
  permissive parse — the reference tolerates malformed entries,
  /root/reference/data_validation.py:944-958)
* S8 openhashtab .sums parser  -> ``manifest_from_sums`` (text + regexp
  projection, /root/reference/data_validation.py:895-933)
* S10 local-dir glob manifest  -> ``glob_manifest`` (listing DataFrame +
  rlike filter, /root/reference/data_getters.py:228-260)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from np_data_validation_spark.schema import MANIFEST, SEQUENCES


def read_sequences(spark: SparkSession, path: str, recursive: bool = True) -> DataFrame:
    """Snapshot scan. Hive-partitioned dirs give partition pruning on
    ``source``; recursiveFileLookup covers loose nested layouts (the
    reference's rglob('*') semantics — but pruning beats walking, so
    partitioned layout is preferred)."""
    reader = spark.read
    if recursive:
        # NB recursiveFileLookup disables hive partition discovery; only use
        # it for non-partitioned layouts.
        try:
            return reader.parquet(path)
        except Exception:
            return reader.option("recursiveFileLookup", "true").parquet(path)
    return reader.parquet(path)


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(MANIFEST).parquet(path)


def manifest_from_json(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines manifest with the explicit MANIFEST schema; malformed rows
    land in nulls rather than failing the scan (PERMISSIVE mode), matching
    the reference's tolerant multi-format JSON load."""
    return (
        spark.read.schema(MANIFEST)
        .option("mode", "PERMISSIVE")
        .json(path)
        .filter(F.col("doc_id").isNotNull())
    )


def manifest_from_sums(
    spark: SparkSession, path: str, default_source: str = "sums"
) -> DataFrame:
    """Parse checksum-list text files: lines of ``<16-hex-hash> <doc_id> <n_tok>``.

    The reference reads openhashtab ``.sums`` files with a 2-line stride
    (checksum line, filename line); the engine's line format carries the
    same payload in one line — a text scan + regexp projection either way.
    Unparseable lines are dropped (reference skips malformed entries).
    """
    lines = spark.read.text(path)
    pat = r"^([0-9a-fA-F]{1,16})\s+(\S+)\s+(\d+)$"
    out = lines.select(
        F.regexp_extract("value", pat, 1).alias("hex_hash"),
        F.regexp_extract("value", pat, 2).alias("doc_id"),
        F.regexp_extract("value", pat, 3).alias("n_tok_str"),
    ).filter(F.col("doc_id") != "")
    return (
        out.select(
            "doc_id",
            F.col("n_tok_str").cast("int").alias("n_tok"),
            F.lpad(F.lower("hex_hash"), 16, "0").alias("_hx"),
            F.lit(default_source).alias("source"),
        )
        # reinterpret 16 hex chars as a signed 64-bit value: two 32-bit
        # halves, two's-complement on the high half (ANSI-safe arithmetic)
        .withColumn("_hi", F.expr("cast(conv(substr(_hx, 1, 8), 16, 10) as bigint)"))
        .withColumn("_lo", F.expr("cast(conv(substr(_hx, 9, 8), 16, 10) as bigint)"))
        .withColumn(
            "tok_hash",
            (
                F.when(F.col("_hi") >= 2147483648, F.col("_hi") - 4294967296)
                .otherwise(F.col("_hi"))
                * F.lit(4294967296)
                + F.col("_lo")
            ).cast("long"),
        )
        .select("doc_id", "n_tok", "tok_hash", "source")
    )


def glob_manifest(
    spark: SparkSession, root: str, name_rlike: str = r".*\.parquet$"
) -> DataFrame:
    """Manifest-of-files from a directory listing (the reference's
    local-dir glob manifest): one row per file with name + size, filtered
    by a regex — a file-listing DataFrame, not an os.walk loop."""
    entries = []
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            full = os.path.join(dirpath, fn)
            entries.append((fn, full, os.path.getsize(full)))
    df = spark.createDataFrame(entries, "name string, path string, size long")
    return df.filter(F.col("name").rlike(name_rlike))


def normalize_ids(df: DataFrame, cols: tuple[str, ...] = ("doc_id", "source")) -> DataFrame:
    """Ingest-time normalization (the reference lower-cases every compare,
    /root/reference/data_validation.py:554 etc.; normalizing once here keeps
    join keys bucketing-friendly instead of wrapping them in lower())."""
    out = df
    for c in cols:
        out = out.withColumn(c, F.lower(F.trim(F.col(c))))
    return out
