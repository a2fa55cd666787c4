"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship validation pipeline (scan -> portable content
hash -> manifest join -> ordered CASE verdict classifier -> verdict counts)
on /root/testdata/sf0.001.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2 plus the training-data ops (dedup / similarity / text
analysis); definitions live in np_data_validation_spark/queries.py where
the Spark expressions and their DuckDB SQL twins are built from shared
constants so they cannot drift.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from np_data_validation_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.flagship_verdict_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
