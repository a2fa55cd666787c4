"""Custom stateful streaming operator: cumulative per-source arrival
totals via ``applyInPandasWithState``.

The windowed aggregation in streaming/windowed.py covers the built-in
stateful surface; this module covers the CUSTOM one — arbitrary
user-managed state per group key, the Spark-native replacement for the
reference's driver-side progress counters (the ``progressbar`` tallies
threaded through /root/reference/data_validation.py's validate loops):
instead of a single-process counter, each source's running totals live in
the state store, update once per micro-batch from Arrow-batched pandas
frames, and survive restarts through the streaming checkpoint.

Scale shape: state is O(distinct sources) — each group's state is three
numbers, the per-batch work is a pandas sum over that group's rows in
that batch, and the exchange is the same hash-partition-by-key any
groupBy needs. No per-row Python (Arrow batches), no driver-side state.

Semantics pinned by tests/test_sources_streaming.py:

* update-mode emission: one row per (source present in the micro-batch),
  carrying the CUMULATIVE totals after that batch — a monotone prefix-sum
  series whose last row per source equals the batch groupBy oracle over
  the same files;
* state survives both micro-batch boundaries within a run and
  availableNow restarts sharing a checkpoint (the engine's
  batch-with-resume cadence);
* sources absent from a batch emit nothing (their state is untouched).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: (n_batches, n_seqs, sum_tok) — the per-source running state
_STATE_SCHEMA = "n_batches long, n_seqs long, sum_tok long"
_OUTPUT_SCHEMA = (
    "source string, n_batches long, n_seqs_cum long, sum_tok_cum long"
)


def _update_totals(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n_batches, n_seqs, sum_tok = (
        state.get if state.exists else (0, 0, 0)
    )
    rows = 0
    toks = 0
    for pdf in pdfs:
        rows += len(pdf)
        # int(): numpy int64 -> plain int (py4j-safe state update)
        toks += int(pdf["n_tok"].fillna(0).sum())
    n_batches += 1
    n_seqs += rows
    sum_tok += toks
    state.update((n_batches, n_seqs, sum_tok))
    yield pd.DataFrame(
        {
            "source": [key[0]],
            "n_batches": [n_batches],
            "n_seqs_cum": [n_seqs],
            "sum_tok_cum": [sum_tok],
        }
    )


def stateful_source_totals(df: DataFrame) -> DataFrame:
    """Cumulative (n_batches, n_seqs, sum_tok) per source, one emitted row
    per source per micro-batch it appears in. Use with
    ``outputMode("update")``; state never expires (totals are
    whole-stream by design — bounded by the source-id cardinality, not by
    time)."""
    return df.groupBy("source").applyInPandasWithState(
        _update_totals,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
