"""Sequence packing: fixed token-budget training examples from
variable-length tokenized sequences.

The step between a validated corpus and a trainer: concatenate sequences
into examples of at most ``budget`` tokens so attention windows are full
instead of padded. Bin packing is NP-hard; at 10^12 rows the production
shape is GREEDY NEXT-FIT per partition — walk the partition in a
deterministic order, append to the open pack while it fits, close it when
the next sequence would overflow. Next-fit is O(n), single-pass,
streaming-friendly, and carries the classic guarantee that any two
CONSECUTIVE packs sum to more than the budget — i.e. utilization > 50%
even adversarially, and near-perfect on real length distributions (the
fixture packs at >90%).

Scale shape: one optional shuffle (hash-repartition so the packing is a
pure function of doc_id, independent of input file layout) then ONE
mapInPandas pass holding only the open pack's state — O(1) memory beyond
the Arrow batch, no sort, no driver involvement. Pack ids are globally
unique by construction: (spark_partition_id << 32) | local index. The
sequential walk is the documented exception to the no-per-row-Python
rule (same doctrine as dedup._cc_local_finish): next-fit is inherently
order-dependent, each row is O(1) plain-int work, and it runs in tasks.

Reference anchor: the reference sizes file batches against a byte budget
before acting on a session folder (/root/reference/data_validation.py
:1150-1165); this is the same accumulate-until-budget walk, emitted as a
table instead of a loop side effect.

Rows with NULL ``n_tok`` are excluded — an unknown length cannot be
packed; upstream validation reports them as NULL_N_TOK violations.
Sequences longer than the budget get a single-member pack flagged
``oversize`` (truncate vs split is a downstream policy decision).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from np_data_validation_spark.functions.text import portable_hash60


def pack_sequences(
    seq: DataFrame,
    budget: int,
    parts: int | None = None,
    id_col: str = "doc_id",
    len_col: str = "n_tok",
) -> DataFrame:
    """Assign every sequence to a pack of total length <= ``budget``.

    Returns (id_col, len_col, pack_id long, offset long, oversize bool):
    ``offset`` is the sequence's start position inside its pack (prefix
    sum of the lengths packed before it), so a trainer can slice packed
    examples without re-walking. ``parts=None`` repartitions to the
    session default parallelism; ``parts=0`` packs within the existing
    partitions (zero shuffle — use when the input's layout is already a
    deliberate ordering, e.g. curriculum order).

    Determinism caveat (ADVICE r8 packing.py:74): with ``parts=None`` the
    partition count comes from ``defaultParallelism``, so the "packing is
    a pure function of the ids present" guarantee holds only PER session
    configuration — the same corpus packs differently on hosts with
    different core counts. Pass an explicit ``parts`` for cross-run /
    cross-host reproducibility.
    """
    if budget <= 0:
        raise ValueError(f"budget must be > 0, got {budget}")
    d = seq.select(id_col, len_col).filter(F.col(len_col).isNotNull())
    if parts != 0:
        # deterministic order, decoupled from file layout: hash doc_id,
        # route by pmod so the (partition, order) of every row — hence the
        # whole packing — is a pure function of the ids present
        k = parts or seq.sparkSession.sparkContext.defaultParallelism
        d = (
            d.withColumn("_ord", portable_hash60(F.col(id_col).cast("string")))
            .repartition(k, F.pmod(F.col("_ord"), F.lit(k)))
            # full-key sort: duplicate ids (an upstream violation class)
            # may carry different lengths; ties must still order
            # deterministically for the packing to be a pure function
            .sortWithinPartitions("_ord", id_col, len_col)
            .drop("_ord")
        )
    d = d.withColumn("_pid", F.spark_partition_id())
    out_schema = T.StructType(
        [
            d.schema[id_col],
            d.schema[len_col],
            T.StructField("pack_id", T.LongType(), False),
            T.StructField("offset", T.LongType(), False),
            T.StructField("oversize", T.BooleanType(), False),
        ]
    )

    def walk(batches):
        import pandas as pd

        next_idx = 0  # next pack index to allocate in this partition
        open_idx = None  # index of the open (non-oversize) pack
        used = 0  # tokens in the open pack
        base = None  # spark_partition_id << 32
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = int(pdf["_pid"].iloc[0]) << 32
            ids, lens = pdf[id_col].tolist(), pdf[len_col].tolist()
            pack, off, over = [], [], []
            for n in lens:
                n = int(n)
                if n > budget:
                    # oversize: its own immediately-closed pack; the open
                    # pack (if any) stays open for the next sequence
                    pack.append(base | next_idx)
                    next_idx += 1
                    off.append(0)
                    over.append(True)
                    continue
                if open_idx is None or used + n > budget:
                    open_idx = next_idx
                    next_idx += 1
                    used = 0
                pack.append(base | open_idx)
                off.append(used)
                over.append(False)
                used += n
            yield pd.DataFrame(
                {
                    id_col: ids,
                    len_col: lens,
                    "pack_id": pack,
                    "offset": off,
                    "oversize": over,
                }
            )

    return d.mapInPandas(walk, out_schema)
