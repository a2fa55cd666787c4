"""Skew handling + join-strategy selection.

The reference has no skew handling and suffers for it: one big session is
one long sequential loop (/root/reference/data_validation.py:1449-1455).
Here skew is handled explicitly (BASELINE.json north_rule):

* AQE skew-join splitting is enabled session-wide (session.py).
* ``with_salt`` adds a deterministic salt column so hot keys (a dominant
  ``source``, a pathological duplicate ``doc_id``) spread over
  ``buckets`` reducers.
* ``salted_join`` implements the explode-replicate pattern for joining a
  skewed fact side against a dimension side.
* ``choose_join`` picks broadcast vs shuffle based on an estimated row
  count — the explicit form of what AQE does at runtime, for when we know
  the manifest side is small (reference analog: the manifest fetched per
  session was always small, /root/reference/data_validation.py:827-829).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default number of salt buckets for hot-key spreading.
DEFAULT_SALT_BUCKETS = 16


def salt_expr(*cols: str | Column, buckets: int = DEFAULT_SALT_BUCKETS) -> Column:
    """Deterministic uniform salt in [0, buckets) from row content.

    Deterministic (no ``rand()``) so re-runs of a resumed job land rows in
    identical buckets — required for the checkpoint idempotence contract.
    """
    return F.pmod(F.xxhash64(*[F.col(c) if isinstance(c, str) else c for c in cols]), F.lit(buckets)).cast("int")


def with_salt(
    df: DataFrame,
    entropy_cols: list[str],
    buckets: int = DEFAULT_SALT_BUCKETS,
    col_name: str = "_salt",
) -> DataFrame:
    return df.withColumn(col_name, salt_expr(*entropy_cols, buckets=buckets))


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "left",
    buckets: int = DEFAULT_SALT_BUCKETS,
    entropy_cols: list[str] | None = None,
) -> DataFrame:
    """Join a skewed fact side to a (replicable) dimension side.

    The fact side gets a content-derived salt; the dimension side is
    exploded ``buckets``-fold so every (key, salt) partition finds its
    match. Join keys become ``on + [_salt]`` so a hot key's rows spread
    across ``buckets`` reducers instead of one.

    Only correct for joins where the dim side may be replicated (each dim
    row matching a fact row exactly once per salt value) — i.e. equi-joins
    where output multiplicity is per-pair, which is all the engine needs.
    """
    entropy = entropy_cols or on
    fact = with_salt(skewed, entropy, buckets)
    replicated = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = fact.join(replicated, on + ["_salt"], how)
    return out.drop("_salt")


def choose_join(
    left: DataFrame,
    right: DataFrame,
    on,
    how: str = "left",
    strategy: str = "auto",
    broadcast_threshold_rows: int = 2_000_000,
    right_rows: int | None = None,
) -> DataFrame:
    """Equi-join with an explicit strategy knob.

    ``auto``: broadcast the right side when its (known or estimated) row
    count is under the threshold, else let Catalyst/AQE pick (sort-merge or
    shuffled-hash at 10^12-row scale). ``broadcast``/``shuffle`` force.
    """
    if strategy == "broadcast":
        return left.join(F.broadcast(right), on, how)
    if strategy == "shuffle":
        return left.join(right.hint("shuffle_hash"), on, how)
    if strategy == "auto":
        if right_rows is not None and right_rows <= broadcast_threshold_rows:
            return left.join(F.broadcast(right), on, how)
        return left.join(right, on, how)
    raise ValueError(f"unknown join strategy: {strategy!r}")
