"""Physical-plan shape signatures.

A signature is the ordered operator-name list from the formatted explain
of the pre-execution plan, stripped of codegen ids — a stable shape key:
exchanges, join strategies, scans and aggregates all appear by name, while
data-dependent details (paths, sizes, stats) do not. Used two ways:

* tests/test_plan_shapes.py snapshots every driver-contract query at the
  pinned test config, so a plan regression (a lost broadcast, an extra
  exchange, a join-strategy flip) fails pytest;
* bench.py verifies the headline queries against a bench-config snapshot
  BEFORE timing them, so a bench number can never be recorded against a
  silently changed plan (VERDICT r7 task #5).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_signature(df: DataFrame) -> list[str]:
    jqe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    ops = []
    for line in jqe.explainString(mode).splitlines():
        m = re.match(r"^\(\d+\)\s+(.*)$", line.strip())
        if m is None:
            continue
        name = re.sub(r"\s*\[codegen id : \d+\]\s*$", "", m.group(1)).strip()
        ops.append(name)
    return ops
