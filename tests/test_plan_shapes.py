"""Physical-plan regression guards: the optimizations the engine relies on
at 100-TB scale must stay visible in the executed plans — filters reaching
the parquet scan, small sides broadcast, codegen covering the hot
expressions, no sort-merge in the one-pass join."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partition_filter_prunes_scan(spark, seq_man, synth_dataset):
    """source = <hive partition> must become a partition filter, not a
    post-scan filter (resume pruning relies on this)."""
    root, _ = synth_dataset
    import os

    seq = spark.read.parquet(os.path.join(root, "sequences"))
    plan = _plan(seq.filter(F.col("source") == "src_01").select("doc_id"))
    assert "PartitionFilters" in plan and "src_01" in plan


def test_column_pruning_reaches_scan(spark, seq_man):
    """A 2-column projection must not read the token payload."""
    seq, _, _ = seq_man
    plan = _plan(seq.select("doc_id", "n_tok"))
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "tokens" not in read_schema


def test_onepass_join_is_shuffled_hash_with_codegen(spark, seq_man):
    from np_data_validation_spark.plans.onepass import pairs_stage1

    seq, man, _ = seq_man
    plan = _plan(pairs_stage1(seq, man))
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # (codegen spans only render in the post-execution AQE final plan)


def test_probe_broadcasts_missed_side(spark, seq_man, tmp_path):
    from np_data_validation_spark.plans import onepass

    seq, man, _ = seq_man
    s1_path = str(tmp_path / "s1")
    onepass.pairs_stage1(seq, man).write.parquet(s1_path)
    s1 = spark.read.parquet(s1_path)
    probed, n_miss = onepass.probe_pairs_from(spark, s1, man)
    assert n_miss > 0
    assert "BroadcastHashJoin" in _plan(probed)


def test_uniqueness_is_filter_not_aggregation(spark, seq_man, tmp_path):
    """tot_mult precomputation means selecting uniqueness offenders is a
    pushable filter over the identities table, not an agg+broadcast."""
    from np_data_validation_spark.plans import onepass

    seq, man, _ = seq_man
    ids_path = str(tmp_path / "ids")
    s1_path = str(tmp_path / "s1b")
    onepass.pairs_stage1(seq, man).write.parquet(s1_path)
    s1 = spark.read.parquet(s1_path)
    onepass.identity_rows(s1).write.parquet(ids_path)
    ids = spark.read.parquet(ids_path)
    plan = _plan(onepass.uniqueness_violations_from_identities(ids))
    assert "PushedFilters: [IsNotNull(tot_mult), GreaterThan(tot_mult,1)]" in plan
