"""Stats + drift tests: per-partition stats, HLL sketches, chi2/KS."""

import math

import pytest
from pyspark.sql import functions as F

from np_data_validation_spark.operators import drift as D
from np_data_validation_spark.operators import stats as S


def test_partition_stats(seq_man):
    seq, _, labels = seq_man
    pdf = S.partition_stats(seq).toPandas()
    glob = pdf[pdf["is_global"]]
    per = pdf[~pdf["is_global"]].set_index("source")
    assert len(glob) == 1
    assert int(glob["n_rows"].iloc[0]) == sum(per["n_rows"])
    # hot-source skew is present in the fixture
    assert per["n_rows"].max() > 4 * per["n_rows"].min()
    counts = labels.groupby("source").size()
    dups = (
        labels[labels["case"].isin(["duplicate", "duplicate_mixed"])]
        .groupby("source")
        .size()
    )
    for src in counts.index:
        want = counts[src] + (dups.get(src, 0))
        assert per.loc[src, "n_rows"] == want
    # approx distinct within HLL tolerance
    got = int(glob["doc_id_approx_distinct"].iloc[0])
    true = labels["doc_id"].nunique()
    assert abs(got - true) / true < 0.05


def test_hll_sketch_merge(seq_man):
    seq, _, labels = seq_man
    sketches = S.doc_id_sketches(seq)
    assert sketches.count() == labels["source"].nunique()
    est = S.merge_sketches(sketches).collect()[0]["doc_id_distinct_global"]
    true = labels["doc_id"].nunique()
    assert abs(est - true) / true < 0.05


def test_histograms_merge_to_total(seq_man):
    seq, _, _ = seq_man
    per_src = S.n_tok_histogram(seq, group_col="source")
    total_from_parts = per_src.agg(F.sum("cnt")).collect()[0][0]
    # nulls are excluded from the histogram (no bucket; rate tracked in
    # partition_stats)
    assert total_from_parts == seq.filter(F.col("n_tok").isNotNull()).count()
    glob = S.n_tok_histogram(seq, group_col=None)
    assert glob.agg(F.sum("cnt")).collect()[0][0] == total_from_parts


def test_chi2_math_against_known_values():
    # chi2 sf reference points (R: pchisq(q, df, lower.tail=FALSE))
    assert math.isclose(D.chi2_sf(3.841458820694124, 1), 0.05, rel_tol=1e-6)
    assert math.isclose(D.chi2_sf(18.307038053275146, 10), 0.05, rel_tol=1e-6)
    assert math.isclose(D.chi2_sf(0.0, 5), 1.0)
    assert D.chi2_sf(1000.0, 3) < 1e-10


def test_no_drift_on_identical_distributions(spark, seq_man):
    seq, _, _ = seq_man
    h = S.n_tok_histogram(seq, group_col=None)
    res = D.chi_square_drift(h, h)
    assert res.statistic == pytest.approx(0.0)
    assert res.p_value == pytest.approx(1.0)
    ks = D.ks_drift(h, h)
    assert ks.statistic == pytest.approx(0.0)
    assert not ks.drifted


def test_drift_detected_on_shifted_distribution(spark, seq_man):
    seq, _, _ = seq_man
    h = S.n_tok_histogram(seq, group_col=None)
    shifted = S.n_tok_histogram(
        seq.withColumn("n_tok", F.col("n_tok") + F.lit(200)), group_col=None
    )
    res = D.chi_square_drift(shifted, h)
    assert res.drifted
    ks = D.ks_drift(shifted, h)
    assert ks.drifted
    assert ks.statistic > 0.3


def test_source_histogram_drift(spark, seq_man):
    seq, _, _ = seq_man
    h = S.source_histogram(seq)
    # drop the hot source entirely -> categorical drift
    poisoned = S.source_histogram(seq.filter(F.col("source") != "src_00"))
    res = D.chi_square_drift(poisoned, h, key="source")
    assert res.drifted
