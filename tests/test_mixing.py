"""Data-mixing operator: downsample-only reweighting toward a target
source mixture, deterministic and cross-engine reproducible."""

import pytest
from pyspark.sql import functions as F

from np_data_validation_spark.functions import text as TX
from np_data_validation_spark.operators import mixing as MX


@pytest.fixture(scope="module")
def skewed_docs(spark):
    rows = (
        [(i, "a") for i in range(1000)]
        + [(i + 10_000, "b") for i in range(500)]
        + [(i + 20_000, "c") for i in range(250)]
    )
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_mix_rates_binding_source_keeps_everything(skewed_docs):
    # N = min(1000/0.5, 500/0.5) = 1000 -> a keeps 500 (rate 0.5), the
    # binding source b keeps all 500 (rate 1.0)
    rates = MX.mix_rates(skewed_docs, {"a": 0.5, "b": 0.5})
    assert rates == {"a": 500_000, "b": 1_000_000}


def test_mix_rates_rejects_bad_targets(skewed_docs):
    with pytest.raises(ValueError, match="absent from the corpus"):
        MX.mix_rates(skewed_docs, {"a": 0.5, "nope": 0.5})
    with pytest.raises(ValueError, match="must be > 0"):
        MX.mix_rates(skewed_docs, {"a": 1.0, "b": 0.0})
    assert MX.mix_rates(skewed_docs, {}) == {}
    assert MX.mix_corpus(skewed_docs, {}).count() == 0


def test_mix_corpus_hits_target_and_is_deterministic(skewed_docs):
    target = {"a": 0.6, "b": 0.4}
    out = MX.mix_corpus(skewed_docs, target)
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"a", "b"}  # c dropped: not in the target
    total = sum(counts.values())
    # hash sampling is binomial around the rate: allow a few % at n=1250
    for s, p in target.items():
        assert counts[s] / total == pytest.approx(p, abs=0.05)
    # downsample-only: kept rows are a subset of the input
    assert out.join(skewed_docs, ["doc_id", "source"], "left_anti").count() == 0
    # pure function of (key, salt): identical twice, different under a salt
    again = MX.mix_corpus(skewed_docs, target)
    assert out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0
    salted = MX.mix_corpus(skewed_docs, target, salt="|epoch2")
    assert salted.exceptAll(out).count() > 0


def test_mix_corpus_duckdb_picks_the_same_rows(skewed_docs):
    """Engine parity: DuckDB applying the same rates through the shared
    hash twin keeps the EXACT same doc_ids."""
    import duckdb

    target = {"a": 0.35, "b": 0.45, "c": 0.20}
    rates = MX.mix_rates(skewed_docs, target)
    got = sorted(
        r["doc_id"] for r in MX.mix_corpus(skewed_docs, target, salt="|mx").collect()
    )
    pdf = skewed_docs.toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    case = (
        "CASE "
        + " ".join(f"WHEN source = '{s}' THEN {ppm}" for s, ppm in rates.items())
        + " ELSE 0 END"
    )
    want = [
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM docs WHERE "
            f"{TX.hash_sample_predicate_sql('doc_id', case, salt='|mx')} ORDER BY doc_id"
        ).fetchall()
    ]
    assert got == want and len(got) > 0
