"""Skew-handling helper tests: salting determinism + salted-join parity."""

from pyspark.sql import functions as F

from np_data_validation_spark.operators import skew


def test_salt_is_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [(f"doc_{i}", "src") for i in range(500)], "doc_id string, source string"
    )
    a = skew.with_salt(df, ["doc_id"], buckets=8).select("doc_id", "_salt").collect()
    b = skew.with_salt(df, ["doc_id"], buckets=8).select("doc_id", "_salt").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    salts = {r["_salt"] for r in a}
    assert salts <= set(range(8))
    assert len(salts) >= 6  # spread, not a constant


def test_salted_join_matches_plain_join(spark):
    # hot key: 'k0' appears 1000x on the fact side
    fact = spark.createDataFrame(
        [(f"k{i % 3}" if i % 2 else "k0", i) for i in range(2000)],
        "k string, v int",
    )
    dim = spark.createDataFrame(
        [("k0", "a"), ("k1", "b"), ("k2", "c"), ("k9", "z")], "k string, d string"
    )
    plain = fact.join(dim, "k", "left").select("k", "v", "d")
    salted = skew.salted_join(fact, dim, ["k"], how="left", buckets=4).select("k", "v", "d")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_inner_join(spark):
    fact = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], "k string, v int")
    dim = spark.createDataFrame([("a", 10)], "k string, w int")
    out = skew.salted_join(fact, dim, ["k"], how="inner", buckets=3).collect()
    assert sorted((r["k"], r["v"], r["w"]) for r in out) == [("a", 1, 10), ("a", 2, 10)]


def test_choose_join_strategies(spark):
    left = spark.createDataFrame([("a", 1)], "k string, v int")
    right = spark.createDataFrame([("a", 2)], "k string, w int")
    for strat, rows in (("broadcast", None), ("shuffle", None), ("auto", 1)):
        out = skew.choose_join(left, right, ["k"], "inner", strategy=strat, right_rows=rows)
        assert out.count() == 1
    # explain shows broadcast for the broadcast strategy
    plan = skew.choose_join(
        left, right, ["k"], "inner", strategy="broadcast"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan
