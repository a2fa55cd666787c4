"""Skew-handling helper tests: salting determinism + salted-join parity +
auto-engagement of the salted rollup in the default one-pass plan."""

from pyspark.sql import functions as F

from np_data_validation_spark.functions.hashing import with_tok_hash
from np_data_validation_spark.operators import skew
from np_data_validation_spark.plans import onepass


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


def _hot_dataset(spark, n_rows=1500, hot_copies=400):
    """Snapshot of unique subjects + a manifest where ONE doc_id has
    ``hot_copies`` valid-copy counterparts (the reference's one-big-session
    pathology: a single subject funnels a huge pair group)."""
    rows = [(f"d{i:05d}", [i % 7, i % 11, 5], 3, "src_a") for i in range(n_rows)]
    snap = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )
    hashed = with_tok_hash(snap).select("doc_id", "source", "n_tok", "tok_hash").collect()
    man_rows = [(r["doc_id"], r["n_tok"], r["tok_hash"], "src_a") for r in hashed]
    hot = hashed[0]
    man_rows += [
        (hot["doc_id"], hot["n_tok"], hot["tok_hash"], f"bak_{j:04d}")
        for j in range(hot_copies)
    ]
    man = spark.createDataFrame(
        man_rows, "doc_id string, n_tok int, tok_hash long, source string"
    )
    return snap, man


def test_detect_hot_keys(spark):
    snap, man = _hot_dataset(spark)
    s1 = onepass.pairs_stage1(snap, man)
    assert skew.detect_hot_keys(s1, ("doc_id", "source"), ratio=4.0, min_hot_rows=50)
    uniform = onepass.pairs_stage1(snap, man.filter(~F.col("source").startswith("bak")))
    assert not skew.detect_hot_keys(
        uniform, ("doc_id", "source"), ratio=4.0, min_hot_rows=50
    )


def test_onepass_auto_salting_engages_and_matches(spark, tmp_path):
    """End-to-end: the default plan detects the hot key, engages the salted
    rollup, and produces output identical to the unsalted plan."""
    snap, man = _hot_dataset(spark)
    auto = onepass.validate_onepass(
        spark, snap, man, str(tmp_path / "auto"),
        skew_ratio=4.0, skew_min_hot_rows=50,
    )
    assert auto.salt_buckets_used == skew.DEFAULT_SALT_BUCKETS
    plain = onepass.validate_onepass(
        spark, snap, man, str(tmp_path / "plain"), salt_buckets=None
    )
    assert plain.salt_buckets_used is None
    cols = onepass.ROLLED_PUBLIC_COLS
    key = lambda df: sorted(map(tuple, df.select(*cols).collect()))  # noqa: E731
    assert key(auto.rolled) == key(plain.rolled)


def test_onepass_auto_salting_stays_off_uniform(spark, tmp_path):
    snap, man = _hot_dataset(spark, hot_copies=0)
    res = onepass.validate_onepass(
        spark, snap, man, str(tmp_path / "uni"),
        skew_ratio=4.0, skew_min_hot_rows=50,
    )
    assert res.salt_buckets_used is None


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
