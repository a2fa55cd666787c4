"""Text analysis + dedup operators on the documents table."""

import pytest
from pyspark.sql import functions as F

from np_data_validation_spark.functions import text as TX
from np_data_validation_spark.operators import dedup as DD

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_text_functions_shapes(spark, docs):
    out = docs.select(
        TX.ws_token_count("text").alias("wt"),
        TX.regex_token_count("text").alias("rt"),
        TX.punct_ratio("text").alias("pr"),
        TX.stopword_ratio("text").alias("sr"),
        TX.quality_score("text").alias("q"),
        TX.lang_id("text").alias("lid"),
        TX.doc_fingerprint("text").alias("fp"),
    ).toPandas()
    assert (out["wt"] > 0).all()
    assert (out["rt"] >= out["wt"]).all()  # regex splits punctuation out
    assert out["pr"].between(0, 1).all()
    assert out["q"].between(0, 1).all()
    assert set(out["lid"]) <= {"en", "de", "es", "fr", "und"}
    assert out["fp"].nunique() > len(out) * 0.9


def test_lang_id_on_clear_samples(spark):
    df = spark.createDataFrame(
        [
            ("the cat is in the house and it is warm",),
            ("der hund ist nicht in das haus und die katze",),
            ("el perro es que la casa y los gatos",),
            ("le chien est dans les maisons et une chatte",),
            ("zzz qqq xxx",),
        ],
        "text string",
    )
    got = [r[0] for r in df.select(TX.lang_id("text")).collect()]
    assert got == ["en", "de", "es", "fr", "und"]


def _with_dups(docs):
    """documents plus mutated copies of every 20th doc (near-dups) and
    verbatim copies of every 50th (exact dups)."""
    near = (
        docs.filter(F.col("doc_id") % 20 == 0)
        .withColumn("doc_id", F.col("doc_id") + 100000)
        .withColumn("text", F.expr("substr(text, 6)"))
    )
    exact = docs.filter(F.col("doc_id") % 50 == 0).withColumn(
        "doc_id", F.col("doc_id") + 200000
    )
    return docs.unionByName(near).unionByName(exact)


def test_exact_duplicates(docs):
    aug = _with_dups(docs)
    groups = DD.exact_duplicates(aug).toPandas()
    n_exact = docs.filter(F.col("doc_id") % 50 == 0).count()
    assert len(groups) == n_exact
    assert (groups["n_docs"] == 2).all()
    kept = DD.exact_dedup_keep_first(aug)
    assert kept.count() == aug.count() - n_exact


def test_minhash_lsh_finds_near_dups(docs):
    aug = _with_dups(docs)
    cand = DD.minhash_lsh_candidates(aug).toPandas()
    # every exact dup pair must be found (identical signatures)
    n_exact = docs.filter(F.col("doc_id") % 50 == 0).count()
    exact_pairs = {
        (i, i + 200000)
        for i in [r[0] for r in docs.filter(F.col("doc_id") % 50 == 0).select("doc_id").collect()]
    }
    found = set(zip(cand["doc_a"], cand["doc_b"]))
    assert exact_pairs <= found
    # most near-dup pairs (5-char prefix removed) should be found
    near_ids = [r[0] for r in docs.filter(F.col("doc_id") % 20 == 0).select("doc_id").collect()]
    near_pairs = {(i, i + 100000) for i in near_ids}
    recall = len(near_pairs & found) / len(near_pairs)
    assert recall >= 0.8, f"near-dup recall {recall}"


def test_jaccard_verify(spark, docs):
    aug = _with_dups(docs)
    cand = DD.minhash_lsh_candidates(aug)
    verified = DD.jaccard_pairs(aug, cand, threshold=0.9).toPandas()
    pairs = set(zip(verified["doc_a"], verified["doc_b"]))
    # exact dups have jaccard 1.0 and survive the verify
    for i in [r[0] for r in docs.filter(F.col("doc_id") % 50 == 0).select("doc_id").collect()]:
        assert (i, i + 200000) in pairs
    assert (verified["jaccard"] >= 0.9).all()


def test_simhash_near_dups(docs):
    aug = _with_dups(docs)
    # exact dups have hamming 0 and must be found
    pairs = DD.simhash_near_dups(aug, max_hamming=3).toPandas()
    found = set(zip(pairs["doc_a"], pairs["doc_b"]))
    exact_ids = [r[0] for r in docs.filter(F.col("doc_id") % 50 == 0).select("doc_id").collect()]
    for i in exact_ids:
        assert (i, i + 200000) in found
    assert (pairs["hamming"] <= 3).all()


def test_simhash_value_stability(spark):
    df = spark.createDataFrame([("hello world foo bar",)], "text string")
    a = df.select(DD.simhash_expr("text").alias("s")).collect()[0]["s"]
    b = df.select(DD.simhash_expr("text").alias("s")).collect()[0]["s"]
    assert a == b
    assert 0 <= a < 2**32
