"""Driver-contract query suite: one entry per SURVEY.md §2 operator family,
each as (a) an idiomatic DataFrame-API query over the testdata tables and
(b) an exactly-equivalent DuckDB SQL oracle.

Parity rules that keep value-hash comparison honest:
* every computed column is aliased identically on both sides;
* float outputs are integer-ized with floor(x * 1e6) (no float hashing);
* money aggregations run on integer cents (exact, order-independent);
* the md5-derived 60-bit portable hash is bit-identical in both engines.

The verdict flagship derives a (snapshot, manifest) pair from ``documents``
with deterministic SQL-expressible mutations, so the reference's verdict
semantics (/root/reference/data_validation.py:547-628) are value-checked
end-to-end against DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from np_data_validation_spark.functions import text as TX
from np_data_validation_spark.operators import dedup as DD
from np_data_validation_spark.operators import similarity as SIM
from np_data_validation_spark.operators import verdicts as V

# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


#: (sf_dir, table) -> inferred StructType. Parquet footer/schema inference
#: is driver-serial fixed cost paid at DataFrame CONSTRUCTION — measured
#: ~75 ms per table read, ~0.3 s for a 5-table query like j10 (r9). The
#: schema is metadata, inferred once per input directory from the actual
#: files and reused for every later read of the same table — never a
#: hardcoded guess, so a driver-generated scale factor with a different
#: schema still works.
_SCHEMA_MEMO: dict[tuple[str, str], object] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (sf_dir, name)
    path = f"{sf_dir}/{name}.parquet"
    schema = _SCHEMA_MEMO.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_MEMO[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


def _i6(col):  # float -> stable integer (1e-6 grain)
    return F.floor(col * 1_000_000).cast("long")


I6 = "CAST(floor(({x}) * 1000000) AS BIGINT)"

CENTS = "CAST(round({x} * 100) AS BIGINT)"


def _cents(col):
    return F.round(col * 100).cast("long")


# --- snapshot/manifest derivation for the verdict flagship ----------------
# snapshot: every document; fp = portable 60-bit hash of raw text
# manifest mutations (deterministic; doc_id arithmetic):
#   %13==0 dropped            -> MISSING_COUNTERPART
#   %5 ==0 moved to 'backup'  -> path!= (copy family)
#   %11==0 n+3                -> size mismatch
#   %7 ==0 fp+1               -> hash mismatch


def _snapshot(docs: DataFrame) -> DataFrame:
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("source").alias("source"),
        F.col("n_chars").cast("int").alias("n_tok"),
        TX.portable_hash60("text").alias("tok_hash"),
    )


def _manifest(docs: DataFrame) -> DataFrame:
    return (
        docs.filter(F.col("doc_id") % 13 != 0)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.when(F.col("doc_id") % 5 == 0, F.lit("backup"))
            .otherwise(F.col("source"))
            .alias("source"),
            (
                F.col("n_chars") + F.when(F.col("doc_id") % 11 == 0, 3).otherwise(0)
            ).cast("int").alias("n_tok"),
            (
                TX.portable_hash60("text")
                + F.when(F.col("doc_id") % 7 == 0, 1).otherwise(0)
            ).alias("tok_hash"),
        )
    )


SNAPSHOT_SQL = f"""
SELECT CAST(doc_id AS BIGINT) doc_id, source,
       CAST(n_chars AS INT) n_tok,
       {TX.portable_hash60_sql('text')} tok_hash
FROM documents
"""

MANIFEST_SQL = f"""
SELECT CAST(doc_id AS BIGINT) doc_id,
       CASE WHEN doc_id % 5 = 0 THEN 'backup' ELSE source END source,
       CAST(n_chars + (CASE WHEN doc_id % 11 = 0 THEN 3 ELSE 0 END) AS INT) n_tok,
       {TX.portable_hash60_sql('text')} + (CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) tok_hash
FROM documents WHERE doc_id % 13 != 0
"""

#: SQL twin of operators.verdicts.classify_expr — same ordered CASE, same
#: column naming (s = snapshot side, m_* = manifest side).
VERDICT_CASE_SQL = """
CASE
  WHEN m_doc_id IS NULL AND m_tok_hash IS NULL AND m_n_tok IS NULL THEN 14
  WHEN tok_hash IS NOT NULL AND m_tok_hash IS NOT NULL AND tok_hash = m_tok_hash
       AND n_tok = m_n_tok AND doc_id = m_doc_id AND source = m_source THEN 5
  WHEN n_tok = m_n_tok AND doc_id = m_doc_id AND source = m_source
       AND tok_hash IS NULL AND m_tok_hash IS NOT NULL THEN 6
  WHEN n_tok = m_n_tok AND doc_id = m_doc_id AND source = m_source
       AND tok_hash IS NOT NULL AND m_tok_hash IS NULL THEN 7
  WHEN tok_hash IS NOT NULL AND m_tok_hash IS NOT NULL AND tok_hash = m_tok_hash
       AND n_tok = m_n_tok AND doc_id = m_doc_id AND NOT (source = m_source) THEN 21
  WHEN tok_hash IS NOT NULL AND m_tok_hash IS NOT NULL AND tok_hash = m_tok_hash
       AND n_tok = m_n_tok AND NOT (doc_id = m_doc_id) THEN 22
  WHEN tok_hash IS NOT NULL AND m_tok_hash IS NOT NULL AND doc_id = m_doc_id
       AND NOT (source = m_source) AND NOT (n_tok = m_n_tok)
       AND NOT (tok_hash = m_tok_hash) THEN 11
  WHEN tok_hash IS NOT NULL AND m_tok_hash IS NOT NULL AND doc_id = m_doc_id
       AND NOT (source = m_source) AND NOT (n_tok = m_n_tok)
       AND tok_hash = m_tok_hash THEN 12
  WHEN tok_hash IS NOT NULL AND m_tok_hash IS NOT NULL AND doc_id = m_doc_id
       AND NOT (source = m_source) AND n_tok = m_n_tok
       AND NOT (tok_hash = m_tok_hash) THEN 13
  WHEN tok_hash IS NOT NULL AND m_tok_hash IS NOT NULL AND tok_hash = m_tok_hash
       AND NOT (n_tok = m_n_tok) AND NOT (doc_id = m_doc_id) THEN 10
  WHEN tok_hash IS NOT NULL AND m_tok_hash IS NOT NULL
       AND NOT (tok_hash = m_tok_hash) AND NOT (n_tok = m_n_tok)
       AND NOT (doc_id = m_doc_id) THEN 0
  ELSE -1
END
"""

PAIRS_SQL = f"""
WITH s AS ({SNAPSHOT_SQL}), m AS ({MANIFEST_SQL}),
j AS (
  SELECT s.doc_id, s.source, s.n_tok, s.tok_hash,
         m.doc_id m_doc_id, m.source m_source, m.n_tok m_n_tok, m.tok_hash m_tok_hash
  FROM s LEFT JOIN m ON s.doc_id = m.doc_id
)
SELECT j.*, {VERDICT_CASE_SQL} AS verdict_code FROM j
"""


def _pairs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    snap, man = _snapshot(docs), _manifest(docs)
    m = man.select(
        F.col("doc_id").alias("m_doc_id"),
        F.col("source").alias("m_source"),
        F.col("n_tok").alias("m_n_tok"),
        F.col("tok_hash").alias("m_tok_hash"),
    )
    j = snap.join(m, snap.doc_id == m.m_doc_id, "left")
    return j.withColumn("verdict_code", V.classify_expr())


def _augmented_docs(docs: DataFrame) -> DataFrame:
    """documents + near-dup copies (%20: 5-char prefix cut) + exact copies
    (%50) — deterministic in both engines. Planted ids live in disjoint
    MIRRORED negative spaces (near: odd -(2*id+1), exact: even -(2*id+2))
    rather than additive offsets: real doc_ids are non-negative, so the
    plants can never collide with a real document at any scale factor
    (an additive +100000 offset collided once the table reached 100000
    rows)."""
    near = (
        docs.filter(F.col("doc_id") % 20 == 0)
        .withColumn("doc_id", -(F.col("doc_id") * 2 + 1))
        .withColumn("text", F.expr("substr(text, 6)"))
    )
    exact = docs.filter(F.col("doc_id") % 50 == 0).withColumn(
        "doc_id", -(F.col("doc_id") * 2 + 2)
    )
    return docs.unionByName(near).unionByName(exact)


AUG_DOCS_SQL = """
SELECT * FROM documents
UNION ALL
SELECT -(doc_id * 2 + 1) doc_id, substr(text, 6) AS "text", lang, source, n_chars
FROM documents WHERE doc_id % 20 = 0
UNION ALL
SELECT -(doc_id * 2 + 2) doc_id, text, lang, source, n_chars
FROM documents WHERE doc_id % 50 = 0
"""

# NB: AUG_DOCS_SQL column order must match the parquet schema
# (doc_id, text, lang, source, n_chars) — verified in tests.


# ---------------------------------------------------------------------------
# the query + oracle registry
# ---------------------------------------------------------------------------

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# --- flagship: J2 verdict classifier ---------------------------------------


@q(
    "flagship_verdict_counts",
    f"SELECT verdict_code, count(*) AS n FROM ({PAIRS_SQL}) GROUP BY verdict_code",
)
def flagship_verdict_counts(spark, sf_dir):
    """S1 scan -> P-projections -> J1 keyed join -> J2 CASE classifier ->
    A3 group-by. The engine's flagship pipeline, value-checked vs DuckDB."""
    return _pairs_df(spark, sf_dir).groupBy("verdict_code").agg(
        F.count(F.lit(1)).alias("n")
    )


@q(
    "j5_invalid_band_rows",
    f"""SELECT doc_id, verdict_code FROM ({PAIRS_SQL})
        WHERE verdict_code BETWEEN 10 AND 13""",
)
def j5_invalid_band_rows(spark, sf_dir):
    """J5: invalid-copy band extraction (reference strategies.py:51-61)."""
    p = _pairs_df(spark, sf_dir)
    return p.filter(F.col("verdict_code").between(10, 13)).select(
        "doc_id", "verdict_code"
    )


@q(
    "j6_missing_anti_join",
    f"""WITH s AS ({SNAPSHOT_SQL}), m AS ({MANIFEST_SQL})
        SELECT s.doc_id FROM s ANTI JOIN m ON s.doc_id = m.doc_id""",
)
def j6_missing_anti_join(spark, sf_dir):
    """J6: missing-counterpart anti-join."""
    docs = _t(spark, sf_dir, "documents")
    return _snapshot(docs).join(_manifest(docs), "doc_id", "left_anti").select("doc_id")


@q(
    "j7_size_prefilter_probe",
    f"""WITH s AS ({SNAPSHOT_SQL}), m AS ({MANIFEST_SQL})
        SELECT s.doc_id, CAST(s.tok_hash = m.tok_hash AS INT) AS hash_match
        FROM s JOIN m ON s.n_tok = m.n_tok AND s.doc_id != m.doc_id""",
)
def j7_size_prefilter_probe(spark, sf_dir):
    """J7: cheap size-equality prefilter join, then expensive hash compare
    (reference data_validation.py:1256-1266)."""
    docs = _t(spark, sf_dir, "documents")
    s, m = _snapshot(docs), _manifest(docs)
    m2 = m.select(
        F.col("doc_id").alias("m_doc_id"),
        F.col("n_tok").alias("m_n_tok"),
        F.col("tok_hash").alias("m_tok_hash"),
    )
    return (
        s.join(m2, (s.n_tok == m2.m_n_tok) & (s.doc_id != m2.m_doc_id))
        .select(
            "doc_id",
            (F.col("tok_hash") == F.col("m_tok_hash")).cast("int").alias("hash_match"),
        )
    )


@q(
    "j8_exchange_coalesce",
    f"""WITH s AS (SELECT doc_id, source, n_tok,
                    CASE WHEN doc_id % 3 = 0 THEN NULL ELSE tok_hash END tok_hash
                   FROM ({SNAPSHOT_SQL})),
         m AS ({MANIFEST_SQL})
        SELECT s.doc_id, coalesce(s.tok_hash, m.tok_hash) AS tok_hash
        FROM s LEFT JOIN m ON s.doc_id = m.doc_id""",
)
def j8_exchange_coalesce(spark, sf_dir):
    """J8: checksum-exchange join — reuse the manifest's hash when the
    subject lacks one (reference strategies.py:73-92)."""
    docs = _t(spark, sf_dir, "documents")
    s = _snapshot(docs).withColumn(
        "tok_hash",
        F.when(F.col("doc_id") % 3 == 0, F.lit(None)).otherwise(F.col("tok_hash")),
    )
    m = _manifest(docs).select(
        F.col("doc_id").alias("m_doc_id"), F.col("tok_hash").alias("m_tok_hash")
    )
    return s.join(m, s.doc_id == m.m_doc_id, "left").select(
        "doc_id", F.coalesce("tok_hash", "m_tok_hash").alias("tok_hash")
    )


# --- classic joins on the TPC-H-ish tables ---------------------------------


@q(
    "j1_keyed_lookup_join",
    f"""SELECT c.c_mktsegment AS segment, count(*) AS n_orders,
               CAST(sum({CENTS.format(x='o.o_totalprice')}) AS BIGINT) AS total_cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment""",
)
def j1_keyed_lookup_join(spark, sf_dir):
    """J1: keyed equi-join (broadcast dim) + aggregation on integer cents."""
    o, c = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_cents(F.col("o_totalprice"))).alias("total_cents"),
        )
    )


@q(
    "j3_anti_join_new_only",
    "SELECT c_custkey FROM customer ANTI JOIN orders ON c_custkey = o_custkey",
)
def j3_anti_join_new_only(spark, sf_dir):
    """J3: dedup-on-insert anti-join (customers with no orders)."""
    o, c = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


@q(
    "j4_semi_join_valid",
    """SELECT o_orderkey FROM orders SEMI JOIN lineitem
       ON o_orderkey = l_orderkey AND l_returnflag = 'R'""",
)
def j4_semi_join_valid(spark, sf_dir):
    """J4: valid-copy semi-join (orders with >=1 returned lineitem)."""
    o, l = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    return o.join(
        l.filter(F.col("l_returnflag") == "R"),
        o.o_orderkey == l.l_orderkey,
        "left_semi",
    ).select("o_orderkey")


@q(
    "j10_multiway_join",
    f"""SELECT r.r_name AS region, n.n_name AS nation,
               CAST(sum({CENTS.format(x='l.l_extendedprice')}) AS BIGINT) AS price_cents,
               count(*) AS n_items
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name""",
)
def j10_multiway_join(spark, sf_dir):
    """J10: multi-way star join (fact -> dims), broadcast dims."""
    l, o = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    c, n, r = (
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"),
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(_cents(F.col("l_extendedprice"))).alias("price_cents"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --- aggregations -----------------------------------------------------------


@q(
    "a1_partition_tally",
    "SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars FROM documents GROUP BY source",
)
def a1_partition_tally(spark, sf_dir):
    """A1: per-partition bytes/count tally (reference clear() sums)."""
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


@q(
    "a2_group_consistency",
    f"""WITH m2 AS (
          SELECT doc_id, tok_hash FROM ({MANIFEST_SQL})
          UNION ALL
          SELECT doc_id, tok_hash + 9 FROM ({MANIFEST_SQL}) WHERE doc_id % 19 = 0
        )
        SELECT doc_id, count(DISTINCT tok_hash) AS n_hashes
        FROM m2 GROUP BY doc_id HAVING count(DISTINCT tok_hash) > 1""",
)
def a2_group_consistency(spark, sf_dir):
    """A2: all-same-checksum consistency groups (injected conflicts)."""
    man = _manifest(_t(spark, sf_dir, "documents")).select("doc_id", "tok_hash")
    conflicted = man.filter(F.col("doc_id") % 19 == 0).withColumn(
        "tok_hash", F.col("tok_hash") + 9
    )
    return (
        man.unionByName(conflicted)
        .groupBy("doc_id")
        .agg(F.countDistinct("tok_hash").alias("n_hashes"))
        .filter(F.col("n_hashes") > 1)
    )


@q(
    "a4_rollup_stats",
    f"""SELECT coalesce(source, '__all__') AS source, count(*) AS n_rows,
               min(n_chars) AS min_chars, max(n_chars) AS max_chars,
               {I6.format(x='avg(n_chars)')} AS avg_chars_i6
        FROM documents GROUP BY ROLLUP(source)""",
)
def a4_rollup_stats(spark, sf_dir):
    """Stats rollup: per-source + global in one pass (grouping sets)."""
    return (
        _t(spark, sf_dir, "documents")
        .rollup("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            _i6(F.avg("n_chars")).alias("avg_chars_i6"),
        )
        .withColumn("source", F.coalesce("source", F.lit("__all__")))
        .select("source", "n_rows", "min_chars", "max_chars", "avg_chars_i6")
    )


@q(
    "a5_histogram",
    """SELECT CAST(floor(n_chars / 50) AS BIGINT) AS bucket, count(*) AS cnt
       FROM documents GROUP BY bucket""",
)
def a5_histogram(spark, sf_dir):
    """Fixed-width histogram (drift input; mergeable partials)."""
    return (
        _t(spark, sf_dir, "documents")
        .groupBy(F.floor(F.col("n_chars") / 50).cast("long").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# --- windows ---------------------------------------------------------------


@q(
    "w1_latest_per_key",
    """SELECT o_custkey, o_orderkey FROM (
         SELECT o_custkey, o_orderkey,
                row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate DESC, o_orderkey DESC) rn
         FROM orders) WHERE rn = 1""",
)
def w1_latest_per_key(spark, sf_dir):
    """W1: latest record per key (the reference's 'last match wins').

    r9 (guide §2.3, aggregate before you shuffle): expressed as ONE
    map-side-combined max over struct(o_orderdate, o_orderkey) instead of
    a row_number window — the lexicographic struct max IS the first row
    under ORDER BY (o_orderdate DESC, o_orderkey DESC), row for row (the
    frozen window-form oracle pins that equivalence; null dates lose the
    max exactly as desc_nulls_last ranks them last). The window form
    paid two sorts around the exchange (WindowGroupLimit already kept
    shuffle volume down); the agg form is sort-free and shuffles one
    partial row per (key, mapper)."""
    latest = F.max(F.struct("o_orderdate", "o_orderkey")).alias("_latest")
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(latest)
        .select("o_custkey", F.col("_latest.o_orderkey").alias("o_orderkey"))
    )


@q(
    "w2_dedup_representatives",
    f"""WITH aug AS ({AUG_DOCS_SQL}),
         fp AS (SELECT doc_id, {TX.portable_hash60_sql(TX.normalize_text_sql('text'))} fp FROM aug)
        SELECT fp, min(doc_id) AS keeper, count(*) AS n_docs
        FROM fp GROUP BY fp HAVING count(*) > 1""",
)
def w2_dedup_representatives(spark, sf_dir):
    """W2/T1: duplicate-group reduction to one representative."""
    aug = _augmented_docs(_t(spark, sf_dir, "documents"))
    return (
        aug.select("doc_id", TX.doc_fingerprint("text").alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


@q(
    "w3_running_total",
    f"""SELECT o_custkey, o_orderkey,
               CAST(sum({CENTS.format(x='o_totalprice')})
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents
        FROM orders""",
)
def w3_running_total(spark, sf_dir):
    """Frame-spec window: running spend per customer."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(_cents(F.col("o_totalprice"))).over(w).alias("running_cents"),
    )


# --- sort / limit / set ops -------------------------------------------------


@q(
    "o1_global_topk",
    f"""SELECT l_orderkey, l_linenumber, {CENTS.format(x='l_extendedprice')} AS price_cents
        FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20""",
)
def o1_global_topk(spark, sf_dir):
    """O1-O3: global top-k with total tiebreak (deterministic)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(20)
        .select(
            "l_orderkey",
            "l_linenumber",
            _cents(F.col("l_extendedprice")).alias("price_cents"),
        )
    )


@q(
    "t1_distinct",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def t1_distinct(spark, sf_dir):
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@q(
    "t4_intersect_except",
    """SELECT n_nationkey FROM
       ((SELECT c_nationkey AS n_nationkey FROM customer
         INTERSECT SELECT s_nationkey FROM supplier)
        EXCEPT SELECT n_nationkey FROM nation WHERE n_regionkey = 0)""",
)
def t4_intersect_except(spark, sf_dir):
    """T4: relational intersect/except."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n_nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n_nationkey"))
    n0 = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 0)
        .select("n_nationkey")
    )
    return c.intersect(s).exceptAll(n0).distinct()


# --- projections / filters / scalar functions -------------------------------


@q(
    "p1_regex_key_extract",
    """SELECT CAST(regexp_extract(source, 'src([0-9]+)', 1) AS INT) AS src_num,
              count(*) AS n
       FROM documents GROUP BY src_num""",
)
def p1_regex_key_extract(spark, sf_dir):
    """P1: regex key extraction (the session-key parse)."""
    return (
        _t(spark, sf_dir, "documents")
        .select(
            F.regexp_extract("source", "src([0-9]+)", 1).cast("int").alias("src_num")
        )
        .groupBy("src_num")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@q(
    "p8_age_gate",
    """SELECT event_type, count(*) AS n FROM events
       WHERE ts < TIMESTAMP '2024-01-15 00:00:00' GROUP BY event_type""",
)
def p8_age_gate(spark, sf_dir):
    """P8: age-gate filter on timestamps."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@q(
    "f_string_funcs",
    """SELECT upper(substr(c_name, 1, 4)) AS prefix,
              count(*) AS n, CAST(sum(length(c_name)) AS BIGINT) AS total_len
       FROM customer GROUP BY prefix""",
)
def f_string_funcs(spark, sf_dir):
    return (
        _t(spark, sf_dir, "customer")
        .select(
            F.upper(F.substring("c_name", 1, 4)).alias("prefix"),
            F.length("c_name").alias("_len"),
        )
        .groupBy("prefix")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_len").alias("total_len"))
    )


@q(
    "f_date_funcs",
    """SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, count(*) AS n
       FROM orders WHERE o_orderdate >= TIMESTAMP '2024-01-10 00:00:00'
       GROUP BY day""",
)
def f_date_funcs(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
        .select(F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@q(
    "f_json_extract",
    """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod, count(*) AS n
       FROM events GROUP BY k_mod""",
)
def f_json_extract(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .select(
            (F.get_json_object("props", "$.k").cast("int") % 10).alias("k_mod")
        )
        .groupBy("k_mod")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- text analysis ----------------------------------------------------------


@q(
    "tx_token_counts",
    f"""SELECT doc_id, {TX.ws_token_count_sql('text')} AS ws_tokens,
               {TX.regex_token_count_sql('text')} AS re_tokens
        FROM documents""",
)
def tx_token_counts(spark, sf_dir):
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        TX.ws_token_count("text").alias("ws_tokens"),
        TX.regex_token_count("text").alias("re_tokens"),
    )


@q(
    "tx_quality_scores",
    f"""SELECT source, {I6.format(x=f'avg({TX.quality_score_sql("text")})')} AS avg_quality_i6,
               count(*) AS n
        FROM documents GROUP BY source""",
)
def tx_quality_scores(spark, sf_dir):
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            _i6(F.avg(TX.quality_score("text"))).alias("avg_quality_i6"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@q(
    "tx_repetition",
    f"""SELECT doc_id, {I6.format(x=TX.repetition_ratio_sql('text'))} AS rep_i6
        FROM documents""",
)
def tx_repetition(spark, sf_dir):
    """Within-doc n-gram repetition ratio (the degenerate-text signal
    quality filters threshold on). Row-local; value-checked at 1e-6
    grain."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id", _i6(TX.repetition_ratio("text")).alias("rep_i6")
    )


#: deterministic per-source sampling rates (parts-per-million) for the
#: data-mixing query — src0 upsampled, src1 half, everything else light
_MIX_RATES_SQL = (
    "CASE source WHEN 'src0' THEN 500000 WHEN 'src1' THEN 250000 ELSE 125000 END"
)


@q(
    "tx_hash_sample",
    f"""SELECT doc_id, source FROM documents
        WHERE {TX.hash_sample_predicate_sql('doc_id', _MIX_RATES_SQL, salt='|mix1')}""",
)
def tx_hash_sample(spark, sf_dir):
    """Reproducible data-mixing sample: per-source rates applied through a
    deterministic hash predicate, so the selected rows are a pure function
    of (doc_id, salt) — identical across re-runs, partitionings, and
    engines (the DuckDB oracle picks the exact same rows). A filter, not a
    shuffle; at 100 TB this is a scan that emits the kept fraction."""
    rates = (
        F.when(F.col("source") == "src0", 500000)
        .when(F.col("source") == "src1", 250000)
        .otherwise(125000)
    )
    docs = _t(spark, sf_dir, "documents")
    return docs.filter(TX.hash_sample_predicate("doc_id", rates, salt="|mix1")).select(
        "doc_id", "source"
    )


@q(
    "tx_pii_flags",
    f"""WITH aug AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 23 = 0 THEN
                   text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com or call 555-123-'
                        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE text END AS text
          FROM documents)
        SELECT doc_id, {TX.pii_email_count_sql('text')} AS n_email,
               {TX.pii_phone_count_sql('text')} AS n_phone
        FROM aug WHERE {TX.pii_email_count_sql('text')} + {TX.pii_phone_count_sql('text')} > 0""",
)
def tx_pii_flags(spark, sf_dir):
    """PII detection (email/phone counts) — the scrub-before-training
    stage. The synthetic corpus contains no PII, so every 23rd document
    gets a deterministic planted email+phone appended (same expression in
    the DuckDB oracle); the query returns exactly the flagged docs with
    their match counts. Row-local regexp_count — a scan-shaped filter at
    100 TB."""
    docs = _t(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-123-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    aug = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 23 == 0, planted).otherwise(F.col("text")).alias("text"),
    )
    out = aug.select(
        "doc_id",
        TX.pii_email_count("text").alias("n_email"),
        TX.pii_phone_count("text").alias("n_phone"),
    )
    return out.filter(F.col("n_email") + F.col("n_phone") > 0)


@q(
    "tx_langid_confusion",
    f"""SELECT lang, {TX.lang_id_sql('text')} AS predicted, count(*) AS n
        FROM documents GROUP BY lang, predicted""",
)
def tx_langid_confusion(spark, sf_dir):
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("lang", TX.lang_id("text").alias("predicted"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@q(
    "tx_fingerprints",
    f"SELECT doc_id, {TX.doc_fingerprint_sql('text')} AS fp FROM documents",
)
def tx_fingerprints(spark, sf_dir):
    return _t(spark, sf_dir, "documents").select(
        "doc_id", TX.doc_fingerprint("text").alias("fp")
    )


# --- dedup ------------------------------------------------------------------


@q(
    "dd_exact_dup_groups",
    f"""WITH aug AS ({AUG_DOCS_SQL})
        SELECT {TX.doc_fingerprint_sql('text')} AS fp, count(*) AS n_docs,
               min(doc_id) AS first_doc
        FROM aug GROUP BY fp HAVING count(*) > 1""",
)
def dd_exact_dup_groups(spark, sf_dir):
    aug = _augmented_docs(_t(spark, sf_dir, "documents"))
    return (
        aug.select("doc_id", TX.doc_fingerprint("text").alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc"))
        .filter(F.col("n_docs") > 1)
    )


def _minhash_bands_sql(
    k: int = DD.MINHASH_K,
    bands: int = DD.MINHASH_BANDS,
    aug_sql: str = AUG_DOCS_SQL,
) -> str:
    r = k // bands
    mh_cols = ", ".join(
        f"{DD.minhash_sql('text', i)} AS mh_{i}" for i in range(k)
    )
    band_rows = " UNION ALL ".join(
        f"""SELECT doc_id, {b} AS band,
            {TX.portable_hash60_sql(' || '.join([f"CAST(mh_{b * r + j} AS VARCHAR)" if j == 0 else f"',' || CAST(mh_{b * r + j} AS VARCHAR)" for j in range(r)]))} AS band_hash
            FROM sig"""
        for b in range(bands)
    )
    return f"WITH aug AS ({aug_sql}), sig AS (SELECT doc_id, {mh_cols} FROM aug) {band_rows}"


@q(
    "dd_minhash_lsh_pairs",
    f"""WITH bandsl AS ({_minhash_bands_sql()})
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bandsl a JOIN bandsl b ON a.band = b.band AND a.band_hash = b.band_hash
        WHERE a.doc_id < b.doc_id""",
)
def dd_minhash_lsh_pairs(spark, sf_dir):
    aug = _augmented_docs(_t(spark, sf_dir, "documents"))
    return DD.minhash_lsh_candidates(aug, max_bucket=None)


@q(
    "dd_simhash_values",
    f"""WITH aug AS ({AUG_DOCS_SQL})
        SELECT doc_id, {DD.simhash_sql('text')} AS simhash FROM aug""",
)
def dd_simhash_values(spark, sf_dir):
    aug = DD.ensure_cpu_splits(_augmented_docs(_t(spark, sf_dir, "documents")))
    return aug.select("doc_id", DD.simhash_expr("text").alias("simhash"))


#: hot-bucket cap used by the PIPELINE queries (cluster / dedup corpus):
#: the production guard against quadratic bucket blowup on
#: boilerplate-heavy corpora (at sf0.1 the template-generated synthetic
#: corpus puts up to 715 docs in one band bucket — 1.36M candidate pairs
#: uncapped vs 163k at cap 100; at sf0.01 every bucket is already <= 100,
#: so the cap is a no-op there). The raw-semantics queries
#: (dd_minhash_lsh_pairs, dd_jaccard_verified) stay uncapped so the
#: uncapped LSH contract is value-checked too.
DD_PIPELINE_MAX_BUCKET = 100


def _verified_pairs_sql(
    aug_sql: str = AUG_DOCS_SQL, max_bucket: int | None = None
) -> str:
    """LSH-candidate pairs verified at Jaccard >= 0.8 over the doc set
    ``aug_sql`` — shared by the dd_jaccard_verified oracle, (as the edge
    list) the transitive clustering oracle, and (over the exact-survivor
    set) the dedup-corpus oracle, so none of them can desynchronize.
    ``max_bucket`` models the Spark side's hot-bucket cap: buckets with
    more than that many docs are dropped BEFORE pairing (a count window
    over the same (band, band_hash) key)."""
    band_src = "bandsl"
    cap_cte = ""
    if max_bucket:
        cap_cte = f""",
         bandc AS (SELECT doc_id, band, band_hash,
                          count(*) OVER (PARTITION BY band, band_hash) AS _n
                   FROM bandsl)"""
        band_src = f"(SELECT doc_id, band, band_hash FROM bandc WHERE _n <= {max_bucket})"
    return f"""WITH aug AS ({aug_sql}),
         sh AS (SELECT doc_id, {DD.shingle_hashes_sql('text')} AS sh FROM aug),
         bandsl AS ({_minhash_bands_sql(aug_sql=aug_sql)}){cap_cte},
         cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                  FROM {band_src} a JOIN {band_src} b
                    ON a.band = b.band AND a.band_hash = b.band_hash
                  WHERE a.doc_id < b.doc_id)
        SELECT doc_a, doc_b,
               {I6.format(x="jc")} AS jaccard_i6
        FROM (SELECT doc_a, doc_b,
                     len(list_intersect(x.sh, y.sh)) /
                       (len(x.sh) + len(y.sh)
                        - len(list_intersect(x.sh, y.sh))) AS jc
              FROM cand JOIN sh x ON cand.doc_a = x.doc_id
                        JOIN sh y ON cand.doc_b = y.doc_id) j
        WHERE jc >= 0.8"""


_VERIFIED_PAIRS_SQL = _verified_pairs_sql()


def _verified_pairs_df(spark, sf_dir, max_bucket: int | None = None) -> DataFrame:
    aug = _augmented_docs(_t(spark, sf_dir, "documents"))
    cand = DD.minhash_lsh_candidates(aug, max_bucket=max_bucket)
    return DD.jaccard_pairs(aug, cand, threshold=0.8)


@q("dd_jaccard_verified", _VERIFIED_PAIRS_SQL)
def dd_jaccard_verified(spark, sf_dir):
    out = _verified_pairs_df(spark, sf_dir)
    return out.select("doc_a", "doc_b", _i6(F.col("jaccard")).alias("jaccard_i6"))


@q(
    "dd_cluster_keep_one",
    DD.cluster_keep_one_sql(
        _verified_pairs_sql(max_bucket=DD_PIPELINE_MAX_BUCKET)
    ),
)
def dd_cluster_keep_one(spark, sf_dir):
    """Transitive near-dup clustering over the verified candidate pairs
    (VERDICT r7 task #2): alternating large-star/small-star connected
    components close the pairwise relation into equivalence classes, then
    a keep-one policy marks the minimum doc_id of each cluster — the
    distributed closure of the reference's unique-hits reduction
    (/root/reference/data_validation.py:1274-1284). The DuckDB oracle is
    a recursive CTE over the SAME pairs SQL, so transitivity itself is
    value-checked (a 3-hop chain A~B~C must land A, B and C in one
    cluster even though A and C share no shingles — pinned by
    tests/test_text_dedup.py as well). Runs the production hot-bucket cap
    (DD_PIPELINE_MAX_BUCKET, modeled identically in the oracle's count
    window): at sf0.01 the cap is a no-op, at sf0.1 it is the difference
    between 163k and 1.36M candidate pairs."""
    pairs = _verified_pairs_df(spark, sf_dir, max_bucket=DD_PIPELINE_MAX_BUCKET)
    return DD.cluster_keep_one(pairs)


@q(
    "dd_dedup_corpus",
    DD.dedup_corpus_sql(
        AUG_DOCS_SQL,
        _verified_pairs_sql(
            "SELECT doc_id, text FROM surv", max_bucket=DD_PIPELINE_MAX_BUCKET
        ),
    ),
)
def dd_dedup_corpus(spark, sf_dir):
    """The full production dedup stage end to end (exact pre-pass →
    MinHash/LSH/Jaccard near-dup pairs over the exact survivors →
    transitive clustering → keep-one): every augmented doc labeled
    ('keep' | 'exact' | 'near'). The DuckDB twin composes the SAME shared
    builders over the SAME survivor set (window on the shared content
    fingerprint, recursive-CTE closure), so each stage's attrition is
    value-checked, not just the final corpus size."""
    aug = _augmented_docs(_t(spark, sf_dir, "documents"))
    return DD.dedup_corpus(aug, max_bucket=DD_PIPELINE_MAX_BUCKET)


@q(
    "dd_contamination",
    f"""WITH bench AS (SELECT * FROM documents WHERE doc_id % 17 = 0),
         corpus AS (
           SELECT doc_id, text FROM documents WHERE doc_id % 17 <> 0
           UNION ALL
           SELECT -(doc_id + 1) AS doc_id, substr(text, 6) AS text FROM bench),
         bsh AS (SELECT DISTINCT unnest({DD.word_ngram_hashes_sql('text')}) AS sh
                 FROM bench),
         csh AS (SELECT doc_id, {DD.word_ngram_hashes_sql('text')} AS shs
                 FROM corpus),
         ex AS (SELECT doc_id, len(shs) AS n_shingles, unnest(shs) AS sh FROM csh)
        SELECT doc_id, n_shingles, count(*) AS n_matched
        FROM ex WHERE sh IN (SELECT sh FROM bsh)
        GROUP BY doc_id, n_shingles""",
)
def dd_contamination(spark, sf_dir):
    """Benchmark decontamination: documents with doc_id % 17 == 0 play the
    eval suite; the training corpus is everything else PLUS planted leaks
    (eval docs re-inserted under the mirrored id -(doc_id+1) — real ids
    are non-negative, so the plant can never collide with a real corpus
    doc at any scale — with a 5-char prefix cut, so partial leaks must
    still be caught). The eval shingle set is broadcast; the corpus never
    shuffles (see operators/dedup.py:contamination_overlap for the 100-TB
    shape)."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    leaked = (
        bench.withColumn("doc_id", -(F.col("doc_id") + 1))
        .withColumn("text", F.expr("substr(text, 6)"))
        .select("doc_id", "text")
    )
    corpus = docs.filter(F.col("doc_id") % 17 != 0).select("doc_id", "text").unionByName(leaked)
    return DD.contamination_overlap(corpus, bench, n=DD.CONTAM_NGRAM_N, min_overlap=1)


# --- similarity ---------------------------------------------------------------


@q(
    "sim_cosine_topk",
    f"""WITH q AS (SELECT vec_id query_id, embedding qv FROM embeddings WHERE vec_id < 5),
         scored AS (
           SELECT q.query_id, e.vec_id neighbor_id,
                  list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) cosine
           FROM embeddings e, q WHERE e.vec_id != q.query_id)
        SELECT query_id, neighbor_id, rank FROM (
          SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id) rank
          FROM scored) WHERE rank <= 3""",
)
def sim_cosine_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    out = SIM.brute_force_topk(emb, q, k=3)
    return out.select("query_id", "neighbor_id", "rank")


@q(
    "sim_near_dup_pairs",
    f"""WITH aug AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT -(vec_id + 1), embedding FROM embeddings WHERE vec_id % 40 = 0)
        SELECT a.vec_id id_a, b.vec_id id_b
        FROM aug a JOIN aug b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.999""",
)
def sim_near_dup_pairs(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # mirrored negative plant ids — collision-free at any scale (real
    # vec_ids are non-negative; the old +50000 offset collided once the
    # embeddings table reached 50000 rows)
    dup = emb.filter(F.col("vec_id") % 40 == 0).withColumn(
        "vec_id", -(F.col("vec_id") + 1)
    )
    aug = emb.unionByName(dup)
    out = SIM.embedding_near_dups(
        aug, dim=64, threshold=0.999, method="brute", id_col="vec_id"
    )
    return out.select(F.col("id_a"), F.col("id_b"))


# --- drift statistics (distributed, SQL-twinned) -----------------------------


_HIST_SQL = "SELECT CAST(floor(n_chars / 50) AS BIGINT) AS bucket, count(*) AS cnt FROM documents{where} GROUP BY bucket"


@q(
    "drift_chi2_statistic",
    f"""WITH obs AS ({_HIST_SQL.format(where=" WHERE source != 'src0'")}),
         expd AS ({_HIST_SQL.format(where="")}),
         tot AS (SELECT (SELECT CAST(sum(cnt) AS DOUBLE) FROM obs) o_tot,
                        (SELECT CAST(sum(cnt) AS DOUBLE) FROM expd) e_tot),
         j AS (SELECT CAST(coalesce(o.cnt, 0) AS DOUBLE) o_cnt, CAST(e.cnt AS DOUBLE) e_cnt
               FROM expd e LEFT JOIN obs o ON e.bucket = o.bucket)
        SELECT {I6.format(x='sum(pow(o_cnt - e_cnt * (SELECT o_tot / e_tot FROM tot), 2) / (e_cnt * (SELECT o_tot / e_tot FROM tot)))')} AS chi2_i6
        FROM j""",
)
def drift_chi2_statistic(spark, sf_dir):
    """Chi-square drift statistic, fully in-plan (treewise-merged partial
    histograms -> aligned join -> one scalar agg)."""
    from np_data_validation_spark.operators import drift as D
    from np_data_validation_spark.operators import stats as S

    docs = _t(spark, sf_dir, "documents").withColumnRenamed("n_chars", "n_tok")
    obs = S.n_tok_histogram(docs.filter(F.col("source") != "src0"), group_col=None, bucket_width=50)
    exp = S.n_tok_histogram(docs, group_col=None, bucket_width=50)
    return D.chi_square_statistic_df(obs, exp).select(_i6(F.col("chi2")).alias("chi2_i6"))


@q(
    "drift_ks_statistic",
    f"""WITH obs AS ({_HIST_SQL.format(where=" WHERE source != 'src0'")}),
         expd AS ({_HIST_SQL.format(where="")}),
         tot AS (SELECT (SELECT CAST(sum(cnt) AS DOUBLE) FROM obs) o_tot,
                        (SELECT CAST(sum(cnt) AS DOUBLE) FROM expd) e_tot),
         j AS (SELECT coalesce(e.bucket, o.bucket) bucket,
                      CAST(coalesce(o.cnt, 0) AS DOUBLE) o_cnt,
                      CAST(coalesce(e.cnt, 0) AS DOUBLE) e_cnt
               FROM expd e FULL OUTER JOIN obs o ON e.bucket = o.bucket),
         c AS (SELECT sum(o_cnt) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) o_cum,
                      sum(e_cnt) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) e_cum
               FROM j)
        SELECT {I6.format(x='max(abs(o_cum / (SELECT o_tot FROM tot) - e_cum / (SELECT e_tot FROM tot)))')} AS ks_i6
        FROM c""",
)
def drift_ks_statistic(spark, sf_dir):
    """KS drift statistic from histogram ECDFs (running-sum window)."""
    from np_data_validation_spark.operators import drift as D
    from np_data_validation_spark.operators import stats as S

    docs = _t(spark, sf_dir, "documents").withColumnRenamed("n_chars", "n_tok")
    obs = S.n_tok_histogram(docs.filter(F.col("source") != "src0"), group_col=None, bucket_width=50)
    exp = S.n_tok_histogram(docs, group_col=None, bucket_width=50)
    return D.ks_statistic_df(obs, exp).select(_i6(F.col("ks")).alias("ks_i6"))


# --- extra projections / set ops ---------------------------------------------


@q(
    "p3_basename_extract",
    """SELECT doc_id,
              list_extract(string_split('datalake/' || source || '/' || CAST(doc_id AS VARCHAR) || '.tok', '/'), 3) AS basename
       FROM documents""",
)
def p3_basename_extract(spark, sf_dir):
    """P3: basename projection via split + element_at (the reference's
    os.path.basename, /root/reference/data_validation.py:473)."""
    docs = _t(spark, sf_dir, "documents")
    path = F.concat(F.lit("datalake/"), F.col("source"), F.lit("/"), F.col("doc_id").cast("string"), F.lit(".tok"))
    return docs.select(
        "doc_id", F.element_at(F.split(path, "/"), 3).alias("basename")
    )


@q(
    "t2_union_distinct",
    """SELECT n_nationkey FROM (
         SELECT c_nationkey AS n_nationkey FROM customer
         UNION SELECT s_nationkey FROM supplier)""",
)
def t2_union_distinct(spark, sf_dir):
    """T2: union of key sets + distinct."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n_nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n_nationkey"))
    return c.unionByName(s).distinct()


# --- non-SQL-expressible (rows-only checks) ----------------------------------


def udf_xxhash_tokens(spark, sf_dir):
    """The mandated pandas/Arrow UDF surface: synthesize int32 token arrays
    from embeddings, fingerprint with the vectorized XXH64 kernel.

    UNREGISTERED from the driver contract in r8 (the driver sweeps at most
    50 queries() entries): this was the contract's last rows-only row, and
    the kernel's values are already driver-checked by its registered twin
    ``udf_xxhash_golden`` (pinned spec goldens) — unregistering it in favor
    of ``dd_dedup_corpus`` makes every driver row value-checked. Still
    timed by bench.py (BENCH_ONLY) and exercised by tests/test_hashing.py."""
    from np_data_validation_spark.functions.hashing import tok_hash_arrow

    emb = _t(spark, sf_dir, "embeddings")
    toks = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: (x * 1000).cast("int")).alias("tokens"),
    )
    return toks.select("vec_id", tok_hash_arrow(F.col("tokens")).alias("tok_hash"))


def hll_distinct_sketch(spark, sf_dir):
    """HLL sketch partial + treewise union merge (stats.py path).

    UNREGISTERED from the driver contract in r8: the driver sweeps at most
    50 queries() entries (observed r7: 51 registered -> exactly the first
    50 in dict order swept, dropping streaming_verdict_rollup), and this
    rows-only entry is fully redundant with its value-checked twin
    ``hll_distinct_check``, which computes the SAME treewise-merged sketch
    and gates it within 2% of DuckDB's exact count. Still exercised by
    tests/test_stats_drift.py."""
    from np_data_validation_spark.operators import stats as S

    docs = _t(spark, sf_dir, "documents").withColumnRenamed("doc_id", "_id")
    snap = docs.select(F.col("_id").cast("string").alias("doc_id"), "source")
    return S.merge_sketches(S.doc_id_sketches(snap))


@q(
    "hll_distinct_check",
    """SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_exact,
              TRUE AS within_2pct
       FROM documents""",
)
def hll_distinct_check(spark, sf_dir):
    """Value-level oracle gate for the HLL path: the sketch's treewise-merged
    estimate must land within 2% of the exact distinct count (HLL_LGK=12 ->
    ~1.6% expected rel. error). Emitting (n_exact, within_2pct) makes the
    engine-specific sketch value hash-comparable: DuckDB computes the exact
    count and asserts TRUE, so the row hashes match iff the sketch is
    in-tolerance."""
    from np_data_validation_spark.operators import stats as S

    docs = _t(spark, sf_dir, "documents").withColumnRenamed("doc_id", "_id")
    snap = docs.select(F.col("_id").cast("string").alias("doc_id"), "source")
    est = S.merge_sketches(S.doc_id_sketches(snap))
    exact = snap.agg(F.countDistinct("doc_id").alias("_n"))
    return exact.crossJoin(est).select(
        F.col("_n").cast("long").alias("n_exact"),
        (
            F.abs(F.col("doc_id_distinct_global") - F.col("_n"))
            <= 0.02 * F.col("_n")
        ).alias("within_2pct"),
    )


def ann_lsh_topk(spark, sf_dir):
    """Production ANN variant: numpy-matmul bucket kernel (pandas UDF).

    UNREGISTERED from the driver contract in r8 (same 50-entry sweep cap
    as hll_distinct_sketch): the rows-only numpy path is redundant with
    the bit-identical oracle-checked twin ``ann_lsh_topk_portable`` for
    driver evidence, and its recall floor vs brute force is pinned by
    tests/test_similarity_multimodal.py."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return SIM.lsh_topk(emb, q, dim=64, k=3, bits=8).select(
        "query_id", "neighbor_id", "rank"
    )


def _ann_portable_sql() -> str:
    bucket = SIM.bucket_portable_sql("embedding", dim=64, bits=8)
    probes = ", ".join(["bucket"] + [f"xor(bucket, {1 << b})" for b in range(8)])
    return f"""
    WITH c AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings),
    q AS (SELECT vec_id AS query_id, embedding AS qvec,
                 unnest([{probes}]) AS bucket
          FROM c WHERE vec_id < 5),
    cand AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                    CAST(q.qvec AS DOUBLE[])) AS cosine
      FROM c JOIN q ON c.bucket = q.bucket AND c.vec_id != q.query_id)
    SELECT query_id, neighbor_id, rank FROM (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rank
      FROM cand) WHERE rank <= 3
    """


@q("ann_lsh_topk_portable", _ann_portable_sql())
def ann_lsh_topk_portable(spark, sf_dir):
    """Oracle-checkable ANN: md5-derived hyperplanes + left-to-right folds
    make the LSH buckets (and thus the candidate sets and final ranks)
    bit-identical between the Spark plan and the DuckDB twin."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return SIM.lsh_topk_portable(emb, q, dim=64, k=3, bits=8).select(
        "query_id", "neighbor_id", "rank"
    )


# --- U1/U2: value-level oracle for the vectorized xxhash64 kernel ------------

_GOLDEN_FIXTURE = __file__.rsplit("/", 2)[0] + "/fixtures/xxh64_golden.parquet"


@q(
    "udf_xxhash_golden",
    f"""SELECT CAST(case_id AS INT) AS case_id, expected_hash AS tok_hash
        FROM read_parquet('{_GOLDEN_FIXTURE}') ORDER BY case_id""",
)
def udf_xxhash_golden(spark, sf_dir):
    """Value-level check of the vectorized pandas-UDF XXH64 kernel: hash the
    fixture token arrays (edge lengths around every stripe/lane boundary,
    adversarial values) and compare against goldens pinned from the scalar
    public-spec implementation — the golden-checksum doctrine of the
    reference (/root/reference/data_validation.py:204-208, :493-496),
    surfaced as a driver-checked oracle instead of pytest-only."""
    from np_data_validation_spark.functions.hashing import tok_hash_arrow

    fx = spark.read.parquet(_GOLDEN_FIXTURE)
    return fx.select(
        F.col("case_id").cast("int").alias("case_id"),
        tok_hash_arrow(F.col("tokens")).alias("tok_hash"),
    )


# --- J9 action gate + P6 conditional compute --------------------------------


@q(
    "j9_reclaimable_gate",
    f"""SELECT doc_id, source, CAST(n_valid_backups AS BIGINT) AS n_valid_backups
        FROM (
          SELECT doc_id, source,
                 MAX(CASE WHEN verdict_code >= 21 AND m_source = 'backup' THEN 1 ELSE 0 END) AS vb,
                 MAX(CASE WHEN verdict_code BETWEEN 10 AND 13 THEN 1 ELSE 0 END) AS veto,
                 SUM(CASE WHEN verdict_code >= 21 AND m_source = 'backup' THEN 1 ELSE 0 END) AS n_valid_backups
          FROM ({PAIRS_SQL}) GROUP BY doc_id, source
        ) g
        WHERE vb = 1 AND veto = 0 AND source != 'backup'""",
)
def j9_reclaimable_gate(spark, sf_dir):
    """J9 + the veto-then-act gate (reference strategies.py:95-168):
    subjects with >=1 valid copy in the backup-rooted source and zero
    invalid-band copies; source-membership restricts both the backup side
    and the subject side."""
    return V.find_reclaimable(_pairs_df(spark, sf_dir), backup_sources=("backup",))


@q(
    "p6_conditional_hash_gate",
    f"""WITH s AS ({SNAPSHOT_SQL})
        SELECT doc_id,
               CASE WHEN n_tok <= 256 THEN tok_hash ELSE NULL END AS gated_hash,
               (n_tok <= 256) AS hashed
        FROM s""",
)
def p6_conditional_hash_gate(spark, sf_dir):
    """P6: size-threshold conditional compute — the reference gated checksum
    generation behind checksum_threshold (/root/reference/
    data_validation.py:424, :487-491); expressed as a CASE that nulls the
    expensive column above the threshold (Catalyst short-circuits the hash
    for gated-off rows)."""
    s = _snapshot(_t(spark, sf_dir, "documents"))
    return s.select(
        "doc_id",
        F.when(F.col("n_tok") <= 256, F.col("tok_hash")).alias("gated_hash"),
        (F.col("n_tok") <= 256).alias("hashed"),
    )


# --- streaming-vs-batch parity: the Structured Streaming path --------------

#: The streaming oracle's CASE is literally the engine CASE with hash
#: values replaced by a symbolic content id ``c``: token arrays are unique
#: per vec_id in this fixture, so tok_hash equality <=> token-array
#: equality <=> c equality (the input_hint's per-row invariant). The
#: textual substitution also maps m_tok_hash -> m_c.
STREAM_CASE_SQL = VERDICT_CASE_SQL.replace("tok_hash", "c")

#: Deterministic fault injections over embeddings-derived sequences
#: (id arithmetic, both engines):
#:   %13==0 dropped from manifest      -> MISSING_COUNTERPART (probe finds
#:                                        nothing: content absent)
#:   %17==0 manifest doc_id 'r'||id    -> stage-1 miss, probe rescues by
#:                                        content (VALID_COPY_RENAMED)
#:   %7 ==0 content corrupted          -> hash mismatch (and a %17&&%7 row
#:                                        stays MISSING: probe can't match)
#:   %11==0 manifest n_tok+3           -> size mismatch
#:   %5 ==0 manifest source 'backup'   -> copy family
#:   %19==0 extra 'mirror' row         -> multi-pair subject (rollup MAX)
STREAM_ROLLUP_SQL = f"""
WITH base AS (
  SELECT CAST(vec_id AS BIGINT) AS id,
         CAST(vec_id AS VARCHAR) AS doc_id,
         's' || CAST(vec_id % 3 AS VARCHAR) AS source,
         len(embedding) AS n_tok
  FROM embeddings
),
s AS (SELECT doc_id, source, n_tok, id AS c FROM base),
m AS (
  SELECT CASE WHEN id % 17 = 0 THEN 'r' || doc_id ELSE doc_id END AS m_doc_id,
         CASE WHEN id % 5 = 0 THEN 'backup' ELSE source END AS m_source,
         n_tok + (CASE WHEN id % 11 = 0 THEN 3 ELSE 0 END) AS m_n_tok,
         CASE WHEN id % 7 = 0 THEN -(id + 1) ELSE id END AS m_c
  FROM base WHERE id % 13 != 0
  UNION ALL
  SELECT doc_id, 'mirror', n_tok, id
  FROM base WHERE id % 13 != 0 AND id % 19 = 0
),
j AS (
  SELECT s.doc_id, s.source, s.n_tok, s.c,
         m.m_doc_id, m.m_source, m.m_n_tok, m.m_c
  FROM s LEFT JOIN m ON s.doc_id = m.m_doc_id
),
p1 AS (SELECT j.*, {STREAM_CASE_SQL} AS verdict_code FROM j),
miss AS (SELECT doc_id, source, n_tok, c FROM p1 WHERE verdict_code = 14),
pf AS (
  SELECT s.doc_id, s.source, s.n_tok, s.c,
         m.m_doc_id, m.m_source, m.m_n_tok, m.m_c
  FROM miss s JOIN m ON s.c = m.m_c
),
p2 AS (SELECT pf.*, {STREAM_CASE_SQL} AS verdict_code FROM pf),
still AS (
  SELECT doc_id, source, n_tok, c,
         NULL AS m_doc_id, NULL AS m_source, NULL AS m_n_tok, NULL AS m_c,
         14 AS verdict_code
  FROM miss WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.m_c = miss.c)
),
merged AS (
  SELECT * FROM p1 WHERE verdict_code != 14
  UNION ALL SELECT * FROM p2
  UNION ALL SELECT * FROM still
),
rolled AS (
  SELECT doc_id, source,
         MAX(verdict_code) AS final_verdict_code,
         bool_or(verdict_code >= 21 OR verdict_code = 5) AS has_valid,
         bool_or(verdict_code BETWEEN 11 AND 13) AS has_invalid,
         bool_or(verdict_code = 14) AS is_missing,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM merged GROUP BY doc_id, source
)
SELECT doc_id, source, final_verdict_code, has_valid, has_invalid, is_missing,
       n_pairs,
       CASE WHEN has_invalid OR is_missing THEN 'fail'
            WHEN has_valid OR final_verdict_code IN (6, 7) THEN 'pass'
            ELSE 'unknown' END AS row_status
FROM rolled
"""


def stream_parity_tables(spark, sf_dir) -> tuple[DataFrame, DataFrame]:
    """(sequences, manifest) in input_hint schema, derived from embeddings
    with the deterministic fault injections documented on STREAM_ROLLUP_SQL
    — shared by the streaming driver query and the batch-parity pytest so
    the two paths validate literally the same tables."""
    from np_data_validation_spark.functions.hashing import with_tok_hash

    base = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("long").alias("_id"),
        F.col("vec_id").cast("string").alias("doc_id"),
        F.transform("embedding", lambda x: (x * 1000).cast("int")).alias("tokens"),
        F.size("embedding").cast("int").alias("n_tok"),
        F.concat(F.lit("s"), (F.col("vec_id") % 3).cast("string")).alias("source"),
    )
    kept = base.filter(F.col("_id") % 13 != 0)
    main = kept.select(
        F.when(F.col("_id") % 17 == 0, F.concat(F.lit("r"), F.col("doc_id")))
        .otherwise(F.col("doc_id"))
        .alias("doc_id"),
        F.when(
            F.col("_id") % 7 == 0,
            F.concat(F.col("tokens"), F.array(F.lit(999999))),
        )
        .otherwise(F.col("tokens"))
        .alias("tokens"),
        (F.col("n_tok") + F.when(F.col("_id") % 11 == 0, 3).otherwise(0))
        .cast("int")
        .alias("n_tok"),
        F.when(F.col("_id") % 5 == 0, F.lit("backup"))
        .otherwise(F.col("source"))
        .alias("source"),
    )
    mirror = kept.filter(F.col("_id") % 19 == 0).select(
        "doc_id", "tokens", "n_tok", F.lit("mirror").alias("source")
    )
    man = with_tok_hash(main.unionByName(mirror)).select(
        "doc_id", "n_tok", "tok_hash", "source"
    )
    return base.select("doc_id", "tokens", "n_tok", "source"), man


@q("streaming_verdict_rollup", STREAM_ROLLUP_SQL)
def streaming_verdict_rollup(spark, sf_dir):
    """The Structured-Streaming path driven end-to-end and value-checked
    against DuckDB (VERDICT r4 task #5): an availableNow file-source stream
    (streaming/incremental.validate_stream -> foreachBatch -> the SAME
    plans.onepass plan as batch) over a SEQUENCES table derived from
    ``embeddings`` with deterministic fault injections. The oracle mirrors
    the FULL onepass verdict semantics — stage-1 doc_id join, ordered CASE,
    content probe of the missing band, per-identity anti-join, per-subject
    rollup — with hash equality encoded symbolically (see STREAM_CASE_SQL).
    Reference anchor: the batch-with-resume outer loop this streams,
    /root/reference/data_validation.py:1449-1464."""
    import os
    import tempfile

    from np_data_validation_spark.streaming.incremental import validate_stream

    seq, man = stream_parity_tables(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="npdv_stream_q_")
    # the landing/output/checkpoint tree is query-scoped scratch: the
    # rolled verdicts are materialized on the driver (small: one row per
    # subject) and the tree removed, so repeated driver runs leave no
    # npdv_stream_q_* residue in /tmp (ADVICE r5 queries.py:1230)
    try:
        landing, out = os.path.join(tmp, "landing"), os.path.join(tmp, "out")
        seq.write.mode("overwrite").parquet(landing)
        validate_stream(spark, landing, man, out).awaitTermination()
        rolled = spark.read.parquet(os.path.join(out, "verdicts")).select(
            "doc_id",
            "source",
            "final_verdict_code",
            "has_valid",
            "has_invalid",
            "is_missing",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            "row_status",
        )
        return spark.createDataFrame(rolled.collect(), rolled.schema)
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


def dd_prepare_corpus(spark, sf_dir):
    """The full corpus-preparation composition (quality funnel ->
    benchmark decontamination -> exact/near dedup -> deterministic
    900000-ppm sampling) over the augmented documents, eval suite =
    doc_id % 17 == 0. Bench-timed only (the 50-entry driver contract is
    full); its values are cross-engine-checked doc by doc against
    DD.prepare_corpus_sql in tests/test_text_dedup.py, and every stage it
    composes carries its own green driver oracle (filter signals via
    tx_*, contamination via dd_contamination, dedup via
    dd_dedup_corpus)."""
    docs = _t(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 17 == 0).select("doc_id", "text")
    return DD.prepare_corpus(
        _augmented_docs(docs),
        eval_docs=ev,
        max_bucket=DD_PIPELINE_MAX_BUCKET,
        sample_ppm=900000,
    )


#: timed by bench.py but NOT part of the <=50-entry driver contract (see
#: udf_xxhash_tokens docstring — its values are driver-checked via the
#: registered udf_xxhash_golden twin; dd_prepare_corpus is cross-engine
#: pytest-checked, see its docstring)
BENCH_ONLY: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "udf_xxhash_tokens": udf_xxhash_tokens,
    "dd_prepare_corpus": dd_prepare_corpus,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver-contract registry, kept to AT MOST 50 entries.

    The driver's correctness sweep covers at most 50 queries in dict
    order: with 51 registered in round 7 it recorded exactly the first 50
    and dropped the last (``streaming_verdict_rollup`` — VERDICT r7 task
    #1). Two defenses: the registry holds <= 50 entries (redundant
    rows-only twins are unregistered, see hll_distinct_sketch /
    ann_lsh_topk docstrings), and the streaming entry — the engine's only
    Structured-Streaming evidence, and the most expensive single query —
    is promoted to position 2 so ANY truncation rule (count cap or time
    budget) still sweeps it. As of r8 every registered entry carries a
    DuckDB value oracle (the last rows-only row, udf_xxhash_tokens, moved
    to BENCH_ONLY; its values are driver-checked via udf_xxhash_golden)."""
    d = dict(_QUERIES)
    assert len(d) <= 50, (
        f"{len(d)} queries registered; the driver sweeps at most 50 — "
        "unregister a redundant rows-only entry before adding more"
    )
    promoted = ["flagship_verdict_counts", "streaming_verdict_rollup"]
    return {
        **{k: d[k] for k in promoted if k in d},
        **{k: v for k, v in d.items() if k not in promoted},
    }


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
