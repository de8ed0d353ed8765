"""Relational operator anchors over the TPC-H-ish tables.

These exercise the classical operators hidden inside the reference
(SURVEY.md §2.3: projection, filter, hash/broadcast join, semi/anti
join, aggregation, distinct, sort, window, point lookup) as native
Spark plans with exact DuckDB oracles. Money arithmetic is done in
DECIMAL (exact, associative — reproducible across engines and
partitionings) and cast to double only at the output boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jsonld_spark.plans.session import read_table

DEC = "decimal(18,2)"


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style aggregation with partial+final hash aggregate."""
    li = read_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast(DEC)
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1).cast(DEC) - disc)).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def pricing_summary_sql() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus"""


def top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style 3-way join: broadcast the small dimension side,
    shuffle-join the fact tables, aggregate, top-N sort."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    revenue = (
        F.col("l_extendedprice").cast(DEC)
        * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust.where(F.col("c_mktsegment") == "BUILDING")),
              orders.o_custkey == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def top_unshipped_orders_sql() -> str:
    return """
SELECT l_orderkey, o_orderdate,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10"""


# the synthetic corpus gives every customer at least one order, so the
# unfiltered anti-join is 0 rows at every sf — a vacuous oracle match
# (VERDICT r2 #3). The dated variant (no order since the cutoff) yields
# 6 / 29 / 305 rows at sf0.001/0.01/0.1, making the driver check real.
RECENT_ORDER_CUTOFF = "1999-01-01"


def customers_without_orders(spark: SparkSession, sf_dir: str,
                             since: str | None = RECENT_ORDER_CUTOFF) -> DataFrame:
    """Anti-join (frame []-must-not-exist analogue, SURVEY.md §2.3):
    customers with no order on/after ``since`` (None = no order ever).
    The date filter pushes to the parquet scan before the anti-join."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    if since is not None:
        orders = orders.where(F.col("o_orderdate") >= F.lit(since).cast("timestamp"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_nationkey")
    )


def customers_without_orders_sql(since: str | None = RECENT_ORDER_CUTOFF) -> str:
    recent = f" AND o_orderdate >= TIMESTAMP '{since}'" if since is not None else ""
    return f"""
SELECT c_custkey, c_name, c_nationkey
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey{recent})"""


def event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: window + lag + cumulative sum (gap > 30 min
    starts a new session) — the @list/window machinery analogue."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet timestamps load as TIMESTAMP_NTZ; epoch via UTC session tz
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    new_session = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sessions = ev.withColumn(
        "session_idx",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sessions.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


def event_sessions_sql() -> str:
    return """
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events),
s AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM g)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM s GROUP BY user_id, session_idx"""


STRATIFIED_K = 5


def stratified_sample(
    spark: SparkSession, sf_dir: str, group: str = "source",
    k: int = STRATIFIED_K,
) -> DataFrame:
    """Deterministic per-stratum uniform sample of the documents
    corpus: keep the ``k`` rows with the smallest md5(doc_id) per
    ``group`` — bottom-k hash sampling (the KMV construction read as
    a sampler). Hash order is uniform-pseudorandom yet reproducible
    across engines and runs, so a training pipeline gets a stable
    per-source sample with no RNG state. Scale shape: one window
    partitioned by the stratum; samples merge by union + re-cut,
    i.e. bottom-k is a partial aggregate at 100 TB.

    Output: (group, doc_id, hash_rank, sample_tag)."""
    docs = read_table(spark, sf_dir, "documents")
    tag = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy(group).orderBy(tag, "doc_id")
    return (
        docs.select(F.col(group), "doc_id", tag.alias("sample_tag"))
        .withColumn("hash_rank", F.row_number().over(w))
        .where(F.col("hash_rank") <= k)
    )


def stratified_sample_sql(group: str = "source", k: int = STRATIFIED_K) -> str:
    return f"""
SELECT {group}, doc_id, sample_tag, hash_rank FROM (
  SELECT {group}, doc_id, md5(CAST(doc_id AS VARCHAR)) AS sample_tag,
         row_number() OVER (PARTITION BY {group}
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS hash_rank
  FROM documents) s
WHERE hash_rank <= {k}"""


MIX_BUDGET_NUM = 3   # keep docs while cum_tokens*DEN <= source_total*NUM
MIX_BUDGET_DEN = 10  # i.e. a 30% per-source token budget


def token_budget_mix(
    spark: SparkSession, sf_dir: str,
    num: int = MIX_BUDGET_NUM, den: int = MIX_BUDGET_DEN,
) -> DataFrame:
    """Data-mixture sampling under a per-source TOKEN budget: within
    each source, walk documents in deterministic md5(doc_id) order and
    keep them while the running token total stays within num/den of the
    source's total tokens. This is the "sample each domain down to its
    mixture weight in tokens, not documents" step of a training-data
    pipeline (document sampling over-weights sources with short docs).

    The budget is a RATIO, not a constant, so the query is
    scale-invariant, and the comparison is pure integer arithmetic
    (cum*den <= total*num) — exact in any engine. Scale shape: one
    window per stratum (cumulative sum; sorts spill, no collect) plus a
    per-source total attached by the window's unbounded frame — a
    single shuffle on source. Skewed giant sources are the known cost
    of a per-stratum cumsum; the two-pass per-partition-prefix-sum
    refinement drops in here without changing the contract.

    Output: (source, doc_id, n_tokens, cum_tokens, source_tokens)."""
    docs = read_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.lower(F.col("text")), " ")).cast("long")
    tag = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(tag, "doc_id")
    wall = Window.partitionBy("source")
    return (
        docs.select("source", "doc_id", n_tokens.alias("n_tokens"),
                    tag.alias("tag"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("source_tokens", F.sum("n_tokens").over(wall))
        .where(F.col("cum_tokens") * den <= F.col("source_tokens") * num)
        .select("source", "doc_id", "n_tokens", "cum_tokens", "source_tokens")
    )


def token_budget_mix_sql(num: int = MIX_BUDGET_NUM,
                         den: int = MIX_BUDGET_DEN) -> str:
    return f"""
SELECT source, doc_id, n_tokens, cum_tokens, source_tokens FROM (
  SELECT source, doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY source
                             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY source) AS BIGINT)
           AS source_tokens
  FROM (SELECT source, doc_id,
               len(string_split(lower(text), ' ')) AS n_tokens
        FROM documents) t) s
WHERE cum_tokens * {den} <= source_tokens * {num}"""
