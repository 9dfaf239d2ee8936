"""Relational operator surface: SURVEY.md §2.B Q1-Q23, Q30, Q34, Q36.

Everything here is pure DataFrame built-ins — no UDFs, no collect() —
so the whole surface stays inside whole-stage codegen and Catalyst gets
pushdown/pruning/join-selection for free. Scale notes per query are in
the docstrings; the global principles:

* Dimension joins (region/nation/part/customer at TPC-H shapes) are
  explicitly ``broadcast()``-hinted — at 100 TB the fact side never
  shuffles for these.
* Aggregations are expressed as single groupBy().agg() so Spark plans
  partial (map-side) aggregation before the exchange.
* Window top-k uses rank-pushdown-friendly ``row_number`` over a
  partitioned window (Spark inserts a per-partition top-k filter before
  the final sort at scale via WindowGroupLimit).

Reference parity: each query's docstring cites the reference behavior it
models (SURVEY.md §2.A R-numbers, file:line into /root/reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.prefix import prefix_max
from ..tables import load

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def _r4(c):
    return F.round(c.cast("double"), 4)


# ---------------------------------------------------------------------------
# Q1 scan/project — reference R1-R8 source scans reduce to parquet scan.
# Scale: projection prunes to 4 columns at the reader (check ReadSchema);
# order+limit plans as TakeOrderedAndProject (no global sort materialized).
# ---------------------------------------------------------------------------
def q01_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
            "l_quantity",
            "l_extendedprice",
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    )


Q01_SQL = """
SELECT l_orderkey,
       CAST(l_linenumber AS BIGINT) AS l_linenumber,
       l_quantity,
       l_extendedprice
FROM lineitem
ORDER BY l_orderkey, l_linenumber
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q2 filter pushdown — TPC-H Q6 predicate shape (reference R23 metadata
# equality filter generalized). Scale: all three predicates push to the
# parquet scan (PushedFilters); only 4 columns read.
# ---------------------------------------------------------------------------
def q02_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _r4(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


Q02_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# Q3 grouped aggregation — TPC-H Q1 shape (reference R16 count generalized).
# Scale: partial aggregation map-side; 4-group output so the exchange moves
# O(partitions * groups) rows, not data.
# ---------------------------------------------------------------------------
def q03_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r4(F.sum("l_quantity")).alias("sum_qty"),
            _r4(F.sum("l_extendedprice")).alias("sum_base_price"),
            _r4(F.sum(disc_price)).alias("sum_disc_price"),
            _r4(F.sum(charge)).alias("sum_charge"),
            _r4(F.avg("l_quantity")).alias("avg_qty"),
            _r4(F.avg("l_extendedprice")).alias("avg_price"),
            _r4(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q03_SQL = """
SELECT l_returnflag,
       l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Q4 distinct aggregation. Scale: countDistinct plans a two-phase
# partial-distinct expand; for high-cardinality keys prefer Q5's HLL.
# ---------------------------------------------------------------------------
def q04_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


Q04_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Q5 approximate distinct (HLL++). No oracle entry: sketch estimates are
# engine-specific (driver records rows-only). Scale: single pass, fixed
# memory per group — this is the 100 TB path for Q4.
# ---------------------------------------------------------------------------
def q05_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("approx_users"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Q6 inner equi-join — orders ⋈ customer, revenue per market segment.
# Scale: customer is the smaller side; at TPC-H ratios it still exceeds
# broadcast threshold, so this is the canonical sort-merge / shuffle-hash
# join on o_custkey with AQE free to downgrade to broadcast at runtime.
# ---------------------------------------------------------------------------
def q06_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            _r4(F.sum("o_totalprice")).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )


Q06_SQL = """
SELECT c_mktsegment,
       round(sum(o_totalprice), 4) AS revenue,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Q7 broadcast join — lineitem ⋈ part filtered by brand. Scale: part
# filtered by brand is tiny → explicit broadcast hint; the 100 TB fact
# table never shuffles. Filter on the dimension is applied BEFORE the
# broadcast so only matching part rows ship.
# ---------------------------------------------------------------------------
def q07_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#2")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "inner")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _r4(F.sum("l_quantity")).alias("sum_qty"),
            _r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            ),
        )
        .orderBy("p_brand")
    )


Q07_SQL = """
SELECT p_brand,
       count(*) AS n_items,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#2'
GROUP BY p_brand
ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# Q8 multi-way join — TPC-H Q5 shape: region⋈nation⋈customer⋈orders⋈lineitem.
# Scale: region/nation broadcast (tiny dims); customer⋈orders⋈lineitem
# shuffle on their keys; Catalyst reorders so dim filters apply first.
# ---------------------------------------------------------------------------
def q08_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            _r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("n_name")
    )


Q08_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# Q9 left outer join — customers with/without orders, null-safe counts.
# ---------------------------------------------------------------------------
def q09_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            _r4(F.coalesce(F.sum("o_totalprice"), F.lit(0.0))).alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


Q09_SQL = """
SELECT c_custkey,
       c_name,
       count(o_orderkey) AS n_orders,
       round(coalesce(sum(o_totalprice), 0), 4) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# Q10 semi join — reference R11 dedup probe shape (EXISTS). Scale: semi
# join only ships join keys for the probe side; no fan-out duplication.
# ---------------------------------------------------------------------------
def q10_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


Q10_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# Q11 anti join — reference R22 delete shape (NOT EXISTS): documents with
# no embedding row. Scale: the 100 TB delete path is exactly this plan
# against the victims side (or a Delta DELETE which compiles to the same).
# ---------------------------------------------------------------------------
def q11_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    return (
        docs.join(emb, docs.doc_id == emb.vec_id, "left_anti")
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


Q11_SQL = """
SELECT doc_id, source
FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Q12 exact dedup — reference R10+R11: sha2 content hash, keep min id.
# Scale: shuffle on the 32-byte hash (uniform — no skew); equivalent to
# dropDuplicates but keeps a deterministic representative.
# ---------------------------------------------------------------------------
def q12_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.withColumn("content_hash", F.sha2(F.col("text"), 256))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .orderBy("keep_id")
    )


Q12_SQL = """
SELECT sha256(text) AS content_hash,
       min(doc_id) AS keep_id,
       count(*) AS dup_count
FROM documents
GROUP BY sha256(text)
ORDER BY keep_id
"""


# ---------------------------------------------------------------------------
# Q13 window ranking — top-3 orders per customer (reference R17's top-k,
# per-group). Scale: Spark plans WindowGroupLimit: each partition keeps a
# running top-3 before the shuffle-sort, so no full sort of 100 TB.
# ---------------------------------------------------------------------------
def q13_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


Q13_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) t
WHERE rn <= 3
ORDER BY o_custkey, rn
"""


# ---------------------------------------------------------------------------
# Q14 analytic window — running revenue per customer.
# ---------------------------------------------------------------------------
def q14_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", TS_FMT_SPARK).alias("order_ts"),
        _r4(F.sum("o_totalprice").over(w)).alias("running_total"),
    ).orderBy("o_custkey", "o_orderkey")


Q14_SQL = f"""
SELECT o_custkey,
       o_orderkey,
       strftime(o_orderdate, '{TS_FMT_DUCK}') AS order_ts,
       round(sum(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_total
FROM orders
ORDER BY o_custkey, o_orderkey
"""


# ---------------------------------------------------------------------------
# Q15 lag/lead — day-over-day delta of daily event value.
# ---------------------------------------------------------------------------
def q15_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .agg(_r4(F.sum("value")).alias("daily_value"))
    )
    w = Window.orderBy("day")
    return daily.select(
        "day",
        "daily_value",
        _r4(F.col("daily_value") - F.lag("daily_value").over(w)).alias("delta"),
    ).orderBy("day")


Q15_SQL = """
WITH daily AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         round(sum(value), 4) AS daily_value
  FROM events GROUP BY 1
)
SELECT day,
       daily_value,
       round(daily_value - lag(daily_value) OVER (ORDER BY day), 4) AS delta
FROM daily
ORDER BY day
"""


# ---------------------------------------------------------------------------
# Q16 global top-k — reference R17's k-NN ordering as a relational sort.
# Scale: orderBy().limit() plans TakeOrderedAndProject — per-partition
# heaps, no global sort.
# ---------------------------------------------------------------------------
def q16_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return (
        part.select("p_partkey", "p_name", "p_retailprice")
        .orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
        .limit(10)
    )


Q16_SQL = """
SELECT p_partkey, p_name, p_retailprice
FROM part
ORDER BY p_retailprice DESC, p_partkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Q17 set operations — nation keys of two market segments.
# ---------------------------------------------------------------------------
def q17_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    a = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_nationkey").distinct()
    b = cust.where(F.col("c_mktsegment") == "MACHINERY").select("c_nationkey").distinct()
    tagged = (
        a.union(b).distinct().select(F.lit("union").alias("op"), "c_nationkey")
        .union(a.intersect(b).select(F.lit("intersect").alias("op"), "c_nationkey"))
        .union(a.exceptAll(b).select(F.lit("except").alias("op"), "c_nationkey"))
    )
    return tagged.select(
        "op", F.col("c_nationkey").cast("bigint").alias("c_nationkey")
    ).orderBy("op", "c_nationkey")


Q17_SQL = """
WITH a AS (SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'),
     b AS (SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY')
SELECT op, CAST(c_nationkey AS BIGINT) AS c_nationkey FROM (
  SELECT 'union' AS op, c_nationkey FROM (SELECT c_nationkey FROM a UNION SELECT c_nationkey FROM b)
  UNION ALL
  SELECT 'intersect' AS op, c_nationkey FROM (SELECT c_nationkey FROM a INTERSECT SELECT c_nationkey FROM b)
  UNION ALL
  SELECT 'except' AS op, c_nationkey FROM (SELECT c_nationkey FROM a EXCEPT SELECT c_nationkey FROM b)
) t
ORDER BY op, c_nationkey
"""


# ---------------------------------------------------------------------------
# Q18 grouping sets / rollup.
# ---------------------------------------------------------------------------
def q18_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            _r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
            F.grouping_id().cast("bigint").alias("gid"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


Q18_SQL = """
SELECT l_returnflag,
       l_linestatus,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_items,
       CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Q19 string functions — reference R9/R12/R18 string handling surface.
# ---------------------------------------------------------------------------
def q19_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.lower("source").alias("source_lower"),
        F.upper("lang").alias("lang_upper"),
        F.substring("text", 1, 40).alias("text_head"),
        F.length("text").cast("bigint").alias("text_len"),
        F.concat_ws("|", "source", "lang").alias("source_lang"),
        F.split("text", " ").getItem(0).alias("first_word"),
        F.coalesce(F.regexp_extract("text", "([a-z]{6,})", 1), F.lit("")).alias(
            "first_long_word"
        ),
    ).orderBy("doc_id")


Q19_SQL = """
SELECT doc_id,
       lower(source) AS source_lower,
       upper(lang) AS lang_upper,
       substring(text, 1, 40) AS text_head,
       CAST(length(text) AS BIGINT) AS text_len,
       concat_ws('|', source, lang) AS source_lang,
       string_split(text, ' ')[1] AS first_word,
       coalesce(regexp_extract(text, '([a-z]{6,})', 1), '') AS first_long_word
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Q20 date functions.
# ---------------------------------------------------------------------------
def q20_date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_epoch_start"),
    ).orderBy("o_orderkey")


Q20_SQL = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(month(o_orderdate) AS BIGINT) AS order_month,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
           AS days_since_epoch_start
FROM orders
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# Q21 math functions.
# ---------------------------------------------------------------------------
def q21_math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.round("p_retailprice", 2).alias("price_r2"),
        _r4(F.abs(F.col("p_retailprice") - 1000.0)).alias("abs_delta"),
        F.floor("p_retailprice").cast("bigint").alias("price_floor"),
        F.ceil("p_retailprice").cast("bigint").alias("price_ceil"),
        _r4(F.pow(F.col("p_size").cast("double"), 2.0)).alias("size_sq"),
        _r4(F.sqrt(F.col("p_retailprice"))).alias("price_sqrt"),
    ).orderBy("p_partkey")


Q21_SQL = """
SELECT p_partkey,
       round(p_retailprice, 2) AS price_r2,
       round(abs(p_retailprice - 1000.0), 4) AS abs_delta,
       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
       CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
       round(pow(CAST(p_size AS DOUBLE), 2.0), 4) AS size_sq,
       round(sqrt(p_retailprice), 4) AS price_sqrt
FROM part
ORDER BY p_partkey
"""


# ---------------------------------------------------------------------------
# Q22 array functions over the embedding column (reference R17/R18 vector
# data). All math in double after exact float32->double widening; sums use
# an explicit left-to-right fold so both engines add in index order.
# ---------------------------------------------------------------------------
def q22_array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    # + 0.0 after every round: an element in (-5e-5, 0) rounds to IEEE
    # -0.0 in DuckDB but +0.0 through Spark's BigDecimal HALF_UP (which
    # has no signed zero) — the q71 lesson, hit here at sf0.1 by
    # vec 1753's first component. Exact no-op for all other doubles;
    # applied identically in the oracle.
    z = F.lit(0.0)
    return emb.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        (_r4(F.element_at("embedding", 1).cast("double")) + z).alias(
            "e_first"
        ),
        (_r4(F.array_max("embedding").cast("double")) + z).alias("e_max"),
        (_r4(F.array_min("embedding").cast("double")) + z).alias("e_min"),
        (
            _r4(F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x))
            + z
        ).alias("e_sum"),
        F.size(F.slice("embedding", 1, 8)).cast("bigint").alias("head_len"),
    ).orderBy("vec_id")


Q22_SQL = """
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       round(CAST(embedding[1] AS DOUBLE), 4) + 0.0 AS e_first,
       round(CAST(list_max(embedding) AS DOUBLE), 4) + 0.0 AS e_max,
       round(CAST(list_min(embedding) AS DOUBLE), 4) + 0.0 AS e_min,
       round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4)
           + 0.0 AS e_sum,
       CAST(len(embedding[1:8]) AS BIGINT) AS head_len
FROM embeddings
ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# Q23 JSON extraction — reference R12's open-ended metadata map modeled as
# the events.props JSON column.
# ---------------------------------------------------------------------------
def q23_json_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select("event_id", k.alias("k"))
        .withColumn("k_bucket", (F.col("k") % 10).cast("bigint"))
        .orderBy("event_id")
    )


Q23_SQL = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS BIGINT) AS k_bucket
FROM events
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Q30 grouped metadata count — reference R16/R22 "what's in my store".
# ---------------------------------------------------------------------------
def q30_store_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    return (
        docs.join(emb, docs.doc_id == emb.vec_id, "inner")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("vec_id").alias("n_vectors"),
        )
        .orderBy("source")
    )


Q30_SQL = """
SELECT source,
       count(DISTINCT doc_id) AS n_docs,
       count(vec_id) AS n_vectors
FROM documents JOIN embeddings ON doc_id = vec_id
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# Q34 dedup streaming-shape — latest event per user (reference R11 as a
# keep-latest upsert). Scale: WindowGroupLimit again; in streaming this is
# dropDuplicates within watermark (streaming/jobs.py).
# ---------------------------------------------------------------------------
def q34_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", TS_FMT_SPARK).alias("ts_str"),
            "event_type",
        )
        .orderBy("user_id")
    )


Q34_SQL = f"""
SELECT user_id, event_id, strftime(ts, '{TS_FMT_DUCK}') AS ts_str, event_type
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) t
WHERE rn = 1
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Q36 weighted average as built-in combo (sum(x*w)/sum(w)) — the declared
# UDAF surface without a custom JVM aggregator.
# ---------------------------------------------------------------------------
def q36_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            _r4(
                F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
                / F.sum("l_quantity")
            ).alias("weighted_avg_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("l_returnflag")
    )


Q36_SQL = """
SELECT l_returnflag,
       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS weighted_avg_price,
       count(*) AS n_items
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Q54 exact percentiles — Spark `percentile` and DuckDB `quantile_cont`
# share linear interpolation, so values hash-match after round(4).
# ---------------------------------------------------------------------------
def q54_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            _r4(F.percentile("o_totalprice", F.lit(0.5))).alias("p50"),
            _r4(F.percentile("o_totalprice", F.lit(0.9))).alias("p90"),
            _r4(F.percentile("o_totalprice", F.lit(0.99))).alias("p99"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


Q54_SQL = """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# Q55 pivot — event counts/value by type pivoted to columns (explicit
# value list => no extra distinct-values job, stable output schema).
# ---------------------------------------------------------------------------
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q55_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    return (
        ev.groupBy(day)
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
        .select(
            "day", *[F.col(t).cast("bigint").alias(f"n_{t}") for t in EVENT_TYPES]
        )
        .orderBy("day")
    )


Q55_SQL = f"""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       {", ".join(f"count(*) FILTER (event_type = '{t}') AS n_{t}" for t in EVENT_TYPES)}
FROM events
GROUP BY 1
ORDER BY day
"""


# ---------------------------------------------------------------------------
# Q60 deterministic systematic sampling — hash/modulo sampling that any
# engine reproduces (df.sample is RNG-engine-specific => not oracle-able;
# modulo-on-key is the portable pattern and what a 100 TB pipeline uses
# for reproducible eval splits).
# ---------------------------------------------------------------------------
def q60_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.where(F.col("event_id") % 10 == 0)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            _r4(F.avg("value")).alias("avg_value"),
        )
        .orderBy("event_type")
    )


Q60_SQL = """
SELECT event_type,
       count(*) AS n_sampled,
       round(avg(value), 4) AS avg_value
FROM events
WHERE event_id % 10 = 0
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Q61 approximate quantiles (KLL/GK-style sketch). Rows-only: sketch
# internals are engine-specific; tolerance vs the exact oracle asserted
# in tests. This is the 100 TB path for Q54.
# ---------------------------------------------------------------------------
def q61_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            _r4(F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(1000))).alias(
                "p50_approx"
            ),
            _r4(F.percentile_approx("o_totalprice", F.lit(0.9), F.lit(1000))).alias(
                "p90_approx"
            ),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Q72 extended window functions — rank family beyond row_number.
# ---------------------------------------------------------------------------
def q72_window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice"), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_orderkey",
            "o_orderstatus",
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
            _r4(F.percent_rank().over(w)).alias("pct_rank"),
            _r4(F.cume_dist().over(w)).alias("cume"),
            F.first("o_orderkey").over(w).alias("first_key"),
            F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
        )
        .orderBy("o_orderkey")
    )


Q72_SQL = """
SELECT o_orderkey,
       o_orderstatus,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       round(percent_rank() OVER w, 4) AS pct_rank,
       round(cume_dist() OVER w, 4) AS cume,
       first_value(o_orderkey) OVER w AS first_key,
       nth_value(o_orderkey, 2) OVER w AS second_key
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# q90 — TPC-H Q4 shape (order-priority checking), adapted to the fixture
# columns: count orders per priority in a quarter that have at least one
# line shipped after the order date. EXISTS = left-semi join; only order
# keys shuffle. The date predicate prunes the orders scan first.
# ---------------------------------------------------------------------------
def q90_tpch_q4_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q90_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# q91 — TPC-H Q12 shape (priority classes per line status): conditional
# CASE aggregation over the orders⋈lineitem join in one shipping year.
# ---------------------------------------------------------------------------
def q91_tpch_q12_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q91_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# ---------------------------------------------------------------------------
# q92 — TPC-H Q14 shape (promotion revenue share): ratio of conditional
# to total revenue for one shipping month, lineitem⋈part with the part
# dimension broadcast.
# ---------------------------------------------------------------------------
def q92_tpch_q14_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        _r4(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
            / F.sum(rev)
        ).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q92_SQL = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1.0 - l_discount)
                              ELSE 0.0 END)
             / sum(l_extendedprice * (1.0 - l_discount)), 4) AS promo_revenue_pct,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate <  TIMESTAMP '1997-04-01'
"""


# ---------------------------------------------------------------------------
# q97 — TPC-H Q3 shape (shipping-priority top-10): segment-filtered
# customer dim broadcast into orders⋈lineitem, revenue per order,
# top-10 by rounded revenue with a deterministic key tiebreak.
# ---------------------------------------------------------------------------
def q97_tpch_q3_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1998-06-01")
    li = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1998-06-01")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_r4(F.sum(rev)).alias("revenue"))
        .withColumn("o_orderdate", F.date_format("o_orderdate", "yyyy-MM-dd"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q97_SQL = """
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q98 — TPC-H Q10 shape (returned-item revenue per customer): one
# order-quarter, returned lines only, customer+nation dims broadcast,
# top-20 customers by rounded revenue with key tiebreak.
# ---------------------------------------------------------------------------
def q98_tpch_q10_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            _r4(F.sum(rev)).alias("revenue"),
            F.round(F.first("c_acctbal"), 2).alias("c_acctbal"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q98_SQL = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
       round(any_value(c_acctbal), 2) AS c_acctbal
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# q109 — TPC-H Q5 shape (local-supplier revenue per nation): the
# 6-table join with the co-nationality predicate. region/nation/
# supplier/customer broadcast; the only shuffles are the fact-side
# orders⋈lineitem join and the final 5-row aggregate.
# ---------------------------------------------------------------------------
def q109_tpch_q5_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    supp = load(spark, sf_dir, "supplier")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_r4(F.sum(rev)).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q109_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------------------
# q110 — TPC-H Q18 shape (large-volume orders): orders whose total
# quantity exceeds a threshold, with customer attribution. The HAVING
# subquery is one partial-aggregated pass over lineitem; its output
# (few thousand keys) semi-joins the fact side.
# ---------------------------------------------------------------------------
BIG_ORDER_QTY = 250


def q110_tpch_q18_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > BIG_ORDER_QTY)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            _r4(F.col("total_qty")).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


Q110_SQL = f"""
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(o_totalprice, 2) AS o_totalprice,
       round(CAST(total_qty AS DOUBLE), 4) AS total_qty
FROM orders
JOIN (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > {BIG_ORDER_QTY}
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# q112 — TPC-H Q7 shape (volume shipping between two nations): the
# classic two-aliased-dimension join. Both nation copies broadcast; the
# pair predicate is applied at the joins so the fact side is filtered
# before the final (nation, nation, year) aggregate — at 100 TB the only
# big shuffles are orders⋈lineitem and the tiny final agg.
# ---------------------------------------------------------------------------
Q7_NATION_A = "NATION_3"
Q7_NATION_B = "NATION_7"


def q112_tpch_q7_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    supp = load(spark, sf_dir, "supplier")
    cust = load(spark, sf_dir, "customer")
    pair = [Q7_NATION_A, Q7_NATION_B]
    ns = load(spark, sf_dir, "nation").where(F.col("n_name").isin(pair)).alias("ns")
    nc = load(spark, sf_dir, "nation").where(F.col("n_name").isin(pair)).alias("nc")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(ns), supp.s_nationkey == F.col("ns.n_nationkey"))
        .join(F.broadcast(nc), cust.c_nationkey == F.col("nc.n_nationkey"))
        .where(F.col("ns.n_name") != F.col("nc.n_name"))
        .select(
            F.col("ns.n_name").alias("supp_nation"),
            F.col("nc.n_name").alias("cust_nation"),
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            rev.alias("rev"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_r4(F.sum("rev")).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q112_SQL = f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
WHERE ((ns.n_name = '{Q7_NATION_A}' AND nc.n_name = '{Q7_NATION_B}')
    OR (ns.n_name = '{Q7_NATION_B}' AND nc.n_name = '{Q7_NATION_A}'))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# q113 — TPC-H Q11 shape (important parts by revenue share): per-part
# revenue filtered against a fraction of the corpus-wide total. The
# global total is a 1-row aggregate broadcast into the HAVING predicate
# (BroadcastNestedLoopJoin over one row — no shuffle); the per-part agg
# is a single partial-aggregated pass.
# ---------------------------------------------------------------------------
Q11_FRACTION = 0.0007


def q113_tpch_q11_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    per_part = li.groupBy("l_partkey").agg(F.sum(rev).alias("raw_value"))
    threshold = li.agg(
        (F.sum(rev) * F.lit(Q11_FRACTION)).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(threshold))
        .where(F.col("raw_value") > F.col("threshold"))
        .select("l_partkey", _r4(F.col("raw_value")).alias("value"))
        .orderBy(F.desc("value"), "l_partkey")
    )


Q113_SQL = f"""
SELECT l_partkey,
       round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS value
FROM lineitem
GROUP BY l_partkey
HAVING sum(l_extendedprice * (1.0 - l_discount)) > (
  SELECT sum(l_extendedprice * (1.0 - l_discount)) * {Q11_FRACTION}
  FROM lineitem
)
ORDER BY value DESC, l_partkey
"""


# ---------------------------------------------------------------------------
# q114 — TPC-H Q15 shape (top supplier by quarterly revenue): the
# revenue "view" is one partial-aggregated pass; its max is a 1-row
# broadcast compared back against the same aggregate (computed once,
# reused — Spark plans the reused subtree with an exchange reuse).
# Equality is on the 4-rounded revenue so the cross-engine comparison
# is exact.
# ---------------------------------------------------------------------------
def q114_tpch_q15_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    supp = load(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    revenue = li.groupBy("l_suppkey").agg(_r4(F.sum(rev)).alias("total_revenue"))
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.join(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q114_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# q115 — TPC-H Q2 shape (best supplier per part): cheapest average sale
# price per (part, supplier) from the fact table, per-part minimum via a
# partitioned row_number window (ordered on the 4-rounded price with the
# suppkey tie-break so the float ordering is deterministic cross-engine).
# The part filter semi-joins BEFORE the window so only surviving parts
# are ranked; supplier/nation dimensions broadcast.
# ---------------------------------------------------------------------------
Q2_MAX_SIZE = 5


def q115_tpch_q2_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(F.col("p_size") <= Q2_MAX_SIZE)
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    avgp = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "p_name", "l_suppkey")
        .agg(_r4(F.avg("l_extendedprice")).alias("avg_price"))
    )
    w = Window.partitionBy("p_partkey").orderBy("avg_price", "l_suppkey")
    return (
        avgp.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .drop("rk")
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("p_partkey", "p_name", "s_name", "n_name", "avg_price")
        .orderBy("p_partkey")
    )


Q115_SQL = f"""
WITH avgp AS (
  SELECT p_partkey, p_name, l_suppkey,
         round(avg(l_extendedprice), 4) AS avg_price,
         row_number() OVER (
           PARTITION BY p_partkey
           ORDER BY round(avg(l_extendedprice), 4), l_suppkey
         ) AS rk
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_size <= {Q2_MAX_SIZE}
  GROUP BY p_partkey, p_name, l_suppkey
)
SELECT p_partkey, p_name, s_name, n_name, avg_price
FROM avgp
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE rk = 1
ORDER BY p_partkey
"""


# ---------------------------------------------------------------------------
# q116 — TPC-H Q19 shape (disjunctive predicate join): an OR of
# brand/size/quantity conjuncts as the join condition. The part-side
# conjunct members are pushed to the broadcast build side; the quantity
# bounds prune the probe side at the scan (PushedFilters shows the
# disjunction's common bounds).
# ---------------------------------------------------------------------------
def q116_tpch_q19_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    cond = (li.l_partkey == part.p_partkey) & (
        (
            (part.p_brand == "Brand#11")
            & part.p_size.between(1, 15)
            & li.l_quantity.between(1, 20)
        )
        | (
            (part.p_brand == "Brand#22")
            & part.p_size.between(10, 30)
            & li.l_quantity.between(10, 30)
        )
        | (
            (part.p_brand == "Brand#15")
            & part.p_size.between(20, 50)
            & li.l_quantity.between(20, 40)
        )
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return li.join(F.broadcast(part), cond).agg(
        _r4(F.sum(rev)).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q116_SQL = """
SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 40)
"""


# ---------------------------------------------------------------------------
# q126 — TPC-H Q8 shape (national market share): the share of one
# supplier nation's revenue within a customer region's purchases of
# one part type, by order year — conditional-sum ratio over a 7-table
# join. Every dimension (part/supplier/customer/nation x2/region)
# broadcasts; the fact side shuffles once for orders⋈lineitem and the
# tiny per-year aggregate. The conditional sums share one aggregation
# pass (no self-join on the year).
# ---------------------------------------------------------------------------
Q8_REGION = "EUROPE"
Q8_TYPE = "PROMO"
Q8_NATION = "NATION_8"


def q126_tpch_q8_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    part = load(spark, sf_dir, "part").where(F.col("p_type") == Q8_TYPE)
    supp = load(spark, sf_dir, "supplier")
    cust = load(spark, sf_dir, "customer")
    sn = load(spark, sf_dir, "nation").alias("sn")
    cn = load(spark, sf_dir, "nation").alias("cn")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == Q8_REGION)
    vol = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn.n_nationkey"))
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn.n_nationkey"))
        .join(F.broadcast(region), F.col("cn.n_regionkey") == region.r_regionkey)
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            vol.alias("volume"),
            (F.col("sn.n_name") == Q8_NATION).alias("is_target"),
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("is_target"), F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                4,
            ).alias("mkt_share"),
            _r4(F.sum("volume")).alias("total_volume"),
        )
        .orderBy("o_year")
    )


Q126_SQL = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(CASE WHEN sn.n_name = '{Q8_NATION}'
                      THEN l_extendedprice * (1.0 - l_discount)
                      ELSE 0.0 END)
             / sum(l_extendedprice * (1.0 - l_discount)), 4) AS mkt_share,
       round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS total_volume
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey
WHERE p_type = '{Q8_TYPE}' AND r_name = '{Q8_REGION}'
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# q127 — TPC-H Q9 shape (product-line profit): profit per supplier
# nation per year over parts matching a name pattern. The schema has
# no partsupp/supplycost, so cost is proxied by retail price
# (amount = revenue - 0.1 * p_retailprice * l_quantity) — the join
# topology and aggregation shape are Q9's. The LIKE filter prunes the
# broadcast part build side before the join.
# ---------------------------------------------------------------------------
Q9_NAME_PAT = "%red%"
Q9_COST_FACTOR = 0.1


def q127_tpch_q9_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    part = load(spark, sf_dir, "part").where(F.col("p_name").like(Q9_NAME_PAT))
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) - (
        F.lit(Q9_COST_FACTOR) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(_r4(F.sum("amount")).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q127_SQL = f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(l_extendedprice * (1.0 - l_discount)
                 - {Q9_COST_FACTOR} * p_retailprice * l_quantity), 4)
         AS sum_profit
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '{Q9_NAME_PAT}'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


# ---------------------------------------------------------------------------
# q129 — unpivot/melt (wide -> long): the inverse of q55's pivot, via
# the DataFrame ``unpivot`` API (Spark's Expand operator — one pass, no
# join). Long-format metric rows then aggregate per metric; at scale
# Expand multiplies rows map-side, so the only shuffle is the 3-group
# aggregate.
# ---------------------------------------------------------------------------
def q129_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="metric",
        valueColumnName="val",
    )
    return (
        long.groupBy("metric")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            _r4(F.sum("val")).alias("sum_val"),
            _r4(F.min("val")).alias("min_val"),
            _r4(F.max("val")).alias("max_val"),
        )
        .orderBy("metric")
    )


Q129_SQL = """
SELECT metric,
       count(*) AS n_values,
       round(sum(val), 4) AS sum_val,
       round(min(val), 4) AS min_val,
       round(max(val), 4) AS max_val
FROM (
  SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem
  UNION ALL
  SELECT 'l_extendedprice' AS metric, l_extendedprice AS val FROM lineitem
  UNION ALL
  SELECT 'l_discount' AS metric, l_discount AS val FROM lineitem
)
GROUP BY metric
ORDER BY metric
"""


# ---------------------------------------------------------------------------
# q131 — co-purchase lift (market-basket pairs): part pairs that
# co-occur in the same order, scored by lift = P(a,b)/(P(a)P(b)).
# The pair join shuffles on l_orderkey only and is quadratic strictly
# WITHIN an order (orders have bounded line counts — the same blocked-
# pair bound as the label-blocked similarity join); per-part counts are
# a broadcast-sized dimension joined back. Top pairs by support with a
# deterministic tie-break.
# ---------------------------------------------------------------------------
MIN_PAIR_SUPPORT = 3


def q131_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    n_orders = li.agg(
        F.count_distinct("l_orderkey").cast("double").alias("n_orders")
    )
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= MIN_PAIR_SUPPORT)
    )
    per_part = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_orders_part"))
    pa = per_part.select(
        F.col("l_partkey").alias("part_a"), F.col("n_orders_part").alias("na")
    )
    pb = per_part.select(
        F.col("l_partkey").alias("part_b"), F.col("n_orders_part").alias("nb")
    )
    return (
        pairs.join(F.broadcast(pa), "part_a")
        .join(F.broadcast(pb), "part_b")
        .join(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "support",
            F.round(
                (F.col("support") * F.col("n_orders"))
                / (F.col("na") * F.col("nb")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.desc("support"), "part_a", "part_b")
        .limit(50)
    )


Q131_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS support
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {MIN_PAIR_SUPPORT}
),
per_part AS (SELECT l_partkey, count(*) AS n_orders_part FROM li GROUP BY 1)
SELECT part_a, part_b, support,
       round((support * CAST(n.n_orders AS DOUBLE))
             / (pa.n_orders_part * pb.n_orders_part), 4) AS lift
FROM pairs
JOIN per_part pa ON part_a = pa.l_partkey
JOIN per_part pb ON part_b = pb.l_partkey
CROSS JOIN n
ORDER BY support DESC, part_a, part_b
LIMIT 50
"""


# ---------------------------------------------------------------------------
# q275 — directional association rules over co-purchased parts:
# for every supported pair (the q131 candidate set), the rule metrics
# a→b and b→a — confidence (P(b|a)), and conviction
# ((1 − P(b)) / (1 − conf), the "how much worse than independence is
# a-without-b" odds ratio; NULL when conf = 1) — ranked by forward
# confidence. q131 stops at symmetric lift; rules are what a
# recommender actually deploys (direction matters: bread→butter and
# butter→bread have the same lift, different confidence).
# Float/ranking determinism: every metric is a single division of
# exact int64 counts — bit-identical doubles on both engines, so the
# confidence ranking needs no rounding; ties break (part_a, part_b).
# Scale shape: identical to q131 — distinct projection, self-join on
# the order key (co-partitioned), support floor applied before the
# per-part joins, broadcast count dims, TakeOrdered top-20.
# ---------------------------------------------------------------------------
RULES_TOP = 20


def q275_rule_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    n_orders = li.agg(
        F.count_distinct("l_orderkey").cast("double").alias("n_orders")
    )
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .where(F.col("support") >= MIN_PAIR_SUPPORT)
    )
    per_part = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders_part")
    )
    pa = per_part.select(
        F.col("l_partkey").alias("part_a"), F.col("n_orders_part").alias("na")
    )
    pb = per_part.select(
        F.col("l_partkey").alias("part_b"), F.col("n_orders_part").alias("nb")
    )
    conf_ab = F.col("support") / F.col("na").cast("double")
    conf_ba = F.col("support") / F.col("nb").cast("double")
    conviction = F.when(
        conf_ab < 1.0,
        (F.lit(1.0) - F.col("nb") / F.col("n_orders")) / (F.lit(1.0) - conf_ab),
    )
    return (
        pairs.join(F.broadcast(pa), "part_a")
        .join(F.broadcast(pb), "part_b")
        .join(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "support",
            "na",
            "nb",
            conf_ab.alias("conf_a2b"),
            conf_ba.alias("conf_b2a"),
            (
                F.col("support")
                * F.col("n_orders")
                / (F.col("na") * F.col("nb")).cast("double")
            ).alias("lift"),
            conviction.alias("conviction_a2b"),
        )
        .orderBy(F.desc("conf_a2b"), "part_a", "part_b")
        .limit(RULES_TOP)
    )


Q275_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_orders FROM li),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(count(*) AS BIGINT) AS support
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {MIN_PAIR_SUPPORT}
),
per_part AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_orders_part
  FROM li GROUP BY 1
)
SELECT part_a, part_b, support,
       pa.n_orders_part AS na,
       pb.n_orders_part AS nb,
       support / CAST(pa.n_orders_part AS DOUBLE) AS conf_a2b,
       support / CAST(pb.n_orders_part AS DOUBLE) AS conf_b2a,
       support * n.n_orders
         / CAST(pa.n_orders_part * pb.n_orders_part AS DOUBLE) AS lift,
       CASE WHEN support / CAST(pa.n_orders_part AS DOUBLE) < 1.0
            THEN (1.0 - pb.n_orders_part / n.n_orders)
                 / (1.0 - support / CAST(pa.n_orders_part AS DOUBLE))
       END AS conviction_a2b
FROM pairs
JOIN per_part pa ON part_a = pa.l_partkey
JOIN per_part pb ON part_b = pb.l_partkey
CROSS JOIN n
ORDER BY conf_a2b DESC, part_a, part_b
LIMIT {RULES_TOP}
"""


# ---------------------------------------------------------------------------
# q132 — deterministic weighted sampling (A-Res, Efraimidis-Spirakis):
# key_i = u_i^(1/w_i) with a deterministic engine-portable uniform
# u_i from a Knuth multiplicative hash of the doc id; the global top-k
# by key IS a weighted sample without replacement. Top-k plans as
# TakeOrderedAndProject (per-partition heaps — no global sort); the
# whole operator is one narrow pass + one k-row reduce, which is the
# scalable form of "sample 1k docs by length from 100 TB".
# ---------------------------------------------------------------------------
WSAMPLE_K = 25
# Two-lane engine-portable mix (functions/hashing.py): the previous
# single-lane `(id % M) * K` form made id and id+M collide — every
# ~1M-apart document pair drew the SAME uniform u_i, i.e. correlated
# sampling at exactly the >1M-id scale the overflow guard targets.
# The two-lane core folds `id div M` back in with a second odd
# constant, raising the collision period to M^2 = 1e12 while keeping
# every intermediate < 5.5e15 (no int64 wrap in Spark, no raise in
# DuckDB, for any int64 id).
from ..functions.hashing import (  # noqa: E402
    HASH_MOD,
    KNUTH1 as KNUTH,
    PORTABLE_ID_MOD as KNUTH_MOD,
    mix_core_duck,
    mix_core_spark,
)


def q132_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    u = (
        (F.expr(mix_core_spark("doc_id")) + 12345) % HASH_MOD + 1
    ).cast("double") / (HASH_MOD + 1)
    key = F.round(F.pow(u, F.lit(1.0) / F.col("n_chars")), 10)
    return (
        docs.select(
            "doc_id",
            "n_chars",
            key.alias("sample_key"),
        )
        .orderBy(F.desc("sample_key"), "doc_id")
        .limit(WSAMPLE_K)
        .select("doc_id", "n_chars", F.round("sample_key", 4).alias("sample_key"))
    )


# NB: the top-k ORDER BY must bind to the 10-digit key, not the
# 4-rounded display value (alias shadowing in an outer ORDER BY picks
# the wrong one and the tie-break changes the selected set).
Q132_SQL = f"""
SELECT doc_id, n_chars, round(k10, 4) AS sample_key
FROM (
  SELECT doc_id, n_chars,
         round(pow(CAST(({mix_core_duck("doc_id")} + 12345)
                        % {HASH_MOD} + 1 AS DOUBLE)
                   / {HASH_MOD + 1}, 1.0 / n_chars), 10) AS k10
  FROM documents
  ORDER BY k10 DESC, doc_id
  LIMIT {WSAMPLE_K}
)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# q218 pareto front (skyline): the parts no other part dominates on
# (price low, size high) — the classic multi-criteria shortlist query
# (SKYLINE operator; Borzsonyi et al., ICDE'01). A part is dominated
# iff some part is <= on price, >= on size, and strictly better on at
# least one. The naive form is the O(n^2) NOT-EXISTS self-join (the
# oracle); the Spark plan is O(n log n) window algebra:
#   1. reduce to one row per DISTINCT price with the max size at that
#      price (groupBy — shuffle-parallel, partial-agg map-side; the
#      only stage that touches all rows);
#   2. over that reduced frontier-candidate set, running
#      max(size) over strictly-cheaper prices (integer-cents RANGE
#      frame ending at -1 makes "strictly cheaper" exact — no double
#      epsilon games) marks dominated price points;
#   3. join survivors back to parts (equal price+size ties are all
#      non-dominated, and kept).
# The prefix max in step 2 runs on |distinct prices| rows, not
# |parts|, and is DISTRIBUTED (functions/prefix.py prefix_max:
# range-partition + per-partition running max + broadcast offsets) —
# the price domain grows with N, so it is never one partition.
# ---------------------------------------------------------------------------
def q218_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    p = part.select(
        "p_partkey",
        "p_size",
        "p_retailprice",
        F.round(F.col("p_retailprice") * 100)
        .cast("bigint")
        .alias("_price_c"),
    )
    per_price = p.groupBy("_price_c").agg(F.max("p_size").alias("_best_size"))
    # distributed exclusive prefix max (functions/prefix.py): _price_c
    # is unique after the groupBy, so ROWS ..-1 == the strictly-cheaper
    # RANGE frame, and the price domain (which grows with N) is never
    # collapsed to one partition
    # frontier columns are RENAMED before the join back to p: the
    # checkpoint inside prefix_max severs the plan-id provenance the
    # ambiguous-self-join resolver needs, so the join carries no
    # duplicated names instead (the q320 p_tbl lesson)
    frontier = (
        prefix_max(per_price, ["_price_c"], "_best_size", "_max_cheaper")
        .where(
            F.col("_max_cheaper").isNull()
            | (F.col("_max_cheaper") < F.col("_best_size"))
        )
        .select(
            F.col("_price_c").alias("_f_price_c"),
            F.col("_best_size").alias("_f_best_size"),
        )
    )
    return (
        p.join(
            F.broadcast(frontier),
            (F.col("_price_c") == F.col("_f_price_c"))
            & (F.col("p_size") == F.col("_f_best_size")),
        )
        .select("p_partkey", "p_size", _r4(F.col("p_retailprice")).alias("price"))
        .orderBy("p_partkey")
    )


Q218_SQL = """
WITH p AS (
  SELECT p_partkey, p_size, p_retailprice,
         CAST(round(p_retailprice * 100) AS BIGINT) AS price_c
  FROM part
)
SELECT a.p_partkey,
       a.p_size,
       round(CAST(a.p_retailprice AS DOUBLE), 4) AS price
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.price_c <= a.price_c AND b.p_size >= a.p_size
    AND (b.price_c < a.price_c OR b.p_size > a.p_size)
)
ORDER BY p_partkey
"""


# ---------------------------------------------------------------------------
# q246 revenue bridge — period-over-period contribution analysis: the
# year-over-year revenue delta per brand decomposed into a PRICE
# effect ((p1-p0)*q1) and a VOLUME effect ((q1-q0)*p0), where p is the
# realized unit price (rev/qty). The two effects sum to the delta
# EXACTLY by construction — the finance-close "bridge"/waterfall every
# BI stack ships, and the template for any metric decomposition
# (tokens-per-source drift, cost attribution). Brands priced in only
# one period are excluded (no unit price to bridge — the declared
# semantics, applied identically in the oracle).
# Plan: ONE scan of lineitem (both years read together, year folded
# into conditional aggregates — not two scans), part dim broadcast,
# one shuffle on brand. 25 output rows.
# ---------------------------------------------------------------------------
BRIDGE_Y0, BRIDGE_Y1 = 1996, 1997


def q246_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    yr = F.year("l_shipdate")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        li.where(yr.isin(BRIDGE_Y0, BRIDGE_Y1))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(F.when(yr == BRIDGE_Y0, rev)).alias("rev0"),
            F.sum(F.when(yr == BRIDGE_Y0, F.col("l_quantity"))).alias("qty0"),
            F.sum(F.when(yr == BRIDGE_Y1, rev)).alias("rev1"),
            F.sum(F.when(yr == BRIDGE_Y1, F.col("l_quantity"))).alias("qty1"),
        )
        .where(F.col("qty0").isNotNull() & F.col("qty1").isNotNull())
    )
    p0 = F.col("rev0") / F.col("qty0")
    p1 = F.col("rev1") / F.col("qty1")
    return agg.select(
        "p_brand",
        _r4(F.col("rev0")).alias("rev0"),
        _r4(F.col("rev1")).alias("rev1"),
        _r4(F.col("rev1") - F.col("rev0")).alias("delta"),
        _r4((p1 - p0) * F.col("qty1")).alias("price_effect"),
        _r4((F.col("qty1") - F.col("qty0")) * p0).alias("volume_effect"),
    ).orderBy("p_brand")


Q246_SQL = f"""
WITH agg AS (
  SELECT p.p_brand,
         sum(CASE WHEN year(l.l_shipdate) = {BRIDGE_Y0}
                  THEN l.l_extendedprice * (1 - l.l_discount) END) AS rev0,
         sum(CASE WHEN year(l.l_shipdate) = {BRIDGE_Y0}
                  THEN l.l_quantity END) AS qty0,
         sum(CASE WHEN year(l.l_shipdate) = {BRIDGE_Y1}
                  THEN l.l_extendedprice * (1 - l.l_discount) END) AS rev1,
         sum(CASE WHEN year(l.l_shipdate) = {BRIDGE_Y1}
                  THEN l.l_quantity END) AS qty1
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE year(l.l_shipdate) IN ({BRIDGE_Y0}, {BRIDGE_Y1})
  GROUP BY p.p_brand
)
SELECT p_brand,
       round(rev0, 4) AS rev0,
       round(rev1, 4) AS rev1,
       round(rev1 - rev0, 4) AS delta,
       round((rev1 / qty1 - rev0 / qty0) * qty1, 4) AS price_effect,
       round((qty1 - qty0) * (rev0 / qty0), 4) AS volume_effect
FROM agg
WHERE qty0 IS NOT NULL AND qty1 IS NOT NULL
ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# q259 — order-fulfilment latency distribution: days from order date
# to the LAST line shipment, summarized per order priority (count,
# mean, exact p50/p90 via interpolated percentile, max). The
# SLA-readout shape: one fact-to-fact aggregate then a percentile per
# small group. Plan: lineitem reduces to per-order max(l_shipdate) in
# ONE map-side-combining groupBy on l_orderkey, joins orders on the
# same key (co-partitioned shuffle), then a 5-group percentile
# aggregate — latencies are small ints so the exact percentile state
# is a per-group histogram, not a sort. Parity: Spark F.percentile
# and DuckDB quantile_cont both use the (n-1)p linear-interpolation
# estimator; inputs are identical ints so the doubles match.
# ---------------------------------------------------------------------------
def q259_fill_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("last_ship")
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lat = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        "o_orderpriority",
        F.datediff(F.to_date("last_ship"), F.to_date("o_orderdate")).alias(
            "latency_days"
        ),
    )
    return (
        lat.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.avg("latency_days").alias("avg_days"),
            F.percentile("latency_days", F.lit(0.5)).alias("p50_days"),
            F.percentile("latency_days", F.lit(0.9)).alias("p90_days"),
            F.max("latency_days").cast("bigint").alias("max_days"),
        )
        .orderBy("o_orderpriority")
    )


Q259_SQL = """
WITH last_ship AS (
  SELECT l_orderkey, max(l_shipdate) AS last_ship
  FROM lineitem GROUP BY l_orderkey
),
lat AS (
  SELECT o.o_orderpriority,
         date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.last_ship AS DATE))
           AS latency_days
  FROM orders o JOIN last_ship l ON o.o_orderkey = l.l_orderkey
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       avg(latency_days) AS avg_days,
       quantile_cont(latency_days, 0.5) AS p50_days,
       quantile_cont(latency_days, 0.9) AS p90_days,
       CAST(max(latency_days) AS BIGINT) AS max_days
FROM lat
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


QUERIES = {
    "q01_scan_project": q01_scan_project,
    "q02_filter_pushdown": q02_filter_pushdown,
    "q03_tpch_q1": q03_tpch_q1,
    "q04_count_distinct": q04_count_distinct,
    "q05_approx_count_distinct": q05_approx_count_distinct,
    "q06_join_inner": q06_join_inner,
    "q07_join_broadcast": q07_join_broadcast,
    "q08_join_multiway": q08_join_multiway,
    "q09_join_left": q09_join_left,
    "q10_join_semi": q10_join_semi,
    "q11_join_anti": q11_join_anti,
    "q12_dedup_exact": q12_dedup_exact,
    "q13_window_topk": q13_window_topk,
    "q14_window_running": q14_window_running,
    "q15_window_lag": q15_window_lag,
    "q16_global_topk": q16_global_topk,
    "q17_set_ops": q17_set_ops,
    "q18_rollup": q18_rollup,
    "q19_string_fns": q19_string_fns,
    "q20_date_fns": q20_date_fns,
    "q21_math_fns": q21_math_fns,
    "q22_array_fns": q22_array_fns,
    "q23_json_fns": q23_json_fns,
    "q30_store_counts": q30_store_counts,
    "q259_fill_latency": q259_fill_latency,
    "q34_latest_per_key": q34_latest_per_key,
    "q36_weighted_avg": q36_weighted_avg,
    "q54_percentiles": q54_percentiles,
    "q55_pivot": q55_pivot,
    "q60_systematic_sample": q60_systematic_sample,
    "q72_window_rank_family": q72_window_rank_family,
    "q61_approx_quantiles": q61_approx_quantiles,
    "q90_tpch_q4_shape": q90_tpch_q4_shape,
    "q91_tpch_q12_shape": q91_tpch_q12_shape,
    "q92_tpch_q14_shape": q92_tpch_q14_shape,
    "q97_tpch_q3_shape": q97_tpch_q3_shape,
    "q98_tpch_q10_shape": q98_tpch_q10_shape,
    "q109_tpch_q5_shape": q109_tpch_q5_shape,
    "q110_tpch_q18_shape": q110_tpch_q18_shape,
    "q112_tpch_q7_shape": q112_tpch_q7_shape,
    "q113_tpch_q11_shape": q113_tpch_q11_shape,
    "q114_tpch_q15_shape": q114_tpch_q15_shape,
    "q115_tpch_q2_shape": q115_tpch_q2_shape,
    "q116_tpch_q19_shape": q116_tpch_q19_shape,
    "q126_tpch_q8_shape": q126_tpch_q8_shape,
    "q127_tpch_q9_shape": q127_tpch_q9_shape,
    "q129_unpivot_metrics": q129_unpivot_metrics,
    "q131_copurchase_lift": q131_copurchase_lift,
    "q275_rule_confidence": q275_rule_confidence,
    "q132_weighted_sample": q132_weighted_sample,
    "q218_pareto_front": q218_pareto_front,
    "q246_revenue_bridge": q246_revenue_bridge,
}

ORACLE = {
    "q259_fill_latency": Q259_SQL,
    "q218_pareto_front": Q218_SQL,
    "q01_scan_project": Q01_SQL,
    "q02_filter_pushdown": Q02_SQL,
    "q03_tpch_q1": Q03_SQL,
    "q04_count_distinct": Q04_SQL,
    "q06_join_inner": Q06_SQL,
    "q07_join_broadcast": Q07_SQL,
    "q08_join_multiway": Q08_SQL,
    "q09_join_left": Q09_SQL,
    "q10_join_semi": Q10_SQL,
    "q11_join_anti": Q11_SQL,
    "q12_dedup_exact": Q12_SQL,
    "q13_window_topk": Q13_SQL,
    "q14_window_running": Q14_SQL,
    "q15_window_lag": Q15_SQL,
    "q16_global_topk": Q16_SQL,
    "q17_set_ops": Q17_SQL,
    "q18_rollup": Q18_SQL,
    "q19_string_fns": Q19_SQL,
    "q20_date_fns": Q20_SQL,
    "q21_math_fns": Q21_SQL,
    "q22_array_fns": Q22_SQL,
    "q23_json_fns": Q23_SQL,
    "q30_store_counts": Q30_SQL,
    "q34_latest_per_key": Q34_SQL,
    "q36_weighted_avg": Q36_SQL,
    "q54_percentiles": Q54_SQL,
    "q55_pivot": Q55_SQL,
    "q60_systematic_sample": Q60_SQL,
    "q72_window_rank_family": Q72_SQL,
    "q90_tpch_q4_shape": Q90_SQL,
    "q91_tpch_q12_shape": Q91_SQL,
    "q92_tpch_q14_shape": Q92_SQL,
    "q97_tpch_q3_shape": Q97_SQL,
    "q98_tpch_q10_shape": Q98_SQL,
    "q109_tpch_q5_shape": Q109_SQL,
    "q110_tpch_q18_shape": Q110_SQL,
    "q112_tpch_q7_shape": Q112_SQL,
    "q113_tpch_q11_shape": Q113_SQL,
    "q114_tpch_q15_shape": Q114_SQL,
    "q115_tpch_q2_shape": Q115_SQL,
    "q116_tpch_q19_shape": Q116_SQL,
    "q126_tpch_q8_shape": Q126_SQL,
    "q127_tpch_q9_shape": Q127_SQL,
    "q129_unpivot_metrics": Q129_SQL,
    "q131_copurchase_lift": Q131_SQL,
    "q275_rule_confidence": Q275_SQL,
    "q132_weighted_sample": Q132_SQL,
    "q246_revenue_bridge": Q246_SQL,
}
