"""SQL front-end surface — queries expressed as ``spark.sql`` text over
registered views, exercising constructs users write directly in SQL:
correlated scalar subqueries, EXISTS with range predicates, and
conditional-aggregation distributions (TPC-H Q2/Q4/Q13 shapes).

Catalyst decorrelates these into the same join plans the DataFrame API
produces — RewriteCorrelatedScalarSubquery turns the per-group min into
an aggregate + join; EXISTS becomes a left-semi join. Registering views
per call is catalog-only (no data copied).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import register_views


def _sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(query)


# TPC-H Q2 shape: rows matching the per-group minimum via a correlated
# scalar subquery.
Q67 = """
SELECT p_partkey, p_name, p_retailprice, p_brand
FROM part p
WHERE p_retailprice = (
  SELECT min(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
)
ORDER BY p_brand, p_partkey
"""


def q67_correlated_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, Q67)


# TPC-H Q4 shape: order-priority distribution for orders with at least
# one lineitem shipped after the order date (EXISTS + range predicate).
Q68 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q68_exists_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, Q68)


# TPC-H Q13 shape: distribution of customers by order count (left join +
# two-level aggregation).
Q69 = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q69_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, Q69)


# Multi-granularity corpus profile in one pass: GROUPING SETS computes
# the (lang, source), (lang), (source) and grand-total aggregates in a
# single Expand + aggregation — one shuffle instead of four queries.
# GROUPING() flags disambiguate real NULLs from rollup rows.
Q108 = """
SELECT coalesce(lang, '(all)') AS lang,
       coalesce(source, '(all)') AS source,
       CAST(grouping(lang) AS BIGINT) AS g_lang,
       CAST(grouping(source) AS BIGINT) AS g_source,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars_total
FROM documents
GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())
ORDER BY g_lang, g_source, lang, source
"""


def q108_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, Q108)


# TPC-H Q21 shape (suppliers who kept orders waiting): for finished
# orders, the suppliers whose lineitem shipped >60 days after the order
# while EVERY other supplier on the same order shipped on time — a
# correlated EXISTS plus a NOT EXISTS over the same fact table.
# Catalyst decorrelates both into left-semi / left-anti joins on
# l_orderkey; no driver-side iteration. (The reference schema has no
# commit/receipt dates, so lateness is ship-vs-order-date.)
Q117 = """
SELECT s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL '60' DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate + INTERVAL '60' DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


def q117_tpch_q21_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, Q117)


# TPC-H Q22 shape (promising idle customers): above-average-balance
# customers in a segment subset with no RECENT orders — a scalar
# average subquery (1-row broadcast) plus NOT EXISTS (left-anti join
# shipping only custkeys; the date predicate prunes the anti side at
# the scan). Segment stands in for the phone country code the
# reference schema lacks; "idle" is date-windowed because this
# corpus's customers all have lifetime orders.
Q118 = """
SELECT CAST(c.c_nationkey % 5 AS BIGINT) AS seg,
       count(*) AS numcust,
       round(sum(c.c_acctbal), 4) AS totacctbal
FROM customer c
WHERE c.c_nationkey % 5 IN (0, 1, 2)
  AND c.c_acctbal > (
    SELECT avg(c2.c_acctbal) FROM customer c2
    WHERE c2.c_acctbal > 0.0 AND c2.c_nationkey % 5 IN (0, 1, 2)
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY 1
ORDER BY 1
"""


def q118_tpch_q22_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, Q118)


QUERIES = {
    "q67_correlated_min": q67_correlated_min,
    "q68_exists_distribution": q68_exists_distribution,
    "q69_count_distribution": q69_count_distribution,
    "q108_grouping_sets": q108_grouping_sets,
    "q117_tpch_q21_shape": q117_tpch_q21_shape,
    "q118_tpch_q22_shape": q118_tpch_q22_shape,
}

# The same ANSI text runs on both engines (views share names/schemas).
ORACLE = {
    "q67_correlated_min": Q67,
    "q68_exists_distribution": Q68,
    "q69_count_distribution": Q69,
    "q108_grouping_sets": Q108,
    "q117_tpch_q21_shape": Q117,
    "q118_tpch_q22_shape": Q118,
}
