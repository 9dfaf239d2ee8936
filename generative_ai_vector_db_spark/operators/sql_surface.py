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


# TPC-H Q16 shape (supplier diversity per part attribute): distinct
# suppliers per (brand, type, size) for a filtered part subset,
# excluding a supplier denylist via NOT IN. The reference corpus has
# no partsupp table, so the part↔supplier relation is the DISTINCT
# (l_partkey, l_suppkey) projection of lineitem — same topology:
# NOT IN decorrelates to a null-aware anti-join on the (tiny,
# broadcast) denylist, then a two-key distinct-count aggregation.
# (Denylist = negative balance, standing in for Q16's complaints
# predicate; empty at tiny SF, non-empty from sf0.01 up.)
Q133 = """
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT ps.l_suppkey) AS supplier_cnt
FROM part p
JOIN (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
  ON p.p_partkey = ps.l_partkey
WHERE p.p_brand <> 'Brand#45'
  AND p.p_type NOT LIKE 'MEDIUM%'
  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND ps.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 40
"""


def q133_tpch_q16_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, Q133)


# TPC-H Q17 shape (small-quantity-order revenue): yearly-average
# revenue from orders whose quantity is below 20% of the per-part
# average — a correlated scalar aggregate on the fact table itself.
# Catalyst's RewriteCorrelatedScalarSubquery turns the inner avg into
# a per-partkey aggregate joined back on l_partkey: one extra
# aggregation + one equi-join, never a per-row subquery execution.
# The brand filter prunes the probe side at the scan.
Q134 = """
SELECT round(sum(l.l_extendedprice) / 7.0, 4) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND l.l_quantity < (
    SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
  )
"""


def q134_tpch_q17_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, Q134)


# TPC-H Q20 shape (suppliers with significant stock of a part class):
# suppliers whose 1996 shipments of 'blue%' parts exceed a volume
# threshold — a nested IN chain (supplier ← grouped lineitem ← part
# name filter). Both INs become left-semi joins; the inner part filter
# is a broadcast semi on l_partkey, the HAVING aggregate runs on the
# pruned fact partition only. (The reference corpus has no partsupp
# availqty, so the threshold is on shipped volume — same plan shape.)
Q135 = """
SELECT s.s_suppkey, s.s_name, round(s.s_acctbal, 4) AS s_acctbal
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l
  WHERE l.l_partkey IN (
      SELECT p.p_partkey FROM part p WHERE p.p_name LIKE 'blue%'
    )
    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l.l_suppkey
  HAVING sum(l.l_quantity) > 50.0
)
ORDER BY s.s_name
"""


def q135_tpch_q20_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, Q135)


# TPC-H Q6 shape (forecast revenue change): single-table filter +
# global aggregate — the canonical predicate-pushdown benchmark. All
# three range predicates reach the parquet scan as PushedFilters, the
# scan reads only 4 of 11 columns (ReadSchema), and the aggregate is a
# partial/final pair with no shuffle beyond the single-row exchange.
# This completes the 22/22 TPC-H query-shape inventory (Q1-Q22).
Q148 = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                * CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24.0
"""


def q148_tpch_q6_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, Q148)


# CUBE: every aggregate granularity of (event_type, day quarter) in one
# Expand + single-shuffle aggregation — the OLAP companion to q18's
# ROLLUP (hierarchical) and q108's explicit GROUPING SETS. GROUPING()
# flags disambiguate real NULLs from cube rows; the value sum uses the
# q71 DECIMAL drift guard. hour()/floor() behave identically on both
# engines over the NTZ-normalized timestamps.
Q164 = """
SELECT coalesce(event_type, '(all)') AS event_type,
       coalesce(CAST(day_quarter AS STRING), '(all)') AS day_quarter,
       CAST(grouping(event_type) AS BIGINT) AS g_type,
       CAST(grouping(day_quarter) AS BIGINT) AS g_quarter,
       CAST(count(*) AS BIGINT) AS n_events,
       round(CAST(sum(CAST(round(value, 8) AS DECIMAL(27,8))) AS DOUBLE), 4)
           AS sum_value
FROM (
  SELECT event_type,
         CAST(floor(hour(ts) / 6) AS BIGINT) AS day_quarter,
         value
  FROM events
)
GROUP BY CUBE (event_type, day_quarter)
ORDER BY g_type, g_quarter, event_type, day_quarter
"""


def q164_cube_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, Q164)


# Recursive CTE (Spark 4 WITH RECURSIVE): hierarchy walk over the
# implicit binary tree parent(doc) = floor(doc_id / 2) — the
# thread-reconstruction / org-rollup shape users write directly in SQL
# now that Spark supports it. The SAME text runs on both engines;
# depth is O(log n) (16 levels at sf0.1), far under Spark's recursion
# limit, and each recursion step is one equi-join on the parent key —
# the iterative q76/q193 loop expressed declaratively.
Q200 = """
WITH RECURSIVE tree AS (
  SELECT doc_id, CAST(0 AS BIGINT) AS depth
  FROM documents WHERE doc_id = 1
  UNION ALL
  SELECT c.doc_id, t.depth + 1
  FROM documents c
  JOIN tree t ON CAST(floor(c.doc_id / 2) AS BIGINT) = t.doc_id
  WHERE c.doc_id > 1
)
SELECT depth,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS min_doc,
       CAST(max(doc_id) AS BIGINT) AS max_doc
FROM tree
GROUP BY depth
ORDER BY depth
"""


def q200_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, Q200)


# LATERAL correlated subquery with per-row ORDER BY/LIMIT — the
# "top-N per group without a window function" idiom (and the form
# users port from Postgres/DuckDB verbatim). Catalyst rewrites the
# correlated limit into a ranked join — the same physical shape as
# q13's window top-k — so the declarative form costs nothing extra.
# Same text on both engines; doc-count ties broken by c_custkey.
Q204 = """
SELECT n.n_name, top.c_custkey, top.c_acctbal
FROM nation n, LATERAL (
  SELECT c_custkey, round(c_acctbal, 2) AS c_acctbal
  FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c.c_acctbal DESC, c.c_custkey
  LIMIT 2
) AS top
ORDER BY n.n_name, top.c_acctbal DESC, top.c_custkey
"""


def q204_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, Q204)


# NULL-semantics parity — grouping BY a null key, count(*) vs
# count(col), a null-safe join (IS NOT DISTINCT FROM) against an
# inline VALUES dimension that carries a NULL key, and NULLS FIRST
# ordering, all in one statement of identical text. The fixtures have
# no physical NULLs, so NULLIF manufactures them deterministically —
# the engine-parity point is the SEMANTICS (null group retained,
# null-safe equality matches the NULL row, count(col) skips nulls),
# which both engines must agree on bit-for-bit for the hash to match.
Q206 = """
WITH o AS (
  SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS status
  FROM orders
),
labels(status, label) AS (
  VALUES ('F', 'finished'), ('P', 'pending'), (NULL, 'open')
)
SELECT o.status, l.label,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(o.status) AS BIGINT) AS n_nonnull
FROM o JOIN labels l ON o.status IS NOT DISTINCT FROM l.status
GROUP BY o.status, l.label
ORDER BY o.status NULLS FIRST
"""


def q206_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, Q206)


# ---------------------------------------------------------------------------
# q226 VARIANT shredding (Spark 4 semi-structured type): the modern
# log-pipeline round trip — construct a nested JSON document per
# event, parse it into the binary VARIANT type, then shred it back to
# columns with TYPED `variant_get` paths and aggregate only from the
# extracted values. The oracle computes the same aggregates straight
# from the base columns, so the hash-match proves the
# construct -> VARIANT -> typed-extract path is LOSSLESS (doubles
# survive via shortest-round-trip JSON printing; ints and strings
# exactly). VARIANT is the Spark-4 face of q23's string-JSON path:
# parse once into a binary tree, then O(1) typed path reads — at
# 100 TB this is the difference between re-parsing JSON text per
# field and one parse + cheap shreds (plus Parquet variant shredding
# on write). No UDFs; everything is codegen expressions.
# ---------------------------------------------------------------------------
# Spark-side text (VARIANT is Spark-4-only, so — uniquely in this
# module — the oracle below is DIFFERENT text over the base columns).
Q226_SPARK = """
WITH docs AS (
  SELECT parse_json(to_json(named_struct(
           'id',  event_id,
           'uid', user_id,
           'm',   named_struct('event_type', event_type, 'value', value),
           'k',   CAST(get_json_object(props, '$.k') AS BIGINT)
         ))) AS v
  FROM events
),
shredded AS (
  SELECT variant_get(v, '$.m.event_type', 'string') AS event_type,
         variant_get(v, '$.m.value', 'double')      AS val,
         variant_get(v, '$.k', 'bigint')            AS k,
         variant_get(v, '$.uid', 'bigint')          AS uid
  FROM docs
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(val), 4) AS sum_value,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(count(DISTINCT uid) AS BIGINT) AS n_users
FROM shredded
GROUP BY event_type
ORDER BY event_type
"""


def q226_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, Q226_SPARK)


Q226 = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 4) AS sum_value,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY event_type
ORDER BY event_type
"""


QUERIES = {
    "q67_correlated_min": q67_correlated_min,
    "q68_exists_distribution": q68_exists_distribution,
    "q69_count_distribution": q69_count_distribution,
    "q108_grouping_sets": q108_grouping_sets,
    "q117_tpch_q21_shape": q117_tpch_q21_shape,
    "q118_tpch_q22_shape": q118_tpch_q22_shape,
    "q133_tpch_q16_shape": q133_tpch_q16_shape,
    "q134_tpch_q17_shape": q134_tpch_q17_shape,
    "q135_tpch_q20_shape": q135_tpch_q20_shape,
    "q148_tpch_q6_shape": q148_tpch_q6_shape,
    "q164_cube_profile": q164_cube_profile,
    "q200_recursive_hierarchy": q200_recursive_hierarchy,
    "q204_lateral_topk": q204_lateral_topk,
    "q206_null_semantics": q206_null_semantics,
    "q226_variant_shred": q226_variant_shred,
}

# The same ANSI text runs on both engines (views share names/schemas).
ORACLE = {
    "q226_variant_shred": Q226,
    "q67_correlated_min": Q67,
    "q68_exists_distribution": Q68,
    "q69_count_distribution": Q69,
    "q108_grouping_sets": Q108,
    "q117_tpch_q21_shape": Q117,
    "q118_tpch_q22_shape": Q118,
    "q133_tpch_q16_shape": Q133,
    "q134_tpch_q17_shape": Q134,
    "q135_tpch_q20_shape": Q135,
    "q148_tpch_q6_shape": Q148,
    "q164_cube_profile": Q164,
    "q200_recursive_hierarchy": Q200,
    "q204_lateral_topk": Q204,
    "q206_null_semantics": Q206,
}
