"""Iterative graph analytics over behavioral edges.

The reference has no graph surface; this extends the engine with the
canonical iterative-algorithm shape (fixed-point over an edge list)
the same way q76's connected components does, but with NUMERIC state:
PageRank over the user co-visitation graph (q177's edge construction).
Recommender candidate generation and bot-ring triage both rank users
by centrality in exactly this graph.

Why integer micro-units: PageRank is a float fixed-point, and float
summation order differs between engines (and between executors — the
q71 lesson). Every quantity here is BIGINT micro-units (1e8 = rank
mass 1.0): the teleport term and each neighbor contribution use
integer division (``div`` / ``//``, floor semantics identical in Spark
and DuckDB), so every iteration is bit-exact on both engines AND
independent of partitioning/summation order — the result is
hash-matchable and cluster-deterministic at any scale. The deliberate
floor leakage (< 1e-8 per term) drains a negligible amount of rank
mass and is part of the declared operator semantics, applied
identically in the oracle.

Scale shape: each iteration is ONE shuffle (edges joined to ranks on
src, re-aggregated on dst) — the textbook distributed PageRank plan.
Ranks are re-materialized per round with ``localCheckpoint`` so round
N's plan does not embed rounds 1..N-1 (same hygiene as
dedup.connected_components; swap for reliable ``checkpoint`` on a
long-lived cluster job). Edge degree is attached ONCE before the loop,
not re-joined per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from .quality import COVISIT_CAP, covisit_kept_cte

PR_SCALE = 100_000_000  # rank mass 1.0 in micro-units
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # d = 0.85 as an integer ratio
PR_ITERS = 5
PR_TOP = 20


def _covisit_edges(
    spark: SparkSession, sf_dir: str, cap: int = COVISIT_CAP
) -> DataFrame:
    """Symmetrized q177 co-visitation edges (no top-N truncation):
    users sharing a (event_type, hour) activity bucket, buckets larger
    than ``cap`` dropped as no-signal (see q177)."""
    ev = load(spark, sf_dir, "events")
    visits = ev.select(
        "user_id",
        F.concat_ws(
            "|",
            "event_type",
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH"),
        ).alias("bucket"),
    ).distinct()
    sizes = visits.groupBy("bucket").agg(F.count(F.lit(1)).alias("_u"))
    kept = visits.join(
        F.broadcast(sizes.where(F.col("_u") <= cap).select("bucket")),
        "bucket",
    )
    a = kept.select(F.col("user_id").alias("u_a"), "bucket")
    b = kept.select(F.col("user_id").alias("u_b"), "bucket")
    pairs = (
        a.join(b, "bucket")
        .where(F.col("u_a") < F.col("u_b"))
        .select("u_a", "u_b")
        .distinct()
    )
    return pairs.select(
        F.col("u_a").alias("src"), F.col("u_b").alias("dst")
    ).union(pairs.select(F.col("u_b").alias("src"), F.col("u_a").alias("dst")))


def q193_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _covisit_edges(spark, sf_dir).localCheckpoint()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    # degree attached once; each round then joins ranks only
    edges_d = edges.join(deg, "src").localCheckpoint()
    nstats = deg.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    ranks = (
        deg.select(F.col("src").alias("node"))
        .crossJoin(F.broadcast(nstats))
        .select(
            "node", F.expr(f"{PR_SCALE} div _n").cast("bigint").alias("r")
        )
        .localCheckpoint()
    )
    teleport = F.expr(
        f"({(PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE} div ({PR_DAMP_DEN} * _n))"
    )
    for _ in range(PR_ITERS):
        inflow = (
            edges_d.join(ranks, edges_d.src == ranks.node)
            .select("dst", F.expr("r div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            inflow.crossJoin(F.broadcast(nstats))
            .select(
                F.col("dst").alias("node"),
                (
                    teleport
                    + F.expr(f"({PR_DAMP_NUM} * s) div {PR_DAMP_DEN}")
                )
                .cast("bigint")
                .alias("r"),
            )
            .localCheckpoint()
        )
    return (
        ranks.join(deg, ranks.node == deg.src)
        .select(F.col("node").alias("user_id"), F.col("r").alias("r_units"), "deg")
        .orderBy(F.desc("r_units"), "user_id")
        .limit(PR_TOP)
    )


def _pagerank_sql() -> str:
    teleport = (
        f"({(PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE}"
        f" // ({PR_DAMP_DEN} * (SELECT _n FROM n)))"
    )
    iters = []
    for i in range(1, PR_ITERS + 1):
        iters.append(
            f"""pr{i} AS (
  SELECT e.dst AS node,
         CAST({teleport}
              + ({PR_DAMP_NUM} * sum(p.r // e.deg)) // {PR_DAMP_DEN}
           AS BIGINT) AS r
  FROM edges_d e JOIN pr{i - 1} p ON p.node = e.src
  GROUP BY e.dst
)"""
        )
    chain = ",\n".join(iters)
    return f"""
WITH {covisit_kept_cte()},
pairs AS (
  SELECT DISTINCT a.user_id AS u_a, b.user_id AS u_b
  FROM kept a JOIN kept b USING (bucket)
  WHERE a.user_id < b.user_id
),
edges AS (
  SELECT u_a AS src, u_b AS dst FROM pairs
  UNION ALL
  SELECT u_b AS src, u_a AS dst FROM pairs
),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
edges_d AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)),
n AS (SELECT CAST(count(*) AS BIGINT) AS _n FROM deg),
pr0 AS (
  SELECT src AS node, CAST({PR_SCALE} // (SELECT _n FROM n) AS BIGINT) AS r
  FROM deg
),
{chain}
SELECT p.node AS user_id, p.r AS r_units, d.deg
FROM pr{PR_ITERS} p JOIN deg d ON d.src = p.node
ORDER BY r_units DESC, user_id
LIMIT {PR_TOP}
"""


Q193_SQL = _pagerank_sql()

# ---------------------------------------------------------------------------
# q210 — triangle count + global clustering coefficient over the same
# co-visitation graph: the cohesion metric that separates organic
# communities (high closure) from scripted/bot traffic (star-shaped,
# near-zero closure) — and the classic distributed-graph benchmark
# shape. The orientation is DEGREE-ORDERED (edge points from the
# (deg, id)-smaller endpoint to the larger — "compact-forward"), not
# id-ordered: every node's out-degree is then O(sqrt(m)), so the wedge
# join materializes O(m^1.5) rows worst-case instead of sum(deg^2) —
# on the sf0.1 fixture graph this is the difference between ~100 s and
# ~3 s, and at real scale between feasible and not. Each triangle has
# exactly one source with two out-edges, so counting directed wedges
# whose (b, c) closes in DAG direction counts each triangle once. The
# count is orientation-independent — the DuckDB twin keeps the simple
# id-ordered form and must agree exactly. Wedge total for the
# coefficient comes from degrees (integer); 3T/W is one division.
# The bucket cap is TIGHTER than q177's (15 vs 50): buckets near the
# 50-user ceiling induce ~50-cliques whose C(50,3) triangles are pure
# bucket artifacts — they saturate the coefficient toward 1 and
# dominate the runtime while carrying zero cohesion signal. The cap is
# part of the operator semantics, applied identically in the oracle.
# ---------------------------------------------------------------------------
TRIANGLE_BUCKET_CAP = 15


def q210_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    sym = _covisit_edges(spark, sf_dir, cap=TRIANGLE_BUCKET_CAP)
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    dsrc = deg.select(F.col("src").alias("_s"), F.col("deg").alias("ds"))
    ddst = deg.select(F.col("src").alias("_d"), F.col("deg").alias("dd"))
    dag = (
        sym.join(dsrc, sym.src == dsrc._s)
        .join(ddst, sym.dst == ddst._d)
        .where(
            (F.col("ds") < F.col("dd"))
            | ((F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst")))
        )
        .select("src", "dst", F.col("dd").alias("dord"))
        .localCheckpoint()
    )
    e1 = dag.select(
        F.col("src").alias("a"), F.col("dst").alias("b"), F.col("dord").alias("db")
    )
    e2 = dag.select(
        F.col("src").alias("a2"), F.col("dst").alias("c"), F.col("dord").alias("dc")
    )
    wedges = e1.join(
        e2,
        (e1.a == e2.a2)
        & (
            (F.col("db") < F.col("dc"))
            | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
        ),
    ).select("b", "c")
    closing = dag.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    tri = wedges.join(closing, ["b", "c"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )
    wedge_total = deg.agg(
        F.sum(F.expr("deg * (deg - 1) div 2")).cast("bigint").alias("n_wedges")
    )
    return (
        tri.crossJoin(F.broadcast(wedge_total))
        .select(
            "n_triangles",
            "n_wedges",
            F.round(
                3 * F.col("n_triangles") / F.col("n_wedges").cast("double"), 4
            ).alias("clustering_coeff"),
        )
    )


Q210_SQL = f"""
WITH {covisit_kept_cte(TRIANGLE_BUCKET_CAP)},
canon AS (
  SELECT DISTINCT a.user_id AS src, b.user_id AS dst
  FROM kept a JOIN kept b USING (bucket)
  WHERE a.user_id < b.user_id
),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM canon e1
  JOIN canon e2 ON e1.src = e2.src AND e1.dst < e2.dst
  JOIN canon e3 ON e3.src = e1.dst AND e3.dst = e2.dst
),
deg AS (
  SELECT node, count(*) AS deg FROM (
    SELECT src AS node FROM canon UNION ALL SELECT dst FROM canon
  ) GROUP BY node
),
w AS (
  SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges FROM deg
)
SELECT n_triangles, n_wedges,
       round(3 * n_triangles / CAST(n_wedges AS DOUBLE), 4)
           AS clustering_coeff
FROM tri CROSS JOIN w
"""


# ---------------------------------------------------------------------------
# q211 — personalized PageRank: q193's fixed point with the teleport
# mass concentrated on a SEED set (here: purchasers — a deterministic
# behavioral cohort) instead of spread uniformly. The result ranks
# every user by proximity to the seed cohort through the
# co-visitation graph — the candidate-generation primitive behind
# "users like your buyers" audience expansion and graph-based
# recommendation. Same integer micro-unit discipline and per-round
# localCheckpoint as q193; the only new piece is the seed indicator,
# one broadcast-joined flag. Seed nodes are kept in EVERY round via an
# outer join against the inflow (a seed's teleport mass arrives each
# iteration whether or not any ranked neighbor feeds it — dropping it
# on a no-inflow round would lose rank >= (1-d)/|S|, e.g. on a path
# graph where reachability alternates); non-seed nodes with no inflow
# drop out — semantically rank ~0, so the top-N is unaffected.
# ---------------------------------------------------------------------------
def q211_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    seeds = (
        ev.where(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("node"))
        .distinct()
    )
    edges = _covisit_edges(spark, sf_dir).localCheckpoint()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    edges_d = edges.join(deg, "src").localCheckpoint()
    nodes = deg.select(F.col("src").alias("node"))
    seed_nodes = nodes.join(seeds, "node")  # seeds present in the graph
    ns = seed_nodes.agg(F.count(F.lit(1)).cast("bigint").alias("_s"))
    # teleport lands only on seeds: (1-d)/|S| each, in micro-units
    teleport = F.expr(
        f"({(PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE} div ({PR_DAMP_DEN} * _s))"
    )
    ranks = (
        seed_nodes.crossJoin(F.broadcast(ns))
        .select("node", F.expr(f"{PR_SCALE} div _s").cast("bigint").alias("r"))
        .localCheckpoint()
    )
    is_seed = F.col("_seed").isNotNull()
    # loop-invariant: materialized ONCE, not re-derived (which would
    # re-scan events every iteration inside the eager checkpoint)
    seed_flag = seed_nodes.select(
        F.col("node").alias("_sn"), F.lit(1).alias("_seed")
    ).localCheckpoint()
    for _ in range(PR_ITERS):
        inflow = (
            edges_d.join(ranks, edges_d.src == ranks.node)
            .select("dst", F.expr("r div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            inflow.join(
                seed_flag, inflow.dst == seed_flag._sn, "full"
            )
            .crossJoin(F.broadcast(ns))
            .select(
                F.coalesce(F.col("dst"), F.col("_sn")).alias("node"),
                (
                    F.when(is_seed, teleport).otherwise(F.lit(0))
                    + F.coalesce(
                        F.expr(f"({PR_DAMP_NUM} * s) div {PR_DAMP_DEN}"),
                        F.lit(0),
                    )
                )
                .cast("bigint")
                .alias("r"),
            )
            .localCheckpoint()
        )
    return (
        ranks.join(seed_flag, ranks.node == seed_flag._sn, "left")
        .select(
            F.col("node").alias("user_id"),
            F.col("r").alias("r_units"),
            is_seed.alias("is_seed"),
        )
        .orderBy(F.desc("r_units"), "user_id")
        .limit(PR_TOP)
    )


def _ppr_sql() -> str:
    teleport = (
        f"({(PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE}"
        f" // ({PR_DAMP_DEN} * (SELECT _s FROM ns)))"
    )
    iters = []
    for i in range(1, PR_ITERS + 1):
        iters.append(
            f"""pr{i} AS (
  SELECT coalesce(agg.node, s.node) AS node,
         CAST(CASE WHEN s.node IS NOT NULL THEN {teleport} ELSE 0 END
              + coalesce(({PR_DAMP_NUM} * agg._in) // {PR_DAMP_DEN}, 0)
           AS BIGINT) AS r
  FROM (
    SELECT e.dst AS node, sum(p.r // e.deg) AS _in
    FROM edges_d e JOIN pr{i - 1} p ON p.node = e.src
    GROUP BY e.dst
  ) agg
  FULL OUTER JOIN seed_nodes s ON s.node = agg.node
)"""
        )
    chain = ",\n".join(iters)
    return f"""
WITH {covisit_kept_cte()},
pairs AS (
  SELECT DISTINCT a.user_id AS u_a, b.user_id AS u_b
  FROM kept a JOIN kept b USING (bucket)
  WHERE a.user_id < b.user_id
),
edges AS (
  SELECT u_a AS src, u_b AS dst FROM pairs
  UNION ALL
  SELECT u_b AS src, u_a AS dst FROM pairs
),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
edges_d AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)),
seeds AS (
  SELECT DISTINCT user_id AS node FROM events WHERE event_type = 'purchase'
),
seed_nodes AS (
  SELECT d.src AS node FROM deg d JOIN seeds s ON s.node = d.src
),
ns AS (SELECT CAST(count(*) AS BIGINT) AS _s FROM seed_nodes),
pr0 AS (
  SELECT node, CAST({PR_SCALE} // (SELECT _s FROM ns) AS BIGINT) AS r
  FROM seed_nodes
),
{chain}
SELECT p.node AS user_id, p.r AS r_units,
       p.node IN (SELECT node FROM seed_nodes) AS is_seed
FROM pr{PR_ITERS} p
ORDER BY r_units DESC, user_id
LIMIT {PR_TOP}
"""


Q211_SQL = _ppr_sql()

# ---------------------------------------------------------------------------
# q229 graph profile — one-row topology summary of the co-visitation
# graph: node/edge counts, degree extremes, and DEGREE ASSORTATIVITY
# (Pearson correlation of endpoint degrees across edges — positive =
# hubs link to hubs / social-like, negative = hub-and-spoke /
# bot-like). The profile a pipeline reads BEFORE running the heavier
# graph ops (q193/q210/q211): assortativity and max degree predict
# whether wedge counting needs the degree-ordered orientation and how
# skewed the PageRank shuffle will be. Plan: the edge list is built
# once (same capped covisit CTE as q193/q210/q211), degrees are one
# groupBy, and the correlation comes from SIX exact integer sums
# (m, Σx, Σy, Σxy, Σx², Σy²) folded through the textbook formula —
# doubles enter only at the final multiply/divide/sqrt over exact
# integer inputs, so both engines compute the identical value.
# ---------------------------------------------------------------------------
def q229_graph_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _covisit_edges(spark, sf_dir).localCheckpoint()
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    dx = deg.select(F.col("src").alias("_sx"), F.col("deg").alias("dx"))
    dy = deg.select(F.col("src").alias("_sy"), F.col("deg").alias("dy"))
    ed = (
        edges.join(dx, edges["src"] == dx["_sx"])
        .join(dy, edges["dst"] == dy["_sy"])
        .select("dx", "dy")
    )
    sums = ed.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("dx").cast("bigint").alias("sx"),
        F.sum("dy").cast("bigint").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).cast("bigint").alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).cast("bigint").alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("bigint").alias("syy"),
    )
    nstats = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.max("deg").cast("bigint").alias("max_degree"),
        F.sum("deg").cast("bigint").alias("_degsum"),
    )
    num = (
        F.col("m").cast("double") * F.col("sxy")
        - F.col("sx").cast("double") * F.col("sy")
    )
    den = F.sqrt(
        F.col("m").cast("double") * F.col("sxx")
        - F.col("sx").cast("double") * F.col("sx")
    ) * F.sqrt(
        F.col("m").cast("double") * F.col("syy")
        - F.col("sy").cast("double") * F.col("sy")
    )
    return (
        nstats.crossJoin(sums)
        .select(
            "n_nodes",
            (F.col("m") / 2).cast("bigint").alias("n_edges"),
            "max_degree",
            F.round(
                F.col("_degsum").cast("double") / F.col("n_nodes"), 4
            ).alias("mean_degree"),
            # degree-REGULAR graphs (every degree equal — e.g. one
            # clique) have zero degree variance: the correlation is
            # undefined, emitted as NULL (caught by the hypothesis
            # brute-force test, which generates single-bucket cliques)
            F.when(den != 0, F.round(num / den, 4)).alias("assortativity"),
        )
    )


Q229_SQL = f"""
WITH {covisit_kept_cte()},
pairs AS (
  SELECT DISTINCT a.user_id AS u_a, b.user_id AS u_b
  FROM kept a JOIN kept b USING (bucket)
  WHERE a.user_id < b.user_id
),
edges AS (
  SELECT u_a AS src, u_b AS dst FROM pairs
  UNION ALL
  SELECT u_b AS src, u_a AS dst FROM pairs
),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
ed AS (
  SELECT x.deg AS dx, y.deg AS dy
  FROM edges e JOIN deg x ON e.src = x.src JOIN deg y ON e.dst = y.src
),
sums AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(dx) AS BIGINT) AS sx,
         CAST(sum(dy) AS BIGINT) AS sy,
         CAST(sum(dx * dy) AS BIGINT) AS sxy,
         CAST(sum(dx * dx) AS BIGINT) AS sxx,
         CAST(sum(dy * dy) AS BIGINT) AS syy
  FROM ed
),
nstats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(max(deg) AS BIGINT) AS max_degree,
         CAST(sum(deg) AS BIGINT) AS degsum
  FROM deg
)
SELECT n_nodes,
       CAST(m // 2 AS BIGINT) AS n_edges,
       max_degree,
       round(CAST(degsum AS DOUBLE) / n_nodes, 4) AS mean_degree,
       CASE WHEN sqrt(CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 * sqrt(CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
                 = 0 THEN NULL
            ELSE round(
              (CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
              / (sqrt(CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 * sqrt(CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
              4) END AS assortativity
FROM nstats, sums
"""


# ---------------------------------------------------------------------------
# q242 — single-source shortest paths (BFS hop counts) over the same
# co-visitation graph, bounded to BFS_MAX_HOPS: the "how close is every
# user to patient zero" primitive (influence radius, abuse-ring blast
# radius, friend-of-friend candidate generation). Completes the graph
# family (q193 centrality, q210 cohesion, q211 proximity, q229
# topology, q76/q223 components) with the distance primitive.
# Plan: TRUE frontier expansion (r9, ADVICE r8 — the r8 loop joined
# the full reached set to edges every round, re-expanding settled
# nodes): each round joins only the nodes DISCOVERED last round to
# edges on src, dedupes the candidate dst set, and anti-joins against
# the settled set, so round h touches O(|frontier_h| * degree) edges —
# total work O(E) across all rounds, the textbook distributed BFS.
# Each round is re-materialized with localCheckpoint so round N's plan
# does not embed rounds 1..N-1, and an empty frontier short-circuits.
# After k rounds every min-hop <= k is final (BFS invariant), so the
# k-bounded result is EXACT — hash-graded against a recursive-CTE
# oracle (hops are integers: no float drift). The source is
# data-derived (minimum node id), not a literal, so the operator is
# fixture-scale-independent.
# ---------------------------------------------------------------------------
BFS_MAX_HOPS = 4


def q242_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _covisit_edges(spark, sf_dir).localCheckpoint()
    dist = (
        edges.agg(F.min("src").cast("bigint").alias("node"))
        .withColumn("hops", F.lit(0).cast("bigint"))
        .localCheckpoint()
    )
    frontier = dist.select("node")
    for h in range(1, BFS_MAX_HOPS + 1):
        new = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").cast("bigint").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .withColumn("hops", F.lit(h).cast("bigint"))
            .localCheckpoint()
        )
        if not new.take(1):
            break
        dist = dist.unionByName(new).localCheckpoint()
        frontier = new.select("node")
    return dist.select("node", F.col("hops").cast("bigint").alias("hops")).orderBy(
        "node"
    )


Q242_SQL = f"""
WITH RECURSIVE {covisit_kept_cte()},
pairs AS (
  SELECT DISTINCT a.user_id AS u_a, b.user_id AS u_b
  FROM kept a JOIN kept b USING (bucket)
  WHERE a.user_id < b.user_id
),
edges AS (
  SELECT u_a AS src, u_b AS dst FROM pairs
  UNION ALL
  SELECT u_b AS src, u_a AS dst FROM pairs
),
reach(node, hops) AS (
  SELECT min(src), 0 FROM edges
  UNION
  SELECT e.dst, r.hops + 1
  FROM reach r JOIN edges e ON e.src = r.node
  WHERE r.hops < {BFS_MAX_HOPS}
)
SELECT CAST(node AS BIGINT) AS node,
       CAST(min(hops) AS BIGINT) AS hops
FROM reach
GROUP BY node
ORDER BY node
"""


QUERIES = {
    "q193_graph_pagerank": q193_graph_pagerank,
    "q210_triangle_count": q210_triangle_count,
    "q211_personalized_pagerank": q211_personalized_pagerank,
    "q229_graph_profile": q229_graph_profile,
    "q242_shortest_paths": q242_shortest_paths,
}

ORACLE = {
    "q193_graph_pagerank": Q193_SQL,
    "q210_triangle_count": Q210_SQL,
    "q211_personalized_pagerank": Q211_SQL,
    "q229_graph_profile": Q229_SQL,
    "q242_shortest_paths": Q242_SQL,
}
