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

from pyspark.sql import DataFrame, SparkSession, Window
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


# ---------------------------------------------------------------------------
# Round-10 graph tier: the co-PURCHASE graph (parts sharing >= MIN_W
# distinct orders). The co-visitation graph above is near-complete by
# construction (every user shares hourly buckets; median degree ~105
# of 150 nodes), so cohesion/link-prediction on it is degenerate; the
# weight-thresholded co-purchase graph is sparse (median degree ~3),
# the realistic regime for k-core and neighborhood link prediction.
# Pair build: per-order part list self-joined WITHIN the order key —
# quadratic only in order size (bounded ~7 by the TPC-H shape), one
# shuffle on l_orderkey, then a pair-count threshold. At 100 TB the
# basket-size bound keeps the pair explosion linear in lineitem rows.
# ---------------------------------------------------------------------------
COPURCHASE_MIN_W = 2
KCORE_K = 3
# 16 rounds: the fixture worst case converges in 10 (sf0.01); the
# Spark loop short-circuits at the fixpoint and the MATERIALIZED
# oracle unroll is linear in rounds, so the margin is cheap. Peeling
# is monotone, so extra rounds past convergence are no-ops.
KCORE_ROUNDS = 16
LPA_ROUNDS = 4
AA_SCALE = 1_000_000_000_000  # Adamic-Adar micro-units (1e12 = 1.0)


def copurchase_edges_cte(min_w: int = COPURCHASE_MIN_W) -> str:
    """The ONE SQL definition of the thresholded co-purchase edge list
    (embedded by Q292/Q293/Q294 so operator and oracle cannot drift)."""
    return f"""li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
wpairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb,
         CAST(count(*) AS BIGINT) AS w
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
),
p2 AS (SELECT pa, pb FROM wpairs WHERE w >= {min_w}),
edges AS (
  SELECT pa AS src, pb AS dst FROM p2
  UNION ALL
  SELECT pb AS src, pa AS dst FROM p2
)"""


def _copurchase_edges(
    spark: SparkSession, sf_dir: str, min_w: int = COPURCHASE_MIN_W
) -> DataFrame:
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    p2 = (
        a.join(b, "ok")
        .where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        .where(F.col("w") >= min_w)
        .select("pa", "pb")
    )
    return p2.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst")
    ).union(p2.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))


# ---------------------------------------------------------------------------
# q292 — k-core decomposition (k=3) by iterative peeling: drop nodes
# with degree < k, recompute, repeat. The operator is defined as
# KCORE_ROUNDS peel rounds; peeling is monotone (each round only
# removes), so once a round removes nothing every later round is a
# no-op — the Spark loop short-circuits on a stable edge count, which
# is result-identical to running all rounds, and the oracle unrolls
# the full fixed count. Integer-only state: hash-exact.
# Scale: each round is one groupBy(degree) + one semi-join filter on a
# SHRINKING edge list, localCheckpoint per round (plan does not nest).
# ---------------------------------------------------------------------------
def q292_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core membership + within-core degree for the co-purchase
    graph. Core analytics triage "structurally dense" product groups
    (recommender seed sets, bundle detection)."""
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint()
    prev = edges.count()
    for _ in range(KCORE_ROUNDS):
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("dg"))
        # semi-joins, no broadcast hint: the survivor node set scales
        # with the graph, so AQE picks the strategy per round
        keep = deg.where(F.col("dg") >= KCORE_K).select("src")
        edges = (
            edges.join(keep, "src", "left_semi")
            .join(
                keep.select(F.col("src").alias("dst")), "dst", "left_semi"
            )
            .select("src", "dst")
            .localCheckpoint()
        )
        cur = edges.count()
        if cur == prev:
            break
        prev = cur
    return (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_deg"))
        .select(F.col("src").cast("bigint").alias("node"), "core_deg")
        .orderBy("node")
    )


def _kcore_sql() -> str:
    # Every stage is MATERIALIZED: stage i+1 references stage i three
    # times (via the degree filter), so default CTE inlining would
    # expand the base scan 3^R times — materialization keeps the
    # oracle linear, mirroring the Spark loop's localCheckpoint.
    stages = []
    for i in range(KCORE_ROUNDS):
        p = f"e{i}" if i else "e0"
        stages.append(
            f"""d{i} AS (SELECT src, count(*) AS dg FROM {p} GROUP BY src),
k{i} AS MATERIALIZED (SELECT src FROM d{i} WHERE dg >= {KCORE_K}),
e{i + 1} AS MATERIALIZED (
  SELECT e.src, e.dst FROM {p} e
  JOIN k{i} a ON e.src = a.src JOIN k{i} b ON e.dst = b.src
)"""
        )
    last = f"e{KCORE_ROUNDS}"
    body = ",\n".join(stages)
    return f"""WITH {copurchase_edges_cte()},
e0 AS MATERIALIZED (SELECT src, dst FROM edges),
{body}
SELECT CAST(src AS BIGINT) AS node, CAST(count(*) AS BIGINT) AS core_deg
FROM {last}
GROUP BY src
ORDER BY node
"""


Q292_SQL = _kcore_sql()


# ---------------------------------------------------------------------------
# q293 — neighborhood link prediction: for non-adjacent part pairs at
# distance 2, common-neighbor count, Jaccard overlap, and the
# Resource-Allocation index (Zhou/Lü/Zhang 2009): Σ 1/deg(z) over
# common neighbors z. RA is summed in BIGINT micro-units
# (floor(1e12 / deg_z) per common neighbor — IEEE division + floor is
# bit-determined, unlike ln(), whose libm-vs-JVM last-ulp differences
# could flip a floor): integer summation is order-independent, so the
# score (and the top-30 cut it ranks) is bit-exact on both engines and
# under any partitioning (the q193 micro-unit discipline).
# Scale: the wedge join (z's neighbor pairs) is Σ deg(z)^2, bounded by
# the threshold-sparse degree profile; candidates are deduped to
# (a, b) once, the known-edge anti-join uses the edge list itself, and
# the final top-30 is a TakeOrdered, never a global sort.
# ---------------------------------------------------------------------------
LINKPRED_TOP = 30


def q293_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("dg"))
    # wedge: z adjacent to both a and b, a < b
    e1 = edges.select(F.col("src").alias("z"), F.col("dst").alias("u_a"))
    e2 = edges.select(F.col("src").alias("z"), F.col("dst").alias("u_b"))
    wedges = e1.join(e2, "z").where(F.col("u_a") < F.col("u_b"))
    cand = (
        wedges.join(
            deg.select(F.col("src").alias("z"), F.col("dg").alias("dgz")), "z"
        )
        .groupBy("u_a", "u_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cn"),
            F.sum(
                F.floor(F.lit(float(AA_SCALE)) / F.col("dgz").cast("double"))
                .cast("bigint")
            )
            .cast("bigint")
            .alias("ra_micro"),
        )
    )
    known = edges.select(
        F.col("src").alias("u_a"), F.col("dst").alias("u_b")
    )
    cand = cand.join(known, ["u_a", "u_b"], "left_anti")
    da = deg.select(F.col("src").alias("u_a"), F.col("dg").alias("da"))
    db = deg.select(F.col("src").alias("u_b"), F.col("dg").alias("db"))
    return (
        cand.join(da, "u_a")
        .join(db, "u_b")
        .select(
            F.col("u_a").cast("bigint").alias("part_a"),
            F.col("u_b").cast("bigint").alias("part_b"),
            "cn",
            (
                F.col("cn").cast("double")
                / (F.col("da") + F.col("db") - F.col("cn")).cast("double")
            ).alias("jaccard"),
            "ra_micro",
        )
        .orderBy(F.desc("ra_micro"), "part_a", "part_b")
        .limit(LINKPRED_TOP)
    )


Q293_SQL = f"""
WITH {copurchase_edges_cte()},
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS dg FROM edges GROUP BY src),
wedges AS (
  SELECT e1.dst AS u_a, e2.dst AS u_b, e1.src AS z
  FROM edges e1 JOIN edges e2 ON e1.src = e2.src
  WHERE e1.dst < e2.dst
),
cand AS (
  SELECT u_a, u_b, CAST(count(*) AS BIGINT) AS cn,
         CAST(sum(CAST(floor({AA_SCALE}.0 / CAST(d.dg AS DOUBLE))
                       AS BIGINT)) AS BIGINT) AS ra_micro
  FROM wedges w JOIN deg d ON w.z = d.src
  GROUP BY u_a, u_b
),
new_pairs AS (
  SELECT c.* FROM cand c
  LEFT JOIN edges e ON c.u_a = e.src AND c.u_b = e.dst
  WHERE e.src IS NULL
)
SELECT CAST(n.u_a AS BIGINT) AS part_a,
       CAST(n.u_b AS BIGINT) AS part_b,
       cn,
       CAST(cn AS DOUBLE) / CAST(a.dg + b.dg - cn AS DOUBLE) AS jaccard,
       ra_micro
FROM new_pairs n JOIN deg a ON n.u_a = a.src JOIN deg b ON n.u_b = b.src
ORDER BY ra_micro DESC, part_a, part_b
LIMIT {LINKPRED_TOP}
"""


# ---------------------------------------------------------------------------
# q294 — synchronous majority label propagation (community detection),
# LPA_ROUNDS rounds: every node simultaneously adopts the most frequent
# label among its neighbors, ties to the smallest label. All state is
# integer labels with a deterministic tie-break, so the fixed-round
# result is exact on both engines (no convergence/oscillation
# ambiguity: the operator is DEFINED as R synchronous rounds).
#
# r16 PERF (guide §2.4 remove shuffles, §2.2 iterative cadence): the
# per-round groupBy(dst, label).count + row_number window was TWO
# exchanges plus a per-node sort per round; mode(label, true) — the
# deterministic mode, which by definition returns the LOWEST value
# among the most-frequent (Spark 4's documented tie rule, exactly this
# operator's "most frequent, ties to smallest") — computes the same
# label in ONE hash aggregate with map-side partial maps, no sort. The
# per-round localCheckpoint is gone too: each round's labels frame has
# exactly one consumer (the next round), so the 4 rounds pipeline into
# a single job over the one checkpointed edge list instead of 4 eager
# barrier jobs (bit-identical at all SFs + the lineitem decade;
# reference-vs-mode equality is test-locked, and the sparse graph makes
# count-1 ties ubiquitous, so the fixtures exercise the tie rule hard).
# Scale: one shuffle per round (edges join labels on src, re-aggregate
# on dst), lineage depth fixed at LPA_ROUNDS.
# ---------------------------------------------------------------------------
def q294_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    for _ in range(LPA_ROUNDS):
        labels = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.mode(F.col("label"), True).alias("label"))
        )
    return (
        labels.groupBy("label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("community_size"))
        .select(F.col("label").cast("bigint").alias("community"), "community_size")
        .where(F.col("community_size") >= 2)
        .orderBy(F.desc("community_size"), "community")
    )


def _lpa_sql() -> str:
    stages = []
    for i in range(LPA_ROUNDS):
        p = f"l{i}" if i else "l0"
        stages.append(
            f"""nb{i} AS (
  SELECT e.dst AS node, l.label, count(*) AS c
  FROM e0 e JOIN {p} l ON e.src = l.node
  GROUP BY e.dst, l.label
),
l{i + 1} AS MATERIALIZED (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node
                              ORDER BY c DESC, label ASC) AS rn
    FROM nb{i}
  ) WHERE rn = 1
)"""
        )
    body = ",\n".join(stages)
    return f"""WITH {copurchase_edges_cte()},
e0 AS MATERIALIZED (SELECT src, dst FROM edges),
l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM e0),
{body}
SELECT CAST(label AS BIGINT) AS community,
       CAST(count(*) AS BIGINT) AS community_size
FROM l{LPA_ROUNDS}
GROUP BY label
HAVING count(*) >= 2
ORDER BY community_size DESC, community
"""


Q294_SQL = _lpa_sql()


# ---------------------------------------------------------------------------
# q312 — HITS hubs & authorities on the supplier -> part bipartite
# supply graph (distinct (s_suppkey, l_partkey) pairs from lineitem):
# authority(part) = Σ hub(supplier) over its suppliers, hub(supplier)
# = Σ authority(part) over its parts, renormalized to HITS_SCALE
# total mass each half-round. All state is BIGINT micro-units with
# integer renormalization (x * SCALE div Σx) — the q193 discipline:
# bit-exact on both engines, partitioning-independent. Top-20
# authorities out. Ranks the "most structurally central" parts —
# candidate seeds for assortment/recommendation.
# Scale: each half-round is one shuffle (edges ⋈ scores on one side,
# re-agg on the other); the renorm total is a broadcast 1-row agg;
# localCheckpoint per round; oracle unrolled.
# ---------------------------------------------------------------------------
HITS_SCALE = 100_000_000
HITS_ITERS = 3
HITS_TOP = 20


def q312_hits_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ed = (
        load(spark, sf_dir, "lineitem")
        .select(
            F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .localCheckpoint()
    )
    # r16 PERF (guide §2.2 iterative cadence): the checkpoint moved
    # from the RENORMALIZED frame to the RAW per-side aggregate. The
    # renorm total (atot/htot) is a broadcast subtree, and a broadcast
    # materializes through its own job — checkpointing only `auth`
    # meant every half-round executed the heavy edges-join-groupBy
    # TWICE (once under the 1-row total's broadcast, once in the main
    # plan). Checkpointing `araw`/`hraw` computes it ONCE; the renorm
    # projection and the 1-row total both read the materialized rows.
    # Bit-identical (integer state) at all SFs + the lineitem decade.
    hubs = (
        ed.select("s")
        .distinct()
        .select("s", F.lit(1).cast("bigint").alias("h"))
    )
    auth = None
    for _ in range(HITS_ITERS):
        araw = (
            ed.join(hubs, "s")
            .groupBy("p")
            .agg(F.sum("h").cast("bigint").alias("ar"))
            .localCheckpoint()
        )
        atot = araw.agg(F.sum("ar").cast("bigint").alias("_t"))
        auth = araw.crossJoin(F.broadcast(atot)).select(
            "p",
            F.expr(f"ar * {HITS_SCALE} div _t").cast("bigint").alias("a"),
        )
        hraw = (
            ed.join(auth, "p")
            .groupBy("s")
            .agg(F.sum("a").cast("bigint").alias("hr"))
            .localCheckpoint()
        )
        htot = hraw.agg(F.sum("hr").cast("bigint").alias("_t"))
        hubs = hraw.crossJoin(F.broadcast(htot)).select(
            "s",
            F.expr(f"hr * {HITS_SCALE} div _t").cast("bigint").alias("h"),
        )
    deg = ed.groupBy("p").agg(F.count(F.lit(1)).cast("bigint").alias("n_suppliers"))
    return (
        auth.join(deg, "p")
        .select(
            F.col("p").cast("bigint").alias("partkey"),
            F.col("a").alias("authority_units"),
            "n_suppliers",
        )
        .orderBy(F.desc("authority_units"), "partkey")
        .limit(HITS_TOP)
    )


def _hits_sql() -> str:
    stages = []
    prev_h = "h0"
    for i in range(HITS_ITERS):
        stages.append(
            f"""ar{i} AS (
  SELECT e.p, CAST(sum(h.h) AS BIGINT) AS ar
  FROM ed e JOIN {prev_h} h USING (s) GROUP BY e.p
),
a{i} AS MATERIALIZED (
  SELECT p, CAST(ar * {HITS_SCALE} // (SELECT sum(ar) FROM ar{i}) AS BIGINT)
           AS a
  FROM ar{i}
),
hr{i} AS (
  SELECT e.s, CAST(sum(a.a) AS BIGINT) AS hr
  FROM ed e JOIN a{i} a USING (p) GROUP BY e.s
),
h{i + 1} AS MATERIALIZED (
  SELECT s, CAST(hr * {HITS_SCALE} // (SELECT sum(hr) FROM hr{i}) AS BIGINT)
           AS h
  FROM hr{i}
)"""
        )
        prev_h = f"h{i + 1}"
    body = ",\n".join(stages)
    last_a = f"a{HITS_ITERS - 1}"
    return f"""
WITH ed AS MATERIALIZED (
  SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
),
h0 AS (SELECT DISTINCT s, CAST(1 AS BIGINT) AS h FROM ed),
{body},
deg AS (SELECT p, CAST(count(*) AS BIGINT) AS n_suppliers FROM ed GROUP BY p)
SELECT CAST(a.p AS BIGINT) AS partkey,
       a.a AS authority_units,
       d.n_suppliers
FROM {last_a} a JOIN deg d USING (p)
ORDER BY authority_units DESC, partkey
LIMIT {HITS_TOP}
"""


Q312_SQL = _hits_sql()


# ---------------------------------------------------------------------------
# q333 — degree assortativity of the co-visitation graph: Pearson
# correlation of endpoint degrees over the (symmetrized) directed edge
# list — Newman's r. Positive = hubs attach to hubs (social shape),
# negative = hub-and-spoke (infrastructure shape); q229's profile
# reports the degree DISTRIBUTION, this reports how degrees WIRE — the
# one-number readout that decides whether q292-style k-core peeling or
# q211-style hub personalization is the right decomposition.
# Scale: degrees are one groupBy over edges; the corr is a single agg
# over the edge list with both endpoint degrees joined in (two
# broadcast-able joins against the |V|-row degree table).
# ---------------------------------------------------------------------------
def q333_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _covisit_edges(spark, sf_dir).localCheckpoint()
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    ds = deg.select(F.col("src").alias("s"), F.col("deg").alias("deg_src"))
    dd = deg.select(F.col("src").alias("d"), F.col("deg").alias("deg_dst"))
    joined = edges.join(ds, edges.src == ds.s).join(dd, edges.dst == dd.d)
    return joined.agg(
        (F.count(F.lit(1)) / 2).cast("bigint").alias("n_edges"),
        F.countDistinct(edges.src).cast("bigint").alias("n_nodes"),
        F.round(
            F.corr(
                F.col("deg_src").cast("double"), F.col("deg_dst").cast("double")
            ),
            4,
        ).alias("assortativity"),
    )


Q333_SQL = f"""
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
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src)
SELECT CAST(count(*) / 2 AS BIGINT) AS n_edges,
       CAST(count(DISTINCT e.src) AS BIGINT) AS n_nodes,
       round(corr(CAST(ds.deg AS DOUBLE), CAST(dd.deg AS DOUBLE)), 4)
         AS assortativity
FROM edges e
JOIN deg ds ON ds.src = e.src
JOIN deg dd ON dd.src = e.dst
"""


QUERIES = {
    "q333_degree_assortativity": q333_degree_assortativity,
    "q193_graph_pagerank": q193_graph_pagerank,
    "q312_hits_bipartite": q312_hits_bipartite,
    "q210_triangle_count": q210_triangle_count,
    "q211_personalized_pagerank": q211_personalized_pagerank,
    "q229_graph_profile": q229_graph_profile,
    "q242_shortest_paths": q242_shortest_paths,
    "q292_kcore": q292_kcore,
    "q293_link_prediction": q293_link_prediction,
    "q294_label_propagation": q294_label_propagation,
}

ORACLE = {
    "q333_degree_assortativity": Q333_SQL,
    "q193_graph_pagerank": Q193_SQL,
    "q312_hits_bipartite": Q312_SQL,
    "q210_triangle_count": Q210_SQL,
    "q211_personalized_pagerank": Q211_SQL,
    "q229_graph_profile": Q229_SQL,
    "q242_shortest_paths": Q242_SQL,
    "q292_kcore": Q292_SQL,
    "q293_link_prediction": Q293_SQL,
    "q294_label_propagation": Q294_SQL,
}
