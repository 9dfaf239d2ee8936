"""Distributed global prefix sums over an ordered frame.

The rank-statistics family (KS / Mann-Whitney / Kruskal-Wallis / CvM /
ROC — q220, q282, q289, q316, q286) reduces events to a DISTINCT-VALUE
frame and then needs running totals in value order. The naive form is
``Window.orderBy(value)`` — an UNPARTITIONED window that moves the whole
distinct-value domain to one partition. That was acceptable under a
bounded-domain assumption, but the r12 judge measured the fixture's own
domain growing ~N^0.43 (6.6k distinct values at sf0.01 -> 17.8k at
sf0.1), so at 100 TB the domain is billions of rows and the single
partition is a real bottleneck.

``prefix_sums`` computes the same running totals as a distributed plan
(the q283 ``_global_rank`` / q239 ``_global_ntile`` machinery,
generalized from row_number to arbitrary SUM columns):

1. ``repartitionByRange`` on the order key — Spark's range partitioner
   places lower keys in lower partition ids, so ``spark_partition_id``
   ordering matches key ordering and every key lives in exactly one
   partition;
2. per-partition running sums via a window PARTITIONED by ``_pid``
   (never unpartitioned — each partition sorts locally);
3. per-partition totals, prefix-summed into partition offsets through a
   triangular broadcast self-join over the <= n_parts-row frame;
4. global prefix = broadcast offset + local running sum.

The result is bit-identical to the unpartitioned window (integer sums
in any grouping order), so oracle SQL and driver hashes are unchanged.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

PREFIX_RANK_PARTS = 32  # range-partition width for the distributed scan


def _as_cols(order_cols: Sequence) -> list:
    """Names stay names; Column expressions (e.g. F.desc('x')) pass
    through — the range partitioner and the per-partition window both
    honor the same sort direction, so spark_partition_id order matches
    key order either way."""
    return [
        c if isinstance(c, Column) else F.col(c) for c in order_cols
    ]


def prefix_sums(
    df: DataFrame,
    order_cols: Sequence[str],
    sums: Mapping[str, str],
    *,
    inclusive: bool = False,
    n_parts: int = PREFIX_RANK_PARTS,
) -> DataFrame:
    """Append global running totals of each ``sums`` key over
    ``ORDER BY order_cols`` as the mapped output column, without an
    unpartitioned window.

    ``order_cols`` must be a strict total order over ``df`` (for the
    distinct-value frames here, the value column alone); entries may
    be names or Column expressions (e.g. ``F.desc("n")``) — both the
    range partitioner and the windows honor the direction. ``inclusive``
    selects UNBOUNDED PRECEDING .. CURRENT ROW; the default is the
    exclusive .. 1 PRECEDING frame (coalesced to 0 on the first row).
    Output columns are BIGINT; inputs must be integral.
    """
    order_cols = _as_cols(order_cols)
    # localCheckpoint is LOAD-BEARING, not an optimization: the range
    # partitioner SAMPLES its boundaries from the upstream row order,
    # and when the input is a hash aggregate that order is
    # nondeterministic — two plan instantiations of the same
    # repartitionByRange can draw DIFFERENT boundaries, so the spine's
    # _pid and the totals' _pid silently disagree (observed at sf0.1:
    # q282 offsets shifted by a whole boundary's worth of rows).
    # Materializing the partitioned frame once freezes boundaries and
    # _pid for every consumer.
    d = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    pt = d.groupBy("_pid").agg(
        *[F.sum(src).alias(f"_t_{out}") for src, out in sums.items()]
    )
    off = (
        pt.join(
            F.broadcast(
                pt.select(
                    F.col("_pid").alias("_bpid"),
                    *[
                        F.col(f"_t_{out}").alias(f"_bt_{out}")
                        for out in sums.values()
                    ],
                )
            ),
            F.col("_bpid") < F.col("_pid"),
            "left",
        )
        .groupBy("_pid")
        .agg(
            *[
                F.coalesce(F.sum(f"_bt_{out}"), F.lit(0)).alias(f"_off_{out}")
                for out in sums.values()
            ]
        )
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0 if inclusive else -1)
    )
    res = d.join(F.broadcast(off), "_pid")
    for src, out in sums.items():
        res = res.withColumn(
            out,
            (
                F.col(f"_off_{out}")
                + F.coalesce(F.sum(src).over(w), F.lit(0))
            ).cast("bigint"),
        )
    return res.drop("_pid", *[f"_off_{out}" for out in sums.values()])


def prefix_max(
    df: DataFrame,
    order_cols: Sequence,
    src: str,
    out: str,
    *,
    n_parts: int = PREFIX_RANK_PARTS,
) -> DataFrame:
    """Append the EXCLUSIVE running maximum of ``src`` over
    ``ORDER BY order_cols`` as ``out``, distributed exactly like
    ``prefix_sums`` (range-partition, per-partition running max,
    broadcast per-partition max offsets merged with ``greatest``).
    The first row in the global order gets NULL (max over an empty
    frame) — the same semantics as an unpartitioned
    ``rowsBetween(unboundedPreceding, -1)`` max, which is what the
    strictly-dominates frontier tests (q218) rely on.
    """
    order_cols = _as_cols(order_cols)
    # localCheckpoint: same boundary-consistency requirement as
    # prefix_sums (see the comment there)
    d = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    pt = d.groupBy("_pid").agg(F.max(src).alias("_t"))
    off = (
        pt.join(
            F.broadcast(
                pt.select(
                    F.col("_pid").alias("_bpid"), F.col("_t").alias("_bt")
                )
            ),
            F.col("_bpid") < F.col("_pid"),
            "left",
        )
        .groupBy("_pid")
        .agg(F.max("_bt").alias("_off"))
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # greatest() skips NULLs, returning NULL only when BOTH the local
    # exclusive prefix (first row in partition) and the offset (first
    # partition) are NULL — exactly the empty-frame semantics
    return (
        d.join(F.broadcast(off), "_pid")
        .withColumn(out, F.greatest(F.max(src).over(w), F.col("_off")))
        .drop("_pid", "_off")
    )
