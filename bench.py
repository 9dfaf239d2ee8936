"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>,
   "reps": N, "rep_totals": [...], "spread_pct": ...}

Each query is forced end-to-end with the noop sink (full execution, no
driver-side collect skew). Per-query wall-clock excludes session
startup; a warmup query amortizes JVM/codegen first-run cost.

Variance protocol: the ACTIVE set runs REPS times; per-query times and
the headline value are MEDIANS, and rep_totals/spread_pct record the
run-to-run spread — so a real regression is distinguishable from
JVM/GC variance. ANN queries (q47/q49) fit their index on first touch
(cached per session, as a pipeline would); the median therefore
reflects the probe path, with build cost visible in rep_totals[0].
Settled sub-second rows are RETIRED (BASELINE.md "Headline rotation"):
each runs a warmup pass plus two recorded steady-state passes per run
and the BEST of the two lands under "retired_queries" (matching the
HEADLINE comment and BASELINE.md), so the forward band stays fresh
and the 4-rep protocol stays short. A retired row whose best-of-2
exceeds 1.5x its recorded band revives into the active set.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from generative_ai_vector_db_spark.session import get_session  # noqa: E402
from generative_ai_vector_db_spark.operators import (  # noqa: E402
    chunker,
    corpus,
    dedup,
    graph,
    ingest,
    merge_registries,
    mllib_index,
    multimodal,
    pandas_udfs,
    rag,
    relational,
    retrieval,
    scale,
    stats,
    store,
    temporal,
    text,
    vector,
)
from generative_ai_vector_db_spark.streaming import jobs as streaming_jobs  # noqa: E402

# Headline rotation policy (r13, BASELINE.md "Headline rotation"):
# the ACTIVE set below runs the full 4-rep median protocol; rows that
# have SETTLED — sub-second median at sf0.1 in two consecutive quiet
# records with no implementation change in between — move to RETIRED,
# which still executes ONCE per bench run (after warmup) so the
# forward band keeps a fresh number and a regression is still visible
# the round it happens, without 4x-repeating queries whose spread is
# pure noise. Revival rule: a retired query whose once-per-run time
# exceeds 1.5x its recorded band returns to ACTIVE next round. Each
# round's new heavy shapes join ACTIVE (forward-band protocol).
HEADLINE = [
    "q08_join_multiway",
    "q27_similarity_join",
    "q44_minhash_neardup",
    "q47_ann_brp_lsh",
    "q49_ann_ivf",
    "q50_ingest_pipeline",
    # round-7/8 heavy operators (added r8/r9 per VERDICT #4s)
    "q221_heavy_hitters",
    "q223_fuzzy_survivorship",
    "q242_shortest_paths",
    # round-10 heavy operators: iterative peel, Arrow-hash + LSH join,
    # time-bounded self-join, B=200 bootstrap fan-out
    "q292_kcore",
    "q302_portable_minhash",
    "q303_seq_patterns",
    "q305_poisson_bootstrap",
    # round-11 heavy operators: incremental band-index probe, 2-table
    # multiprobe ANN (kept active r13: vectorized in late r12, needs a
    # second settled record), triple-domain sketch scan, rare-shingle
    # posting join
    "q322_incremental_neardup",
    "q320_portable_hyperplane_ann",
    "q327_portable_hll",
    "q338_containment_pairs",
    # round-12 heavy operators: NN-descent graph build + beam search,
    # IVF cell-blocked pair scan, hashed-vocab token double-pass,
    # 50-anchor broadcast scan
    "q347_portable_graph_ann",
    "q346_semdedup_cells",
    "q350_dsir_importance",
    "q351_hubness_audit",
    # round-13 heavy operator: the portable IVF-PQ pipeline (encode
    # scan + ADC shortlist + exact re-rank)
    "q362_portable_ivfpq_ann",
    # round-15 heavy operator: the trained-pivot IVF pipeline (one
    # applyInPandas Lloyd's fit + broadcast-relation assignment scan
    # + probe/re-rank)
    "q369_trained_ivf_ann",
    # round-16 additions (additions-only per the bench contract): the
    # three r16-optimized heavies that were not yet benched — LPA
    # mode-agg rounds, HITS raw-aggregate checkpoint cadence, scaled
    # SemDeDup grouped gram scan
    "q294_label_propagation",
    "q312_hits_bipartite",
    "q366_semdedup_scaled_cells",
]

# Settled sub-second rows (retired r13; medians stable across the
# r8-r12 quiet records — see BASELINE.md for each row's band). Run
# once per bench, recorded under "retired_queries".
RETIRED = [
    "q01_scan_project",
    "q02_filter_pushdown",
    "q03_tpch_q1",
    "q06_join_inner",
    "q13_window_topk",
    "q24_chunk_stride",
    "q25_knn_l2",
    "q26_knn_cosine",
    "q31_tumbling_window",
    "q33_session_window",
    "q38_text_quality",
    "q43_multimodal_decode",
    "q52_delete_by_source",
    "q53_rag_pipeline",
    "q56_salted_agg",
    "q58_asof_join",
    "q63_corpus_stats",
    "q64_repetition_ratio",
    "q215_fuzzy_blocked_dedup",
    "q228_quantile_normalize",
    "q236_inverted_index",
    "q245_power_iteration",
]

# Upper edge of each retired row's recorded band (BASELINE.md
# "Headline rotation": r8-r12 quiet-record medians). The revival rule
# is mechanical: best-of-2 > REVIVAL_FACTOR x band -> the row returns
# to ACTIVE next round; the bench JSON self-reports the trigger under
# "revived" so the tripwire is data, not prose (r14, VERDICT r13
# item 7).
RETIRED_BANDS = {
    "q01_scan_project": 0.60,
    "q02_filter_pushdown": 0.54,
    "q03_tpch_q1": 0.79,
    "q06_join_inner": 0.91,
    "q13_window_topk": 0.93,
    "q24_chunk_stride": 0.68,
    "q25_knn_l2": 1.03,
    "q26_knn_cosine": 0.97,
    "q31_tumbling_window": 1.13,
    "q33_session_window": 1.19,
    "q38_text_quality": 1.86,
    "q43_multimodal_decode": 0.70,
    "q52_delete_by_source": 0.57,
    "q53_rag_pipeline": 1.00,
    "q56_salted_agg": 0.45,
    "q58_asof_join": 0.98,
    "q63_corpus_stats": 0.55,
    "q64_repetition_ratio": 0.81,
    "q215_fuzzy_blocked_dedup": 0.52,
    "q228_quantile_normalize": 0.65,
    "q236_inverted_index": 0.93,
    "q245_power_iteration": 0.79,
}

REVIVAL_FACTOR = 1.5


def revived_queries(
    retired_times: dict[str, float],
    bands: dict[str, float] | None = None,
    factor: float = REVIVAL_FACTOR,
) -> list[str]:
    """Retired rows whose recorded best-of-2 exceeds factor x their
    band — the mechanical revival trigger (pure so it unit-tests
    without a Spark session)."""
    bands = RETIRED_BANDS if bands is None else bands
    return sorted(
        name
        for name, t in retired_times.items()
        if name in bands and t > factor * bands[name]
    )


# r14 verdict item 2: the point probe alone has a false-negative mode
# — BENCH_r14 recorded kept-rep totals of [178.1, 90.4, 103.0] (kept
# spread 97%) while the probes only flagged the DROPPED rep, so the
# record self-labeled `contended: false`. Contention that lands on the
# measured queries but misses the 2-second probe window is invisible
# to the probe; the kept reps' own spread is the direct evidence.
REP_RELATIVE_FACTOR = 1.5  # kept rep total vs fastest kept rep
KEPT_SPREAD_LIMIT_PCT = 35.0  # max-min over min across kept reps


def _steal_jiffies() -> int:
    """Cumulative hypervisor steal time (/proc/stat `cpu` line, field
    9) — 0 where unavailable. This is the GROUND TRUTH behind the
    heuristic flags above: a co-tenant burst on a shared host is
    invisible to in-VM `ps` (r15 observed ~4.8 cumulative CPU-hours of
    steal with a quiet process table) but lands directly here, so the
    JSON records the per-rep steal share alongside the inferred
    verdict."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        return int(parts[8])
    except Exception:
        return 0


def contention_verdict(
    probe_times: list[float],
    kept_idx: list[int],
    kept_totals: list[float],
) -> dict:
    """Combine the point probe with rep-relative evidence (pure, so it
    unit-tests on recorded BENCH shapes without a Spark session).

    - probe: any KEPT rep whose pre-rep probe ran > 1.5x the session's
      median probe (the r11 rule, unchanged).
    - rep-relative: any kept rep total > REP_RELATIVE_FACTOR x the
      fastest kept rep — same-workload reps differing 1.5x cannot both
      be steady-state.
    - spread: kept spread above KEPT_SPREAD_LIMIT_PCT.
    """
    probe_ref = statistics.median(probe_times) if probe_times else 0.0
    contended_reps = [
        i for i, p in enumerate(probe_times) if p > 1.5 * probe_ref
    ]
    probe_hit = bool(set(contended_reps) & set(kept_idx))
    lo = min(kept_totals) if kept_totals else 0.0
    rep_relative_hit = bool(lo) and any(
        t > REP_RELATIVE_FACTOR * lo for t in kept_totals
    )
    spread_pct = (
        round(100.0 * (max(kept_totals) - lo) / lo, 1) if lo else 0.0
    )
    spread_hit = spread_pct > KEPT_SPREAD_LIMIT_PCT
    return {
        "contended_reps": contended_reps,
        "contended_probe": probe_hit,
        "contended_rep_relative": rep_relative_hit,
        "contended_spread": spread_hit,
        "contended": probe_hit or rep_relative_hit or spread_hit,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_session(
        app_name="gavd-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
    )
    queries, _ = merge_registries(
        relational, vector, chunker, corpus, graph, ingest, text, dedup,
        multimodal, pandas_udfs, mllib_index, store, rag, retrieval, scale,
        stats, temporal, streaming_jobs,
    )

    def run(name: str) -> float:
        t0 = time.time()
        queries[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        return time.time() - t0

    # Calibration probe (VERDICT r10 #4): a fixed, data-independent
    # CPU-bound job runs before every rep; its wall time moves with
    # host contention, not with repo code, so the recorded JSON
    # self-labels contended reps — BENCH_r10's 39.4 s headline was a
    # contention artifact distinguishable only via BASELINE.md prose.
    # A rep is flagged when its probe exceeds 1.5x the session's best
    # probe; `contended` is true when any KEPT rep is flagged.
    def probe() -> float:
        t0 = time.time()
        spark.range(0, 30_000_000, 1, 32).selectExpr(
            "sum(id * 2654435761 % 1000003) AS s"
        ).write.mode("overwrite").format("noop").save()
        return time.time() - t0

    # warmup pass over the FULL set (not recorded): JVM/JIT/codegen,
    # parquet footer caches, and the one-time ANN index fits all land
    # here, so the recorded reps measure steady state and spread_pct
    # reflects genuine run-to-run variance rather than cold-start decay.
    probe()  # discard: JVM/codegen first-touch
    warmup = {name: run(name) for name in HEADLINE + RETIRED}
    # retired rows: best-of-2 recorded steady-state passes (forward
    # band + revival tripwire), not the 4-rep protocol — see HEADLINE
    # comment. Best-of-2 because a single pass has no protection
    # against a one-off host hiccup, which would spuriously trip the
    # 1.5x revival rule (observed: q38 4.6 s single-pass vs its
    # 0.6-1.9 s band in an otherwise quiet run).
    retired_times = {
        name: round(min(run(name), run(name)), 3) for name in RETIRED
    }

    # Trim policy (documented in BASELINE.md): run 4 reps, DROP the
    # slowest whole rep, then take per-query medians over the kept
    # reps. The container's CPU allotment swings ~1.6x between runs
    # (r4: rep_totals [38.2, 23.6, 21.1], spread 81% — rep 1 was a
    # noisy outlier, not a regression); a single bad rep should not be
    # able to drag the median. All raw rep totals are still reported.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "4"))
    per_rep: list[dict[str, float]] = []
    probe_times: list[float] = []
    steal_pct_per_rep: list[float] = []
    for _ in range(reps):
        s0, w0 = _steal_jiffies(), time.time()
        probe_times.append(round(probe(), 3))
        per_rep.append({name: run(name) for name in HEADLINE})
        s1, w1 = _steal_jiffies(), time.time()
        # steal share of this rep's total CPU capacity (USER_HZ=100
        # jiffies/s per CPU); >~5% of a rep explains a slow outlier
        cap = 100.0 * int(cpus) * max(w1 - w0, 1e-6)
        steal_pct_per_rep.append(round(100.0 * (s1 - s0) / cap, 2))

    rep_totals = [round(sum(r.values()), 3) for r in per_rep]
    # Drop-index computed directly (r11 advice): recovering kept
    # indices by dict equality would double-count a rep whose totals
    # tie the dropped one, mislabeling the `contended` flag.
    kept_idx = list(range(len(per_rep)))
    if len(per_rep) >= 3:
        drop_i = max(
            range(len(per_rep)), key=lambda i: sum(per_rep[i].values())
        )
        kept_idx.remove(drop_i)
    kept = [per_rep[i] for i in kept_idx]
    times = {
        name: round(statistics.median(r[name] for r in kept), 3)
        for name in HEADLINE
    }
    kept_totals = [round(sum(r.values()), 3) for r in kept]
    lo, hi = min(kept_totals), max(kept_totals)
    rlo, rhi = min(rep_totals), max(rep_totals)
    # reference inside contention_verdict = MEDIAN probe, not the
    # minimum: one anomalously fast probe (observed 0.195 s against a
    # 0.35 s session norm) would otherwise flag every normal rep as
    # contended — the flag should fire for reps slower than the
    # session's typical, not for the session being briefly lucky.
    verdict = contention_verdict(probe_times, kept_idx, kept_totals)
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "reps": reps,
        "trim": "drop-slowest-rep",
        "rep_totals": rep_totals,
        "kept_totals": kept_totals,
        "spread_pct": round(100.0 * (hi - lo) / lo, 1) if lo else 0.0,
        "raw_spread_pct": round(100.0 * (rhi - rlo) / rlo, 1) if rlo else 0.0,
        "warmup_total": round(sum(warmup.values()), 3),
        "retired_queries": retired_times,
        "retired_total": round(sum(retired_times.values()), 3),
        "revived": revived_queries(retired_times),
        "probe_times": probe_times,
        "steal_pct_per_rep": steal_pct_per_rep,
        **verdict,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
