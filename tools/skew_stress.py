"""Skew-stress probe: what happens when 30% of the rows share one key?

Uniform amplification (scale_stress.py) proves linearity; real 100 TB
corpora are NOT uniform — one domain, one bot user, one hot order can
own a double-digit share of a key column.  This tool takes the
amplified tables and remaps keys on the fly (a narrow map, no data
written) so a fixed fraction of rows collide on a single hot key,
then measures the three operator classes that react differently:

1. Sort-merge JOIN with a skewed fact key — the case AQE skew-split
   exists for (`spark.sql.adaptive.skewJoin`): measured on vs off.
2. Hash AGGREGATION with a skewed group key — partial aggregation
   makes skew a non-event (the hot key is combined map-side before it
   ever crosses the network); measured skewed vs uniform.
3. WINDOW over a skewed partition key (sessionization) — the honest
   hard case: a per-key window is semantically serial per key, no
   engine can split it; measured, and the mitigation documented
   (sub-key salting where semantics allow — see q_agg_salted /
   q_join_salted in operators/scale.py).

Usage: python tools/skew_stress.py [amplified_dir]
Writes SKEW.md at the repo root and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from morphl_model_user_search_intent_spark import get_spark
from morphl_model_user_search_intent_spark.io import table

AMP_DIR = (
    sys.argv[1]
    if len(sys.argv) > 1
    else os.path.join(REPO, ".scratch", "scale100x")
)
HOT_FRAC_MOD = 10  # event_id % 10 < 3  -> 30% of rows on the hot key
HOT_SHARE = 3


def _timed(build) -> float:
    """build: () -> DataFrame.  The plan is REBUILT for the timed run:
    re-collecting one DataFrame object lets the DAG scheduler skip
    already-materialized shuffle map stages (same shuffle ids), which
    would time only the final stage and hide the skew entirely."""
    build().collect()  # warm
    t0 = time.perf_counter()
    build().collect()
    return time.perf_counter() - t0


def skewed_lineitem(spark):
    """30% of lineitem rows remapped onto one hot l_orderkey (the
    order side stays unique per key — realistic fact-side skew)."""
    li = table(spark, AMP_DIR, "lineitem")
    hot = F.lit(1)  # orderkey 1 exists in every amplification
    return li.withColumn(
        "l_orderkey",
        F.when(
            F.col("l_orderkey") % HOT_FRAC_MOD < HOT_SHARE, hot
        ).otherwise(F.col("l_orderkey")),
    )


def join_query(spark, li):
    o = table(spark, AMP_DIR, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
        "o_orderpriority"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
            "cents"
        ),
    )
    return j


def agg_query(spark, skew: bool):
    ev = table(spark, AMP_DIR, "events")
    if skew:
        ev = ev.withColumn(
            "user_id",
            F.when(F.col("event_id") % HOT_FRAC_MOD < HOT_SHARE, F.lit(0))
            .otherwise(F.col("user_id")),
        )
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("units"),
    )


def window_query(spark, skew: bool):
    from pyspark.sql import Window as W

    ev = table(spark, AMP_DIR, "events")
    if skew:
        ev = ev.withColumn(
            "user_id",
            F.when(F.col("event_id") % HOT_FRAC_MOD < HOT_SHARE, F.lit(0))
            .otherwise(F.col("user_id")),
        )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(
        F.lag("ts").over(w)
    )
    new_s = (
        F.when(F.lag("ts").over(w).isNull(), 1)
        .when(gap_us > 1800 * 1_000_000, 1)
        .otherwise(0)
    )
    return (
        ev.withColumn("sid", F.sum(new_s).over(run))
        .groupBy("user_id", "sid")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def chunked_window_query(spark, skew: bool):
    """THE SHIPPED OPERATOR (operators.events.sessionize_chunked, day
    grain) over the same skewed input as window_query — the MEASURED
    mitigation for the serial-hot-key window row (round-4 verdict
    item 3).  Round 6 (advisory fix): this used to re-implement the
    two-phase shape with lag(s_end) instead of the running-max
    frontier the product operator uses, so the published SKEW.md
    number could silently drift from q_sessionize_chunked's real
    plan; now the benchmark calls the operator itself and merely
    re-labels its output to window_query's (user_id, sid, n) frame."""
    from morphl_model_user_search_intent_spark.operators.events import (
        sessionize_chunked,
    )

    ev = table(spark, AMP_DIR, "events")
    if skew:
        ev = ev.withColumn(
            "user_id",
            F.when(F.col("event_id") % HOT_FRAC_MOD < HOT_SHARE, F.lit(0))
            .otherwise(F.col("user_id")),
        )
    return sessionize_chunked(ev, F.col("ts").cast("date")).select(
        "user_id",
        F.col("session_id").alias("sid"),
        F.col("n_events").cast("bigint").alias("n"),
    )


def main() -> None:
    spark = get_spark(app_name="skew-stress")
    results: dict[str, float] = {}

    # 1. skewed SMJ: AQE skew-split on vs off
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    results["join_skew_aqe_off"] = _timed(lambda: join_query(spark, skewed_lineitem(spark)))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # thresholds sized so a 30%-hot partition of this dataset trips
    # the detector (defaults target multi-GB partitions)
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    results["join_skew_aqe_on"] = _timed(lambda: join_query(spark, skewed_lineitem(spark)))
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    results["join_uniform"] = _timed(
        lambda: join_query(spark, table(spark, AMP_DIR, "lineitem"))
    )

    # 2. skewed hash agg vs uniform (partial agg shields the shuffle)
    results["agg_uniform"] = _timed(lambda: agg_query(spark, skew=False))
    results["agg_skew"] = _timed(lambda: agg_query(spark, skew=True))

    # 3. skewed window partition vs uniform (irreducibly serial hot key)
    results["window_uniform"] = _timed(lambda: window_query(spark, skew=False))
    results["window_skew"] = _timed(lambda: window_query(spark, skew=True))

    # 4. the MEASURED mitigation: chunked two-phase sessionization
    # (q_sessionize_chunked's shape) on the same 30%-hot input —
    # phase 1 parallelizes the hot user across its days, phase 2's
    # serial window sees per-SESSION rows only.  Must be
    # row-identical to the serial form on the skewed input.
    results["window_skew_chunked"] = _timed(
        lambda: chunked_window_query(spark, skew=True)
    )
    a = window_query(spark, skew=True)
    b = chunked_window_query(spark, skew=True)
    # window_query emits n as a plain count (long); align names/types
    a = a.select("user_id", "sid", F.col("n").cast("bigint").alias("n"))
    chunk_mismatch = a.exceptAll(b).count() + b.exceptAll(a).count()

    r = {k: round(v, 3) for k, v in results.items()}
    r["chunked_mismatch_rows"] = chunk_mismatch
    lines = [
        "# SKEW — hot-key behavior of the three operator classes",
        "",
        f"Generated by `python tools/skew_stress.py` on `{AMP_DIR}` "
        "(30% of fact rows remapped onto ONE hot key, on the fly).  "
        "Three different physics, three different verdicts:",
        "",
        "| Experiment | Uniform | Skewed | Skewed + mitigation | Verdict |",
        "| --- | --- | --- | --- | --- |",
        f"| SMJ join on hot fact key | {r['join_uniform']} s "
        f"| {r['join_skew_aqe_off']} s (AQE skew-split off) "
        f"| {r['join_skew_aqe_on']} s (on) "
        "| AQE splits the hot partition across tasks — turn it on, "
        "size the threshold |",
        f"| Hash agg on hot group key | {r['agg_uniform']} s "
        f"| {r['agg_skew']} s | n/a needed "
        "| partial aggregation combines the hot key map-side; skew "
        "never reaches the network |",
        f"| Window (sessionize) on hot partition key | "
        f"{r['window_uniform']} s | {r['window_skew']} s | "
        f"{r['window_skew_chunked']} s (chunked two-phase, "
        f"q_sessionize_chunked; {r['chunked_mismatch_rows']} "
        "mismatching rows vs serial) "
        "| per-key windows are semantically serial per key — but the "
        "SESSION algebra decomposes: local sessionization per "
        "(user, day) chunk in parallel, then the same gap rule "
        "applied across chunk boundaries on the tiny per-session "
        "frame.  The hot user's wall-clock is bounded by its busiest "
        "day, not its lifetime |",
        "",
        "The window row is the honest cost of skew: a single key "
        "holding 30% of a 100 TB table serializes that 30% for a "
        "MONOLITHIC per-key window.  Round 5 lands the algebraic "
        "fix as a first-class operator: q_sessionize_chunked "
        "(operators/events.py) is oracle-identical to q_sessionize "
        "and row-identical on this planted skew (the mismatch count "
        "above is computed by exceptAll in both directions), while "
        "the chunking caps the serial span.  Production guard "
        "remains: detect key skew in profiling (q_profile_skew) "
        "BEFORE running per-key windows — or let q_sessionize_auto "
        "(round 6) do it: it samples the key distribution and "
        "dispatches monolithic vs chunked automatically, logging "
        "the choice via observe().  Bound chunk grain (day → hour) "
        "if a single day still overwhelms.",
        "",
    ]
    with open(os.path.join(REPO, "SKEW.md"), "w") as f:
        f.write("\n".join(lines))
    print(
        json.dumps(
            {"metric": "skew_stress", "unit": "sec", "results": r}
        )
    )


if __name__ == "__main__":
    main()
