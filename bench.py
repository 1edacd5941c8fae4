"""Benchmark runner — the driver's per-round performance probe.

Runs the headline queries (mapped to BASELINE.md's B1–B10 shapes) at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}``.

Method mirrors BASELINE.md (tools/baseline_all.py): one shared
SparkSession (startup excluded), warm best-of-2, timed around the full
action (``collect`` of the result) — and, like the baseline, each
timed run BUILDS A FRESH DataFrame.  That matters for honesty twice
over: (a) plan construction (py4j + Catalyst analysis, 0.3–0.6 s per
headline at local[32]) is inside the timed window on both sides of the
2× comparison, and (b) re-collecting one cached DataFrame would reuse
its materialized shuffle outputs (upstream stages skip entirely), so
only a fresh plan forces the full scan→shuffle→agg execution the
baseline pays.

The engine's plan cache (registry.py) is real and on by default for
library users; its effect is reported separately as ``cached_queries``
/ ``cached_value`` — repeated identical queries on the same session +
immutable snapshot dir skip plan construction AND reuse shuffle
output.  The headline ``value`` stays the fresh-execution number so
the driver's comparison against BASELINE.md is like-for-like.

Best-of-2 damps single-run scheduler/GC noise (observed ±20% on
sub-second queries at local[32]) without hiding real regressions — a
plan that got slower is slower on both runs.

Round-8 warm-up discipline (r7 verdict item 3): each query runs TWO
untimed executions before the timed samples — one was not enough (the
JVM's tiered JIT keeps recompiling through the first executions, so
r7's first timed samples were systematically slowest).  The JSON also
carries ``load_1m``/``idle_host`` so ambient contention is visible in
the artifact.

Round-7 drift bookkeeping (the r5→r6 +11.6% ambient-drift question):
alongside the best-of-2 per-query numbers, the JSON now carries
``value_bo3`` / ``queries_bo3`` — the same queries re-ranked
best-of-3 (one extra sample each) — plus ``samples`` with every raw
timing.  A real plan regression moves best-of-2 and best-of-3
together; host-disk drift shows as a spread between them and across
the raw samples, so next round's comparison is answerable from the
artifact alone.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from morphl_model_user_search_intent_spark import REGISTRY, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set — keep aligned with BASELINE.md B1..B10 shapes as
# operators land.  Falls back gracefully if a key is not yet registered.
HEADLINE = [
    "q_agg_hash",        # B1 pricing summary
    "q_join_unshipped",  # B2 top unshipped revenue
    "q_join_multiway",   # B3 revenue by region/nation
    "q_win_topk",        # B4 top-3 orders per customer
    "q_agg_distinct",    # B5 distinct counts
    "q_sessionize",      # B6 30-min-gap sessionization
    "q_stream_tumbling", # B7 tumbling 1h window
    "q_sim_knn",         # B8 cosine top-5 for 10 query vectors
    "q_text_wordcount",  # B9 corpus word-count
    "q_json_funcs",      # B10 JSON-extract agg
]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    spark = get_spark(app_name="bench")
    names = [n for n in HEADLINE if n in REGISTRY]
    names += sorted(set(os.environ.get("BENCH_EXTRA", "").split(",")) & set(REGISTRY) - set(names))
    per_query: dict[str, float] = {}
    per_query_bo3: dict[str, float] = {}
    raw: dict[str, list[float]] = {}
    cached: dict[str, float] = {}
    load_1m = round(os.getloadavg()[0], 2)
    for name in names:
        spec = REGISTRY[name]
        # TWO untimed warm-ups (round 8, r7 verdict item 3): one warms
        # file listing + codegen compilation, but the JVM's tiered JIT
        # keeps recompiling hot loops through the first few executions
        # — with a single warm-up the first TIMED sample was still
        # systematically the slowest (r7 samples: monotone-decreasing
        # on most headlines), contaminating round-over-round deltas.
        for _ in range(2):
            spec.fresh(spark, SF_DIR).collect()
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            spec.fresh(spark, SF_DIR).collect()  # full build + execute
            samples.append(time.perf_counter() - t0)
        # headline `value` stays best-of-2 of the FIRST two samples —
        # method-identical to every earlier round and to BASELINE.md;
        # best-of-3 is the drift-bookkeeping companion
        per_query[name] = round(min(samples[:2]), 4)
        per_query_bo3[name] = round(min(samples), 4)
        raw[name] = [round(s, 4) for s in samples]
        # plan-cache path: same engine call a library user makes twice
        spec.fn(spark, SF_DIR).collect()
        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            spec.fn(spark, SF_DIR).collect()
            samples.append(time.perf_counter() - t0)
        cached[name] = round(min(samples), 4)
    total = round(sum(per_query.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_warm_total",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "value_bo3": round(sum(per_query_bo3.values()), 4),
                "queries_bo3": per_query_bo3,
                "samples": raw,
                "cached_value": round(sum(cached.values()), 4),
                "cached_queries": cached,
                # idle-host bookkeeping: 1-minute loadavg sampled
                # BEFORE the run — a drifted total with load_1m >> 1
                # is ambient contention, not a regression
                "load_1m": load_1m,
                "idle_host": load_1m < 4.0,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
