"""Performance regression gate (round-2 verdict item #6).

Round 2 shipped a one-line session-config change (a global AQE
coalesce floor) that silently regressed the driver bench 22% — the
correctness suite could not see it.  This gate runs the 10 bench
headline queries warm at sf0.01 on the same session shape as the rest
of the suite and fails if any exceeds its committed round-3 budget
(measured warm time × 2.5 — generous enough for CI noise, tight
enough that an accidental O(n²) plan, a lost broadcast, or the next
global-conf tweak trips it).

Budgets calibrated 2026-08-14 on an idle 32-core host via
``python tools/perf_gate_calibrate.py`` (local[8],
shuffle.partitions=8, sf0.01, 2nd execution timed).  Re-run that tool
and update BUDGETS when a deliberate plan change shifts a headline.
"""

from __future__ import annotations

import time

import pytest

from morphl_model_user_search_intent_spark import REGISTRY

SF_DIR = "/root/testdata/sf0.01"

# seconds = measured warm × 2.5 (tools/perf_gate_calibrate.py,
# recalibrated 2026-08-15 round 6 on an idle host; the round-5/6
# driver-window keys are guarded alongside the bench headliners —
# index/table keys assume staged fixtures, so their budgets cover
# the serve/read path, not one-time staging)
BUDGETS = {
    "q_agg_hash": 1.36,  # measured 0.543s warm
    "q_join_unshipped": 1.57,  # measured 0.628s warm
    "q_join_multiway": 1.44,  # measured 0.575s warm
    "q_win_topk": 0.77,  # measured 0.307s warm
    "q_agg_distinct": 0.75,  # measured 0.301s warm
    "q_sessionize": 1.40,  # measured 0.559s warm
    "q_stream_tumbling": 0.73,  # measured 0.294s warm (RocksDB)
    "q_sim_knn": 1.40,  # measured 0.561s warm
    "q_text_wordcount": 0.49,  # measured 0.195s warm
    "q_json_funcs": 0.58,  # measured 0.231s warm
    "q_sessionize_chunked": 1.99,  # measured 0.798s warm
    "q_sim_index_serve": 2.59,  # measured 1.038s warm
    # round-6 driver-window keys (staged fixtures assumed — the
    # budgets cover the serve/read path, not one-time staging)
    "q_sessionize_auto": 1.45,  # measured 0.581s warm
    "q_sim_index_compact": 2.25,  # measured 0.901s warm
    "q_table_merge": 0.42,  # measured 0.169s warm
    "q_table_time_travel": 0.67,  # measured 0.269s warm
    "q_win_fill_forward": 0.52,  # measured 0.210s warm
    "q_tpch_q09": 0.92,  # measured 0.366s warm
    "q_dedup_semantic": 1.90,  # measured 0.761s warm
    "q_dedup_clusters": 3.46,  # measured 1.386s warm
}


# Absolute suite-load allowance on top of each calibrated budget.
# Round-6 full-suite run: q_win_fill_forward measured 0.549s against
# its 0.52s budget INSIDE the 1800-test suite and 0.21s solo — a
# fixed ~0.1-0.3s contention floor (GC of 1800 tests' session state,
# page-cache pressure) that hits the sub-second budgets hardest in
# relative terms.  A flat +0.2s keeps every budget's detection power
# for what the gate exists to catch (O(n^2) plans, lost broadcasts,
# global-conf regressions — all >=2x) while absorbing suite-load
# jitter that best-of-N retries alone did not (the r06 flake).
_SUITE_LOAD_GRACE = 0.2


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_headline_query_within_budget(spark, name):
    budget = BUDGETS[name] + _SUITE_LOAD_GRACE
    # fresh builds: the plan cache would otherwise reuse shuffle
    # output across runs and the gate would measure only the final
    # stage (budgets were calibrated on full fresh executions)
    fn = REGISTRY[name].fresh
    fn(spark, SF_DIR).collect()  # warm-up: plan + file listing + JIT
    best = min(
        _timed(fn, spark) for _ in range(3)
    )  # best-of-3 warm runs damps scheduler noise (r06: 2 was thin)
    if best > budget:
        # This host's virtualized disk shows intermittent ~3x
        # throughput dips (measured minutes apart in the round-4
        # scale probes); a REAL plan/config regression reproduces,
        # a dip does not — so only fail if a second best-of-3
        # attempt also blows the budget.
        first = best
        best = min(best, *(_timed(fn, spark) for _ in range(3)))
        if best <= budget:
            # The retry rescued the run: make that VISIBLE so an
            # intermittent-but-real regression (one that only
            # sometimes lands under budget) leaves a trail in CI
            # logs instead of silently widening the gate to
            # best-of-4 (round-4 advisor finding).
            import warnings

            warnings.warn(
                f"perf gate retry rescued {name}: first best-of-3 "
                f"{first:.3f}s > {budget}s budget, retry "
                f"best {best:.3f}s — watch for recurrence",
                stacklevel=1,
            )
    assert best <= budget, (
        f"{name}: {best:.3f}s warm exceeds the {budget:.2f}s budget "
        "(committed warm × 2.5 + suite-load grace). If this follows a "
        "DELIBERATE plan change, recalibrate via "
        "tools/perf_gate_calibrate.py; otherwise a config/plan "
        "regression just landed — bisect it."
    )


def _timed(fn, spark) -> float:
    t0 = time.perf_counter()
    fn(spark, SF_DIR).collect()
    return time.perf_counter() - t0
