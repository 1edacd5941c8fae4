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
# recalibrated 2026-08-15 round 5; the two round-5 driver-window
# keys are guarded alongside the bench headliners — q_sim_index_serve
# assumes a staged index, so its budget covers load+serve, not build)
BUDGETS = {
    "q_agg_hash": 1.41,  # measured 0.563s warm (r3 cal)
    "q_join_unshipped": 1.53,  # measured 0.614s warm (r3 cal)
    "q_join_multiway": 0.96,  # measured 0.382s warm
    "q_win_topk": 0.56,  # measured 0.223s warm (r3 cal)
    "q_agg_distinct": 0.62,  # measured 0.248s warm (r3 cal)
    "q_sessionize": 1.35,  # measured 0.542s warm
    "q_stream_tumbling": 0.66,  # measured 0.264s warm (r3 cal)
    "q_sim_knn": 1.29,  # measured 0.518s warm (r3 cal)
    "q_text_wordcount": 0.42,  # measured 0.169s warm (r3 cal)
    "q_json_funcs": 0.54,  # measured 0.215s warm
    "q_sessionize_chunked": 1.74,  # measured 0.698s warm
    "q_sim_index_serve": 2.31,  # measured 0.922s warm
}


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_headline_query_within_budget(spark, name):
    # fresh builds: the plan cache would otherwise reuse shuffle
    # output across runs and the gate would measure only the final
    # stage (budgets were calibrated on full fresh executions)
    fn = REGISTRY[name].fresh
    fn(spark, SF_DIR).collect()  # warm-up: plan + file listing + JIT
    best = min(
        _timed(fn, spark) for _ in range(2)
    )  # best-of-2 warm runs damps scheduler noise
    if best > BUDGETS[name]:
        # This host's virtualized disk shows intermittent ~3x
        # throughput dips (measured minutes apart in the round-4
        # scale probes); a REAL plan/config regression reproduces,
        # a dip does not — so only fail if a second best-of-2
        # attempt also blows the budget.
        first = best
        best = min(best, *(_timed(fn, spark) for _ in range(2)))
        if best <= BUDGETS[name]:
            # The retry rescued the run: make that VISIBLE so an
            # intermittent-but-real regression (one that only
            # sometimes lands under budget) leaves a trail in CI
            # logs instead of silently widening the gate to
            # best-of-4 (round-4 advisor finding).
            import warnings

            warnings.warn(
                f"perf gate retry rescued {name}: first best-of-2 "
                f"{first:.3f}s > {BUDGETS[name]}s budget, retry "
                f"best {best:.3f}s — watch for recurrence",
                stacklevel=1,
            )
    assert best <= BUDGETS[name], (
        f"{name}: {best:.3f}s warm exceeds the {BUDGETS[name]}s budget "
        "(committed r03 warm × 2.5). If this follows a DELIBERATE plan "
        "change, recalibrate via tools/perf_gate_calibrate.py; "
        "otherwise a config/plan regression just landed — bisect it."
    )


def _timed(fn, spark) -> float:
    t0 = time.perf_counter()
    fn(spark, SF_DIR).collect()
    return time.perf_counter() - t0
