"""Host-throughput fixture (round 9): three fixed microbenchmarks
whose COMMITTED numbers let any future round separate 'the host is
slower today' from 'a plan regressed' in one run, instead of
re-litigating ambient drift each time (r7->r8->r9 all hit this).

- python_spin: single-core pure-Python loop (no JVM) — raw CPU.
- codegen_1stage: one whole-stage-codegen aggregate over
  spark.range(50M) — JVM compute throughput, no shuffle.
- shuffle_10stage: a 10-round repartition chain over 1M rows —
  per-stage fixed cost (scheduler + exchange), the term join-heavy
  suites like TPC-H amplify.

Usage: python tools/host_throughput_probe.py   (run idle)
Prints one JSON line; committed history lives in TPCH_BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def best3(fn) -> float:
    best = 9e9
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    from morphl_model_user_search_intent_spark import get_spark

    load0 = round(os.getloadavg()[0], 2)  # BEFORE the probe's own load

    def spin() -> None:
        x = 0
        for i in range(20_000_000):
            x += i & 7
        assert x > 0

    py = best3(spin)

    spark = get_spark(app_name="host-probe")

    def one_stage() -> None:
        spark.range(50_000_000).selectExpr(
            "sum(id * 3 + 1) as s"
        ).collect()

    def ten_stage() -> None:
        df = spark.range(1_000_000)
        for i in range(10):
            df = df.repartition(32, (df.id + i) % 97)
        df.selectExpr("count(1)").collect()

    one_stage()  # warm JIT
    ten_stage()
    print(
        json.dumps(
            {
                "python_spin_s": py,
                "codegen_1stage_s": best3(one_stage),
                "shuffle_10stage_s": best3(ten_stage),
                "load_1m_at_start": load0,
            }
        )
    )


if __name__ == "__main__":
    main()
