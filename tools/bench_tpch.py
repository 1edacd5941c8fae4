"""TPC-H suite benchmark — secondary perf evidence beyond bench.py.

Runs the 22 adapted TPC-H queries (operators/tpch.py) at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) with the exact
bench.py methodology: one shared session, warm best-of-2, each timed
run building a FRESH DataFrame and collecting it, so plan
construction and full execution are both inside the window.  Prints
one JSON line; the committed output lives in TPCH_BENCH.md.

Kept separate from bench.py so the driver's headline comparison
against BASELINE.md stays the fixed B1-B10 set.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from morphl_model_user_search_intent_spark import REGISTRY, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="bench-tpch")
    names = sorted(n for n in REGISTRY if n.startswith("q_tpch_"))
    per_query: dict[str, float] = {}
    for name in names:
        spec = REGISTRY[name]
        spec.fresh(spark, SF_DIR).collect()  # warm: listing + JIT
        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            spec.fresh(spark, SF_DIR).collect()
            samples.append(time.perf_counter() - t0)
        per_query[name] = round(min(samples), 4)
    print(
        json.dumps(
            {
                "metric": "tpch_suite_warm_total",
                "value": round(sum(per_query.values()), 4),
                "unit": "sec",
                "queries": per_query,
                "sf": float(
                    os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
