"""Round-10 optimization profiler.

For each named query, separates the three cost components the bench
conflates (guide §1):

- ``build``   — fresh DataFrame construction (py4j + Catalyst analysis),
- ``collect`` — the bench's timed action (build + execute + transfer),
- ``noop``    — execution only, drained to the noop sink on a pre-built
                DataFrame (guide §1.4), which is the number that scales
                with data.

Also dumps ``explain("formatted")`` for each query to
``plans/r11/<name>_<tag>.txt`` when ``--plans <tag>`` is given.

Usage::

    python tools/profile_r11.py [--plans before] [--reps 3] q_a q_b ...
    python tools/profile_r11.py --headline --plans before
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from morphl_model_user_search_intent_spark import REGISTRY, get_spark  # noqa: E402

HEADLINE = [
    "q_agg_hash",
    "q_join_unshipped",
    "q_join_multiway",
    "q_win_topk",
    "q_agg_distinct",
    "q_sessionize",
    "q_stream_tumbling",
    "q_sim_knn",
    "q_text_wordcount",
    "q_json_funcs",
]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--headline", action="store_true")
    ap.add_argument("--plans", default="")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-noop", action="store_true")
    args = ap.parse_args()
    names = list(args.names)
    if args.headline:
        names = HEADLINE + [n for n in names if n not in HEADLINE]
    spark = get_spark(app_name="profile_r11")
    sc = spark.sparkContext
    plan_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11")
    if args.plans:
        os.makedirs(plan_dir, exist_ok=True)
    print(f"{'query':28s} {'build':>8s} {'collect':>8s} {'noop':>8s}")
    for name in names:
        spec = REGISTRY[name]
        # warm: file listing, codegen, JIT
        for _ in range(2):
            spec.fresh(spark, SF_DIR).collect()
        builds, collects, noops = [], [], []
        for _ in range(args.reps):
            sc.setJobDescription(f"r11-profile build {name}")
            t0 = time.perf_counter()
            df = spec.fresh(spark, SF_DIR)
            builds.append(time.perf_counter() - t0)
            sc.setJobDescription(f"r11-profile collect {name}")
            t0 = time.perf_counter()
            df.collect()
            collects.append(time.perf_counter() - t0)
        if not args.no_noop:
            df = spec.fresh(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()  # warm
            for _ in range(args.reps):
                sc.setJobDescription(f"r11-profile noop {name}")
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                noops.append(time.perf_counter() - t0)
        sc.setJobDescription(None)
        b, c = min(builds), min(collects)
        n = min(noops) if noops else float("nan")
        print(f"{name:28s} {b:8.3f} {b + c:8.3f} {n:8.3f}")
        if args.plans:
            df = spec.fresh(spark, SF_DIR)
            with open(os.path.join(plan_dir, f"{name}_{args.plans}.txt"), "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))


if __name__ == "__main__":
    main()
