"""A/B: q_join_unshipped current (agg-after-join) vs pre-aggregated
lineitem revenue (agg-before-join) at 1x/10x/100x.

The 100x SCALING.md row shows 16.3x wall for a 10x data step with
shuffle bytes exactly 10x — spill-bound.  Pre-aggregating revenue per
l_orderkey BEFORE the join is semantics-preserving (orders is unique
on o_orderkey, so grouping by (l_orderkey, o_orderdate) after the
join collapses to one row per orderkey anyway) and shrinks the big
exchange from raw line rows to map-side-combined partial sums.

Usage: python tools/unshipped_ab.py [dirs...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from morphl_model_user_search_intent_spark import REGISTRY, get_spark
from morphl_model_user_search_intent_spark.functions.exact import (
    units_nn,
)
from morphl_model_user_search_intent_spark.io import table

DIRS = sys.argv[1:] or [
    "/root/testdata/sf0.1",
    os.path.join(REPO, ".scratch", "scale10x"),
    os.path.join(REPO, ".scratch", "scale100x"),
]


def preagg(spark, sf_dir):
    c = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ntz")
    )
    rev_u = units_nn("l_extendedprice", 100) * (
        100 - units_nn("l_discount", 100)
    )
    li_rev = li.groupBy("l_orderkey").agg(F.sum(rev_u).alias("rev_u"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li_rev, o.o_orderkey == li_rev.l_orderkey)
        .select(
            "l_orderkey",
            (F.col("rev_u") / F.lit(10000.0)).alias("revenue"),
            "o_orderdate",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def time2(build, spark, d):
    build(spark, d).collect()  # warm
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        rows = build(spark, d).collect()
        ts.append(time.perf_counter() - t0)
    return min(ts), rows


def main():
    spark = get_spark(app_name="unshipped-ab")
    spark.sparkContext.setLogLevel("ERROR")
    cur = REGISTRY["q_join_unshipped"].fresh
    for d in DIRS:
        t_cur, r_cur = time2(cur, spark, d)
        t_new, r_new = time2(preagg, spark, d)
        same = [tuple(r) for r in r_cur] == [tuple(r) for r in r_new]
        print(
            f"{os.path.basename(d):12s} current {t_cur:7.3f}s  "
            f"preagg {t_new:7.3f}s  identical={same}"
        )


if __name__ == "__main__":
    main()
