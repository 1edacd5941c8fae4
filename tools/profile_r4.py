"""Round-4 headline profiling (verdict items 4+5).

Times fresh-plan builds best-of-3 at sf0.1 for:
  B1  q_agg_hash — current scaled-long exact sums vs raw-float sums
      (the baseline's semantics) vs decimal accumulation: quantifies
      the exactness tax.
  B10 q_json_funcs — get_json_object vs from_json(schema) vs
      parse_json+variant_get: is the re-parse the cost?
  B6  q_sessionize — best-of-3 to separate drift from noise.

Usage: python tools/profile_r4.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

from pyspark.sql import functions as F  # noqa: E402

from morphl_model_user_search_intent_spark import REGISTRY  # noqa: E402
from morphl_model_user_search_intent_spark.io import table  # noqa: E402
from morphl_model_user_search_intent_spark.session import (  # noqa: E402
    get_spark,
)


def best3(label, build, spark):
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        df = build(spark, SF_DIR)
        n = df.count() if hasattr(df, "count") else len(df)
        ts.append(time.perf_counter() - t0)
    print(f"{label:34s} best {min(ts):.3f}s  runs {[round(t,3) for t in ts]}  ({n} rows)")
    return min(ts)


def b1_float(spark, sf_dir):
    """Raw double sums — the baseline's (non-exact) semantics."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def b1_decimal(spark, sf_dir):
    from morphl_model_user_search_intent_spark.functions.exact import dsum

    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
                "sum_charge",
            ),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def b10_from_json(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    k = F.from_json("props", "k int")["k"]
    return ev.withColumn("k", k).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


def b10_variant(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "int")
    return ev.withColumn("k", k).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


def main():
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM + file listing once
    table(spark, SF_DIR, "lineitem").count()
    table(spark, SF_DIR, "events").count()

    print("== B1 q_agg_hash ==")
    best3("scaled-long exact (current)", REGISTRY["q_agg_hash"].fresh, spark)
    best3("raw float (baseline semantics)", b1_float, spark)
    best3("decimal(27,6) accumulation", b1_decimal, spark)

    print("== B10 q_json_funcs ==")
    best3("get_json_object (current)", REGISTRY["q_json_funcs"].fresh, spark)
    best3("from_json typed schema", b10_from_json, spark)
    best3("parse_json + variant_get", b10_variant, spark)

    print("== B6 q_sessionize ==")
    best3("q_sessionize (current)", REGISTRY["q_sessionize"].fresh, spark)


if __name__ == "__main__":
    main()
