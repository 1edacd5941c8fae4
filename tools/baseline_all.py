"""Measure plain-PySpark baselines for ALL ten bench headlines (B1-B10)
at sf0.1 with one uniform methodology — one shared session, warm (2nd
execution) timed, `collect()` as the action (same action bench.py
times for the engine, so the 2× bar compares like with like —
`count()` would let the baseline skip result materialization that the
bench pays for, unfairly penalizing the engine on large outputs like
B4's 45k / B6's 95k rows).

This supersedes the piecemeal history in BASELINE.md: B1's original
5.8 s was a caveated first-action-in-session number (file listing +
plan warmup included), and B2/B4/B7 were timed in a different session
on 2026-08-13.  Re-measuring everything in one run makes the 2× bar
uniformly comparable across all ten headlines.

"Plain" = the straightforward DataFrame formulation a PySpark user
would write first: float sums (no exact-decimal machinery), default
join strategies, no manual repartitioning.  Session config matches the
historical baseline rows: local[8], shuffle.partitions=8, AQE default.

Run on an idle machine: python tools/baseline_all.py
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession, Window as W
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"


def _rd(spark, t):
    return spark.read.parquet(f"{SF_DIR}/{t}.parquet")


def b1_pricing(spark):
    li = _rd(spark, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.sum("l_extendedprice").alias("sum_base_price"),
        F.sum(disc).alias("sum_disc_price"),
        F.sum(disc * (1 + F.col("l_tax"))).alias("sum_charge"),
        F.avg("l_quantity").alias("avg_qty"),
        F.avg("l_extendedprice").alias("avg_price"),
        F.avg("l_discount").alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


def b2_unshipped(spark):
    c = _rd(spark, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _rd(spark, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _rd(spark, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


def b3_multiway(spark):
    return (
        _rd(spark, "region")
        .join(_rd(spark, "nation"), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(_rd(spark, "customer"), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(_rd(spark, "orders"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("revenue"),
        )
    )


def b4_topk(spark):
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        _rd(spark, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


def b5_distinct(spark):
    return _rd(spark, "orders").groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.countDistinct("o_orderstatus").alias("n_status"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def b6_sessionize(spark):
    ev = _rd(spark, "events")
    secs = F.col("ts").cast("timestamp_ltz").cast("long")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = secs - F.lag(secs).over(w)
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        ev.withColumn("new_sess", (gap.isNull() | (gap > 1800)).cast("int"))
        .withColumn("session_id", F.sum("new_sess").over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum("value").alias("session_value"),
        )
    )


def b7_tumbling(spark):
    return (
        _rd(spark, "events")
        .groupBy(
            F.date_trunc("hour", "ts").alias("bucket"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    )


def b8_knn(spark):
    e = _rd(spark, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )
    cos = dot(F.col("v"), F.col("qv")) / (
        F.sqrt(dot(F.col("v"), F.col("v")))
        * F.sqrt(dot(F.col("qv"), F.col("qv")))
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cos.alias("cos_sim"))
    )
    w = W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), "vec_id")
    return scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= 5
    )


def b9_wordcount(spark):
    return (
        _rd(spark, "documents")
        .select(F.explode(F.split(F.trim("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(20)
    )


def b10_json(spark):
    k = F.get_json_object("props", "$.k").cast("int")
    return _rd(spark, "events").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


BASELINES = [
    ("B1 pricing summary", b1_pricing),
    ("B2 top unshipped", b2_unshipped),
    ("B3 multiway join", b3_multiway),
    ("B4 window top-3", b4_topk),
    ("B5 distinct counts", b5_distinct),
    ("B6 sessionize", b6_sessionize),
    ("B7 tumbling hour", b7_tumbling),
    ("B8 cosine top-5", b8_knn),
    ("B9 wordcount top-20", b9_wordcount),
    ("B10 json extract agg", b10_json),
]


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    total = 0.0
    for name, fn in BASELINES:
        fn(spark).collect()  # warmup
        t0 = time.perf_counter()
        n = len(fn(spark).collect())
        dt = time.perf_counter() - t0
        total += dt
        print(f"{name}: {dt:.3f}s warm ({n} rows)")
    print(f"TOTAL: {total:.3f}s")


if __name__ == "__main__":
    main()
