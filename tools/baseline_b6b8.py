"""Measure the plain-PySpark baselines for B6 (sessionize) and B8
(brute-force cosine top-k) at sf0.1 — the two BASELINE.md rows that
had only DuckDB numbers after round 1 (VERDICT.md "What's missing" #3).

"Plain" = the straightforward DataFrame formulation a PySpark user
would write first, under the same session config as the other PySpark
baseline rows (local[8], shuffle.partitions=8, AQE default), warm
(2nd execution timed).  Run: python tools/baseline_b6b8.py
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession, Window as W
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"


def b6_sessionize(spark):
    """Same query as the engine's q_sessionize (lag-gap flag + running
    sum + per-session agg), in the formulation a PySpark user would
    write first — no exact-decimal sum machinery."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    # ts is TIMESTAMP_NTZ in the fixture; NTZ has no direct long cast
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


def b8_knn(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
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


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in (("B6 sessionize", b6_sessionize), ("B8 knn", b8_knn)):
        fn(spark).count()  # warmup
        t0 = time.perf_counter()
        n = fn(spark).count()
        print(f"{name}: {time.perf_counter() - t0:.3f}s warm ({n} rows)")


if __name__ == "__main__":
    main()
