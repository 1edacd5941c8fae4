"""Measure the plain-PySpark baselines for B3 (4-way join), B5
(distinct counts), B9 (corpus word-count), B10 (JSON-extract agg) at
sf0.1 — the four BASELINE.md rows that had only DuckDB numbers after
round 2 (VERDICT.md round-2 "What's missing" #2).

"Plain" = the straightforward DataFrame formulation a PySpark user
would write first, under the same session config as the other PySpark
baseline rows (local[8], shuffle.partitions=8, AQE default), warm
(2nd execution timed).  Run: python tools/baseline_b3b5b9b10.py
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"


def b3_multiway(spark):
    """Revenue by region/nation: region ⋈ nation ⋈ customer ⋈ orders."""
    rd = lambda t: spark.read.parquet(f"{SF_DIR}/{t}.parquet")  # noqa: E731
    return (
        rd("region")
        .join(rd("nation"), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(rd("customer"), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(rd("orders"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("revenue"),
        )
    )


def b5_distinct(spark):
    """Exact distinct counts per order priority."""
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.countDistinct("o_orderstatus").alias("n_status"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def b9_wordcount(spark):
    """Corpus word-count top-20 over documents.text."""
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return (
        d.select(F.explode(F.split(F.trim("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(20)
    )


def b10_json(spark):
    """JSON-extract aggregate over events.props."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in (
        ("B3 multiway", b3_multiway),
        ("B5 distinct", b5_distinct),
        ("B9 wordcount", b9_wordcount),
        ("B10 json", b10_json),
    ):
        fn(spark).count()  # warmup
        t0 = time.perf_counter()
        n = fn(spark).count()
        print(f"{name}: {time.perf_counter() - t0:.3f}s warm ({n} rows)")


if __name__ == "__main__":
    main()
