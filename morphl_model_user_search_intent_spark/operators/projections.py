"""Projection, predicate, null-semantics and conditional operators
(SURVEY.md §2.2)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import register


@register(
    "q_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           l_quantity * 2.5 + 1.0 AS adj_qty
    FROM lineitem
    """,
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with computed columns (per-row double arithmetic is
    IEEE-deterministic, so values hash-match the oracle exactly)."""
    li = table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue.alias("revenue"),
        (revenue * (1 + F.col("l_tax"))).alias("charge"),
        (F.col("l_quantity") * 2.5 + 1.0).alias("adj_qty"),
    )


@register(
    "q_filter_pred",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderstatus IN ('O', 'F'))
      AND o_totalprice BETWEEN 50000.0 AND 200000.0
      AND NOT (o_orderpriority LIKE '%NOT%')
      AND o_orderdate >= TIMESTAMP '1996-01-01'
    """,
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive/disjunctive predicates: IN, BETWEEN, LIKE, NOT.

    All four predicates are Catalyst-native and push down to the scan
    (In, GreaterThanOrEqual, LessThanOrEqual, StringContains).
    """
    o = table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(50000.0, 200000.0)
        & ~F.col("o_orderpriority").like("%NOT%")
        & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")


@register(
    "q_filter_null",
    oracle="""
    SELECT l_linestatus,
           CAST(COUNT(NULLIF(l_returnflag, 'N')) AS BIGINT) AS n_flagged,
           CAST(COUNT(*) AS BIGINT) AS n_all,
           CAST(SUM(CASE WHEN NULLIF(l_returnflag, 'N') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           COALESCE(NULLIF(l_linestatus, 'O'), 'open') AS status_or_open
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null semantics: NULLIF/COALESCE/3-valued logic.

    The fixtures contain no physical NULLs (FIXTURES.md), so nulls are
    manufactured with NULLIF — COUNT(col) skipping nulls vs COUNT(*) is
    the observable behaviour under test.
    """
    li = table(spark, sf_dir, "lineitem")
    flagged = F.nullif(F.col("l_returnflag"), F.lit("N"))
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.count(flagged).alias("n_flagged"),
            F.count(F.lit(1)).alias("n_all"),
            F.sum(F.when(flagged.isNull(), 1).otherwise(0)).alias("n_null"),
        )
        .withColumn(
            "status_or_open",
            F.coalesce(
                F.nullif(F.col("l_linestatus"), F.lit("O")), F.lit("open")
            ),
        )
    )


@register(
    "q_case_when",
    oracle="""
    SELECT CASE WHEN o_totalprice >= 250000.0 THEN 'high'
                WHEN o_totalprice >= 100000.0 THEN 'mid'
                ELSE 'low' END AS price_bucket,
           o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total
    FROM orders
    GROUP BY 1, 2
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional projection (CASE WHEN) — the reference's
    intent-bucketing idiom (classify rows into labeled tiers)."""
    from ..functions.exact import dsum

    o = table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") >= 250000.0, "high")
        .when(F.col("o_totalprice") >= 100000.0, "mid")
        .otherwise("low")
    )
    return (
        o.withColumn("price_bucket", bucket)
        .groupBy("price_bucket", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total"),
        )
    )
