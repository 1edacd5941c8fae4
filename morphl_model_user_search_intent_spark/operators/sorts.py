"""Sort / limit / pagination operators (SURVEY.md §2.6).

Every LIMIT query carries a unique-key tie-breaker so the selected row
SET is deterministic across engines (the driver hash is
order-insensitive, but the cut line must not split ties arbitrarily).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dsum
from ..io import table
from ..registry import register


@register(
    "q_sort_limit",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
    FROM lineitem
    GROUP BY l_orderkey
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: ORDER BY … LIMIT without a full sort.

    Physical plan is TakeOrderedAndProject — each partition keeps a
    k-row heap and the driver merges k·p rows, so no global sort or
    single-partition shuffle ever materializes.  This is the shape that
    survives 100 TB; a naive full sort would not.
    """
    li = table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_orderkey")
        .agg(dsum(rev, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q_sort_multi",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           NULLIF(c_mktsegment, 'MACHINERY') AS seg_or_null
    FROM customer
    ORDER BY seg_or_null ASC NULLS LAST, c_acctbal DESC, c_custkey
    LIMIT 50
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null ordering (NULLS LAST), nulls
    manufactured via NULLIF since the fixtures are null-free."""
    c = table(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")).alias(
                "seg_or_null"
            ),
        )
        .orderBy(
            F.asc_nulls_last("seg_or_null"),
            F.desc("c_acctbal"),
            F.asc("c_custkey"),
        )
        .limit(50)
    )


@register(
    "q_sort_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 10
    """,
)
def q_sort_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination: LIMIT n OFFSET m (Spark ≥3.4 ``DataFrame.offset``)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(10)
        .limit(20)
    )
