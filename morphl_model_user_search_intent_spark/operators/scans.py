"""Parquet scan operators (SURVEY.md §2.1).

The reference stores rows in Cassandra and scans them through the
spark-cassandra-connector (SURVEY.md §1.1 [K]); Parquet + Catalyst
pushdown is the idiomatic Spark stand-in, and the only source the
driver grades.  CSV/JSON ingestion and the Parquet sink round-trip are
covered by unit tests (no fixture files → no oracle pair).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import register


@register(
    "q_scan_parquet",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    """,
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar Parquet scan with projection.

    Scale: column pruning reaches the scan (ReadSchema carries only the
    4 projected columns of 11); at 100 TB this is the difference
    between reading ~36% and 100% of the table bytes.
    """
    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )


@register(
    "q_scan_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity > 45.0
    """,
)
def q_scan_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan with predicate + projection pushdown.

    ``explain()`` shows ``PushedFilters: [LessThan(l_shipdate,...),
    GreaterThan(l_quantity,45.0)]`` on the FileScan — row-group and
    page-level skipping happens inside the Parquet reader, before any
    Spark operator runs.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_quantity") > 45.0)
    ).select("l_orderkey", "l_linenumber", "l_extendedprice")
