"""Reshape operators: pivot / unpivot (wide↔long).

Pivot with an explicit value list — never the value-discovering
overload, which needs an extra distinct pass over the data and is a
collect-to-driver at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import DEC
from ..io import table
from ..registry import register

_STATUSES = ("O", "F", "P")


def _wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(_STATUSES))
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("double"))
    )
    return wide.select(
        "o_orderpriority",
        *[F.col(s).alias(f"total_{s}") for s in _STATUSES],
    )


@register(
    "q_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
                FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS total_O,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
                FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS total_F,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
                FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS total_P
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot long→wide: order totals per priority × status.

    With the value list given, Catalyst compiles this to ONE hash
    aggregate of conditional sums (same plan as the oracle SQL) — a
    single pass, no extra shuffle versus a plain groupBy.
    """
    return _wide(spark, sf_dir)


@register(
    "q_unpivot",
    oracle="""
    WITH wide AS (
      SELECT o_orderpriority,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
                  FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS total_O,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
                  FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS total_F,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
                  FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS total_P
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, status, total FROM (
      SELECT o_orderpriority, 'O' AS status, total_O AS total FROM wide
      UNION ALL
      SELECT o_orderpriority, 'F' AS status, total_F AS total FROM wide
      UNION ALL
      SELECT o_orderpriority, 'P' AS status, total_P AS total FROM wide
    )
    WHERE total IS NOT NULL
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot wide→long (``DataFrame.unpivot``, the Expand-based
    melt).  Null cells (status absent for a priority) are dropped to
    keep parity with the UNION-ALL oracle."""
    wide = _wide(spark, sf_dir)
    return (
        wide.unpivot(
            ids=["o_orderpriority"],
            values=[f"total_{s}" for s in _STATUSES],
            variableColumnName="status",
            valueColumnName="total",
        )
        .withColumn("status", F.replace("status", F.lit("total_"), F.lit("")))
        .filter(F.col("total").isNotNull())
    )
