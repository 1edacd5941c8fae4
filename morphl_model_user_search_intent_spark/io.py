"""Table loading for the 10 driver-provided Parquet tables.

Schemas are ground truth from FIXTURES.md (read from Parquet footers).
``events.ts`` arrives as Parquet TIMESTAMP(NANOS); with
``spark.sql.legacy.parquet.nanosAsLong=true`` Spark surfaces it as a
long (ns since epoch) which we convert EXACTLY to a microsecond
timestamp via integer division (``ts div 1000``) — matching DuckDB's
native ns→µs truncation, with no double-precision round-trip.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import configure

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table; applies the events timestamp normalization."""
    configure(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all 10 tables as a dict keyed by table name."""
    return {name: table(spark, sf_dir, name) for name in TABLES}
