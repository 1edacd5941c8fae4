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


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to a session-tz (UTC) TIMESTAMP regardless
    of the on-disk layout.  Two layouts observed across driver testdata
    generations:

    - Parquet TIMESTAMP(NANOS): surfaced as ``bigint`` ns under
      ``nanosAsLong=true`` → exact integer ``div 1000`` to µs.
    - Parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): surfaced as
      ``timestamp_ntz`` → plain cast; exact because the session
      timezone is pinned to UTC (session.RUNTIME_CONFS).
    """
    t = dict(df.dtypes).get("ts")
    if t == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if t == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


# Per-session scan cache: building a reader + normalization chain is
# pure py4j round-trips (~50-150 ms/query build); the resulting
# DataFrame is an immutable logical plan, safe to share across
# queries.  Keyed by session id with a weakref identity check so a
# recycled id after GC can never serve another session's plans.
_SCAN_CACHE: dict[int, tuple[object, dict[tuple[str, str], DataFrame]]] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table; applies the events timestamp normalization.
    Scan plans are cached per (session, dir, table) — the engine's
    in-process catalog."""
    import weakref

    configure(spark)
    ent = _SCAN_CACHE.get(id(spark))
    if ent is None or ent[0]() is not spark:
        ent = (weakref.ref(spark), {})
        _SCAN_CACHE[id(spark)] = ent
    cache = ent[1]
    key = (os.path.abspath(sf_dir), name)
    df = cache.get(key)
    if df is None:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if name == "events":
            df = normalize_events_ts(df)
        cache[key] = df
    return df


def load(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all 10 tables as a dict keyed by table name."""
    return {name: table(spark, sf_dir, name) for name in TABLES}
