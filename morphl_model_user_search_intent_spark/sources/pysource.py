"""Custom Python data source (Spark 4 ``pyspark.sql.datasource``).

The reference family's ingestion is a remote-API connector (Google
Search Console → Cassandra, SURVEY.md §1.1 [K]); this is the Spark-4
way to build such a connector in pure Python: a ``DataSource``
subclass whose reader declares partitions and yields rows per
partition — Spark schedules one task per partition, so a paginated
API (or any generator) parallelizes like a file scan, no RDD code.

The demo source synthesizes a deterministic event stream (Knuth
multiplicative hash over the row index — the engine's standard
portable-randomness trick), so its output is DuckDB-reproducible and
the driver can hash-check a real aggregate over a source that never
touched disk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..registry import register

N_ROWS = 100_000
N_PARTS = 8
GROUPS = ("alpha", "beta", "gamma", "delta", "epsilon")


class _SynthReader(DataSourceReader):
    def partitions(self):
        return [InputPartition(p) for p in range(N_PARTS)]

    def read(self, partition):
        p = partition.value
        lo = p * N_ROWS // N_PARTS
        hi = (p + 1) * N_ROWS // N_PARTS
        for i in range(lo, hi):
            h = (i * 2654435761) % 4294967296
            yield (i, GROUPS[i % 5], h)


class SyntheticEventsSource(DataSource):
    """``format("synthetic_events")``: N_ROWS deterministic rows across
    N_PARTS independent read tasks."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "i bigint, grp string, h bigint"

    def reader(self, schema) -> _SynthReader:
        return _SynthReader()


@register(
    "q_source_pydatasource",
    oracle=f"""
    SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(h) AS BIGINT) AS h_sum,
           CAST(MIN(h) AS BIGINT) AS h_min
    FROM (
      SELECT i, ['alpha','beta','gamma','delta','epsilon'][(i % 5) + 1]
               AS grp,
             (i * 2654435761) % 4294967296 AS h
      FROM (SELECT UNNEST(generate_series(0, {N_ROWS - 1})) AS i)
    )
    GROUP BY grp
    """,
)
def q_source_pydatasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read through the registered Python data source and aggregate —
    proving the connector path end-to-end: partition planning in
    Python, one Spark task per partition, Arrow-batched rows into the
    JVM, then ordinary Catalyst aggregation on top.

    Per-partition generators keep memory O(1); at scale a real API
    connector maps pages/token-ranges to partitions the same way.
    All values are exact integers (Knuth hash), so the DuckDB twin
    reproduces the "remote" data without the connector.
    """
    try:
        spark.dataSource.register(SyntheticEventsSource)
    except Exception:
        pass  # already registered in this session
    df = spark.read.format("synthetic_events").load()
    return df.groupBy("grp").agg(
        F.count("*").alias("n_rows"),
        F.sum("h").alias("h_sum"),
        F.min("h").alias("h_min"),
    )
