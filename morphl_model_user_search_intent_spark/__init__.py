"""PySpark-native analytics engine with the query & data-processing
capability set of Morphl-AI/MorphL-Model-User-Search-Intent, extended
with LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis).

Design notes
------------
The reference (per SURVEY.md; checkout empty at build time, so the
operative spec is SURVEY.md + the driver contract in
``__spark_entry__.py``) is a PySpark ML pipeline over keyword/search
data.  This engine re-expresses that capability surface Spark-first:

* Declarative DataFrame/SQL plans → Catalyst picks the physical
  strategy (pushdown, pruning, partial aggs, AQE, broadcast).
* Every operator is registered as a ``(name, spark_fn, oracle_sql)``
  triple in :mod:`.registry` so the driver's DuckDB-parity check and
  the local pytest mirror exercise identical code.
* 100 TB posture: no ``collect()`` in any operator, broadcast hints on
  dimension tables, rank-based top-k instead of global sorts, LSH /
  block-partitioned scale paths beside exact oracle-parity variants.
"""

from .session import get_spark
from .io import load, table
from .registry import queries, oracle_sql, REGISTRY

# Import operator modules for their registration side effects.
from .operators import (  # noqa: F401
    scans,
    projections,
    joins,
    aggregates,
    windows,
    sorts,
    setops,
    events,
    reshape,
    scale,
    analytics,
    subqueries,
    quality,
    graph,
    sketches,
    stats_tests,
    tpch,
)
from .functions import scalar  # noqa: F401
from .text import analysis, searchindex  # noqa: F401
from .llm import curation, dedup, index, multimodal, similarity  # noqa: F401
from .udf import udfs  # noqa: F401
from .ml import pipeline  # noqa: F401
from .streaming import ops  # noqa: F401
from .sources import acid, formats, pysource  # noqa: F401
from . import sql_surface  # noqa: F401

__all__ = ["get_spark", "load", "table", "queries", "oracle_sql", "REGISTRY"]
