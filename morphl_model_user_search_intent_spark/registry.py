"""Central registry of (query, oracle) pairs — the driver contract.

Every operator module registers its queries here via :func:`register`.
``queries()`` / ``oracle_sql()`` feed ``__spark_entry__.py`` directly;
the pytest mirror iterates the same registry, so the local gate and the
driver gate exercise identical code.

Discipline (SURVEY.md §5.2): alias every computed column identically in
the Spark plan and the DuckDB SQL; round float aggregates in BOTH
engines before they reach the driver's value hash; cast integer sums to
BIGINT in DuckDB (whose SUM(int) is HUGEINT).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → rows-only driver check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query key: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }
