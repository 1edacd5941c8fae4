"""Local mirror of the driver's DuckDB-oracle parity gate.

Iterates the full registry: oracle-backed queries are hash-compared
cell-for-cell; rows-only queries get a smoke run (dedicated semantic
tests live in their own files).
"""

from __future__ import annotations

import pytest

from morphl_model_user_search_intent_spark import REGISTRY
from morphl_model_user_search_intent_spark.registry import clear_plan_cache

from conftest import SF_DIR, assert_parity


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query(name, spark, duck):
    spec = REGISTRY[name]
    if spec.oracle is None:
        # Executes the plan end-to-end.  Two attempts around the
        # WHOLE build+run: the heavyweight rows-only plans (Spark-ML
        # training) intermittently hit a Py4J hiccup late in a
        # 300-query single-JVM full-suite session — the failure can
        # surface during model fit inside fn(), not just at take().
        # The query passes deterministically when re-driven (always
        # green solo, per-file, and under tools/driver_sim.py).
        try:
            assert len(spec.fn(spark, SF_DIR).take(1)) >= 0
        except Exception:
            # Drop caches accumulated by ~300 prior queries (cached
            # edge sets etc.) before the retry — the hiccup tracks
            # executor memory pressure, not the query.  Executed
            # plan-cache entries pin broadcast relations, so evict
            # those too.
            spark.catalog.clearCache()
            clear_plan_cache()
            assert len(spec.fn(spark, SF_DIR).take(1)) >= 0
    else:
        assert_parity(
            spec.fn(spark, SF_DIR), duck, spec.oracle, name=name
        )
