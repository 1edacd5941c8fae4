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
        assert len(df.take(1)) >= 0  # executes the plan end-to-end
    else:
        assert_parity(df, duck, spec.oracle, name=name)
