"""Static canonicalization gates over the WHOLE registry (plan-only).

Round 1 lost 4 driver rows (and 9 more latent) to two failure classes
that pytest + the local sim could not see:

  (a) Array/Map/Struct output columns — the driver canonicalizes both
      result sets through a pandas ``sort_values``, which cannot
      sort/hash ndarray cells → driver ERR;
  (b) DuckDB windowed integer SUM returns HUGEINT, which pandas turns
      into float64 → value-hash mismatch vs Spark's int64 → driver
      FAIL.

These tests make both classes structurally impossible: every
oracle-checked query's Spark schema is swept for complex types, and
every oracle's DuckDB result types are resolved (binding only, no
execution — the sweep is seconds) and checked for
HUGEINT/UHUGEINT/LIST/STRUCT/MAP.  Rows-only queries are exempt from
(a): the driver only counts their rows.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.driver_sim import (  # noqa: E402
    duck_type_violations,
    spark_schema_violations,
)

import __spark_entry__ as entrymod  # noqa: E402

from tests.conftest import SF_DIR  # noqa: E402

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()
ORACLE_KEYS = sorted(set(QUERIES) & set(ORACLES))


def test_every_oracle_key_has_a_query():
    orphans = sorted(set(ORACLES) - set(QUERIES))
    assert not orphans, f"oracle_sql keys without queries(): {orphans}"


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_no_complex_spark_output(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    bad = spark_schema_violations(df)
    assert not bad, (
        f"{name}: driver's pandas canonicalizer cannot hash {bad}; "
        "serialize with F.array_join / unpack to scalar columns"
    )


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_no_hugeint_or_complex_duck_output(duck, name):
    bad = duck_type_violations(duck, ORACLES[name])
    assert not bad, (
        f"{name}: oracle result types {bad} break the driver's "
        "canonicalizer; CAST(... AS BIGINT) / array_to_string"
    )
