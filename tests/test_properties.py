"""Property-based algebraic laws (SURVEY.md §5.2.4) on small generated
frames: the invariants every relational engine must satisfy,
independent of the fixture data."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),  # k
        st.integers(min_value=-1000, max_value=1000),  # v
    ),
    min_size=0,
    max_size=60,
)

_settings = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(rows or [(0, 0)], "k int, v int").limit(
        len(rows)
    )


@given(rows=rows_strategy)
@_settings
def test_filter_commutes_with_project(spark, rows):
    df = _df(spark, rows)
    a = df.filter(F.col("k") > 0).select("v")
    b = df.select("v", "k").filter(F.col("k") > 0).select("v")
    assert sorted(r.v for r in a.collect()) == sorted(
        r.v for r in b.collect()
    )


@given(rows=rows_strategy)
@_settings
def test_union_counts_add(spark, rows):
    df = _df(spark, rows)
    assert df.unionAll(df).count() == 2 * df.count()


@given(rows=rows_strategy)
@_settings
def test_distinct_idempotent(spark, rows):
    df = _df(spark, rows)
    d1 = df.distinct()
    assert d1.count() == d1.distinct().count()
    assert d1.count() <= df.count()


@given(rows=rows_strategy)
@_settings
def test_topk_is_sorted_prefix(spark, rows):
    df = _df(spark, rows)
    full = [
        (r.k, r.v)
        for r in df.orderBy(F.col("v").desc(), F.col("k")).collect()
    ]
    top = [
        (r.k, r.v)
        for r in df.orderBy(F.col("v").desc(), F.col("k")).limit(5).collect()
    ]
    assert top == full[:5]


@given(rows=rows_strategy)
@_settings
def test_groupby_sum_partitions_total(spark, rows):
    df = _df(spark, rows)
    total = df.agg(F.sum("v")).collect()[0][0]
    by_k = df.groupBy("k").agg(F.sum("v").alias("s")).agg(F.sum("s"))
    assert by_k.collect()[0][0] == total


@given(rows=rows_strategy)
@_settings
def test_semi_plus_anti_partition_left(spark, rows):
    df = _df(spark, rows)
    right = df.filter(F.col("v") % 2 == 0).select("k").distinct()
    semi = df.join(right, "k", "left_semi").count()
    anti = df.join(right, "k", "left_anti").count()
    assert semi + anti == df.count()
