"""Set operations + exact deduplication (SURVEY.md §2.7)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import register


def _halves(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Two overlapping customer-key sets: big spenders vs open-order
    customers (projected from orders so the overlap is meaningful)."""
    o = table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 120000.0).select("o_custkey")
    openo = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return big, openo


@register(
    "q_set_union",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_totalprice > 120000.0
    UNION
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct).  unionByName is position-safe; the distinct is
    a hash aggregate on the output keys."""
    big, openo = _halves(spark, sf_dir)
    return big.unionByName(openo).distinct()


@register(
    "q_set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_totalprice > 120000.0
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (Catalyst plans a left-semi join + aggregate)."""
    big, openo = _halves(spark, sf_dir)
    return big.intersect(openo)


@register(
    "q_set_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_totalprice > 120000.0
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT with set semantics (``subtract`` = EXCEPT DISTINCT —
    unlike ``exceptAll``, a single match in the right side removes ALL
    copies from the left; Catalyst plans a left-anti join + distinct).
    """
    big, openo = _halves(spark, sf_dir)
    return big.subtract(openo)


@register(
    "q_dedup_exact",
    oracle="""
    SELECT user_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(event_id) AS BIGINT) AS first_event_id
    FROM events
    GROUP BY user_id, event_type
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact deduplication on a key subset.

    ``dropDuplicates`` keeps an arbitrary survivor (SURVEY.md §7.3), so
    the oracle-checked form is the deterministic equivalent: group by
    the dedup key and keep MIN(event_id) — same shuffle shape, stable
    answer.  At scale this is one hash aggregate on the dedup key; the
    canonical exact-dedup plan.
    """
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("first_event_id"),
    )


@register(
    "q_set_bag",
    oracle="""
    WITH a AS (SELECT o_orderstatus, o_orderpriority FROM orders
               WHERE o_orderkey % 2 = 0),
    b AS (SELECT o_orderstatus, o_orderpriority FROM orders
          WHERE o_orderkey % 2 = 1)
    SELECT 'intersect_all' AS op, * FROM
      (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
    UNION ALL
    SELECT 'except_all', * FROM
      (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
    """,
)
def q_set_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL):
    multiplicity-aware overlap between two order partitions — the
    audit spelling of "how many duplicate shapes does each half
    contribute" that DISTINCT set ops silently destroy.

    Spark's ``intersectAll``/``exceptAll`` compile to a count-per-
    tuple aggregate + generate (replicate min/diff counts) — one
    shuffle on the full row as key, partial-aggregated, no sort.  The
    two branches share the scan; results are tagged and unioned so
    one driver check covers both operators.
    """
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderstatus", "o_orderpriority"
    )
    b = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderstatus", "o_orderpriority"
    )
    tag = lambda df, t: df.select(F.lit(t).alias("op"), "*")
    return tag(a.intersectAll(b), "intersect_all").unionAll(
        tag(a.exceptAll(b), "except_all")
    )
