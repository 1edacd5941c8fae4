"""Correlated-subquery shapes (SURVEY.md §2.3/§2.4 tail).

Catalyst decorrelates EXISTS / correlated-scalar subqueries into
joins; writing the decorrelated form directly in the DataFrame API
produces the same physical plans the SQL planner would pick, with the
join keys explicit so the partitioning story at scale is auditable:

* correlated EXISTS  → left-semi hash join on the correlation key
  (extra non-equi predicates ride along as join conditions);
* correlated scalar aggregate → aggregate the inner side on the
  correlation key, then an equi-join back to the outer side — both
  sides hash-partition on that key, so the agg's shuffle is reused
  by the join (one Exchange, AQE folds the rest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import SQL_LSUM, SQL_UNITS, lsum, units
from ..io import table
from ..registry import register


@register(
    "q_exists_correlated",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_late
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def q_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4 shape: orders (in a date window) having at least one
    line shipped more than 60 days after the order date — a correlated
    EXISTS whose inner predicate references BOTH sides.

    Decorrelated Spark form: left-semi join on the correlation key
    ``o_orderkey`` with the late-shipment comparison attached to the
    join condition.  The semi join keeps at most one match per order
    (no fan-out, no distinct needed) and hash-partitions both fact
    tables on orderkey — the natural co-partitioning at 100 TB.  The
    date filter lands on the orders scan (PushedFilters), shrinking
    the build side before the shuffle.
    """
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (o.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late"))
    )


@register(
    "q_subquery_correlated",
    oracle=f"""
    WITH part_avg AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)
               / COUNT(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_small,
           {SQL_LSUM(SQL_UNITS("l.l_extendedprice", 100), 100)} AS sum_price
    FROM lineitem l
    JOIN part_avg a ON a.l_partkey = l.l_partkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_quantity < 0.5 * a.avg_qty
    GROUP BY p.p_brand
    """,
)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17 shape: lines whose quantity is below half the
    per-part average — a correlated scalar-aggregate subquery
    (``WHERE l_quantity < 0.5 * (SELECT avg ... WHERE same part)``).

    Decorrelated Spark form: aggregate lineitem by ``l_partkey``, join
    the 1-row-per-part averages back to lineitem on the same key.  The
    self-agg and the self-join share the partkey hash partitioning, so
    the fact table shuffles once and AQE reuses the exchange.  The
    ``part`` dimension joins after the selective quantity filter (AQE
    broadcasts it when the post-filter side is small).  The average is
    decimal-exact then one double division (the engine's davg
    discipline), so the ``<`` threshold is bit-identical in DuckDB.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part_avg = li.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(27,6)")).cast("double")
            / F.count("l_quantity")
        ).alias("avg_qty")
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(part_avg, "l_partkey")
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            lsum(units("l_extendedprice", 100), 100, "sum_price"),
        )
    )


@register(
    "q_exists_anti_combo",
    oracle="""
    WITH r1 AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
      WHERE l_returnflag = 'R'
    ),
    allsupp AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS num_blamed
    FROM r1
    JOIN supplier s ON s.s_suppkey = r1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM allsupp a
        WHERE a.l_orderkey = r1.l_orderkey
          AND a.l_suppkey <> r1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM r1 o
        WHERE o.l_orderkey = r1.l_orderkey
          AND o.l_suppkey <> r1.l_suppkey)
    GROUP BY s.s_name
    ORDER BY num_blamed DESC, s_name LIMIT 20
    """,
)
def q_exists_anti_combo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (sole-blame supplier): suppliers who were the
    ONLY supplier with returned items on a multi-supplier order — a
    correlated EXISTS and a correlated NOT EXISTS against the same
    fact table, the hardest decorrelation pattern in the TPC-H suite.

    Spark spelling: the EXISTS becomes a LEFT SEMI join and the NOT
    EXISTS a LEFT ANTI join, both on ``l_orderkey`` with the
    ``l_suppkey <>`` residual — Catalyst runs them as two shuffled
    semi/anti hash joins, each bounded per order (≤7 lines), so no
    correlated re-execution and no skew risk.  Supplier names arrive
    via broadcast.  Top-20 by (count, name) runs as TakeOrdered.
    """
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    r1 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    allsupp = li.select("l_orderkey", "l_suppkey").distinct()
    a = allsupp.alias("a")
    o = r1.alias("o")
    base = r1.alias("r1")
    semi = base.join(
        a,
        (F.col("r1.l_orderkey") == F.col("a.l_orderkey"))
        & (F.col("r1.l_suppkey") != F.col("a.l_suppkey")),
        "left_semi",
    )
    anti = semi.alias("r1").join(
        o,
        (F.col("r1.l_orderkey") == F.col("o.l_orderkey"))
        & (F.col("r1.l_suppkey") != F.col("o.l_suppkey")),
        "left_anti",
    )
    return (
        anti.join(
            F.broadcast(s), anti.l_suppkey == s.s_suppkey
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("num_blamed"))
        .orderBy(F.col("num_blamed").desc(), "s_name")
        .limit(20)
    )


@register(
    "q_not_exists_scalar",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT))
                  AS DOUBLE) / COUNT(*) / 100.0 AS ab
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) / 100.0
             AS idle_balance
    FROM customer c CROSS JOIN avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY 1
    """,
)
def q_not_exists_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (wealthy inactive customers): an uncorrelated
    scalar-aggregate subquery (global average positive balance) AND a
    correlated NOT EXISTS against orders, composed — the remaining
    decorrelation pattern after Q4/Q17/Q18/Q21.

    Spark spelling: the scalar rides in as a broadcast 1-row cross
    join (evaluated once, never per-row); the NOT EXISTS is a LEFT
    ANTI join on ``o_custkey``.  The anti join's right side projects
    a single column pre-shuffle; the average divides exact integer
    cents, so the threshold double is engine-identical.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")).cast(
                "double"
            )
            / F.count("*")
            / 100.0
        ).alias("ab")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(
            o.filter(
                F.col("o_orderpriority") == "1-URGENT"
            ).select("o_custkey"),
            c.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            (
                F.sum(
                    F.round(F.col("c_acctbal") * 100).cast("bigint")
                )
                / 100.0
            ).alias("idle_balance"),
        )
    )
