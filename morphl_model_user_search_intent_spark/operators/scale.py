"""Skew-handling utilities + scale-shaped query forms (SURVEY.md §4).

AQE's skew-join splitting covers joins; what it does NOT cover is a
hot *aggregate* key whose state is non-algebraic (exact distinct,
collect_list) — there the final-stage reducer for that key receives
everything.  ``salted()`` is the engine's standard rewrite: shard the
hot key with a salt for the first (wide) aggregation, then combine the
per-shard partials in a second (tiny) aggregation.  The result is
bit-identical to the unsalted form, so these queries are fully
DuckDB-oracle-checked against the plain GROUP BY.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import register

N_SALT = 32  # shards per hot key; ≈ executor count is the usual pick


def salted(df: DataFrame, shard_on: str | Column, n: int = N_SALT) -> DataFrame:
    """Add a deterministic ``_salt`` shard column in [0, n).

    Deterministic (xxhash64 of a data column, not ``rand()``) so
    retried/speculative tasks shard identically and tests are stable.
    """
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(shard_on), F.lit(n)).cast("int")
    )


@register(
    "q_agg_salted",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key aggregation via explicit two-phase salting.

    ``l_returnflag`` has 3 values over the whole fact table — the
    textbook hot key.  Plan:

    - exact distinct: dedupe ``(flag, partkey)`` first — that shuffle
      hash-spreads on BOTH columns (no hot partition), then the
      per-flag count is a partial/final agg over already-unique rows;
    - algebraic sum: phase 1 groups by ``(flag, _salt)`` (32-way
      shard of the hot key), phase 2 combines the ≤ 3×32 partials.

    Both joins back on ``l_returnflag`` are 3-row sides → broadcast.
    Result is bit-identical to the plain GROUP BY (the oracle).
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_partkey", "l_quantity"
    )
    n_parts = (
        li.select("l_returnflag", "l_partkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )
    sums = (
        salted(li, "l_partkey")
        .groupBy("l_returnflag", "_salt")
        .agg(F.sum(F.col("l_quantity").cast("decimal(27,6)")).alias("_s"))
        .groupBy("l_returnflag")
        .agg(F.sum("_s").cast("double").alias("sum_qty"))
    )
    return n_parts.join(F.broadcast(sums), "l_returnflag")


@register(
    "q_subquery_scalar",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_pricey
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    GROUP BY o_orderpriority
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery shape: filter a fact table against a global
    aggregate of itself, without a driver-side collect.

    The 1-row aggregate is cross-joined with a broadcast hint —
    exactly what Catalyst does for an uncorrelated scalar subquery
    (BroadcastNestedLoopJoin over a 1-row side), so the fact scan
    streams once and nothing round-trips through Python.
    """
    o = table(spark, sf_dir, "orders")
    global_avg = o.agg(F.avg("o_totalprice").alias("_avg"))
    return (
        o.crossJoin(F.broadcast(global_avg))
        .filter(F.col("o_totalprice") > F.col("_avg"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_pricey"))
    )


@register(
    "q_join_bucketed",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                AS DECIMAL(27,6))) AS DOUBLE) AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey % 10 = 0
    GROUP BY o.o_orderkey, o.o_custkey
    """,
)
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located (bucketed) fact⋈fact join — the zero-shuffle layout
    for the joins a 100 TB warehouse runs every day.

    Both sides are written once as tables bucketed 16-ways on the join
    key (``bucketBy(16, orderkey).sortBy(orderkey)`` — external
    tables, parquet under the repo-local scratch dir).  The join then
    reads bucket i against bucket i: SortMergeJoin with NO Exchange on
    either side (gated in tests/test_plans.py).  At scale this is the
    difference between re-shuffling the whole fact table per query and
    a one-off layout cost at ingest; the same layout serves every
    orderkey-keyed join and aggregate.

    The ``%% 10`` predicate keeps the oracle comparison small; the
    groupBy on the join key also rides the bucket partitioning.
    """
    import os

    from ..io import table as _t
    from ..sources.formats import SCRATCH, _tag

    suffix = _tag(sf_dir).replace(".", "_")
    names = {
        "orders": f"bkt_orders_{suffix}",
        "lineitem": f"bkt_lineitem_{suffix}",
    }
    keys = {"orders": "o_orderkey", "lineitem": "l_orderkey"}
    cols = {
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_extendedprice", "l_discount"],
    }
    for tbl, name in names.items():
        path = os.path.join(SCRATCH, name)
        if not spark.catalog.tableExists(name):
            (
                _t(spark, sf_dir, tbl)
                .select(*cols[tbl])
                .write.mode("overwrite")
                .bucketBy(16, keys[tbl])
                .sortBy(keys[tbl])
                .option("path", path)
                .format("parquet")
                .saveAsTable(name)
            )
    o = spark.table(names["orders"]).filter(F.col("o_orderkey") % 10 == 0)
    li = spark.table(names["lineitem"])
    # MERGE hint: at fixture scale the filtered orders side fits under
    # autoBroadcastJoinThreshold and Catalyst would broadcast; the
    # point here is the bucket-aligned SortMergeJoin (no Exchange, no
    # Sort), which is what survives when BOTH sides are 100 TB facts.
    return (
        o.join(li.hint("merge"), o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(27,6)"
                )
            )
            .cast("double")
            .alias("revenue"),
        )
    )
