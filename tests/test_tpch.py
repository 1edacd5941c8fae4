"""Semantic invariants for the adapted TPC-H suite (operators/tpch.py)
beyond the oracle parity that test_parity.py already enforces:
decorrelation rewrites are checked against their textbook meaning on
real rows, not just against the oracle's multiset."""

from __future__ import annotations

from pyspark.sql import functions as F

from morphl_model_user_search_intent_spark import REGISTRY
from morphl_model_user_search_intent_spark.io import table

from conftest import SF_DIR


def _run(name, spark):
    return REGISTRY[name].fn(spark, SF_DIR)


def test_q02_rows_are_regional_minima(spark):
    """Every (part, supplier) row returned by Q2 must carry the true
    minimum unit price among that part's EUROPE suppliers."""
    rows = _run("q_tpch_q02", spark).collect()
    if not rows:  # sf0.001 slice can be empty; parity still holds
        return
    li = table(spark, SF_DIR, "lineitem")
    s = table(spark, SF_DIR, "supplier")
    n = table(spark, SF_DIR, "nation")
    r = table(spark, SF_DIR, "region").filter(F.col("r_name") == "EUROPE")
    mins = {
        row["l_partkey"]: row["mn"]
        for row in (
            li.join(s, li.l_suppkey == s.s_suppkey)
            .join(n, s.s_nationkey == n.n_nationkey)
            .join(r, n.n_regionkey == r.r_regionkey)
            .groupBy("l_partkey")
            .agg(
                F.min(
                    F.col("l_extendedprice") / F.col("l_quantity")
                ).alias("mn")
            )
            .collect()
        )
    }
    # The returned supplier's best price for the part equals the min.
    best = {
        (row["l_partkey"], row["s_name"]): row["mn"]
        for row in (
            li.join(s, li.l_suppkey == s.s_suppkey)
            .groupBy("l_partkey", "s_name")
            .agg(
                F.min(
                    F.col("l_extendedprice") / F.col("l_quantity")
                ).alias("mn")
            )
            .collect()
        )
    }
    for row in rows:
        assert (
            best[(row["p_partkey"], row["s_name"])]
            == mins[row["p_partkey"]]
        )


def test_q04_exists_matches_direct_count(spark):
    """Semi-join decorrelation == counting orders with ≥1 late line."""
    got = {
        r["o_orderpriority"]: r["order_count"]
        for r in _run("q_tpch_q04", spark).collect()
    }
    o = table(spark, SF_DIR, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
    )
    li = table(spark, SF_DIR, "lineitem")
    late_orders = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
        )
        .select("o_orderkey", "o_orderpriority")
        .distinct()
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert got == {r["o_orderpriority"]: r["n"] for r in late_orders}


def test_q18_threshold_and_limit(spark):
    rows = _run("q_tpch_q18", spark).collect()
    assert len(rows) <= 100
    assert all(r["sum_qty"] > 180 for r in rows)


def test_q21_waiting_supplier_is_sole_late_supplier(spark):
    """For each counted line: order has ≥2 suppliers and exactly one
    late supplier (the textbook EXISTS/NOT-EXISTS meaning)."""
    out = _run("q_tpch_q21", spark).collect()
    total = sum(r["numwait"] for r in out)
    o = table(spark, SF_DIR, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = table(spark, SF_DIR, "lineitem")
    s = table(spark, SF_DIR, "supplier")
    n = table(spark, SF_DIR, "nation").filter(
        F.col("n_name") == "NATION_9"
    )
    base = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "is_late",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90,
    )
    pdf = base.select(
        "l_orderkey", "l_suppkey", "is_late"
    ).toPandas()
    nation_supps = {
        r["s_suppkey"]
        for r in s.join(n, s.s_nationkey == n.n_nationkey).collect()
    }
    expected = 0
    for _, grp in pdf.groupby("l_orderkey"):
        supps = set(grp["l_suppkey"])
        late_supps = set(grp.loc[grp["is_late"], "l_suppkey"])
        if len(supps) >= 2 and len(late_supps) == 1:
            (lone,) = late_supps
            if lone in nation_supps:
                expected += int(
                    ((grp["l_suppkey"] == lone) & grp["is_late"]).sum()
                )
    assert total == expected


def test_q22_no_recent_orders_and_above_avg(spark):
    rows = _run("q_tpch_q22", spark).collect()
    if not rows:
        return
    # Re-derive the qualifying customer set directly and compare counts.
    codes = (1, 7, 13, 17, 19, 23, 24)
    c = table(spark, SF_DIR, "customer").filter(
        F.col("c_nationkey").isin(*codes)
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal"))
        .collect()[0][0]
    )
    recent = table(spark, SF_DIR, "orders").filter(
        F.col("o_orderdate")
        >= F.lit("2000-01-01").cast("timestamp_ntz")
    )
    direct = (
        c.filter(F.col("c_acctbal") > avg_bal)
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .count()
    )
    # avg here is float-accumulated (close but not exact) — allow the
    # boundary to move by at most a couple of customers.
    assert abs(sum(r["numcust"] for r in rows) - direct) <= 2
