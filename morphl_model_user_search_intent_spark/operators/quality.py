"""Data-quality constraint validation — the dbt-test / Deequ-style
gate a pipeline runs before publishing a table set (SURVEY.md §5's
operational-correctness posture, expressed as a query).

One pass per table, all checks fused into single aggregates; the
cross-table referential checks are anti-join counts.  Output is a
compact (check, violations) report — at 100 TB this is exactly the
shape that runs nightly: every check is an algebraic aggregate or a
key-partitioned anti join, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import register


@register(
    "q_validate_constraints",
    oracle="""
    SELECT 'lineitem_orphan_orderkey' AS check_name,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS violations
    UNION ALL
    SELECT 'orders_orphan_custkey',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT)
    UNION ALL
    SELECT 'orders_null_keys',
           CAST((SELECT COUNT(*) FROM orders
                 WHERE o_orderkey IS NULL OR o_custkey IS NULL)
                AS BIGINT)
    UNION ALL
    SELECT 'lineitem_nonpositive_price',
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_extendedprice <= 0) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_discount_range',
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_discount < 0 OR l_discount > 1) AS BIGINT)
    UNION ALL
    SELECT 'documents_nchars_mismatch',
           CAST((SELECT COUNT(*) FROM documents
                 WHERE n_chars <> length(text)) AS BIGINT)
    UNION ALL
    SELECT 'embeddings_bad_dim',
           CAST((SELECT COUNT(*) FROM embeddings
                 WHERE len(embedding) <> 64) AS BIGINT)
    """,
)
def q_validate_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint report over the table set: referential integrity
    (orphan FKs via anti joins), null keys, domain bounds, and
    derived-column consistency — one (check, violations) row each.

    All counts come back 0 on the fixtures (asserted by the oracle
    either way), which is the point: the query IS the gate.
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")

    def report(name: str, df_count: DataFrame) -> DataFrame:
        return df_count.select(
            F.lit(name).alias("check_name"),
            F.col("n").cast("bigint").alias("violations"),
        )

    def cnt(df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n"))

    checks = [
        report(
            "lineitem_orphan_orderkey",
            cnt(li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")),
        ),
        report(
            "orders_orphan_custkey",
            cnt(o.join(c, o.o_custkey == c.c_custkey, "left_anti")),
        ),
        report(
            "orders_null_keys",
            cnt(
                o.filter(
                    F.col("o_orderkey").isNull()
                    | F.col("o_custkey").isNull()
                )
            ),
        ),
        report(
            "lineitem_nonpositive_price",
            cnt(li.filter(F.col("l_extendedprice") <= 0)),
        ),
        report(
            "lineitem_discount_range",
            cnt(
                li.filter(
                    (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
                )
            ),
        ),
        report(
            "documents_nchars_mismatch",
            cnt(d.filter(F.col("n_chars") != F.length("text"))),
        ),
        report(
            "embeddings_bad_dim",
            cnt(e.filter(F.size("embedding") != 64)),
        ),
    ]
    out = checks[0]
    for chk in checks[1:]:
        out = out.unionByName(chk)
    return out


@register(
    "q_observe",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice > 200000.0
    """,
)
def q_observe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``observe()`` in-flight metrics: the filter result flows on
    unchanged while Spark accumulates row count and an exact cent
    total ON THE SAME PASS — the zero-extra-scan pipeline telemetry
    (row counts per stage, null ratios, freshness) that production
    jobs attach to every write instead of re-aggregating after the
    fact.

    The observation costs one accumulator merge per task — no extra
    shuffle, no second job (tests/test_ml_udf.py asserts the captured
    metrics equal an independent aggregate).  The oracle checks the
    pass-through rows are untouched by the instrumentation.
    """
    from pyspark.sql import Observation

    o = table(spark, sf_dir, "orders")
    obs = Observation("q_observe_metrics")
    return (
        o.filter(
            (F.col("o_orderstatus") == "O")
            & (F.col("o_totalprice") > 200000.0)
        )
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("total_cents"),
        )
    )
