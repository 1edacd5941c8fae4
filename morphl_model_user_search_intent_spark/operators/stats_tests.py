"""Statistical hypothesis tests & association measures, round 2
(SURVEY.md §2 "extra" analytics surface): Mann-Whitney U, Cramér's V,
Cohen's kappa.

Shared float discipline with operators/analytics.py: every statistic
is assembled from exact integer rank/count sums (order-independent);
the only float steps are single fixed-shape expressions both engines
evaluate identically, rounded before the driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..io import table
from ..registry import register


@register(
    "q_stats_mannwhitney",
    oracle="""
    WITH c AS (
      SELECT event_type AS g,
             CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    rk AS (
      SELECT g,
             2 * RANK() OVER (ORDER BY c)
               + COUNT(*) OVER (PARTITION BY c) - 1 AS r2
      FROM c
    ),
    s AS (
      SELECT
        CAST(COUNT(*) FILTER (g = 'click') AS BIGINT) AS n_a,
        CAST(COUNT(*) FILTER (g = 'purchase') AS BIGINT) AS n_b,
        CAST(SUM(r2) FILTER (g = 'click') AS BIGINT) AS s2a
      FROM rk
    )
    SELECT n_a, n_b,
           (s2a - n_a * (n_a + 1)) / 2.0 AS u_stat,
           ROUND((CAST(s2a - n_a * (n_a + 1) AS DOUBLE) - n_a * n_b)
                 / (2.0 * SQRT(CAST(n_a AS DOUBLE) * n_b
                               * (n_a + n_b + 1) / 12.0)), 6) AS z_score,
           ROUND(1.0 - CAST(s2a - n_a * (n_a + 1) AS DOUBLE)
                 / (CAST(n_a AS DOUBLE) * n_b), 6) AS rank_biserial
    FROM s
    """,
)
def q_stats_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test: do 'click' and
    'purchase' event values come from the same distribution?  The
    2-sample nonparametric companion to q_stats_ttest (and the k-group
    q_stats_kruskal), plus the rank-biserial effect size (r = 1 −
    2U/n₁n₂) — the same doubled-rank identity as q_ml_auc, since
    U/n₁n₂ IS the AUC.

    Doubled tie-averaged ranks (2r̄ = 2·rank + ties − 1) keep the
    rank sum S and hence 2U = S₂ₐ − n₁(n₁+1) fully integral; z uses
    the no-tie-correction normal approximation evaluated as one fixed
    expression from those integers (identical in both engines).  Rank
    assignment is one sort-based window over the filtered pair of
    groups; at 100 TB the same statistic comes from the value-counts
    formulation (groupBy cents value → cumulative counts), which
    shuffles |distinct values| rows instead of sorting N.
    """
    c = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    ).select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    )
    rk = c.select(
        "g",
        (
            2 * F.rank().over(W.orderBy("c"))
            + F.count("*").over(W.partitionBy("c"))
            - 1
        ).alias("r2"),
    )
    s = rk.agg(
        F.count(F.when(F.col("g") == "click", 1))
        .cast("bigint")
        .alias("n_a"),
        F.count(F.when(F.col("g") == "purchase", 1))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("g") == "click", F.col("r2")))
        .cast("bigint")
        .alias("s2a"),
    )
    u2 = F.col("s2a") - F.col("n_a") * (F.col("n_a") + 1)
    na_d = F.col("n_a").cast("double")
    return s.select(
        "n_a",
        "n_b",
        (u2 / 2.0).alias("u_stat"),
        F.round(
            (u2.cast("double") - F.col("n_a") * F.col("n_b"))
            / (
                2.0
                * F.sqrt(
                    na_d
                    * F.col("n_b")
                    * (F.col("n_a") + F.col("n_b") + 1)
                    / 12.0
                )
            ),
            6,
        ).alias("z_score"),
        F.round(
            1.0 - u2.cast("double") / (na_d * F.col("n_b")), 6
        ).alias("rank_biserial"),
    )


@register(
    "q_stats_cramers",
    oracle="""
    WITH obs AS (
      SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    m AS (
      SELECT seg, pri, o,
             CAST(SUM(o) OVER (PARTITION BY seg) AS BIGINT) AS rs,
             CAST(SUM(o) OVER (PARTITION BY pri) AS BIGINT) AS cs,
             CAST(SUM(o) OVER () AS BIGINT) AS n
      FROM obs
    ),
    terms AS (
      SELECT n,
             ROUND(POWER(o - CAST(rs AS DOUBLE) * cs / n, 2)
                   / (CAST(rs AS DOUBLE) * cs / n), 6) AS term
      FROM m
    ),
    agg AS (
      SELECT CAST(ANY_VALUE(n) AS BIGINT) AS n,
             CAST(SUM(CAST(term AS DECIMAL(38, 8))) AS DOUBLE) AS chi2
      FROM terms
    )
    SELECT n, CAST(5 AS BIGINT) AS n_rows, CAST(5 AS BIGINT) AS n_cols,
           ROUND(chi2, 6) AS chi2,
           CAST(16 AS BIGINT) AS dof,
           ROUND(SQRT(chi2 / (n * 4.0)), 6) AS cramers_v
    FROM agg
    """,
)
def q_stats_cramers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association strength between customer market
    segment and order priority (5×5 contingency over orders⋈customer)
    — the normalized-χ² effect size ([0,1]) that, unlike the raw χ²
    of q_stats_chi2, is comparable across table sizes: V =
    √(χ²/(N·(min(r,c)−1))).

    Cell counts, row/column marginals and N are exact integers from
    one aggregate plus three window sums over the 25-row contingency
    table (driver-sized after the first groupBy — the scan is the only
    big input, and it reduces map-side).  Each cell's (O−E)²/E is one
    fixed float expression rounded to 6 dp, summed exactly as
    DECIMAL(38,8) so cross-engine accumulation order can't flip the
    hash.  The customer dim is broadcast; the fact scan never
    shuffles full rows.
    """
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    obs = (
        o.join(
            F.broadcast(c), o.o_custkey == c.c_custkey
        )
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count("*").cast("bigint").alias("o"))
    )
    m = obs.select(
        "seg",
        "pri",
        "o",
        F.sum("o").over(W.partitionBy("seg")).cast("bigint").alias("rs"),
        F.sum("o").over(W.partitionBy("pri")).cast("bigint").alias("cs"),
        F.sum("o").over(W.partitionBy()).cast("bigint").alias("n"),
    )
    e = F.col("rs").cast("double") * F.col("cs") / F.col("n")
    terms = m.select(
        "n",
        F.round(F.pow(F.col("o") - e, 2) / e, 6).alias("term"),
    )
    agg = terms.agg(
        F.any_value("n").cast("bigint").alias("n"),
        F.sum(F.col("term").cast("decimal(38,8)"))
        .cast("double")
        .alias("chi2"),
    )
    return agg.select(
        "n",
        F.lit(5).cast("bigint").alias("n_rows"),
        F.lit(5).cast("bigint").alias("n_cols"),
        F.round("chi2", 6).alias("chi2"),
        F.lit(16).cast("bigint").alias("dof"),
        F.round(F.sqrt(F.col("chi2") / (F.col("n") * 4.0)), 6).alias(
            "cramers_v"
        ),
    )


# Rater buckets: two independent deterministic labelers of document
# size — character-based and token-based. Their agreement beyond
# chance is what kappa measures.
_CHARS_BUCKET = (
    "CASE WHEN n_chars < 200 THEN 'S' WHEN n_chars < 400 THEN 'M' "
    "ELSE 'L' END"
)
_TOKS_BUCKET = (
    "CASE WHEN ntoks < 36 THEN 'S' WHEN ntoks < 72 THEN 'M' "
    "ELSE 'L' END"
)


@register(
    "q_stats_kappa",
    oracle=f"""
    WITH labeled AS (
      SELECT {_CHARS_BUCKET} AS r1,
             CASE WHEN len(string_split(trim(text), ' ')) < 36 THEN 'S'
                  WHEN len(string_split(trim(text), ' ')) < 72 THEN 'M'
                  ELSE 'L' END AS r2
      FROM documents
    ),
    cells AS (
      SELECT r1, r2, CAST(COUNT(*) AS BIGINT) AS o FROM labeled
      GROUP BY 1, 2
    ),
    marg AS (
      SELECT CAST(SUM(o) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN r1 = r2 THEN o ELSE 0 END) AS BIGINT)
               AS agree
      FROM cells
    ),
    r1m AS (SELECT r1 AS lab, CAST(SUM(o) AS BIGINT) AS rn
            FROM cells GROUP BY r1),
    r2m AS (SELECT r2 AS lab, CAST(SUM(o) AS BIGINT) AS cn
            FROM cells GROUP BY r2),
    pe AS (
      SELECT CAST(SUM(r1m.rn * r2m.cn) AS BIGINT) AS pe_num
      FROM r1m JOIN r2m ON r1m.lab = r2m.lab
    )
    SELECT marg.n,
           ROUND(CAST(marg.agree AS DOUBLE) / marg.n, 6) AS p_observed,
           ROUND(CAST(pe.pe_num AS DOUBLE) / marg.n / marg.n, 6)
             AS p_expected,
           ROUND((CAST(marg.agree AS DOUBLE) / marg.n
                  - CAST(pe.pe_num AS DOUBLE) / marg.n / marg.n)
                 / (1.0 - CAST(pe.pe_num AS DOUBLE) / marg.n / marg.n),
                 6) AS kappa
    FROM marg, pe
    """,
)
def q_stats_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa inter-rater agreement between two deterministic
    document-size labelers (char-bucket vs token-bucket raters, S/M/L)
    — the label-QA metric an annotation pipeline reports before
    trusting a training-label column: κ = (p₀ − pₑ)/(1 − pₑ),
    agreement corrected for chance.

    All inputs are exact integers (diagonal count, per-rater
    marginals, their products summed as BIGINT); the three ratios and
    κ are one fixed float expression, rounded — nothing
    order-dependent anywhere.  The confusion matrix is 9 cells after a
    map-side-combining aggregate, so the plan is scan-dominated at any
    scale.
    """
    d = table(spark, sf_dir, "documents")
    labeled = d.select(
        F.expr(_CHARS_BUCKET).alias("r1"),
        F.when(F.size(F.split(F.trim("text"), " ")) < 36, "S")
        .when(F.size(F.split(F.trim("text"), " ")) < 72, "M")
        .otherwise("L")
        .alias("r2"),
    )
    cells = labeled.groupBy("r1", "r2").agg(
        F.count("*").cast("bigint").alias("o")
    )
    tot = cells.agg(
        F.sum("o").cast("bigint").alias("n"),
        F.sum(F.when(F.col("r1") == F.col("r2"), F.col("o")).otherwise(0))
        .cast("bigint")
        .alias("agree"),
    )
    r1m = cells.groupBy(F.col("r1").alias("lab")).agg(
        F.sum("o").cast("bigint").alias("rn")
    )
    r2m = cells.groupBy(F.col("r2").alias("lab")).agg(
        F.sum("o").cast("bigint").alias("cn")
    )
    pe = (
        r1m.join(r2m, "lab")
        .agg(
            F.sum(F.col("rn") * F.col("cn")).cast("bigint").alias("pe_num")
        )
    )
    n_d = F.col("n").cast("double")
    po = F.col("agree").cast("double") / n_d
    pexp = F.col("pe_num").cast("double") / n_d / n_d
    return tot.crossJoin(pe).select(
        "n",
        F.round(po, 6).alias("p_observed"),
        F.round(pexp, 6).alias("p_expected"),
        F.round((po - pexp) / (1.0 - pexp), 6).alias("kappa"),
    )
