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


@register(
    "q_stats_mcnemar",
    oracle="""
    WITH flags AS (
      SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS a,
             CASE WHEN len(string_split(trim(text), ' ')) >= 54
                  THEN 1 ELSE 0 END AS b
      FROM documents
    ),
    cells AS (
      SELECT
        CAST(SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n11,
        CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n10,
        CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n01,
        CAST(SUM(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n00
      FROM flags
    )
    SELECT n11, n10, n01, n00,
           ROUND(CAST((ABS(n10 - n01) - 1) * (ABS(n10 - n01) - 1)
                      AS DOUBLE) / (n10 + n01), 6) AS chi2_cc
    FROM cells
    """,
)
def q_stats_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test for paired binary labelers — the label-QA check
    for whether two annotators (here: a char-length rule vs a
    token-count rule over the same documents) disagree symmetrically.
    Only the discordant cells matter: χ²_cc = (|b−c|−1)²/(b+c) with
    Edwards' continuity correction.

    The 2×2 table is four exact integer conditional sums in ONE
    map-side-combinable pass (no shuffle beyond the final 1-row agg);
    the statistic is a single fixed float expression.  Scale posture:
    scan-dominated, any row count.
    """
    d = table(spark, sf_dir, "documents")
    a = F.when(F.col("n_chars") >= 300, 1).otherwise(0)
    b = F.when(
        F.size(F.split(F.trim("text"), " ")) >= 54, 1
    ).otherwise(0)
    cells = d.select(a.alias("a"), b.alias("b")).agg(
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("n11"),
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("n10"),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("n01"),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("n00"),
    )
    diff = F.abs(F.col("n10") - F.col("n01")) - 1
    return cells.select(
        "n11",
        "n10",
        "n01",
        "n00",
        F.round(
            (diff * diff).cast("double")
            / (F.col("n10") + F.col("n01")),
            6,
        ).alias("chi2_cc"),
    )


@register(
    "q_stats_kendall",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_c,
             CAST(COUNT(*) AS BIGINT) AS n_ord
      FROM orders
      WHERE o_orderdate < TIMESTAMP '1993-01-01 00:00:00'
      GROUP BY 1
    ),
    pairs AS (
      SELECT
        CASE WHEN (a.rev_c - b.rev_c) * (a.n_ord - b.n_ord) > 0
             THEN 1 ELSE 0 END AS conc,
        CASE WHEN (a.rev_c - b.rev_c) * (a.n_ord - b.n_ord) < 0
             THEN 1 ELSE 0 END AS disc,
        CASE WHEN a.rev_c = b.rev_c THEN 1 ELSE 0 END AS tie_x,
        CASE WHEN a.n_ord = b.n_ord THEN 1 ELSE 0 END AS tie_y
      FROM daily a JOIN daily b ON a.d < b.d
    ),
    s AS (
      SELECT CAST(SUM(conc) AS BIGINT) AS c,
             CAST(SUM(disc) AS BIGINT) AS d,
             CAST(SUM(tie_x) AS BIGINT) AS tx,
             CAST(SUM(tie_y) AS BIGINT) AS ty,
             CAST(COUNT(*) AS BIGINT) AS n0
      FROM pairs
    )
    SELECT c AS concordant, d AS discordant, tx AS ties_x, ty AS ties_y,
           n0 AS n_pairs,
           ROUND(CAST(c - d AS DOUBLE)
                 / SQRT(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE)),
                 6) AS tau_b
    FROM s
    """,
)
def q_stats_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's τ-b rank correlation between daily revenue and daily
    order count (first year of orders) — the ordinal complement to
    q_stats_spearman, robust to any monotone transform and exact under
    ties via the τ-b denominator √((n₀−T_x)(n₀−T_y)).

    Scale posture: the O(n²) pair join runs on the AGGREGATED daily
    series (bounded by calendar days, not row count — ~365 rows at any
    SF), never on raw orders; revenue is compared in exact integer
    cents so concordance flags are identical across engines.  The raw
    scan is one map-side-combinable groupBy; the pair join is a
    broadcast cross of a tiny series.
    """
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1993-01-01 00:00:00").cast("timestamp")
    )
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_c"),
        F.count("*").cast("bigint").alias("n_ord"),
    )
    a = daily.alias("a")
    b = daily.alias("b")
    dx = F.col("a.rev_c") - F.col("b.rev_c")
    dy = F.col("a.n_ord") - F.col("b.n_ord")
    pairs = a.join(
        F.broadcast(b), F.col("a.d") < F.col("b.d"), "inner"
    ).select(
        F.when(dx * dy > 0, 1).otherwise(0).alias("conc"),
        F.when(dx * dy < 0, 1).otherwise(0).alias("disc"),
        F.when(dx == 0, 1).otherwise(0).alias("tie_x"),
        F.when(dy == 0, 1).otherwise(0).alias("tie_y"),
    )
    s = pairs.agg(
        F.sum("conc").cast("bigint").alias("c"),
        F.sum("disc").cast("bigint").alias("d"),
        F.sum("tie_x").cast("bigint").alias("tx"),
        F.sum("tie_y").cast("bigint").alias("ty"),
        F.count("*").cast("bigint").alias("n0"),
    )
    return s.select(
        F.col("c").alias("concordant"),
        F.col("d").alias("discordant"),
        F.col("tx").alias("ties_x"),
        F.col("ty").alias("ties_y"),
        F.col("n0").alias("n_pairs"),
        F.round(
            (F.col("c") - F.col("d")).cast("double")
            / F.sqrt(
                (F.col("n0") - F.col("tx")).cast("double")
                * (F.col("n0") - F.col("ty")).cast("double")
            ),
            6,
        ).alias("tau_b"),
    )


@register(
    "q_stats_friedman",
    oracle="""
    WITH cells AS (
      SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS blk,
             o_orderpriority AS trt,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS v
      FROM orders
      WHERE o_orderdate < TIMESTAMP '1993-01-01 00:00:00'
      GROUP BY 1, 2
    ),
    full_blk AS (
      SELECT blk FROM cells GROUP BY blk HAVING COUNT(*) = 5
    ),
    rk AS (
      SELECT c.blk, c.trt,
             2 * RANK() OVER (PARTITION BY c.blk ORDER BY c.v)
               + COUNT(*) OVER (PARTITION BY c.blk, c.v) - 1 AS r2
      FROM cells c JOIN full_blk USING (blk)
    ),
    rj AS (
      SELECT trt, CAST(SUM(r2) AS BIGINT) AS r2_sum
      FROM rk GROUP BY trt
    ),
    s AS (
      SELECT CAST(SUM(r2_sum * r2_sum) AS BIGINT) AS ssq,
             CAST(COUNT(*) AS BIGINT) AS k,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM full_blk) AS b
      FROM rj
    )
    SELECT b AS n_blocks, k AS n_treatments,
           ROUND(12.0 * (CAST(ssq AS DOUBLE) / 4.0)
                   / (b * k * (k + 1))
                 - 3.0 * b * (k + 1), 6) AS chi2_friedman
    FROM s
    """,
)
def q_stats_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test for k related samples — do the five order
    priorities earn systematically different weekly revenue once the
    week-to-week level is blocked out?  The non-parametric repeated-
    measures ANOVA: rank the k=5 treatments WITHIN each week block,
    χ²_F = 12/(bk(k+1))·ΣR_j² − 3b(k+1).

    Ranks are kept as exact doubled integers (the 2·RANK + ties − 1
    trick shared with q_stats_mannwhitney/q_stats_kruskal) so every
    sum is a BIGINT; blocks missing a treatment are dropped (complete-
    block design).  The heavy input collapses to ≤ 5·weeks cells in
    one map-side-combinable aggregate before any window runs — the
    ranking window operates on a bounded series at any raw scale.
    """
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1993-01-01 00:00:00").cast("timestamp")
    )
    cells = o.groupBy(
        F.date_trunc("week", "o_orderdate").cast("date").alias("blk"),
        F.col("o_orderpriority").alias("trt"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("v")
    )
    full_blk = (
        cells.groupBy("blk").agg(F.count("*").alias("nt"))
        .filter(F.col("nt") == 5)
        .select("blk")
    )
    c2 = cells.join(F.broadcast(full_blk), "blk")
    r2 = (
        2 * F.rank().over(W.partitionBy("blk").orderBy("v"))
        + F.count("*").over(W.partitionBy("blk", "v"))
        - 1
    )
    rk = c2.select("blk", "trt", r2.alias("r2"))
    rj = rk.groupBy("trt").agg(F.sum("r2").cast("bigint").alias("r2_sum"))
    s = rj.agg(
        F.sum(F.col("r2_sum") * F.col("r2_sum"))
        .cast("bigint")
        .alias("ssq"),
        F.count("*").cast("bigint").alias("k"),
    ).crossJoin(full_blk.agg(F.count("*").cast("bigint").alias("b")))
    return s.select(
        F.col("b").alias("n_blocks"),
        F.col("k").alias("n_treatments"),
        F.round(
            12.0
            * (F.col("ssq").cast("double") / 4.0)
            / (F.col("b") * F.col("k") * (F.col("k") + 1))
            - 3.0 * F.col("b") * (F.col("k") + 1),
            6,
        ).alias("chi2_friedman"),
    )


@register(
    "q_stats_cochranq",
    oracle="""
    WITH flags AS (
      SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS a,
             CASE WHEN len(string_split(trim(text), ' ')) >= 54
                  THEN 1 ELSE 0 END AS b,
             CASE WHEN lower(text) LIKE '% the %' THEN 1 ELSE 0 END AS c
      FROM documents
    ),
    s AS (
      SELECT CAST(SUM(a) AS BIGINT) AS ca,
             CAST(SUM(b) AS BIGINT) AS cb,
             CAST(SUM(c) AS BIGINT) AS cc,
             CAST(SUM(a + b + c) AS BIGINT) AS sr,
             CAST(SUM((a + b + c) * (a + b + c)) AS BIGINT) AS sr2
      FROM flags
    )
    SELECT ca AS n_rule_a, cb AS n_rule_b, cc AS n_rule_c,
           ROUND(2.0 * (3 * (ca * ca + cb * cb + cc * cc)
                        - CAST(sr AS DOUBLE) * sr)
                 / (3 * sr - sr2), 6) AS cochran_q
    FROM s
    """,
)
def q_stats_cochranq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q test across k=3 binary labeling rules applied to
    the same documents (char-length, token-count, contains-"the") —
    the k-rater generalization of q_stats_mcnemar an annotation-QA
    pipeline runs before trusting ANY of its weak labelers:
    Q = (k−1)(kΣC_j² − (ΣC_j)²)/(kΣR_i − ΣR_i²).

    Everything is exact integer sums in ONE map-side-combinable pass
    over the scan (row totals and their squares fold into the same
    aggregate); the statistic is a single fixed float expression.
    """
    d = table(spark, sf_dir, "documents")
    a = F.when(F.col("n_chars") >= 300, 1).otherwise(0)
    b = F.when(F.size(F.split(F.trim("text"), " ")) >= 54, 1).otherwise(0)
    c = F.when(F.lower("text").like("% the %"), 1).otherwise(0)
    flags = d.select(a.alias("a"), b.alias("b"), c.alias("c"))
    r = F.col("a") + F.col("b") + F.col("c")
    s = flags.agg(
        F.sum("a").cast("bigint").alias("ca"),
        F.sum("b").cast("bigint").alias("cb"),
        F.sum("c").cast("bigint").alias("cc"),
        F.sum(r).cast("bigint").alias("sr"),
        F.sum(r * r).cast("bigint").alias("sr2"),
    )
    ssq = (
        F.col("ca") * F.col("ca")
        + F.col("cb") * F.col("cb")
        + F.col("cc") * F.col("cc")
    )
    return s.select(
        F.col("ca").alias("n_rule_a"),
        F.col("cb").alias("n_rule_b"),
        F.col("cc").alias("n_rule_c"),
        F.round(
            2.0
            * (3 * ssq - F.col("sr").cast("double") * F.col("sr"))
            / (3 * F.col("sr") - F.col("sr2")),
            6,
        ).alias("cochran_q"),
    )


@register(
    "q_stats_dispersion",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS sc,
             CAST(SUM(c * c) AS BIGINT) AS sc2
      FROM daily GROUP BY event_type
    )
    SELECT event_type, n AS n_days, sc AS n_events,
           ROUND(CAST(sc AS DOUBLE) / n, 6) AS mean_daily,
           ROUND((sc2 - CAST(sc AS DOUBLE) * sc / n) / (n - 1), 6)
             AS var_daily,
           ROUND(((sc2 - CAST(sc AS DOUBLE) * sc / n) / (n - 1))
                 / (CAST(sc AS DOUBLE) / n), 6) AS dispersion_index,
           CASE WHEN ((sc2 - CAST(sc AS DOUBLE) * sc / n) / (n - 1))
                     / (CAST(sc AS DOUBLE) / n) > 1.5
                THEN 'overdispersed'
                WHEN ((sc2 - CAST(sc AS DOUBLE) * sc / n) / (n - 1))
                     / (CAST(sc AS DOUBLE) / n) < 0.67
                THEN 'underdispersed'
                ELSE 'poisson-like' END AS verdict
    FROM s
    """,
)
def q_stats_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-of-dispersion (variance/mean) test per event type on
    daily counts — the Poisson goodness-of-fit triage that tells a
    capacity planner whether arrivals are bursty (overdispersed ⇒
    negative-binomial-style planning) or steady: D = s²/x̄, with
    (n−1)·D ~ χ²ₙ₋₁ under Poisson.

    The raw scan collapses to ≤ types×days cells map-side; variance
    comes from exact BIGINT Σc and Σc² (no float accumulation), so D
    and the verdict are single fixed float expressions per type.
    """
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.count("*").cast("bigint").alias("c"))
    s = daily.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sc2"),
    )
    mean = F.col("sc").cast("double") / F.col("n")
    var = (
        F.col("sc2") - F.col("sc").cast("double") * F.col("sc") / F.col("n")
    ) / (F.col("n") - 1)
    disp = var / mean
    return s.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("sc").alias("n_events"),
        F.round(mean, 6).alias("mean_daily"),
        F.round(var, 6).alias("var_daily"),
        F.round(disp, 6).alias("dispersion_index"),
        F.when(disp > 1.5, "overdispersed")
        .when(disp < 0.67, "underdispersed")
        .otherwise("poisson-like")
        .alias("verdict"),
    )


@register(
    "q_stats_mutual_info",
    oracle="""
    WITH cells AS (
      SELECT CAST(hour(ts) AS BIGINT) // 6 AS x,
             event_type AS y,
             CAST(COUNT(*) AS BIGINT) AS nxy
      FROM events GROUP BY 1, 2
    ),
    nx AS (SELECT x, CAST(SUM(nxy) AS BIGINT) AS nx
           FROM cells GROUP BY x),
    ny AS (SELECT y, CAST(SUM(nxy) AS BIGINT) AS ny
           FROM cells GROUP BY y),
    n AS (SELECT CAST(SUM(nxy) AS BIGINT) AS n FROM cells),
    mi_terms AS (
      SELECT CAST(ROUND(
               (CAST(c.nxy AS DOUBLE) / n.n)
               * LN(CAST(c.nxy AS DOUBLE) * n.n
                    / (CAST(nx.nx AS DOUBLE) * ny.ny)), 10)
               AS DECIMAL(20,10)) AS t
      FROM cells c
      JOIN nx ON nx.x = c.x
      JOIN ny ON ny.y = c.y
      CROSS JOIN n
    ),
    hy_terms AS (
      SELECT CAST(ROUND(
               -(CAST(ny.ny AS DOUBLE) / n.n)
               * LN(CAST(ny.ny AS DOUBLE) / n.n), 10)
               AS DECIMAL(20,10)) AS t
      FROM ny CROSS JOIN n
    )
    SELECT (SELECT CAST(n AS BIGINT) FROM n) AS n_events,
           ROUND(CAST((SELECT SUM(t) FROM mi_terms) AS DOUBLE), 6)
             AS mi_nats,
           ROUND(CAST((SELECT SUM(t) FROM hy_terms) AS DOUBLE), 6)
             AS h_y_nats,
           ROUND(CAST((SELECT SUM(t) FROM mi_terms) AS DOUBLE)
                 / CAST((SELECT SUM(t) FROM hy_terms) AS DOUBLE), 6)
             AS info_ratio
    """,
)
def q_stats_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between time-of-day (6-hour buckets) and
    event type, with the uncertainty coefficient MI/H(Y) — the
    feature-selection score answering "how much does knowing the hour
    tell you about what users do?"; the categorical complement to
    q_stats_cramers (effect size) and q_text_pmi (token level).

    The contingency table is ≤ 4×types exact integer cells from one
    map-side-combinable pass; each MI/entropy term is one fixed float
    expression rounded to DECIMAL(20,10) before the (tiny) sum, so
    accumulation order can never matter.
    """
    e = table(spark, sf_dir, "events")
    cells = e.groupBy(
        (F.hour("ts").cast("bigint") / 6)
        .cast("bigint")
        .alias("x"),
        F.col("event_type").alias("y"),
    ).agg(F.count("*").cast("bigint").alias("nxy"))
    nx = cells.groupBy("x").agg(F.sum("nxy").cast("bigint").alias("nx"))
    ny = cells.groupBy("y").agg(F.sum("nxy").cast("bigint").alias("ny"))
    n = cells.agg(F.sum("nxy").cast("bigint").alias("n"))
    mi_t = (
        cells.join(F.broadcast(nx), "x")
        .join(F.broadcast(ny), "y")
        .crossJoin(F.broadcast(n))
        .select(
            F.round(
                (F.col("nxy").cast("double") / F.col("n"))
                * F.log(
                    F.col("nxy").cast("double")
                    * F.col("n")
                    / (F.col("nx").cast("double") * F.col("ny"))
                ),
                10,
            )
            .cast("decimal(20,10)")
            .alias("t")
        )
        .agg(F.sum("t").alias("mi"))
    )
    hy_t = (
        ny.crossJoin(F.broadcast(n))
        .select(
            F.round(
                -(F.col("ny").cast("double") / F.col("n"))
                * F.log(F.col("ny").cast("double") / F.col("n")),
                10,
            )
            .cast("decimal(20,10)")
            .alias("t")
        )
        .agg(F.sum("t").alias("hy"))
    )
    return (
        n.crossJoin(mi_t)
        .crossJoin(hy_t)
        .select(
            F.col("n").alias("n_events"),
            F.round(F.col("mi").cast("double"), 6).alias("mi_nats"),
            F.round(F.col("hy").cast("double"), 6).alias("h_y_nats"),
            F.round(
                F.col("mi").cast("double") / F.col("hy").cast("double"), 6
            ).alias("info_ratio"),
        )
    )


@register(
    "q_stats_odds_ratio",
    oracle="""
    WITH flags AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
               AS outcome,
             CASE WHEN value >= 100 THEN 1 ELSE 0 END AS exposed
      FROM events
    ),
    cells AS (
      SELECT
        CAST(SUM(CASE WHEN exposed = 1 AND outcome = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS a,
        CAST(SUM(CASE WHEN exposed = 1 AND outcome = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS b,
        CAST(SUM(CASE WHEN exposed = 0 AND outcome = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS c,
        CAST(SUM(CASE WHEN exposed = 0 AND outcome = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS d
      FROM flags
    )
    SELECT a, b, c, d,
           ROUND(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c), 6)
             AS odds_ratio,
           ROUND(EXP(LN(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                     - 1.96 * SQRT(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6)
             AS ci_low,
           ROUND(EXP(LN(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                     + 1.96 * SQRT(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6)
             AS ci_high
    FROM cells
    """,
)
def q_stats_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Odds ratio with the Woolf 95% CI for a 2×2 exposure/outcome
    table (high-value event vs purchase outcome) — the effect-size
    report an experimentation or risk pipeline publishes next to the
    χ² p-value (q_stats_chi2 tests existence; this sizes it, with
    uncertainty).  OR = ad/bc; CI = exp(ln OR ± 1.96·√(Σ1/cell)).

    One map-side-combinable pass builds the four exact integer cells;
    the OR and CI are fixed float expressions.  Scan-dominated at any
    scale.
    """
    e = table(spark, sf_dir, "events")
    outcome = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    exposed = F.when(F.col("value") >= 100, 1).otherwise(0)
    flags = e.select(outcome.alias("o"), exposed.alias("x"))
    cells = flags.agg(
        F.sum(F.when((F.col("x") == 1) & (F.col("o") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when((F.col("x") == 1) & (F.col("o") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
        F.sum(F.when((F.col("x") == 0) & (F.col("o") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
        F.sum(F.when((F.col("x") == 0) & (F.col("o") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("d"),
    )
    orr = (
        F.col("a").cast("double")
        * F.col("d")
        / (F.col("b").cast("double") * F.col("c"))
    )
    half = 1.96 * F.sqrt(
        1.0 / F.col("a") + 1.0 / F.col("b") + 1.0 / F.col("c")
        + 1.0 / F.col("d")
    )
    return cells.select(
        "a",
        "b",
        "c",
        "d",
        F.round(orr, 6).alias("odds_ratio"),
        F.round(F.exp(F.log(orr) - half), 6).alias("ci_low"),
        F.round(F.exp(F.log(orr) + half), 6).alias("ci_high"),
    )


@register(
    "q_ml_score_ks",
    oracle="""
    WITH scored AS (
      SELECT CAST(ROUND(1.0 / (1.0 + EXP(-(value - 50.0) / 10.0)), 6)
                  AS DECIMAL(18,6)) AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    tot AS (
      SELECT CAST(SUM(y) AS BIGINT) AS np,
             CAST(SUM(1 - y) AS BIGINT) AS nn
      FROM scored
    ),
    by_score AS (
      SELECT s,
             CAST(SUM(y) AS BIGINT) AS p,
             CAST(SUM(1 - y) AS BIGINT) AS q
      FROM scored GROUP BY s
    ),
    cum AS (
      SELECT s,
             CAST(SUM(p) OVER (ORDER BY s) AS BIGINT) AS cp,
             CAST(SUM(q) OVER (ORDER BY s) AS BIGINT) AS cq
      FROM by_score
    )
    SELECT ROUND(ABS(CAST(cp AS DOUBLE) / tot.np
                     - CAST(cq AS DOUBLE) / tot.nn), 6) AS ks_stat,
           s AS ks_score,
           cp AS n_pos_below, cq AS n_neg_below
    FROM cum CROSS JOIN tot
    ORDER BY ABS(CAST(cp AS DOUBLE) / tot.np
                 - CAST(cq AS DOUBLE) / tot.nn) DESC, s
    LIMIT 1
    """,
)
def q_ml_score_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov-Smirnov discrimination of a probability score: the
    maximum separation between the positive- and negative-class score
    CDFs, and the score where it occurs (the natural cutoff) — the
    credit-scoring twin of AUC (q_stats_ks measures drift between
    periods; this measures class separation on the SAME logistic
    score q_ml_calibration audits).

    Scores collapse to distinct values first (bounded domain after
    6-dp rounding), so the CDF window runs over a small series;
    counts are exact integers and the argmax carries a score
    tie-break, making the LIMIT 1 deterministic in both engines.
    """
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    s = F.round(
        1.0 / (1.0 + F.exp(-(F.col("value") - 50.0) / 10.0)), 6
    ).cast("decimal(18,6)")
    y = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    scored = e.select(s.alias("s"), y.alias("y"))
    tot = scored.agg(
        F.sum("y").cast("bigint").alias("np"),
        F.sum(1 - F.col("y")).cast("bigint").alias("nn"),
    )
    by_score = scored.groupBy("s").agg(
        F.sum("y").cast("bigint").alias("p"),
        F.sum(1 - F.col("y")).cast("bigint").alias("q"),
    )
    wc = W.orderBy("s").rowsBetween(W.unboundedPreceding, 0)
    cum = by_score.select(
        "s",
        F.sum("p").over(wc).cast("bigint").alias("cp"),
        F.sum("q").over(wc).cast("bigint").alias("cq"),
    )
    sep = F.abs(
        F.col("cp").cast("double") / F.col("np")
        - F.col("cq").cast("double") / F.col("nn")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .orderBy(sep.desc(), "s")
        .limit(1)
        .select(
            F.round(sep, 6).alias("ks_stat"),
            F.col("s").alias("ks_score"),
            F.col("cp").alias("n_pos_below"),
            F.col("cq").alias("n_neg_below"),
        )
    )


@register(
    "q_stats_cohens_h",
    oracle="""
    WITH seg AS (
      SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 'a' ELSE 'b' END
               AS grp,
             CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS hot
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    s AS (
      SELECT
        CAST(SUM(CASE WHEN grp = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS na,
        CAST(SUM(CASE WHEN grp = 'a' THEN hot ELSE 0 END) AS BIGINT) AS ka,
        CAST(SUM(CASE WHEN grp = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
        CAST(SUM(CASE WHEN grp = 'b' THEN hot ELSE 0 END) AS BIGINT) AS kb
      FROM seg
    )
    SELECT na, ka, nb, kb,
           ROUND(CAST(ka AS DOUBLE) / na, 6) AS p_a,
           ROUND(CAST(kb AS DOUBLE) / nb, 6) AS p_b,
           ROUND(2 * ASIN(SQRT(CAST(ka AS DOUBLE) / na))
                 - 2 * ASIN(SQRT(CAST(kb AS DOUBLE) / nb)), 6)
             AS cohens_h
    FROM s
    """,
)
def q_stats_cohens_h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's h effect size for two proportions (urgent-order rate,
    BUILDING segment vs the rest): h = 2·asin√p₁ − 2·asin√p₂ — the
    arcsine-stabilized effect size an experimentation report pairs
    with its significance test (q_ab_test says IF rates differ; h
    says HOW MUCH in a variance-stabilized unit).

    One broadcast dimension join + one map-side-combinable pass into
    four exact integer cells; h is a single fixed float expression
    (asin/sqrt evaluate identically on identical doubles).
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    seg = o.join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    ).select(
        F.when(F.col("c_mktsegment") == "BUILDING", "a")
        .otherwise("b")
        .alias("grp"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("hot"),
    )
    s = seg.agg(
        F.sum(F.when(F.col("grp") == "a", 1).otherwise(0))
        .cast("bigint")
        .alias("na"),
        F.sum(F.when(F.col("grp") == "a", F.col("hot")).otherwise(0))
        .cast("bigint")
        .alias("ka"),
        F.sum(F.when(F.col("grp") == "b", 1).otherwise(0))
        .cast("bigint")
        .alias("nb"),
        F.sum(F.when(F.col("grp") == "b", F.col("hot")).otherwise(0))
        .cast("bigint")
        .alias("kb"),
    )
    pa = F.col("ka").cast("double") / F.col("na")
    pb = F.col("kb").cast("double") / F.col("nb")
    return s.select(
        "na",
        "ka",
        "nb",
        "kb",
        F.round(pa, 6).alias("p_a"),
        F.round(pb, 6).alias("p_b"),
        F.round(
            2 * F.asin(F.sqrt(pa)) - 2 * F.asin(F.sqrt(pb)), 6
        ).alias("cohens_h"),
    )


@register(
    "q_stats_trimmed_mean",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT rev,
             CAST(ROW_NUMBER() OVER (ORDER BY rev, o_custkey)
                  AS BIGINT) AS rn,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM cust) AS n
      FROM cust
    ),
    kept AS (
      SELECT rev, n FROM ranked
      WHERE rn > n // 10 AND rn <= n - n // 10
    )
    SELECT ANY_VALUE(n) AS n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           ROUND(CAST(SUM(rev) AS DOUBLE) / COUNT(*) / 100, 4)
             AS trimmed_mean,
           CAST(MIN(rev) AS BIGINT) AS kept_min_cents,
           CAST(MAX(rev) AS BIGINT) AS kept_max_cents
    FROM kept
    """,
)
def q_stats_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% two-sided trimmed mean of per-customer revenue — the
    robust-location estimate that completes the robust-statistics
    shelf (q_feature_winsorize clamps, q_stats_mad scales, this
    trims): drop the bottom and top ⌊n/10⌋ by exact rank, average
    the rest.

    Rank boundaries are exact integers over the (rev, custkey) total
    order — no percentile interpolation to disagree on; the kept
    sum is exact cents.  One rollup + one bounded window + one
    aggregate.
    """
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev")
    )
    n = cust.count()
    k = n // 10
    ranked = cust.select(
        "rev",
        F.row_number()
        .over(W.orderBy("rev", "o_custkey"))
        .cast("bigint")
        .alias("rn"),
    )
    kept = ranked.filter((F.col("rn") > k) & (F.col("rn") <= n - k))
    return kept.agg(
        F.lit(n).cast("bigint").alias("n_customers"),
        F.count("*").cast("bigint").alias("n_kept"),
        F.round(
            F.sum("rev").cast("double") / F.count("*") / 100, 4
        ).alias("trimmed_mean"),
        F.min("rev").cast("bigint").alias("kept_min_cents"),
        F.max("rev").cast("bigint").alias("kept_max_cents"),
    )


@register(
    "q_stats_grubbs",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS v
      FROM events GROUP BY 1
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS sv,
             CAST(SUM(v * v) AS BIGINT) AS svv
      FROM daily
    ),
    scored AS (
      SELECT d, v, n,
             ABS(v - CAST(sv AS DOUBLE) / n)
               / SQRT((svv - CAST(sv AS DOUBLE) * sv / n) / (n - 1))
               AS g
      FROM daily CROSS JOIN m
    )
    SELECT d AS suspect_day, v AS value_cents, n AS n_days,
           ROUND(g, 6) AS grubbs_g,
           CASE WHEN g > 3.0 THEN 1 ELSE 0 END AS reject_h0
    FROM scored
    ORDER BY g DESC, d
    LIMIT 1
    """,
)
def q_stats_grubbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' maximum-normed-residual test on daily event value
    totals: the single most extreme day and its G = max|x−x̄|/s —
    the formal "is the worst point an outlier" check behind the
    eyeball anomaly ops (q_events_anomaly flags many; Grubbs rules on
    ONE), with a fixed 3.0 critical-value gate standing in for the
    t-based threshold.

    Mean and variance come from exact BIGINT Σv, Σv² (cent-scaled);
    every day's G is one fixed float expression and the argmax
    carries a date tie-break, so the LIMIT 1 is deterministic.
    """
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("v")
    )
    m = daily.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("sv"),
        F.sum(F.col("v") * F.col("v")).cast("bigint").alias("svv"),
    )
    mean = F.col("sv").cast("double") / F.col("n")
    sd = F.sqrt(
        (F.col("svv") - F.col("sv").cast("double") * F.col("sv") / F.col("n"))
        / (F.col("n") - 1)
    )
    g = F.abs(F.col("v") - mean) / sd
    scored = daily.crossJoin(F.broadcast(m)).select(
        "d", "v", "n", g.alias("g")
    )
    return (
        scored.orderBy(F.col("g").desc(), "d")
        .limit(1)
        .select(
            F.col("d").alias("suspect_day"),
            F.col("v").alias("value_cents"),
            F.col("n").alias("n_days"),
            F.round(F.col("g"), 6).alias("grubbs_g"),
            F.when(F.col("g") > 3.0, 1).otherwise(0).alias("reject_h0"),
        )
    )
