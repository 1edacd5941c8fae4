"""Window-function operators (SURVEY.md §2.5).

Determinism discipline: every ORDER BY inside a window carries a
unique-key tie-breaker (row_number/ntile are otherwise partition-order
dependent), and windowed sums go through the exact-decimal cast so
Spark's running accumulation and DuckDB's segment-tree evaluation
produce identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..io import table
from ..registry import register


@register(
    "q_win_rank",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           percent_rank() OVER w AS prnk
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking suite per nation by account balance."""
    c = table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("prnk"),
    )


@register(
    "q_win_topk",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def q_win_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (B4; 44,953 rows at sf0.1).

    Scale: rank-filter is the distributed top-k-per-group idiom — one
    shuffle on the group key, then a per-partition sort bounded by the
    partition; Catalyst pushes the rn<=3 filter into the window sort
    (WindowGroupLimit) so no partition materializes fully sorted.
    """
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q_win_analytic",
    oracle="""
    SELECT event_id, user_id,
           lag(event_type) OVER w AS prev_type,
           lead(value) OVER w AS next_value,
           first_value(ts) OVER w AS first_ts,
           last_value(value) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND UNBOUNDED FOLLOWING) AS final_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic functions over per-user event sequences (lag/lead/
    first/last) — the reference's sequential-feature idiom."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("value").over(w).alias("next_value"),
        F.first("ts").over(w).alias("first_ts"),
        F.last("value").over(wfull).alias("final_value"),
    )


@register(
    "q_win_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS running_total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS sliding_avg,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS near_price_total
    FROM orders
    """,
)
def q_win_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame specifications: running sum (unbounded→current), sliding
    3-row average, and a numeric RANGE frame (±10k price band)."""
    o = table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(27,6)")
    wseq = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = wseq.rowsBetween(W.unboundedPreceding, W.currentRow)
    sliding = wseq.rowsBetween(-2, W.currentRow)
    # PySpark's rangeBetween only accepts integral boundaries; a
    # double-valued RANGE frame needs the SQL form.
    near_price = F.expr(
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) OVER ("
        "PARTITION BY o_custkey ORDER BY o_totalprice "
        "RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW) AS DOUBLE)"
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(dec).over(running).cast("double").alias("running_total"),
        (
            F.sum(dec).over(sliding).cast("double")
            / F.count(F.lit(1)).over(sliding)
        ).alias("sliding_avg"),
        near_price.alias("near_price_total"),
    )


@register(
    "q_win_cume",
    oracle="""
    SELECT c_custkey, c_nationkey,
           cume_dist() OVER (PARTITION BY c_nationkey
                             ORDER BY c_acctbal) AS cd,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) OVER (
             PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           / CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) OVER (
             PARTITION BY c_nationkey) AS DOUBLE) AS bal_share
    FROM customer
    """,
)
def q_win_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distribution + running share of the partition total
    (both ratios of exact-decimal sums → deterministic doubles)."""
    c = table(spark, sf_dir, "customer")
    dec = F.col("c_acctbal").cast("decimal(27,6)")
    wcd = W.partitionBy("c_nationkey").orderBy("c_acctbal")
    wrun = (
        W.partitionBy("c_nationkey")
        .orderBy("c_acctbal", "c_custkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wall = W.partitionBy("c_nationkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.cume_dist().over(wcd).alias("cd"),
        (
            F.sum(dec).over(wrun).cast("double")
            / F.sum(dec).over(wall).cast("double")
        ).alias("bal_share"),
    )


@register(
    "q_win_ratio",
    oracle="""
    WITH nrev AS (
      SELECT n.n_regionkey, n.n_name,
             SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS units
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE c.c_acctbal > 0
      GROUP BY 1, 2
    )
    SELECT n_name,
           CAST(units AS DOUBLE) / 100.0 AS balance,
           ROUND(CAST(units AS DOUBLE)
                 / SUM(units) OVER (PARTITION BY n_regionkey), 6)
             AS region_share,
           ROUND(CAST(units AS DOUBLE) / SUM(units) OVER (), 6)
             AS global_share
    FROM nrev
    """,
)
def q_win_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total windows (RATIO_TO_REPORT): each nation's
    positive customer balance as a share of its region and of the
    world — the report normalization every BI layer needs, spelled as
    unpartitioned/partitioned window sums over the pre-aggregated
    level, never over the fact table.

    The window input is |nations| rows, so the unbounded frames are
    trivial; shares divide exact integer cent sums (numerator and
    denominator both order-independent), making the doubles engine-
    identical with no rounding leap of faith — the 6-dp round only
    guards the division itself.
    """
    from pyspark.sql import Window as W

    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    nrev = (
        c.filter(F.col("c_acctbal") > 0)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_regionkey", "n_name")
        .agg(
            F.sum(
                F.round(F.col("c_acctbal") * 100).cast("bigint")
            ).alias("units")
        )
    )
    u = F.col("units").cast("double")
    return nrev.select(
        "n_name",
        (u / 100.0).alias("balance"),
        F.round(
            u / F.sum("units").over(W.partitionBy("n_regionkey")), 6
        ).alias("region_share"),
        F.round(u / F.sum("units").over(W.partitionBy()), 6).alias(
            "global_share"
        ),
    )


@register(
    "q_win_nth",
    oracle="""
    WITH w AS (
      SELECT user_id, event_id, ts, event_type,
             nth_value(event_type, 3) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS third_type,
             lead(event_type, 2, 'end-of-stream') OVER (
               PARTITION BY user_id ORDER BY ts, event_id)
               AS type_after_next,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT user_id, event_id, third_type, type_after_next
    FROM w WHERE rn <= 5
    """,
)
def q_win_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``nth_value`` and offset ``lead`` with a default — the
    remaining analytic-window corners (q_win_analytic covers
    lag/lead-1/first/last): "what was this user's 3rd-ever event"
    and "what happens two steps ahead" (default-filled at the
    stream's edge), both everyday sequence-feature spellings.

    The running frame makes nth_value deterministic (NULL until 3
    rows exist, then pinned); the (ts, event_id) order key is
    total, so both engines walk identical sequences.  Output is
    trimmed to each user's first 5 events to keep the check focused
    on the edge behavior.
    """
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    order = W.partitionBy("user_id").orderBy("ts", "event_id")
    run = order.rowsBetween(W.unboundedPreceding, 0)
    return (
        ev.select(
            "user_id",
            "event_id",
            F.nth_value("event_type", 3).over(run).alias("third_type"),
            F.lead("event_type", 2, "end-of-stream")
            .over(order)
            .alias("type_after_next"),
            F.row_number().over(order).alias("rn"),
        )
        .filter(F.col("rn") <= 5)
        .select("user_id", "event_id", "third_type", "type_after_next")
    )


@register(
    "q_win_moving_median",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS DOUBLE) / 100.0 AS rev
      FROM orders GROUP BY o_orderdate
    )
    SELECT day, rev,
           ROUND(median(rev) OVER (
             ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS med7
    FROM daily
    """,
)
def q_win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving EXACT median of daily revenue — the robust trend
    line that a moving mean (q_win_trailing_1h's cousin) can't give
    when a single flash-sale day spikes the window.

    Spark disallows ``median``/``percentile`` over a moving frame
    (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), so the frame median
    is built from primitives it does allow: ``collect_list`` over
    the 7-row frame, ``array_sort``, and explicit midpoint
    interpolation — exactly DuckDB's ``median`` (≡
    ``quantile_cont(0.5)``: middle element when odd, mean of the
    two middles when even) over identical 2-dp daily totals from
    the scaled-long fast path.  The frame is ≤7 doubles per day
    over the (small) daily rollup — the heavy lifting is the
    map-side-combinable daily aggregation, not the window.
    """
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        (
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).cast("double")
            / 100.0
        ).alias("rev")
    )
    w7 = W.orderBy("day").rowsBetween(-6, 0)
    arr = F.array_sort(F.collect_list("rev").over(w7))
    n = F.size(arr)
    mid_hi = F.element_at(arr, (n / 2).cast("int") + 1)
    mid_lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    med = F.when(n % 2 == 1, mid_lo).otherwise(
        (mid_lo + mid_hi) / 2.0
    )
    return daily.select(
        "day", "rev", F.round(med, 6).alias("med7")
    )


# Truncated-EWMA weights alpha=0.3, K=10 terms: w_k = a(1-a)^k rounded
# to 6 dp, plus running normalizers.  Both engines receive these as
# the SAME decimal literals, so the weighted sums are bit-identical.
# Weights as EXACT micro-units (w·1e6 integers).  Round 5 multiplied
# float lags by float weight literals in a fixed order — ulp-identical
# only if neither engine fuses or reassociates, and the sf1.0 sweep
# found days whose true EWMA sits EXACTLY on a 6-dp half-way boundary,
# where the engines' ROUND() disagree by one ulp (…548906 vs …548905).
# The fix removes floats entirely until the last step: integer cents ×
# integer micro-weights give an EXACT numerator (HUGEINT/DECIMAL(38,0)
# accumulation, the q_stats_regression headroom discipline), the
# half-up rounding to 6 dp is done in INTEGER arithmetic
# (r = (num6·1e6 + c/2) div c — both engines produce the same bigint),
# and the only float op left is one division of identical operands,
# which is bit-identical by IEEE.  No ROUND() anywhere.
_EWMA_W6 = [int(round(round(0.3 * 0.7 ** k, 6) * 1e6)) for k in range(10)]
_EWMA_CUM100 = [100 * sum(_EWMA_W6[: i + 1]) for i in range(10)]
_EWMA_TERMS_SQL = " + ".join(
    f"COALESCE(CAST(LAG(cents, {k}) OVER w AS HUGEINT) * {w6}, 0)"
    for k, w6 in enumerate(_EWMA_W6)
)
_EWMA_CUM_SQL = "[" + ", ".join(str(c) for c in _EWMA_CUM100) + "]"


@register(
    "q_win_ewma",
    oracle=f"""
    WITH daily AS (
      SELECT o_orderdate AS day,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY o_orderdate
    ),
    lagged AS (
      SELECT day, cents,
             {_EWMA_TERMS_SQL} AS num6,
             LEAST(ROW_NUMBER() OVER w, 10) AS n_avail
      FROM daily
      WINDOW w AS (ORDER BY day)
    )
    SELECT day, CAST(cents AS DOUBLE) / 100.0 AS rev,
           CAST((num6 * 1000000
                 + list_extract({_EWMA_CUM_SQL},
                                CAST(n_avail AS INT)) // 2)
                // list_extract({_EWMA_CUM_SQL}, CAST(n_avail AS INT))
                AS DOUBLE) / 1000000.0 AS ewma
    FROM lagged
    """,
)
def q_win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated exponentially-weighted moving average (α=0.3, 10
    terms, renormalized over available history) of daily revenue —
    the recency-weighted smoother between the uniform moving mean
    and the robust moving median (q_win_moving_median).

    True EWMA is a recurrence no engine-portable SQL expresses;
    truncating at 10 lags captures 1−0.7¹⁰ ≈ 97% of the mass and
    becomes a FIXED expression tree: ten LAG terms multiplied by
    identical 6-dp weight literals and added in explicit
    left-associative order, so both engines perform the same
    float ops in the same sequence — no list/aggregation-order
    dependence at all.  Ten lags share one window sort over the
    daily rollup; on a cluster the series is date-partitioned and
    only partition-boundary rows need a 9-row tail exchange.
    """
    import functools
    import operator

    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("bigint")
        ).alias("cents")
    )
    w = W.orderBy("day")
    big = "decimal(38,0)"
    terms = [
        F.coalesce(
            (F.lag("cents", k).over(w) * F.lit(w6)).cast(big),
            F.lit(0).cast(big),
        )
        for k, w6 in enumerate(_EWMA_W6)
    ]
    num6 = functools.reduce(operator.add, terms)
    n_avail = F.least(F.row_number().over(w), F.lit(10))
    lagged = daily.select(
        "day", "cents", num6.alias("num6"), n_avail.alias("n_avail")
    )
    cum = F.array(*[F.lit(c) for c in _EWMA_CUM100])
    # integer half-up at 6 dp: whole part via exact decimal division
    # of the remainder-stripped numerator (an exact multiple of c, so
    # the division is exact at any scale), fractional micro-part via
    # bigint ops (rem < c ≤ 1e8, so rem·1e6 fits bigint), no carry
    # special-case needed (a full carry just lands in the next whole)
    c_dec = F.col("c_b").cast("decimal(20,0)")
    step = (
        lagged.withColumn(
            "c_b", F.element_at(cum, F.col("n_avail").cast("int"))
        )
        .withColumn("rem", F.pmod(F.col("num6"), c_dec))
        .withColumn(
            "whole",
            ((F.col("num6") - F.col("rem")) / c_dec).cast("bigint"),
        )
        .withColumn(
            "micro",
            F.expr("(CAST(rem AS BIGINT) * 1000000 + c_b DIV 2) DIV c_b"),
        )
    )
    r = F.col("whole") * F.lit(1000000) + F.col("micro")
    return step.select(
        "day",
        (F.col("cents").cast("double") / 100.0).alias("rev"),
        (r.cast("double") / F.lit(1000000.0)).alias("ewma"),
    )


@register(
    "q_win_drawdown",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY 1
    ),
    dd AS (
      SELECT day, cents,
             MAX(cents) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - cents AS drawdown
      FROM daily
    ),
    m AS (SELECT MAX(drawdown) AS mx FROM dd)
    SELECT MIN(dd.day) AS worst_day,
           ROUND(CAST(m.mx AS DOUBLE) / 100.0, 2) AS max_drawdown,
           ROUND(CAST(MIN(dd.cents) AS DOUBLE) / 100.0, 2)
             AS revenue_on_worst_day
    FROM dd CROSS JOIN m
    WHERE dd.drawdown = m.mx
    GROUP BY m.mx
    """,
)
def q_win_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the daily-revenue series: the deepest gap
    between the best day so far (running max) and the current day —
    the worst-slump-from-peak statistic, sharper than a plain MIN
    because it is RELATIVE to the preceding peak (a low day early
    on is no slump; the same level after a record week is).

    Pure integer cents through the running max and the argmax
    (earliest-day tie-break via MIN over the peak rows — the same
    exact-argmax pattern as KS/CUSUM); money formatting is the only
    float.  One daily rollup shuffle + one ordered window over
    |days| rows.
    """
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("bigint")
        ).alias("cents")
    )
    run = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    dd = daily.select(
        "day",
        "cents",
        (F.max("cents").over(run) - F.col("cents")).alias(
            "drawdown"
        ),
    )
    m = dd.agg(F.max("drawdown").alias("mx"))
    return (
        dd.join(F.broadcast(m))
        .filter(F.col("drawdown") == F.col("mx"))
        .groupBy("mx")
        .agg(
            F.min("day").alias("worst_day"),
            F.min("cents").alias("cents"),
        )
        .select(
            "worst_day",
            F.round(F.col("mx").cast("double") / 100.0, 2).alias(
                "max_drawdown"
            ),
            F.round(
                F.col("cents").cast("double") / 100.0, 2
            ).alias("revenue_on_worst_day"),
        )
    )


@register(
    "q_win_rolling_z",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS c
      FROM orders GROUP BY 1
    ),
    w AS (
      SELECT day, c,
             COUNT(*) OVER win AS n,
             SUM(c) OVER win AS s,
             SUM(CAST(c AS DECIMAL(19, 0))
                 * CAST(c AS DECIMAL(19, 0))) OVER win AS q
      FROM daily
      WINDOW win AS (ORDER BY day
                     ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING)
    )
    SELECT day,
           ROUND(CAST(c AS DOUBLE) / 100.0, 2) AS revenue,
           ROUND((CAST(c AS DOUBLE) - CAST(s AS DOUBLE)
                  / CAST(n AS DOUBLE))
                 / SQRT((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                        / (CAST(n AS DOUBLE)
                           * (CAST(n AS DOUBLE) - 1.0))),
                 6) AS z,
           CAST(ABS((CAST(c AS DOUBLE) - CAST(s AS DOUBLE)
                     / CAST(n AS DOUBLE))
                    / SQRT((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                            - CAST(s AS DOUBLE)
                              * CAST(s AS DOUBLE))
                           / (CAST(n AS DOUBLE)
                              * (CAST(n AS DOUBLE) - 1.0)))) > 2.0
                AS BOOLEAN) AS is_anomaly
    FROM w
    WHERE n >= 7
      AND CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) > 0.0
    """,
)
def q_win_rolling_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each day scored against
    the TRAILING 14-day window (current day excluded — the causal
    frame a live monitor uses, where the global z of
    q_events_anomaly would leak the anomaly into its own
    baseline).  |z| > 2 flags the day.

    Window moments (n, Σ, Σ²) are exact via the 1-PRECEDING frame
    — Σ² accumulates as DECIMAL(38,0) because squared daily cents
    overflow int64 in Spark while DuckDB silently promotes to
    HUGEINT (an asymmetry ANSI mode turns into a hard error); the z expression is fixed double arithmetic
    mirrored token-for-token, with integer guards (n ≥ 7, positive
    variance numerator) keeping ANSI division/sqrt total.  One
    daily rollup + one ordered window.
    """
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("bigint")
        ).alias("c")
    )
    win = W.orderBy("day").rowsBetween(-14, -1)
    w = daily.select(
        "day",
        "c",
        F.count("*").over(win).alias("n"),
        F.sum("c").over(win).alias("s"),
        F.sum(
            F.col("c").cast("decimal(19,0)")
            * F.col("c").cast("decimal(19,0)")
        ).over(win).alias("q"),
    )
    nd = F.col("n").cast("double")
    cd = F.col("c").cast("double")
    sd = F.col("s").cast("double")
    qd = F.col("q").cast("double")
    z = (cd - sd / nd) / F.sqrt(
        (nd * qd - sd * sd) / (nd * (nd - 1.0))
    )
    return (
        w.filter(
            (F.col("n") >= 7)
            & (
                F.col("n").cast("double") * F.col("q").cast("double")
                - F.col("s").cast("double") * F.col("s").cast("double")
                > 0.0
            )
        )
        .select(
            "day",
            F.round(cd / 100.0, 2).alias("revenue"),
            F.round(z, 6).alias("z"),
            (F.abs(z) > 2.0).alias("is_anomaly"),
        )
    )


# -------------------------------------------------------------- Holt

def _holt_weights(n: int = 8, alpha: float = 0.5, beta: float = 0.3):
    """One-step-ahead Holt forecast as an explicit linear filter.

    Holt's level/trend recursion (l_t = αy_t + (1−α)(l_{t−1}+b_{t−1});
    b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1}) is linear in the inputs, so
    over a fixed n-day window the forecast l+b is Σ w_j·y_j with
    constant weights — computed once here by running the recursion on
    unit impulses (deterministic driver-side floats, inlined as
    literals into BOTH engines' expressions).
    """
    ws = []
    for j in range(n):
        y = [0.0] * n
        y[j] = 1.0
        lvl = y[0]
        b = y[1] - y[0]
        for i in range(1, n):
            nl = alpha * y[i] + (1 - alpha) * (lvl + b)
            b = beta * (nl - lvl) + (1 - beta) * b
            lvl = nl
        ws.append(lvl + b)
    return ws


_HOLT_N = 8
_HOLT_W = _holt_weights(_HOLT_N)

# lag 1 = yesterday = newest observation in the window = weight index
# n-1; lag 8 = oldest = weight index 0.
_HOLT_SQL = " + ".join(
    f"({_HOLT_W[_HOLT_N - k]!r}) * lag{k}" for k in range(1, _HOLT_N + 1)
)


@register(
    "q_win_holt",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS c
      FROM orders GROUP BY 1
    ),
    lagged AS (
      SELECT day, c,
             {", ".join(f"LAG(c, {k}) OVER (ORDER BY day) AS lag{k}"
                        for k in range(1, _HOLT_N + 1))}
      FROM daily
    )
    SELECT day,
           ROUND(c / 100.0, 2) AS actual,
           ROUND(({_HOLT_SQL}) / 100.0, 2) AS holt_forecast,
           ROUND(ABS(c - ({_HOLT_SQL})) / 100.0, 2) AS abs_err
    FROM lagged WHERE lag{_HOLT_N} IS NOT NULL
    """,
)
def q_win_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential (level+trend) 1-step-ahead forecast of
    daily order revenue (α=0.5, β=0.3, 8-observed-day window) with
    per-day absolute error — the trend-aware upgrade of q_win_ewma's
    level-only smoother, done as a closed-form linear filter: the
    coupled recursion is unrolled driver-side into 8 constant weights
    (see _holt_weights), so the per-row work is one fused dot product
    over LAG columns.

    Determinism: daily revenue is exact cents (BIGINT); the weights
    are identical literals in both engines; the dot product is one
    fixed left-to-right expression — bit-equal IEEE evaluation, then
    rounded.  Scale: the daily series is one narrow partial-agg away
    from the fact table; the 8 lags are a single bounded window over
    it.  The same filter trick turns ANY fixed-horizon linear
    recursion (damped trend, double smoothing, AR(p)) into a window
    expression — no UDF, no iteration at query time.
    """
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "c"
        )
    )
    w = W.orderBy("day")
    lagged = daily.select(
        "day",
        "c",
        *[
            F.lag("c", k).over(w).alias(f"lag{k}")
            for k in range(1, _HOLT_N + 1)
        ],
    )
    forecast = None
    for k in range(1, _HOLT_N + 1):
        term = F.lit(_HOLT_W[_HOLT_N - k]) * F.col(f"lag{k}")
        forecast = term if forecast is None else forecast + term
    return lagged.filter(F.col(f"lag{_HOLT_N}").isNotNull()).select(
        "day",
        F.round(F.col("c") / 100.0, 2).alias("actual"),
        F.round(forecast / 100.0, 2).alias("holt_forecast"),
        F.round(F.abs(F.col("c") - forecast) / 100.0, 2).alias("abs_err"),
    )


@register(
    "q_win_sma_cross",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM orders GROUP BY 1
    ),
    sma AS (
      SELECT d, rev_c,
             CAST(SUM(rev_c) OVER (ORDER BY d
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS s7,
             CAST(SUM(rev_c) OVER (ORDER BY d
               ROWS BETWEEN 27 PRECEDING AND CURRENT ROW) AS BIGINT) AS s28,
             CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS rn
      FROM daily
    ),
    flagged AS (
      SELECT d, s7, s28,
             CASE WHEN 4 * s7 > s28 THEN 1 ELSE 0 END AS above,
             LAG(CASE WHEN 4 * s7 > s28 THEN 1 ELSE 0 END)
               OVER (ORDER BY d) AS prev_above
      FROM sma WHERE rn >= 28
    )
    SELECT d,
           CASE WHEN above = 1 THEN 'golden' ELSE 'death' END
             AS cross_type,
           s7 AS sum7_cents, s28 AS sum28_cents
    FROM flagged
    WHERE prev_above IS NOT NULL AND above <> prev_above
    """,
)
def q_win_sma_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-cross / death-cross detector on daily revenue — the
    7-observation SMA crossing the 28-observation SMA, the classic
    trend-reversal signal a metrics-monitoring pipeline raises.

    The float-free trick: SMA7 > SMA28 ⟺ 4·S7 > S28 in exact integer
    cents (7 and 28 share the factor 4·7), so the crossing flags can
    never disagree across engines; the trailing sums are reported as
    exact cents (the reader divides by 7/28 days for the averages —
    a float display division would be the only cross-engine rounding
    hazard in the whole query).
    Both windows and the lag run over the AGGREGATED daily series
    (bounded by calendar, not row count) in a single partition — the
    correct physical shape, because the series after the first
    map-side-combinable groupBy is tiny at any raw scale.
    """
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_c")
    )
    wd = W.orderBy("d")
    sma = daily.select(
        "d",
        F.sum("rev_c").over(wd.rowsBetween(-6, 0)).cast("bigint").alias("s7"),
        F.sum("rev_c")
        .over(wd.rowsBetween(-27, 0))
        .cast("bigint")
        .alias("s28"),
        F.row_number().over(wd).cast("bigint").alias("rn"),
    ).filter(F.col("rn") >= 28)
    above = F.when(4 * F.col("s7") > F.col("s28"), 1).otherwise(0)
    flagged = sma.select(
        "d",
        "s7",
        "s28",
        above.alias("above"),
        F.lag(above).over(W.orderBy("d")).alias("prev_above"),
    )
    return flagged.filter(
        F.col("prev_above").isNotNull()
        & (F.col("above") != F.col("prev_above"))
    ).select(
        "d",
        F.when(F.col("above") == 1, "golden")
        .otherwise("death")
        .alias("cross_type"),
        F.col("s7").alias("sum7_cents"),
        F.col("s28").alias("sum28_cents"),
    )


@register(
    "q_win_rsi",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_c
      FROM orders GROUP BY 1
    ),
    delta AS (
      SELECT d,
             rev_c - LAG(rev_c) OVER (ORDER BY d) AS ch,
             CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS rn
      FROM daily
    ),
    gl AS (
      SELECT d, rn,
             CAST(SUM(GREATEST(ch, 0)) OVER (ORDER BY d
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS gain14,
             CAST(SUM(GREATEST(-ch, 0)) OVER (ORDER BY d
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS loss14
      FROM delta WHERE ch IS NOT NULL
    )
    SELECT d, gain14, loss14,
           ROUND(100.0 * gain14 / (gain14 + loss14), 4) AS rsi,
           CASE WHEN 100.0 * gain14 / (gain14 + loss14) >= 60
                THEN 'overbought' ELSE 'oversold' END AS signal
    FROM gl
    WHERE rn >= 15 AND gain14 + loss14 > 0
      AND (100.0 * gain14 / (gain14 + loss14) >= 60
           OR 100.0 * gain14 / (gain14 + loss14) <= 40)
    """,
)
def q_win_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cutler's RSI (simple-average relative strength index) on daily
    revenue, reporting overbought (≥60) / oversold (≤40) days (thresholds
    tightened from the classic 70/30 so the alarm fires on the
    fixture's mean-reverting series) — the
    mean-reversion alarm a metrics pipeline raises on KPI series.
    Cutler's SMA variant is chosen over Wilder's EMA deliberately:
    its gains/losses are exact trailing integer sums in cents, so
    RSI = 100·G/(G+L) is one float division per row — cross-engine
    deterministic with no recursive smoothing state.

    Same physical shape as q_win_sma_cross: everything windows over
    the aggregated daily series (bounded by calendar), single
    partition by design after a map-side-combined groupBy.
    """
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_c")
    )
    wd = W.orderBy("d")
    delta = daily.select(
        "d",
        (F.col("rev_c") - F.lag("rev_c").over(wd)).alias("ch"),
        F.row_number().over(wd).cast("bigint").alias("rn"),
    ).filter(F.col("ch").isNotNull())
    w14 = W.orderBy("d").rowsBetween(-13, 0)
    gl = delta.select(
        "d",
        "rn",
        F.sum(F.greatest(F.col("ch"), F.lit(0)))
        .over(w14)
        .cast("bigint")
        .alias("gain14"),
        F.sum(F.greatest(-F.col("ch"), F.lit(0)))
        .over(w14)
        .cast("bigint")
        .alias("loss14"),
    )
    rsi = 100.0 * F.col("gain14") / (F.col("gain14") + F.col("loss14"))
    return gl.filter(
        (F.col("rn") >= 15)
        & (F.col("gain14") + F.col("loss14") > 0)
        & ((rsi >= 60) | (rsi <= 40))
    ).select(
        "d",
        "gain14",
        "loss14",
        F.round(rsi, 4).alias("rsi"),
        F.when(rsi >= 60, "overbought").otherwise("oversold").alias(
            "signal"
        ),
    )


@register(
    "q_win_control_chart",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    mr AS (
      SELECT d, n,
             ABS(n - LAG(n) OVER (ORDER BY d)) AS mrange
      FROM daily
    ),
    limits AS (
      SELECT CAST(SUM(n) AS BIGINT) AS sn,
             CAST(COUNT(*) AS BIGINT) AS nd,
             CAST(SUM(mrange) AS BIGINT) AS smr,
             CAST(COUNT(mrange) AS BIGINT) AS nmr
      FROM mr
    )
    SELECT d, n AS n_events,
           ROUND(CAST(sn AS DOUBLE) / nd, 4) AS center,
           ROUND(CAST(sn AS DOUBLE) / nd
                 + 2.66 * CAST(smr AS DOUBLE) / nmr, 4) AS ucl,
           ROUND(CAST(sn AS DOUBLE) / nd
                 - 2.66 * CAST(smr AS DOUBLE) / nmr, 4) AS lcl,
           CASE WHEN n > CAST(sn AS DOUBLE) / nd
                        + 2.66 * CAST(smr AS DOUBLE) / nmr
                THEN 'above_ucl'
                WHEN n < CAST(sn AS DOUBLE) / nd
                        - 2.66 * CAST(smr AS DOUBLE) / nmr
                THEN 'below_lcl'
                ELSE 'in_control' END AS status
    FROM mr CROSS JOIN limits
    """,
)
def q_win_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XmR (individuals & moving-range) control chart on daily event
    counts: natural process limits x̄ ± 2.66·m̄R, reporting the
    out-of-control days — the SPC discipline behind "is this spike
    signal or noise", complementing q_win_rolling_z (rolling local z)
    with FIXED whole-series limits derived from short-term variation.

    x̄ and m̄R come from exact integer sums over the tiny daily series
    (the moving range is |Δ| of BIGINTs); limits are one fixed float
    expression broadcast back onto the series.  The raw scan
    collapses map-side; both windows run on the bounded daily series.
    """
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.count("*").cast("bigint").alias("n"))
    mr = daily.select(
        "d",
        "n",
        F.abs(F.col("n") - F.lag("n").over(W.orderBy("d"))).alias(
            "mrange"
        ),
    )
    limits = mr.agg(
        F.sum("n").cast("bigint").alias("sn"),
        F.count("*").cast("bigint").alias("nd"),
        F.sum("mrange").cast("bigint").alias("smr"),
        F.count("mrange").cast("bigint").alias("nmr"),
    )
    center = F.col("sn").cast("double") / F.col("nd")
    mrbar = F.col("smr").cast("double") / F.col("nmr")
    ucl = center + 2.66 * mrbar
    lcl = center - 2.66 * mrbar
    return mr.crossJoin(F.broadcast(limits)).select(
        "d",
        F.col("n").alias("n_events"),
        F.round(center, 4).alias("center"),
        F.round(ucl, 4).alias("ucl"),
        F.round(lcl, 4).alias("lcl"),
        F.when(F.col("n") > ucl, "above_ucl")
        .when(F.col("n") < lcl, "below_lcl")
        .otherwise("in_control")
        .alias("status"),
    )


@register(
    "q_win_donchian",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ),
    chan AS (
      SELECT d, rev,
             CAST(MAX(rev) OVER (ORDER BY d
               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS BIGINT)
               AS hi20,
             CAST(MIN(rev) OVER (ORDER BY d
               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS BIGINT)
               AS lo20,
             CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS rn
      FROM daily
    )
    SELECT d, rev AS rev_cents, hi20 AS hi20_cents, lo20 AS lo20_cents,
           CASE WHEN rev > hi20 THEN 'breakout_high'
                ELSE 'breakout_low' END AS signal
    FROM chan
    WHERE rn > 20 AND (rev > hi20 OR rev < lo20)
    """,
)
def q_win_donchian(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Donchian channel breakout detector on daily revenue: days that
    close above the prior-20-day high or below the prior-20-day low —
    the rolling-extreme complement to q_win_control_chart (fixed
    limits) and q_win_rolling_z (local z): an integer-only rule with
    no variance estimate at all, so it's immune to heavy tails.

    The channel frame ends at 1 PRECEDING (the current day must beat
    the PRIOR window, else every new high "breaks out" of itself).
    Exact integer cents everywhere; the window runs on the bounded
    daily series after a map-side-combined rollup.
    """
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev")
    )
    wd = W.orderBy("d")
    prior = wd.rowsBetween(-20, -1)
    chan = daily.select(
        "d",
        "rev",
        F.max("rev").over(prior).cast("bigint").alias("hi20"),
        F.min("rev").over(prior).cast("bigint").alias("lo20"),
        F.row_number().over(wd).cast("bigint").alias("rn"),
    )
    return chan.filter(
        (F.col("rn") > 20)
        & ((F.col("rev") > F.col("hi20")) | (F.col("rev") < F.col("lo20")))
    ).select(
        "d",
        F.col("rev").alias("rev_cents"),
        F.col("hi20").alias("hi20_cents"),
        F.col("lo20").alias("lo20_cents"),
        F.when(F.col("rev") > F.col("hi20"), "breakout_high")
        .otherwise("breakout_low")
        .alias("signal"),
    )


@register(
    "q_win_fill_forward",
    oracle="""
    WITH masked AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'error' THEN NULL
                  ELSE value END AS v_obs
      FROM events
    )
    SELECT event_id, user_id, v_obs,
           LAST_VALUE(v_obs IGNORE NULLS) OVER w AS v_locf,
           CAST(COUNT(v_obs) OVER w AS BIGINT) AS n_obs
    FROM masked
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_win_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward (LOCF) imputation: the sensor
    reading is treated as missing on 'error' events, and every row
    carries the most recent non-null reading on the same user's
    timeline — `last(v, ignorenulls=True)` over a running frame, the
    IGNORE NULLS window surface none of the other §2.5 queries touch
    (q_events_interpolate fills by neighbor-join, q_label_forward by
    range frame; this is the O(n)-per-user frame-native form).

    Rows before a user's first observation stay NULL (both engines);
    `n_obs` counts non-null observations so far, so (v_locf, n_obs)
    jointly pin WHICH observation was carried, not just its value.
    One shuffle on user_id; the running frame is a single pass per
    partition — the plan a 100 TB timeline imputation needs.
    """
    ev = table(spark, sf_dir, "events")
    masked = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "error", None)
        .otherwise(F.col("value"))
        .alias("v_obs"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return masked.select(
        "event_id",
        "user_id",
        "v_obs",
        F.last("v_obs", ignorenulls=True).over(w).alias("v_locf"),
        F.count("v_obs").over(w).cast("bigint").alias("n_obs"),
    )
