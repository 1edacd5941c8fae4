"""User-behavior analytics operators over the events stream.

The reference's domain is predicting user behavior from event-shaped
data (SURVEY.md §1.1: per-(date, query, page) search metrics feeding
churn/shopping-stage/search-intent models).  These are the standard
behavioral queries such a pipeline runs upstream of any model: ordered
funnels, cohort retention, and gap-filled time series.  All three are
pure DataFrame compositions — one shuffle on ``user_id`` (funnel,
retention) or the window bucket (gap-fill), no Python in the loop —
and all are fully DuckDB-oracle-checked.

Scale notes per operator are in the docstrings; the common property is
that state is bounded per user / per bucket, so the plans survive a
100 TB events table as long as ``user_id`` is not pathologically
skewed (AQE skew splitting covers the join sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dsum, lsum, units
from ..io import spread, table
from ..registry import register


@register(
    "q_events_funnel",
    oracle="""
    WITH u AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS s_ts
      FROM events GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS c_ts
      FROM events e JOIN u ON e.user_id = u.user_id
      WHERE e.event_type = 'click' AND e.ts >= u.s_ts
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
      GROUP BY e.user_id
    )
    SELECT CASE WHEN p.user_id IS NOT NULL THEN 3
                WHEN c.user_id IS NOT NULL THEN 2
                WHEN u.s_ts    IS NOT NULL THEN 1
                ELSE 0 END AS stage,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM u
    LEFT JOIN c ON u.user_id = c.user_id
    LEFT JOIN p ON u.user_id = p.user_id
    GROUP BY 1
    """,
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup → click → purchase: how many users reach
    each stage, with stage N+1 required to happen at-or-after the
    user's first stage-N event.

    Plan: three aggregations on ``user_id`` + two joins, all sharing
    the same hash partitioning (one logical shuffle re-used); the
    per-user state is three timestamps.  The per-stage candidate sets
    shrink monotonically, so each successive join is smaller — at
    scale the later stages are broadcast-able and AQE does exactly
    that at runtime.
    """
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    u = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "s_ts"
        )
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(u.filter(F.col("s_ts").isNotNull()), "user_id")
        .filter(F.col("ts") >= F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    stage = (
        F.when(F.col("p_ts").isNotNull(), 3)
        .when(F.col("c_ts").isNotNull(), 2)
        .when(F.col("s_ts").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        u.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .groupBy(stage.alias("stage"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "q_events_retention",
    oracle="""
    WITH first AS (
      SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day
      FROM events GROUP BY user_id
    )
    SELECT f.cohort_day,
           date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
    FROM events e JOIN first f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity day,
    distinct-user counts per (cohort day, days-since-cohort offset).

    Plan: first-activity agg on ``user_id``, joined back to the fact
    (both sides partitioned on user_id — AQE elides one exchange),
    then an exact distinct on (cohort, offset, user) which hash-spreads
    across all three columns before the final count: no hot reducer
    even when one cohort day dominates.
    """
    ev = table(spark, sf_dir, "events").select("user_id", "ts")
    first = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("cohort_day")
    )
    return (
        ev.join(first, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@register(
    "q_events_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo,
             date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ), spine AS (
      SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
      FROM bounds
    ), types AS (
      SELECT DISTINCT event_type FROM events
    ), agg AS (
      SELECT date_trunc('hour', ts) AS bucket, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT s.bucket, t.event_type,
           CAST(COALESCE(a.n, 0) AS BIGINT) AS n_events
    FROM spine s
    CROSS JOIN types t
    LEFT JOIN agg a ON a.bucket = s.bucket AND a.event_type = t.event_type
    """,
)
def q_events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly time series: a dense hour × event_type spine
    with zero-filled counts — the shape every downstream forecasting /
    anomaly model wants (missing buckets are information, not absence).

    Plan: the spine is generated from a 1-row min/max aggregate via
    ``sequence`` + ``explode`` (driver never materializes it), cross-
    joined with the tiny distinct-types side, then a broadcast-able
    left join against the real hourly aggregate.  Spine size is
    hours×types — independent of event count, so at 100 TB the spine
    is still a few-MB broadcast side.
    """
    ev = table(spark, sf_dir, "events").select("ts", "event_type")
    agg = ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket")
    )
    types = ev.select("event_type").distinct()
    return (
        spine.crossJoin(types)
        .join(agg, ["bucket", "event_type"], "left")
        .select(
            "bucket",
            "event_type",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
        )
    )


@register(
    "q_session_window_batch",
    oracle="""
    WITH flags AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL THEN 1
                  WHEN date_diff('microsecond', lag(ts) OVER w, ts)
                       >= 1800000000 THEN 1
                  ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flags
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS session_value
    FROM sessions
    GROUP BY user_id, sid
    """,
)
def q_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``F.session_window`` in BATCH mode — the same operator
    the streaming twin (q_stream_session_window) runs, oracle-checked
    here against the independent lag-gap algorithm of q_sessionize.

    Semantics pinned by the oracle: an event extends the session iff
    it lands strictly inside [prev_ts, prev_ts + 30 min) — a gap of
    exactly 30:00.000000 starts a NEW session (hence ``>=`` in the
    oracle's flag, where q_sessionize's convention is ``>``); the
    emitted session end is last_ts + gap, Spark's definition.

    Two independent implementations (built-in merging-window operator
    vs window-function algorithm) agreeing cell-for-cell is the
    strongest correctness statement the engine makes about
    sessionization.
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "session_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


@register(
    "q_win_trailing_1h",
    oracle="""
    SELECT user_id, event_id, ts,
           (SUM(CAST(round(value * 100) AS BIGINT)) OVER (
              PARTITION BY user_id ORDER BY epoch_us(ts)
              RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
            / 100.0) AS trailing_1h_value,
           CAST(COUNT(*) OVER (
              PARTITION BY user_id ORDER BY epoch_us(ts)
              RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS trailing_1h_events
    FROM events
    WHERE user_id < 20
    """,
)
def q_win_trailing_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based trailing window: per event, the value/count of the
    SAME user's events in the preceding hour (inclusive) — the
    rolling-feature shape (trailing spend, rolling error rate) a
    behavior model consumes per event.

    Spark has no interval RANGE frame on timestamps, so the frame
    orders by exact microsecond longs (`unix_micros`) with a
    3.6e9-µs preceding bound — semantically identical to an interval
    frame, and the oracle mirrors it with `epoch_us`.  One shuffle on
    user_id; per-user state is the hour's peers (bounded by event
    rate), the property that holds at 100 TB.
    """
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    vu = F.round(F.col("value") * 100).cast("bigint")
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        (F.sum(vu).over(w) / F.lit(100.0)).alias("trailing_1h_value"),
        F.count(F.lit(1)).over(w).alias("trailing_1h_events"),
    )


@register(
    "q_events_anomaly",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ),
    trail AS (
      SELECT event_type, hour, n_events,
             SUM(n_events) OVER w AS s,
             SUM(n_events * n_events) OVER w AS ss,
             CAST(COUNT(*) OVER w AS BIGINT) AS m
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hour
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, hour, n_events,
           round((n_events - s / m)
                 / sqrt((ss - (s * s) / m) / (m - 1)), 6) AS zscore
    FROM trail
    WHERE m >= 12 AND (ss - (s * s) / m) / (m - 1) > 0
    """,
)
def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection on the event stream: each
    (event_type, hour) bucket scored against the trailing 24 hours'
    mean/stddev — the ops-monitoring query a behavioral pipeline runs
    over its own ingest (error spikes, traffic cliffs).

    Float discipline: the window carries only exact integer moments
    (Σx, Σx², m over bigint counts); mean and variance come out of
    one shared arithmetic expression — `(x−s/m)/√((ss−s²/m)/(m−1))` —
    written identically in both engines, then rounded to 6 dp, so
    the hash matches despite being derived statistics.  Scale: the
    hourly pre-aggregation collapses the raw stream map-side; the
    window state is 25 rows per event_type — O(1) memory however
    large the stream.
    """
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-24, -1)
    )
    x = F.col("n_events")
    trailing = hourly.select(
        "event_type",
        "hour",
        "n_events",
        F.sum(x).over(w).alias("s"),
        F.sum(x * x).over(w).alias("ss"),
        F.count(F.lit(1)).over(w).alias("m"),
    )
    s, ss, m = F.col("s"), F.col("ss"), F.col("m")
    var = (ss - (s * s) / m) / (m - 1)
    return (
        trailing.filter((m >= 12) & (var > 0))
        .select(
            "event_type",
            "hour",
            "n_events",
            F.round((x - s / m) / F.sqrt(var), 6).alias("zscore"),
        )
    )


@register(
    "q_events_markov",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    trans AS (
      SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT prev_type, event_type, n,
           round(n / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE),
                 6) AS p
    FROM trans
    """,
)
def q_events_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current) — the behavior-prediction
    primitive behind the reference family's next-action models
    (SURVEY.md §1.1: churn / shopping-stage / search-intent are all
    next-behavior classifiers over event streams).

    One shuffle on user_id for the lag (sequence order is per-user),
    then the transition counts collapse map-side to at most
    |types|² = 25 rows — the matrix normalization is a window over
    that tiny frame.  Probabilities are integer-count ratios rounded
    to 6 dp, so both engines hash identically.
    """
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    seq_w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("prev_type", F.lag("event_type").over(seq_w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    norm_w = W.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "event_type",
        "n",
        F.round(
            F.col("n") / F.sum("n").over(norm_w).cast("double"), 6
        ).alias("p"),
    )


@register(
    "q_customer_rfm",
    oracle="""
    WITH base AS (
      SELECT o_custkey,
             date_diff('day', MAX(o_orderdate),
                       TIMESTAMP '2001-08-01') AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             (SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0)
               AS monetary
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, recency_days, frequency, monetary,
           CAST(ntile(5) OVER (ORDER BY recency_days, o_custkey)
                AS BIGINT) AS r_score,
           CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey)
                AS BIGINT) AS f_score,
           CAST(ntile(5) OVER (ORDER BY monetary DESC, o_custkey)
                AS BIGINT) AS m_score
    FROM base
    """,
)
def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer scoring — the
    canonical churn-model feature table (the reference org's
    publishers-churning-users model consumes exactly this shape).

    Per-customer base aggregates are one hash agg; the three ntile(5)
    scores are global windows over the 1-per-customer frame — fine at
    test scale, and the documented scale path for a global ntile is a
    2-pass quantile-bucket assignment (percentile_approx thresholds +
    a broadcast range lookup), same output contract.  Deterministic:
    every ORDER BY carries the custkey tie-break; monetary uses the
    exact scaled-long sum.
    """
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    base = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("2001-08-01").cast("date"),
            F.max("o_orderdate").cast("date"),
        ).cast("bigint").alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        lsum(units("o_totalprice", 100), 100, "monetary"),
    )
    return base.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(5)
        .over(W.orderBy("recency_days", "o_custkey"))
        .cast("bigint")
        .alias("r_score"),
        F.ntile(5)
        .over(W.orderBy(F.col("frequency").desc(), "o_custkey"))
        .cast("bigint")
        .alias("f_score"),
        F.ntile(5)
        .over(W.orderBy(F.col("monetary").desc(), "o_custkey"))
        .cast("bigint")
        .alias("m_score"),
    )


@register(
    "q_events_user_features",
    oracle="""
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_click,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_view,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_signup,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_error,
           (SUM(CAST(round(value * 100) AS BIGINT)) / 100.0)
             AS total_value,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days,
           date_diff('day', CAST(MAX(ts) AS DATE), DATE '2024-01-31')
             AS recency_days
    FROM events
    GROUP BY user_id
    """,
)
def q_events_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral feature table: event-type counts (manual
    pivot), exact total value, active-day count, and recency — the
    preprocessing output of the reference pipeline (SURVEY.md §3.1
    stage 2: per-entity feature rows written back to the store, here
    consumed directly by q_ml_user_model).

    One hash aggregate over the stream; every feature is algebraic or
    distinct-on-a-bounded-domain (≤31 dates per month per user), so
    partials collapse map-side and the shuffle carries one row per
    user — the 100 TB feature-engineering shape.
    """
    ev = table(spark, sf_dir, "events")

    def n_of(t: str) -> F.Column:
        return F.sum(
            F.when(F.col("event_type") == t, 1).otherwise(0)
        ).alias(f"n_{t}")

    return ev.groupBy("user_id").agg(
        n_of("click"),
        n_of("view"),
        n_of("purchase"),
        n_of("signup"),
        n_of("error"),
        (F.sum(F.round(F.col("value") * 100).cast("bigint")) / F.lit(100.0))
        .alias("total_value"),
        F.countDistinct(F.col("ts").cast("date")).alias("active_days"),
        F.datediff(
            F.lit("2024-01-31").cast("date"), F.max("ts").cast("date")
        ).cast("bigint").alias("recency_days"),
    )


@register(
    "q_trend_mom",
    oracle="""
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             (SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0)
               AS revenue,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT month, revenue, n_orders,
           round((revenue - lag(revenue) OVER (ORDER BY month))
                 / lag(revenue) OVER (ORDER BY month), 6) AS mom_change
    FROM monthly
    """,
)
def q_trend_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue trend: monthly rollup + lag-based
    growth rate — the KPI time series every behavioral dashboard
    starts from.

    The monthly rollup shrinks the fact table to ~80 rows before the
    (unavoidably single-partition, but tiny) global-order lag window;
    revenue uses the exact scaled-long sum, and the growth ratio is
    one division of two exact-derived doubles rounded at 6 dp.
    """
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(
        lsum(units("o_totalprice", 100), 100, "revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = W.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "revenue",
        "n_orders",
        F.round((F.col("revenue") - prev) / prev, 6).alias("mom_change"),
    )


@register(
    "q_stats_chi2",
    oracle="""
    WITH obs AS (
      SELECT event_type,
             (date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7)
               AS weekday,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    margins AS (
      SELECT o.*,
             SUM(o.o) OVER (PARTITION BY event_type) AS row_total,
             SUM(o.o) OVER (PARTITION BY weekday) AS col_total,
             SUM(o.o) OVER () AS n
      FROM obs o
    )
    SELECT round(SUM(
             (o - CAST(row_total * col_total AS DOUBLE) / n)
             * (o - CAST(row_total * col_total AS DOUBLE) / n)
             / (CAST(row_total * col_total AS DOUBLE) / n)), 6) AS chi2,
           CAST((COUNT(DISTINCT event_type) - 1)
                * (COUNT(DISTINCT weekday) - 1) AS BIGINT) AS dof
    FROM margins
    """,
)
def q_stats_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between event type and
    weekday — the data-drift / feature-relevance check a behavioral
    pipeline runs before trusting a categorical feature.

    Weekday comes from portable arithmetic (days since a known Monday,
    mod 7) rather than engine-specific DOW functions.  The χ²
    statistic derives entirely from integer cell counts and margins —
    one shared closed-form expression in both engines, rounded at
    6 dp.  The contingency table is |types|×7 = 35 cells after
    map-side partial aggregation: the windows and the final sum run
    on a frame that never grows with the data.
    """
    ev = table(spark, sf_dir, "events")
    weekday = F.pmod(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")),
        F.lit(7),
    )
    obs = ev.groupBy(
        "event_type", weekday.alias("weekday")
    ).agg(F.count(F.lit(1)).alias("o"))
    from pyspark.sql import Window as W

    m = obs.select(
        "event_type",
        "weekday",
        "o",
        F.sum("o").over(W.partitionBy("event_type")).alias("row_total"),
        F.sum("o").over(W.partitionBy("weekday")).alias("col_total"),
        F.sum("o").over(W.partitionBy()).alias("n"),
    )
    e = (F.col("row_total") * F.col("col_total")).cast("double") / F.col("n")
    return m.agg(
        F.round(
            F.sum((F.col("o") - e) * (F.col("o") - e) / e), 6
        ).alias("chi2"),
        (
            (F.countDistinct("event_type") - 1)
            * (F.countDistinct("weekday") - 1)
        ).cast("bigint").alias("dof"),
    )


@register(
    "q_events_dau_wau",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM pairs),
    dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau
            FROM pairs GROUP BY day),
    wau AS (
      SELECT d.day, CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS wau
      FROM days d JOIN pairs p ON p.day BETWEEN d.day - 6 AND d.day
      GROUP BY d.day
    )
    SELECT dau.day, dau.dau, wau.wau,
           round(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
    FROM dau JOIN wau ON wau.day = dau.day
    """,
)
def q_events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU engagement with the stickiness ratio — the
    north-star metric family of every behavioral product pipeline
    (the reference's churn model consumes exactly this decay signal).

    Distinct users over a SLIDING week cannot merge like a sum, so
    the trailing-distinct is computed by fanning each (day, user)
    activity pair out to the ≤7 window-days it supports (explode of a
    0..6 offset sequence), then one exact distinct per window day —
    shuffle volume 7×|active-pairs|, fully parallel, no range join
    and no per-day rescan.  The oracle computes the same windows via
    a DuckDB range join; a semi join against observed days drops the
    phantom window positions past the last activity.
    """
    ev = table(spark, sf_dir, "events")
    pairs = ev.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    days = pairs.select("day").distinct()
    dau = pairs.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    fanned = (
        pairs.withColumn("off", F.explode(F.sequence(F.lit(0), F.lit(6))))
        .select(F.date_add("day", F.col("off")).alias("day"), "user_id")
        .join(days, "day", "left_semi")
    )
    wau = fanned.groupBy("day").agg(
        F.countDistinct("user_id").alias("wau")
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(
                F.col("dau").cast("double") / F.col("wau"), 6
            ).alias("stickiness"),
        )
    )


@register(
    "q_orders_pareto",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS units
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT o_custkey, units,
             SUM(units) OVER (ORDER BY units DESC, o_custkey
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum_units,
             SUM(units) OVER () AS total_units
      FROM rev
    )
    SELECT o_custkey,
           (units / 100.0) AS revenue,
           round(CAST(cum_units AS DOUBLE) / total_units, 6) AS cum_share
    FROM ranked
    WHERE cum_units * 10 <= total_units * 8
    """,
)
def q_orders_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto analysis: the top customers who jointly account for the
    first 80% of revenue — the concentration query behind whale-
    detection and account-prioritization.

    The 80% cut is decided in EXACT integer arithmetic
    (``cum_units·10 ≤ total_units·8`` on scaled-long cents), so the
    selected set is bit-identical across engines — the rounded
    double share is display-only.  The ranking window is global but
    runs on the per-customer aggregate (1 row per customer), not the
    fact table; at extreme customer counts the same cut works on a
    quantile-bucketed pre-pass (q_feature_binning's machinery).
    """
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(units("o_totalprice", 100)).alias("units")
    )
    w_cum = (
        W.orderBy(F.col("units").desc(), "o_custkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    ranked = rev.select(
        "o_custkey",
        "units",
        F.sum("units").over(w_cum).alias("cum_units"),
        F.sum("units").over(W.partitionBy()).alias("total_units"),
    )
    return ranked.filter(
        F.col("cum_units") * 10 <= F.col("total_units") * 8
    ).select(
        "o_custkey",
        (F.col("units") / F.lit(100.0)).alias("revenue"),
        F.round(
            F.col("cum_units").cast("double") / F.col("total_units"), 6
        ).alias("cum_share"),
    )


@register(
    "q_orders_basket",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n_orders
          FROM op),
    ps AS (SELECT l_partkey, COUNT(*) AS part_cnt
           FROM op GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2,
             CAST(COUNT(*) AS BIGINT) AS pair_cnt
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT p1, p2, pair_cnt,
           ROUND(pair_cnt * n.n_orders / (pa.part_cnt * pb.part_cnt), 6)
             AS lift
    FROM pairs
    JOIN ps pa ON pa.l_partkey = pairs.p1
    JOIN ps pb ON pb.l_partkey = pairs.p2
    CROSS JOIN n
    ORDER BY pair_cnt DESC, p1, p2 LIMIT 20
    """,
)
def q_orders_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence with lift — the association-rule
    primitive behind "users who bought X also bought Y" and feature
    crosses for propensity models.

    Plan shape: dedup (order, part), self-join on ``l_orderkey`` with
    ``p1 < p2`` to emit each unordered pair once, count pairs, then
    join per-part support and a broadcast 1-row total.  The self-join
    is bounded per order (TPC-H orders hold ≤7 distinct parts → ≤21
    pairs), so the shuffle is ~3× the fact table regardless of total
    scale — no quadratic blowup.  Top-20 by (count, p1, p2) runs as
    TakeOrdered, never a global sort.  lift = pair_cnt·N/(cnt₁·cnt₂)
    divides exact integers, so the double matches DuckDB bit-for-bit.
    """
    li = table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    n = op.agg(
        F.countDistinct("l_orderkey").cast("double").alias("n_orders")
    )
    ps = op.groupBy("l_partkey").agg(F.count("*").alias("part_cnt"))
    a = op.alias("a")
    b = op.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("p1"),
            F.col("b.l_partkey").alias("p2"),
        )
        .agg(F.count("*").alias("pair_cnt"))
    )
    return (
        pairs.join(
            ps.select(
                F.col("l_partkey").alias("p1"),
                F.col("part_cnt").alias("cnt1"),
            ),
            "p1",
        )
        .join(
            ps.select(
                F.col("l_partkey").alias("p2"),
                F.col("part_cnt").alias("cnt2"),
            ),
            "p2",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "p1",
            "p2",
            "pair_cnt",
            F.round(
                F.col("pair_cnt")
                * F.col("n_orders")
                / (F.col("cnt1") * F.col("cnt2")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("pair_cnt").desc(), "p1", "p2")
        .limit(20)
    )


@register(
    "q_stats_regression",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)
                      * CAST(ROUND(l_extendedprice * 100) AS HUGEINT))
                  AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity AS HUGEINT)
                      * CAST(ROUND(l_extendedprice * 100) AS HUGEINT))
                  AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx) / 100.0, 6)
             AS slope,
           ROUND((sy / n - (n * sxy - sx * sy) / (n * sxx - sx * sx)
                  * sx / n) / 100.0, 6) AS intercept,
           ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
             AS r2
    FROM s
    """,
)
def q_stats_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS regression (price ~ quantity) from exact integer
    moment sums — the distributed equivalent of ``regr_slope`` /
    ``regr_intercept`` / ``regr_r2``.

    Native ``regr_*`` aggregates accumulate doubles, whose partial-sum
    order differs between engines (and between runs at different
    parallelism), so they can never value-hash-match.  Instead the five
    moments are summed as exact BIGINTs (quantity is integral, price is
    2-dp money → cents), converted to DOUBLE once, and the closed-form
    slope/intercept/r² arithmetic is written identically in both
    engines: identical operands + identical IEEE op order ⇒ identical
    doubles.  One map-side-combinable aggregation, no second pass —
    the textbook moment-sum trick that makes regression embarrassingly
    parallel at 100 TB.  Headroom: y² of cent-scale values is ~1e14
    per row, so a BIGINT Σy² overflows past ~1e4 rows per group — the
    sf1.0 sweep hit exactly that (ARITHMETIC_OVERFLOW at 2M rows per
    returnflag).  The cross-moment sums therefore accumulate in
    128-bit exactness (Spark DECIMAL(38,0) ≙ DuckDB HUGEINT — good to
    ~1e38, i.e. ~1e24 rows per group) and convert to DOUBLE once;
    both engines round the same exact integer, so the hash still
    matches.  Per-row products stay within BIGINT (y² ≤ ~1e14).
    """
    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("bigint")
    y = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    big = "decimal(38,0)"
    s = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum((y * y).cast(big)).cast("double").alias("syy"),
        F.sum((x * y).cast(big)).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        n.cast("bigint").alias("n_rows"),
        F.round(slope / 100.0, 6).alias("slope"),
        F.round((sy / n - slope * sx / n) / 100.0, 6).alias("intercept"),
        F.round(
            (n * sxy - sx * sy)
            * (n * sxy - sx * sy)
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


@register(
    "q_events_attribution",
    oracle="""
    WITH o AS (
      SELECT event_type, value,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_touch
      FROM events
    )
    SELECT COALESCE(last_touch, 'direct') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
             / 100.0 AS revenue
    FROM o WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase is credited to
    the user's most recent preceding click/view (or 'direct' when none
    exists) — the standard channel-performance rollup upstream of any
    bid or propensity model.

    One window pass per user carries the last marketing touch forward
    (``last(..., ignorenulls)`` over an unbounded-to-1-preceding ROWS
    frame — ties broken by event_id so both engines walk the same
    order), then a 3-row aggregate.  Per-user state is a single value,
    so the window is skew-safe; revenue sums exact cents
    (functions/exact.py scaled-long discipline).
    """
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(
            F.col("event_type").isin("click", "view"), F.col("event_type")
        ),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("last_touch", touch)
        .filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce("last_touch", F.lit("direct")).alias("channel")
        )
        .agg(
            F.count("*").alias("n_purchases"),
            (
                F.sum(F.round(F.col("value") * 100).cast("bigint")).cast(
                    "double"
                )
                / 100.0
            ).alias("revenue"),
        )
    )


@register(
    "q_events_paths",
    oracle="""
    WITH p AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM events GROUP BY user_id
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM p GROUP BY path
    ORDER BY n_users DESC, path LIMIT 25
    """,
)
def q_events_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: each user's full ordered event sequence joined
    into a path string, then frequency-ranked — sequence mining's
    first step (what do converting sessions look like?).

    Deterministic ordering inside ``collect_list`` does not exist, so
    the list is collected as (ts, event_id, type) structs and
    ``array_sort``-ed — struct comparison is field-ordered, giving the
    exact ``ORDER BY ts, event_id`` walk DuckDB's ``string_agg`` does.
    Per-user state is bounded by events-per-user (cap with ``slice``
    after the sort in production if a power user can log millions of
    events); the path-frequency rollup is an ordinary partial-agg
    groupBy and top-25 runs as TakeOrdered.
    """
    ev = table(spark, sf_dir, "events")
    path = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda s: s.event_type,
        ),
        ">",
    )
    return (
        ev.groupBy("user_id")
        .agg(path.alias("path"))
        .groupBy("path")
        .agg(F.count("*").alias("n_users"))
        .orderBy(F.col("n_users").desc(), "path")
        .limit(25)
    )


@register(
    "q_snapshot_diff",
    oracle="""
    WITH a AS (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_orderkey % 97 <> 0
    ),
    b AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 89 <> 0
    )
    SELECT CASE WHEN a.o_orderkey IS NULL THEN 'inserted'
                WHEN b.o_orderkey IS NULL THEN 'deleted'
                WHEN a.o_totalprice <> b.o_totalprice THEN 'updated'
                ELSE 'unchanged' END AS status,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(COALESCE(b.o_totalprice, 0) * 100)
                         AS BIGINT)
                    - CAST(ROUND(COALESCE(a.o_totalprice, 0) * 100)
                           AS BIGINT)) AS DOUBLE) / 100.0
             AS revenue_delta
    FROM a FULL JOIN b ON a.o_orderkey = b.o_orderkey
    GROUP BY 1
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot diff: classify every key across two table versions
    as inserted / deleted / updated / unchanged and report row counts
    plus the exact revenue delta — the audit primitive behind
    incremental-load validation and late-data reconciliation.

    The two "versions" are deterministic derivations of orders (drop
    keys ≡0 mod 97 vs mod 89; bump price +1.00 on keys ≡0 mod 13), so
    both engines diff identical inputs.  One full outer join on the
    key (shuffle both sides, AQE-safe — keys are unique so no skew),
    then a 4-row aggregate; deltas sum exact cents.  At 100 TB this
    is the join to bucket both snapshots on, making the diff
    exchange-free.
    """
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 97 != 0).select(
        F.col("o_orderkey").alias("a_key"),
        F.col("o_totalprice").alias("a_price"),
    )
    b = o.filter(F.col("o_orderkey") % 89 != 0).select(
        F.col("o_orderkey").alias("b_key"),
        F.when(
            F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") + 1.0
        )
        .otherwise(F.col("o_totalprice"))
        .alias("b_price"),
    )
    cents = lambda c: F.round(F.coalesce(c, F.lit(0)) * 100).cast("bigint")
    return (
        a.join(b, a.a_key == b.b_key, "full")
        .select(
            F.when(F.col("a_key").isNull(), "inserted")
            .when(F.col("b_key").isNull(), "deleted")
            .when(F.col("a_price") != F.col("b_price"), "updated")
            .otherwise("unchanged")
            .alias("status"),
            (cents(F.col("b_price")) - cents(F.col("a_price"))).alias(
                "delta_cents"
            ),
        )
        .groupBy("status")
        .agg(
            F.count("*").alias("n_rows"),
            (F.sum("delta_cents").cast("double") / 100.0).alias(
                "revenue_delta"
            ),
        )
    )


@register(
    "q_stats_entropy",
    oracle="""
    WITH u AS (
      SELECT 'o_orderstatus' AS col, o_orderstatus AS val FROM orders
      UNION ALL
      SELECT 'o_orderpriority', o_orderpriority FROM orders
    ),
    c AS (SELECT col, val, CAST(COUNT(*) AS DOUBLE) AS cnt
          FROM u GROUP BY col, val),
    t AS (SELECT col, SUM(cnt) AS total FROM c GROUP BY col)
    SELECT c.col, CAST(COUNT(*) AS BIGINT) AS n_values,
           ROUND(-SUM((c.cnt / t.total) * ln(c.cnt / t.total)), 6)
             AS entropy,
           ROUND(1 - SUM((c.cnt / t.total) * (c.cnt / t.total)), 6)
             AS gini
    FROM c JOIN t ON c.col = t.col
    GROUP BY c.col
    """,
)
def q_stats_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy + Gini impurity per categorical column — the
    feature-selection / drift-monitoring statistic a model pipeline
    computes before trusting a category as a predictor.

    Unpivot via ``stack`` (zero-copy projection, no shuffle), count
    per (col, value) — state bounded by domain cardinality — then one
    tiny join against per-column totals.  p·ln p runs on identical
    exact-integer-derived doubles in both engines; ``ln`` may differ
    in the last ulp between libm and the JVM, hence the 6-dp round
    (terms are O(1), so 1e-15 noise is far below the gate).
    """
    o = table(spark, sf_dir, "orders")
    u = o.select(
        F.expr(
            "stack(2, 'o_orderstatus', o_orderstatus,"
            " 'o_orderpriority', o_orderpriority) AS (col, val)"
        )
    )
    c = u.groupBy("col", "val").agg(F.count("*").cast("double").alias("cnt"))
    t = c.groupBy("col").agg(F.sum("cnt").alias("total"))
    p = F.col("cnt") / F.col("total")
    return (
        c.join(F.broadcast(t), "col")
        .groupBy("col")
        .agg(
            F.count("*").alias("n_values"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
            F.round(1 - F.sum(p * p), 6).alias("gini"),
        )
    )


@register(
    "q_events_interpolate",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE)
               / COUNT(value) AS v
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo,
             date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ), spine AS (
      SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      FROM bounds
    ), j AS (
      SELECT s.h, hourly.v FROM spine s
      LEFT JOIN hourly ON hourly.h = s.h
    ), w AS (
      SELECT h, v,
        last_value(v IGNORE NULLS) OVER
          (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER
          (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS ph,
        first_value(v IGNORE NULLS) OVER
          (ORDER BY h ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
          AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER
          (ORDER BY h ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
          AS nh
      FROM j
    )
    SELECT h,
           ROUND(CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NULL THEN nv
             WHEN nv IS NULL THEN pv
             ELSE pv + (nv - pv)
                  * (CAST(date_diff('hour', ph, h) AS DOUBLE)
                     / CAST(date_diff('hour', ph, nh) AS DOUBLE))
           END, 6) AS v_interp,
           (v IS NULL) AS was_gap
    FROM w
    """,
)
def q_events_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap fill: the hourly purchase-value series
    densified over the full hour spine, holes filled by interpolating
    between the nearest observed neighbors (edges carry the nearest
    value) — what a forecasting pipeline wants when zero-fill would
    lie (q_events_gapfill's counts ARE zeros; averages are NOT).

    Two ignore-nulls window walks (backward carry of last observed
    value+hour, forward carry of next) turn nearest-neighbor lookup
    into O(n) sequential scans instead of a self-join.  The fraction
    uses exact integer hour differences, so both engines interpolate
    identical doubles.  The demo series is global (one window
    partition); a per-series version adds the series key to
    partitionBy and scales linearly.
    """
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(
            (
                F.sum(F.col("value").cast("decimal(27,6)")).cast("double")
                / F.count("value")
            ).alias("v")
        )
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 hour"))
        ).alias("h")
    )
    j = spine.join(hourly, "h", "left")
    back = W.orderBy("h").rowsBetween(W.unboundedPreceding, 0)
    fwd = W.orderBy("h").rowsBetween(0, W.unboundedFollowing)
    known_h = F.when(F.col("v").isNotNull(), F.col("h"))
    w = j.select(
        "h",
        "v",
        F.last("v", ignorenulls=True).over(back).alias("pv"),
        F.last(known_h, ignorenulls=True).over(back).alias("ph"),
        F.first("v", ignorenulls=True).over(fwd).alias("nv"),
        F.first(known_h, ignorenulls=True).over(fwd).alias("nh"),
    )
    hours = lambda a, b: (
        (F.unix_timestamp(b) - F.unix_timestamp(a)) / F.lit(3600)
    ).cast("bigint")
    frac = hours("ph", "h").cast("double") / hours("ph", "nh").cast(
        "double"
    )
    return w.select(
        "h",
        F.round(
            F.when(F.col("v").isNotNull(), F.col("v"))
            .when(F.col("pv").isNull(), F.col("nv"))
            .when(F.col("nv").isNull(), F.col("pv"))
            .otherwise(
                F.col("pv") + (F.col("nv") - F.col("pv")) * frac
            ),
            6,
        ).alias("v_interp"),
        F.col("v").isNull().alias("was_gap"),
    )


@register(
    "q_events_survival",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS s_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
      SELECT s.user_id, MIN(e.ts) AS p_ts
      FROM s JOIN events e
        ON e.user_id = s.user_id
       AND e.event_type = 'purchase' AND e.ts >= s.s_ts
      GROUP BY s.user_id
    ),
    horizon AS (SELECT MAX(CAST(ts AS DATE)) AS h FROM events),
    subj AS (
      SELECT s.user_id,
             CASE WHEN p.p_ts IS NOT NULL
                  THEN date_diff('day', CAST(s.s_ts AS DATE),
                                 CAST(p.p_ts AS DATE))
                  ELSE date_diff('day', CAST(s.s_ts AS DATE), horizon.h)
             END AS t,
             (p.p_ts IS NOT NULL) AS converted
      FROM s LEFT JOIN p ON p.user_id = s.user_id CROSS JOIN horizon
    ),
    daily AS (
      SELECT t AS day,
             CAST(SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT)
               AS d,
             CAST(COUNT(*) AS BIGINT) AS leaving
      FROM subj GROUP BY t
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM subj),
    ar AS (
      SELECT day, d,
             CAST(n.total
               - COALESCE(SUM(leaving) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS at_risk
      FROM daily CROSS JOIN n
    ),
    km AS (
      SELECT day, d, at_risk,
             SUM(CASE WHEN d > 0 AND d < at_risk
                      THEN ln(1 - CAST(d AS DOUBLE) / at_risk)
                      ELSE 0 END)
               OVER (ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS lnsum,
             MAX(CASE WHEN d = at_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS hit_zero
      FROM ar
    )
    SELECT day, at_risk, d AS conversions,
           CASE WHEN hit_zero = 1 THEN 0.0
                ELSE ROUND(exp(lnsum), 6) END AS survival
    FROM km WHERE d > 0
    """,
)
def q_events_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for time-to-conversion: P(still not
    purchased by day t) over signup cohorts, right-censored at the
    data horizon — the churn/conversion-timing estimator behavioral
    platforms chart before fitting any parametric model.

    S(t) = Π(1 − dᵢ/nᵢ) evaluated as exp(Σ ln(·)) in BOTH engines so
    the float path is identical (window cum-sums may associate
    differently → ~1e-14 noise, absorbed by the 6-dp round).  At-risk
    counts come from exact integer window sums.  Everything reduces to
    |distinct days| rows before the single-partition ordered window —
    at scale, per-cohort curves add the cohort key to partitionBy.
    """
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    p = (
        s.join(
            ev.filter(F.col("event_type") == "purchase").select(
                F.col("user_id").alias("p_user"), F.col("ts").alias("pts")
            ),
            (F.col("user_id") == F.col("p_user"))
            & (F.col("pts") >= F.col("s_ts")),
        )
        .groupBy("user_id")
        .agg(F.min("pts").alias("p_ts"))
    )
    horizon = ev.agg(F.max(F.col("ts").cast("date")).alias("h"))
    subj = (
        s.join(p, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(
                F.col("p_ts").isNotNull(),
                F.datediff(
                    F.col("p_ts").cast("date"), F.col("s_ts").cast("date")
                ),
            )
            .otherwise(
                F.datediff(F.col("h"), F.col("s_ts").cast("date"))
            )
            .alias("t"),
            F.col("p_ts").isNotNull().alias("converted"),
        )
    )
    daily = subj.groupBy(F.col("t").alias("day")).agg(
        F.sum(F.when(F.col("converted"), 1).otherwise(0)).alias("d"),
        F.count("*").alias("leaving"),
    )
    n = subj.agg(F.count("*").alias("total"))
    prev = W.orderBy("day").rowsBetween(W.unboundedPreceding, -1)
    run = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    at_risk = F.col("total") - F.coalesce(
        F.sum("leaving").over(prev), F.lit(0)
    )
    ar = daily.crossJoin(F.broadcast(n)).select(
        "day", "d", at_risk.alias("at_risk")
    )
    term = F.when(
        (F.col("d") > 0) & (F.col("d") < F.col("at_risk")),
        F.log(1 - F.col("d").cast("double") / F.col("at_risk")),
    ).otherwise(F.lit(0.0))
    hit_zero = F.max(
        F.when(F.col("d") == F.col("at_risk"), 1).otherwise(0)
    ).over(run)
    return (
        ar.select(
            "day",
            "d",
            "at_risk",
            F.sum(term).over(run).alias("lnsum"),
            hit_zero.alias("hit_zero"),
        )
        .filter(F.col("d") > 0)
        .select(
            "day",
            "at_risk",
            F.col("d").alias("conversions"),
            F.when(F.col("hit_zero") == 1, F.lit(0.0))
            .otherwise(F.round(F.exp("lnsum"), 6))
            .alias("survival"),
        )
    )


@register(
    "q_orders_seasonality",
    oracle="""
    WITH cells AS (
      SELECT CAST(month(o_orderdate) AS BIGINT) AS m,
             (date_diff('day', DATE '1995-01-02',
                        CAST(o_orderdate AS DATE)) % 7) AS dow,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS units
      FROM orders GROUP BY 1, 2
    ),
    tot AS (SELECT SUM(units) AS total_units,
                   SUM(n_orders) AS total_orders FROM cells)
    SELECT m, dow, n_orders,
           CAST(units AS DOUBLE) / 100.0 AS revenue,
           ROUND((CAST(units AS DOUBLE) / total_units)
                 / (CAST(n_orders AS DOUBLE) / total_orders), 6)
             AS seasonality_index
    FROM cells CROSS JOIN tot
    """,
)
def q_orders_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month × weekday seasonality matrix with a revenue-concentration
    index (cell revenue share ÷ cell order share; >1 = orders in that
    cell run larger than average) — the calendar-effects profile a
    demand or propensity model consumes as features.

    Weekday uses portable day arithmetic from a known Monday
    (1995-01-02), never engine locale.  One partial-aggregated groupBy
    to 84 cells, totals ride back via a broadcast 1-row cross join,
    and every ratio divides exact integer units, so the doubles agree
    bit-for-bit.
    """
    o = table(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.month("o_orderdate").cast("bigint").alias("m"),
        (
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1995-01-02")
            )
            % 7
        ).alias("dow"),
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "units"
        ),
    )
    tot = cells.agg(
        F.sum("units").alias("total_units"),
        F.sum("n_orders").alias("total_orders"),
    )
    return cells.crossJoin(F.broadcast(tot)).select(
        "m",
        "dow",
        "n_orders",
        (F.col("units").cast("double") / 100.0).alias("revenue"),
        F.round(
            (F.col("units").cast("double") / F.col("total_units"))
            / (F.col("n_orders").cast("double") / F.col("total_orders")),
            6,
        ).alias("seasonality_index"),
    )


@register(
    "q_session_features",
    oracle="""
    WITH w AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
                   OR date_diff('microsecond',
                        lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id), ts)
                      >= 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ),
    s AS (
      SELECT *,
             SUM(new_sess) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sess_no
      FROM w
    )
    SELECT user_id, event_id, event_type,
           CAST(sess_no AS BIGINT) AS sess_no,
           CAST(row_number() OVER (PARTITION BY user_id, sess_no
                                   ORDER BY ts, event_id) AS BIGINT)
             AS idx_in_session,
           date_diff('microsecond',
             min(ts) OVER (PARTITION BY user_id, sess_no), ts)
             // 1000000 AS secs_since_start
    FROM s
    """,
)
def q_session_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event session-relative features: session ordinal, index
    within session, seconds since session start (30-min inactivity
    sessions) — exactly the positional features a sequence /
    next-event model consumes per event, complementing
    q_sessionize's per-session rollup.

    Three stacked window passes over the same (user, ts, event_id)
    ordering — Catalyst collapses them into a minimal number of
    sorts behind one user_id shuffle.  Time arithmetic stays in
    exact integer microseconds (floor-divided to seconds
    identically in both engines); per-user state is bounded, so the
    plan scales with users, not events-per-window.
    """
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    order = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(order)
    new_sess = F.when(
        prev_ts.isNull()
        | (
            F.unix_micros("ts") - F.unix_micros(prev_ts)
            >= 1800000000
        ),
        1,
    ).otherwise(0)
    w = ev.select(
        "user_id", "event_id", "ts", "event_type",
        new_sess.alias("new_sess"),
    )
    s = w.select(
        "*",
        F.sum("new_sess")
        .over(order.rowsBetween(W.unboundedPreceding, 0))
        .alias("sess_no"),
    )
    sess = W.partitionBy("user_id", "sess_no").orderBy("ts", "event_id")
    start = F.min("ts").over(W.partitionBy("user_id", "sess_no"))
    return s.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("sess_no").cast("bigint").alias("sess_no"),
        F.row_number().over(sess).cast("bigint").alias("idx_in_session"),
        F.floor(
            (F.unix_micros("ts") - F.unix_micros(start)) / F.lit(1000000)
        )
        .cast("bigint")
        .alias("secs_since_start"),
    )


@register(
    "q_events_growth",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events
    ),
    w AS (
      SELECT user_id, wk,
             lag(wk)  OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
             lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk
      FROM act
    )
    SELECT wk,
           CAST(SUM(CASE WHEN prev_wk IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new,
           CAST(SUM(CASE WHEN prev_wk = wk - 7 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_retained,
           CAST(SUM(CASE WHEN prev_wk IS NOT NULL AND prev_wk < wk - 7
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
           CAST(SUM(CASE WHEN next_wk IS NULL OR next_wk > wk + 7
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_churning
    FROM w GROUP BY wk
    """,
)
def q_events_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting: every active (user, week) classified
    as new / retained / resurrected, plus how many of the week's
    actives churn immediately after — the MAU-decomposition ledger
    (new + retained + resurrected = actives) growth teams monitor.

    One distinct to (user, week) granularity — the heavy lift, hash-
    spread across both columns — then lag/lead over each user's tiny
    week list and a conditional-sum rollup.  Week truncation is
    Monday-anchored in both engines and compared as DATEs (timestamp
    vs date trunc semantics differ — the cast is the portability
    fix); all outputs are exact integer counts.
    """
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    act = ev.select(
        "user_id",
        F.date_trunc("week", "ts").cast("date").alias("wk"),
    ).distinct()
    order = W.partitionBy("user_id").orderBy("wk")
    w = act.select(
        "user_id",
        "wk",
        F.lag("wk").over(order).alias("prev_wk"),
        F.lead("wk").over(order).alias("next_wk"),
    )
    return w.groupBy("wk").agg(
        F.sum(
            F.when(F.col("prev_wk").isNull(), 1).otherwise(0)
        ).alias("n_new"),
        F.sum(
            F.when(
                F.col("prev_wk") == F.date_sub("wk", 7), 1
            ).otherwise(0)
        ).alias("n_retained"),
        F.sum(
            F.when(
                F.col("prev_wk").isNotNull()
                & (F.col("prev_wk") < F.date_sub("wk", 7)),
                1,
            ).otherwise(0)
        ).alias("n_resurrected"),
        F.sum(
            F.when(
                F.col("next_wk").isNull()
                | (F.col("next_wk") > F.date_add("wk", 7)),
                1,
            ).otherwise(0)
        ).alias("n_churning"),
    )


@register(
    "q_topn_other",
    oracle="""
    WITH nrev AS (
      SELECT n.n_name,
             SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS units
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1
    ),
    r AS (
      SELECT *, row_number() OVER (ORDER BY units DESC, n_name) AS rk
      FROM nrev
    )
    SELECT CASE WHEN rk <= 5 THEN n_name ELSE 'OTHER' END AS nation,
           CAST(SUM(units) AS DOUBLE) / 100.0 AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_nations
    FROM r GROUP BY 1
    """,
)
def q_topn_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 nations by revenue with everything else folded into one
    'OTHER' row — the report primitive that keeps dashboards bounded
    no matter how wide the dimension grows (the long tail is summed,
    never dropped).

    The fact table reduces to |nations| rows before the ranking
    window runs (broadcast dims, partial-agg first), so the global
    window is trivially cheap; the fold is a CASE over the rank and
    one more tiny aggregate.  Revenue stays exact integer cents
    until the final division.
    """
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    nrev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("units")
        )
    )
    rk = F.row_number().over(W.orderBy(F.col("units").desc(), "n_name"))
    return (
        nrev.withColumn("rk", rk)
        .groupBy(
            F.when(F.col("rk") <= 5, F.col("n_name"))
            .otherwise("OTHER")
            .alias("nation")
        )
        .agg(
            (F.sum("units").cast("double") / 100.0).alias("revenue"),
            F.count("*").alias("n_nations"),
        )
    )


@register(
    "q_label_forward",
    oracle="""
    SELECT user_id, event_id, event_type,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                                  THEN 1 ELSE 0 END) OVER (
             PARTITION BY user_id
             ORDER BY date_diff('microsecond', TIMESTAMP '1970-01-01',
                                ts)
             RANGE BETWEEN 1 FOLLOWING AND 604800000000 FOLLOWING
           ), 0) AS BIGINT) AS purchases_7d,
           (COALESCE(SUM(CASE WHEN event_type = 'purchase'
                              THEN 1 ELSE 0 END) OVER (
             PARTITION BY user_id
             ORDER BY date_diff('microsecond', TIMESTAMP '1970-01-01',
                                ts)
             RANGE BETWEEN 1 FOLLOWING AND 604800000000 FOLLOWING
           ), 0) > 0) AS label
    FROM events
    """,
)
def q_label_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-looking label generation: for every event, how many
    purchases the same user makes in the NEXT 7 days (strictly
    after), plus the boolean conversion label — the leakage-safe
    target a propensity model trains on, built without a self-join.

    A value-RANGE window over exact epoch microseconds ((1,
    7d·86400·1e6] FOLLOWING) walks each user's timeline once —
    O(n) per user vs the O(n²) candidate join, the same trailing-
    window machinery as q_win_trailing_1h pointed forward.  Empty
    frames coalesce to 0 in both engines; all arithmetic is integer.
    """
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(1, 604800000000)
    )
    cnt = F.coalesce(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).over(w),
        F.lit(0),
    )
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        cnt.cast("bigint").alias("purchases_7d"),
        (cnt > 0).alias("label"),
    )


@register(
    "q_agg_multigrain",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             CAST(date_trunc('week', ts) AS DATE) AS w,
             CAST(date_trunc('month', ts) AS DATE) AS m
      FROM events
    )
    SELECT CASE WHEN GROUPING(d) = 0 THEN 'day'
                WHEN GROUPING(w) = 0 THEN 'week'
                ELSE 'month' END AS grain,
           COALESCE(d, w, m) AS bucket,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM e GROUP BY GROUPING SETS ((d), (w), (m))
    """,
)
def q_agg_multigrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users at day, week, AND month grain from ONE scan:
    GROUPING SETS over the three derived calendar columns — distinct
    users do NOT sum across buckets, so each grain genuinely needs
    its own COUNT(DISTINCT), and the grouping-set expansion shares
    the scan and the exact-distinct machinery instead of running
    three jobs.

    Spark's Expand replicates each row 3× map-side (one replica per
    set) before the two-phase exact distinct — at 100 TB that trades
    2× extra shuffle input for two whole table scans avoided, a win
    whenever the scan dominates (it does; events is the fat table).
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("date").alias("d"),
        F.date_trunc("week", "ts").cast("date").alias("w"),
        F.date_trunc("month", "ts").cast("date").alias("m"),
    )
    ev.createOrReplaceTempView("_multigrain_events")
    return table(spark, sf_dir, "events").sparkSession.sql(
        """
        SELECT CASE WHEN GROUPING(d) = 0 THEN 'day'
                    WHEN GROUPING(w) = 0 THEN 'week'
                    ELSE 'month' END AS grain,
               COALESCE(d, w, m) AS bucket,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM _multigrain_events GROUP BY GROUPING SETS ((d), (w), (m))
        """
    )


@register(
    "q_win_streak",
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    g AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY day) AS INT) AS grp
      FROM d
    ),
    s AS (
      SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len
      FROM g GROUP BY 1, 2
    )
    SELECT user_id,
           MAX(len) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM s GROUP BY user_id
    """,
)
def q_win_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands pattern (day minus its per-user ordinal is
    constant exactly within a consecutive run), the engagement
    feature behind habit scores and streak badges.

    Dedup to (user, day) first — the heavy reduction — then one
    per-user ordered window and two tiny aggregates; all integer/date
    arithmetic, exact in both engines.  Per-user state is bounded by
    active days, so the window never sees a hot partition.
    """
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    d = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    rn = F.row_number().over(
        W.partitionBy("user_id").orderBy("day")
    )
    g = d.select(
        "user_id", "day", F.date_sub("day", rn).alias("grp")
    )
    s = g.groupBy("user_id", "grp").agg(F.count("*").alias("len"))
    return s.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.count("*").alias("n_streaks"),
    )


@register(
    "q_events_diversity",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS DOUBLE) AS cnt
      FROM events GROUP BY 1, 2
    ),
    t AS (SELECT user_id, SUM(cnt) AS tot FROM c GROUP BY 1)
    SELECT c.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(t.tot AS BIGINT) AS n_events,
           ROUND(-SUM((cnt / tot) * ln(cnt / tot)), 6) AS type_entropy
    FROM c JOIN t ON c.user_id = t.user_id
    GROUP BY c.user_id, t.tot
    """,
)
def q_events_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral diversity per user: distinct event types plus the
    Shannon entropy of the user's type mix — the "explorer vs
    single-track" feature that separates browsers from buyers in
    propensity models (same entropy discipline as q_stats_entropy,
    applied per entity).

    Two aggregations sharing the user_id partitioning and a
    broadcast-scale join back; counts are exact integers, so only
    ``ln``'s final ulp needs the 6-dp round.
    """
    ev = table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("double").alias("cnt")
    )
    t = c.groupBy("user_id").agg(F.sum("cnt").alias("tot"))
    p = F.col("cnt") / F.col("tot")
    return (
        c.join(t, "user_id")
        .groupBy("user_id", "tot")
        .agg(
            F.count("*").alias("n_types"),
            F.round(-F.sum(p * F.log(p)), 6).alias("type_entropy"),
        )
        .select(
            "user_id",
            "n_types",
            F.col("tot").cast("bigint").alias("n_events"),
            "type_entropy",
        )
    )


@register(
    "q_events_velocity",
    oracle="""
    WITH wkly AS (
      SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT user_id, wk, n_events,
             CAST(SUM(n_events) OVER (PARTITION BY user_id ORDER BY wk
               ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING) AS BIGINT) AS prev4
      FROM wkly
    )
    SELECT user_id, wk, n_events, prev4,
           ROUND(CAST(4 * n_events AS DOUBLE) / prev4, 6) AS velocity
    FROM w WHERE prev4 > 0
    """,
)
def q_events_velocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement velocity: each user-week's event count against the
    trailing four weeks' average (ratio > 1 = accelerating) — the
    trend feature churn models weight most, and the input to
    early-warning alerting.

    NOTE: weeks a user is absent simply don't produce rows, so the
    4-PRECEDING frame spans the user's last four ACTIVE weeks — the
    gap-filled variant composes q_events_gapfill's spine when
    calendar alignment matters.  All counts are exact integers; the
    single ratio is the only float op.
    """
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    wkly = ev.groupBy(
        "user_id",
        F.date_trunc("week", "ts").cast("date").alias("wk"),
    ).agg(F.count("*").alias("n_events"))
    w = (
        W.partitionBy("user_id")
        .orderBy("wk")
        .rowsBetween(-4, -1)
    )
    return (
        wkly.withColumn("prev4", F.sum("n_events").over(w))
        .filter(F.col("prev4") > 0)
        .select(
            "user_id",
            "wk",
            "n_events",
            "prev4",
            F.round(
                (4 * F.col("n_events")).cast("double") / F.col("prev4"),
                6,
            ).alias("velocity"),
        )
    )


@register(
    "q_cohort_ltv",
    oracle="""
    WITH first AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cw
      FROM events GROUP BY 1
    ),
    cohort_size AS (
      SELECT cw, CAST(COUNT(*) AS BIGINT) AS n_users
      FROM first GROUP BY 1
    ),
    rev AS (
      SELECT f.cw,
             date_diff('day', f.cw,
                       CAST(date_trunc('week', e.ts) AS DATE)) // 7
               AS wk_off,
             SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS cents
      FROM events e JOIN first f ON e.user_id = f.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2
    ),
    c AS (
      SELECT cw, wk_off,
             SUM(cents) OVER (PARTITION BY cw ORDER BY wk_off
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_cents
      FROM rev
    )
    SELECT c.cw AS cohort_week, CAST(c.wk_off AS BIGINT) AS week_offset,
           s.n_users,
           ROUND(CAST(cum_cents AS DOUBLE) / s.n_users / 100.0, 6)
             AS ltv_per_user
    FROM c JOIN cohort_size s ON s.cw = c.cw
    """,
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative LTV curves: per signup-cohort revenue per user by
    week offset — the payback chart unit economics run on (when does
    a cohort's cumulative spend cross acquisition cost?), built
    entirely from exact integer cents until the final per-user
    division.

    The fact table reduces to (cohort, offset) cells before the
    cumulative window — |cohorts|·|weeks| rows, trivial at any scale;
    the user→cohort join shares the user_id partitioning with the
    first-activity aggregate.  Week offsets divide exactly (both
    sides are Monday-truncated), spelled as floor division in both
    engines.
    """
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cw")
    )
    size = first.groupBy("cw").agg(F.count("*").alias("n_users"))
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first, "user_id")
        .groupBy(
            "cw",
            F.expr(
                "datediff(CAST(date_trunc('week', ts) AS DATE), cw)"
                " div 7"
            ).alias("wk_off"),
        )
        .agg(
            F.sum(
                F.round(F.col("value") * 100).cast("bigint")
            ).alias("cents")
        )
    )
    run = (
        W.partitionBy("cw")
        .orderBy("wk_off")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    c = rev.select(
        "cw", "wk_off", F.sum("cents").over(run).alias("cum_cents")
    )
    return c.join(F.broadcast(size), "cw").select(
        F.col("cw").alias("cohort_week"),
        F.col("wk_off").cast("bigint").alias("week_offset"),
        "n_users",
        F.round(
            F.col("cum_cents").cast("double") / F.col("n_users") / 100.0,
            6,
        ).alias("ltv_per_user"),
    )


@register(
    "q_ab_test",
    oracle="""
    WITH assign AS (
      SELECT user_id,
             ((user_id * 2654435761) % 4294967296) % 2 AS variant
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    conv AS (
      SELECT a.variant, e.user_id,
             MAX(CASE WHEN e.event_type = 'purchase' AND e.value > 150
                      THEN 1 ELSE 0 END) AS converted,
             SUM(CASE WHEN e.event_type = 'purchase'
                      THEN CAST(ROUND(e.value * 100) AS BIGINT)
                      ELSE 0 END) AS cents
      FROM events e JOIN assign a ON e.user_id = a.user_id
      GROUP BY 1, 2
    ),
    s AS (
      SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(converted) AS BIGINT) AS n_conv,
             SUM(cents) AS cents
      FROM conv GROUP BY 1
    ),
    p AS (
      SELECT MAX(CASE WHEN variant = 0 THEN n_users END) AS n_a,
             MAX(CASE WHEN variant = 1 THEN n_users END) AS n_b,
             MAX(CASE WHEN variant = 0 THEN n_conv END) AS c_a,
             MAX(CASE WHEN variant = 1 THEN n_conv END) AS c_b,
             MAX(CASE WHEN variant = 0 THEN cents END) AS cents_a,
             MAX(CASE WHEN variant = 1 THEN cents END) AS cents_b
      FROM s
    )
    SELECT n_a, n_b, c_a, c_b,
           ROUND(CAST(c_a AS DOUBLE) / n_a, 6) AS rate_a,
           ROUND(CAST(c_b AS DOUBLE) / n_b, 6) AS rate_b,
           ROUND(CAST(cents_a AS DOUBLE) / 100.0, 2) AS revenue_a,
           ROUND(CAST(cents_b AS DOUBLE) / 100.0, 2) AS revenue_b,
           ROUND((CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
                 / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                        * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 6) AS z_score
    FROM p
    """,
)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users split 50/50 by the engine's
    deterministic Knuth-hash assignment (the same portable arithmetic
    as q_split_assign — rerunnable, engine-independent, no rand()),
    then per-variant high-value conversion (a purchase over
    150 — the rare outcome; 'any purchase' saturates at 100% in this
    fixture and degenerates the test), revenue, and the pooled two-
    proportion z-statistic — the experimentation primitive a
    behavioral platform runs daily.

    Everything reduces to two rows of exact integers before the
    closed-form z (identical IEEE expression both engines; sqrt's
    final ulp absorbed by the 6-dp round).  The per-user conversion
    rollup shares the user_id shuffle with the assignment join.
    """
    ev = table(spark, sf_dir, "events")
    assign = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            (
                (F.col("user_id") * F.lit(2654435761))
                % F.lit(4294967296)
                % 2
            ).alias("variant"),
        )
    )
    conv = (
        ev.join(assign, "user_id")
        .groupBy("variant", "user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > 150),
                    1,
                ).otherwise(0)
            ).alias("converted"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("bigint"),
                ).otherwise(F.lit(0).cast("bigint"))
            ).alias("cents"),
        )
    )
    s = conv.groupBy("variant").agg(
        F.count("*").alias("n_users"),
        F.sum("converted").alias("n_conv"),
        F.sum("cents").alias("cents"),
    )
    pick = lambda v, c: F.max(F.when(F.col("variant") == v, F.col(c)))
    p = s.agg(
        pick(0, "n_users").alias("n_a"),
        pick(1, "n_users").alias("n_b"),
        pick(0, "n_conv").alias("c_a"),
        pick(1, "n_conv").alias("c_b"),
        pick(0, "cents").alias("cents_a"),
        pick(1, "cents").alias("cents_b"),
    )
    ra = F.col("c_a").cast("double") / F.col("n_a")
    rb = F.col("c_b").cast("double") / F.col("n_b")
    pool = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (ra - rb) / F.sqrt(
        pool
        * (1 - pool)
        * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    return p.select(
        "n_a",
        "n_b",
        "c_a",
        "c_b",
        F.round(ra, 6).alias("rate_a"),
        F.round(rb, 6).alias("rate_b"),
        F.round(F.col("cents_a").cast("double") / 100.0, 2).alias(
            "revenue_a"
        ),
        F.round(F.col("cents_b").cast("double") / 100.0, 2).alias(
            "revenue_b"
        ),
        F.round(z, 6).alias("z_score"),
    )


@register(
    "q_score_decay",
    oracle="""
    WITH horizon AS (SELECT MAX(ts) AS h FROM events),
    x AS (
      SELECT user_id,
             exp(-0.1 * (CAST(date_diff('microsecond', ts, horizon.h)
                              AS DOUBLE) / 86400000000))
               AS wgt,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
               AS is_purchase
      FROM events CROSS JOIN horizon
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(wgt), 6) AS engagement_score,
           ROUND(SUM(wgt * is_purchase), 6) AS purchase_score
    FROM x GROUP BY user_id
    """,
)
def q_score_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential recency-decay engagement score: every event
    contributes e^(−0.1·days_ago), so yesterday outweighs last month
    — the standard recency weighting that replaces hard RFM windows
    with a smooth kernel (λ=0.1/day ≈ one-week half-life).

    Age is exact integer microseconds against the global max
    timestamp (broadcast 1-row horizon), so both engines exponentiate
    identical doubles; the per-user sums of ≤dozens of O(1) terms
    carry ≤1e-15 association noise, absorbed by the 6-dp round —
    same discipline as BM25/entropy.  One scan, one user_id shuffle.
    """
    ev = table(spark, sf_dir, "events")
    horizon = ev.agg(F.max("ts").alias("h"))
    wgt = F.exp(
        -0.1
        * (
            (F.unix_micros("h") - F.unix_micros("ts")).cast("double")
            / 86400000000
        )
    )
    x = ev.crossJoin(F.broadcast(horizon)).select(
        "user_id",
        wgt.alias("wgt"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("is_purchase"),
    )
    return x.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("wgt"), 6).alias("engagement_score"),
        F.round(F.sum(F.col("wgt") * F.col("is_purchase")), 6).alias(
            "purchase_score"
        ),
    )


@register(
    "q_stats_mad",
    oracle="""
    WITH base AS (
      SELECT l_returnflag,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    ),
    med AS (
      SELECT l_returnflag, quantile_cont(cents, 0.5) AS med_cents
      FROM base GROUP BY 1
    ),
    dev AS (
      SELECT b.l_returnflag, b.cents, m.med_cents,
             abs(b.cents - m.med_cents) AS adev
      FROM base b JOIN med m ON b.l_returnflag = m.l_returnflag
    ),
    mad AS (
      SELECT l_returnflag, quantile_cont(adev, 0.5) AS mad_c
      FROM dev GROUP BY 1
    )
    SELECT d.l_returnflag,
           ROUND(d.med_cents / 100.0, 6) AS median_price,
           ROUND(m.mad_c / 100.0, 6) AS mad_price,
           CAST(SUM(CASE WHEN abs(d.cents - d.med_cents)
                              > 3 * 1.4826 * m.mad_c
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m ON d.l_returnflag = m.l_returnflag
    GROUP BY d.l_returnflag, d.med_cents, m.mad_c
    """,
)
def q_stats_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via Median Absolute Deviation: flag
    prices beyond 3 scaled MADs (×1.4826 ≈ σ under normality) from
    the per-group median — the outlier gate that, unlike z-scores
    (q_events_anomaly), cannot be dragged by the outliers themselves.

    Two exact-median passes (``F.percentile`` / ``quantile_cont``
    interpolate identically on exact integer cents, the established
    parity discipline) with the group medians broadcast back between
    them; the final count is one conditional aggregate.  At 100 TB
    each pass is a partial-aggregated shuffle on the group key —
    medians per group, never a global sort.  The percentile partials
    build per-partition value maps, so the unsplittable single-row-
    group fixture scan would otherwise serialize every map build on
    one core — ``spread`` fans it out (a plan no-op on splittable
    production layouts).
    """
    li = table(spark, sf_dir, "lineitem")
    base = spread(
        li.select(
            "l_returnflag",
            F.round(F.col("l_extendedprice") * 100)
            .cast("bigint")
            .alias("cents"),
        ),
        spark,
        sf_dir,
        "lineitem",
    )
    med = base.groupBy("l_returnflag").agg(
        F.percentile("cents", 0.5).alias("med_cents")
    )
    dev = base.join(F.broadcast(med), "l_returnflag").withColumn(
        "adev", F.abs(F.col("cents") - F.col("med_cents"))
    )
    mad = dev.groupBy("l_returnflag").agg(
        F.percentile("adev", 0.5).alias("mad_c")
    )
    return (
        dev.join(F.broadcast(mad), "l_returnflag")
        .groupBy("l_returnflag", "med_cents", "mad_c")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("cents") - F.col("med_cents"))
                    > 3 * 1.4826 * F.col("mad_c"),
                    1,
                ).otherwise(0)
            ).alias("n_outliers")
        )
        .select(
            "l_returnflag",
            F.round(F.col("med_cents") / 100.0, 6).alias("median_price"),
            F.round(F.col("mad_c") / 100.0, 6).alias("mad_price"),
            "n_outliers",
        )
    )


@register(
    "q_stats_benford",
    oracle="""
    WITH digits AS (
      SELECT CAST(substring(CAST(CAST(ROUND(o_totalprice * 100)
                                      AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS d
      FROM orders WHERE o_totalprice > 0
    ),
    obs AS (SELECT d, CAST(COUNT(*) AS DOUBLE) AS n
            FROM digits GROUP BY d),
    tot AS (SELECT SUM(n) AS total FROM obs)
    SELECT obs.d AS digit,
           CAST(obs.n AS BIGINT) AS n_observed,
           ROUND(obs.n / tot.total, 6) AS observed_share,
           ROUND(ln(1 + 1.0 / obs.d) / ln(10), 6) AS benford_share,
           ROUND((obs.n / tot.total - ln(1 + 1.0 / obs.d) / ln(10))
                 * (obs.n / tot.total - ln(1 + 1.0 / obs.d) / ln(10))
                 / (ln(1 + 1.0 / obs.d) / ln(10)), 6)
             AS chi2_term
    FROM obs CROSS JOIN tot
    """,
)
def q_stats_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit on order totals: observed vs
    expected log₁₀(1+1/d) shares with per-digit χ² terms — the
    classic fabricated-data / anomalous-feed detector a data-quality
    layer runs on money columns.

    The leading digit comes from the exact integer cents rendered as
    a string (no log10-near-power-of-10 float edge), so the counts
    are exact; the expected shares are closed-form constants both
    engines evaluate identically (ln ulp → 6-dp round).  One
    9-bucket aggregate — scan-bound at any scale.
    """
    o = table(spark, sf_dir, "orders")
    digits = o.filter(F.col("o_totalprice") > 0).select(
        F.substring(
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .cast("string"),
            1,
            1,
        )
        .cast("bigint")
        .alias("d")
    )
    obs = digits.groupBy("d").agg(F.count("*").cast("double").alias("n"))
    tot = obs.agg(F.sum("n").alias("total"))
    share = F.col("n") / F.col("total")
    exp_share = F.log(1 + 1.0 / F.col("d")) / F.log(F.lit(10.0))
    return obs.crossJoin(F.broadcast(tot)).select(
        F.col("d").alias("digit"),
        F.col("n").cast("bigint").alias("n_observed"),
        F.round(share, 6).alias("observed_share"),
        F.round(exp_share, 6).alias("benford_share"),
        F.round(
            (share - exp_share) * (share - exp_share) / exp_share, 6
        ).alias("chi2_term"),
    )


@register(
    "q_orders_interarrival",
    oracle="""
    WITH gaps AS (
      SELECT o.o_custkey, c.c_mktsegment,
             date_diff('day',
               lag(CAST(o.o_orderdate AS DATE)) OVER (
                 PARTITION BY o.o_custkey
                 ORDER BY o.o_orderdate, o.o_orderkey),
               CAST(o.o_orderdate AS DATE)) AS gap_days
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT c_mktsegment,
           CAST(COUNT(gap_days) AS BIGINT) AS n_gaps,
           ROUND(CAST(SUM(gap_days) AS DOUBLE) / COUNT(gap_days), 6)
             AS mean_gap_days,
           quantile_cont(gap_days, 0.5) AS median_gap_days
    FROM gaps WHERE gap_days IS NOT NULL
    GROUP BY 1
    """,
)
def q_orders_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order interarrival statistics: days between a customer's
    consecutive orders, rolled up per market segment — the purchase-
    cadence feature CLV and replenishment models are built on
    (mean + exact median of the gap distribution).

    One per-customer lag window (ordered by date with orderkey
    tiebreak, so both engines difference the same neighbors), then a
    segment-level aggregate over exact integer day gaps; the median
    interpolates identically on integers.  Per-customer state is one
    previous date — no skew exposure.
    """
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_mktsegment",
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lag(F.col("o_orderdate").cast("date")).over(w),
            ).alias("gap_days"),
        )
        .filter(F.col("gap_days").isNotNull())
    )
    return gaps.groupBy("c_mktsegment").agg(
        F.count("gap_days").alias("n_gaps"),
        F.round(
            F.sum("gap_days").cast("double") / F.count("gap_days"), 6
        ).alias("mean_gap_days"),
        F.percentile("gap_days", 0.5).alias("median_gap_days"),
    )


@register(
    "q_events_slo",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_errors
      FROM events GROUP BY 1
    ),
    w AS (
      SELECT h, n_events, n_errors,
             SUM(n_events) OVER (ORDER BY h
               ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS ev_6h,
             SUM(n_errors) OVER (ORDER BY h
               ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS err_6h
      FROM hourly
    )
    SELECT h, n_events, n_errors,
           ROUND(CAST(n_errors AS DOUBLE) / n_events, 6) AS error_rate,
           ROUND(CAST(err_6h AS DOUBLE) / ev_6h / 0.25, 6)
             AS burn_rate_6h,
           (CAST(err_6h AS DOUBLE) / ev_6h > 0.25) AS breach
    FROM w
    """,
)
def q_events_slo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO error-budget monitoring: hourly error rate plus the 6-hour
    sliding burn rate against a 25% error budget, with breach flags —
    the observability rollup a platform computes over its own event
    stream (the fixture's uniform type mix sits at ~20%, so breaches
    mark genuinely anomalous hours, not noise).

    Hourly reduction first (exact integer counts — the only pass over
    the fat table), then a 6-row sliding window over the tiny hourly
    series; ratios divide exact integers.  Per-series windows stay
    single-partition only because there's one global series — per-
    service SLOs add the service key to partitionBy.
    """
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("n_errors"),
    )
    win = W.orderBy("h").rowsBetween(-5, 0)
    w = hourly.select(
        "h",
        "n_events",
        "n_errors",
        F.sum("n_events").over(win).alias("ev_6h"),
        F.sum("n_errors").over(win).alias("err_6h"),
    )
    rate6 = F.col("err_6h").cast("double") / F.col("ev_6h")
    return w.select(
        "h",
        "n_events",
        "n_errors",
        F.round(
            F.col("n_errors").cast("double") / F.col("n_events"), 6
        ).alias("error_rate"),
        F.round(rate6 / 0.25, 6).alias("burn_rate_6h"),
        (rate6 > 0.25).alias("breach"),
    )


@register(
    "q_session_funnel",
    oracle="""
    WITH flags AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
                   OR date_diff('microsecond',
                        lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id), ts)
                      >= 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ),
    sess AS (
      SELECT *,
             SUM(new_sess) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sess_no
      FROM flags
    ),
    v AS (
      SELECT user_id, sess_no, MIN(ts) AS v_ts FROM sess
      WHERE event_type = 'view' GROUP BY 1, 2
    ),
    c AS (
      SELECT s.user_id, s.sess_no, MIN(s.ts) AS c_ts
      FROM sess s JOIN v ON v.user_id = s.user_id
                        AND v.sess_no = s.sess_no
      WHERE s.event_type = 'click' AND s.ts >= v.v_ts
      GROUP BY 1, 2
    ),
    p AS (
      SELECT s.user_id, s.sess_no, MIN(s.ts) AS p_ts
      FROM sess s JOIN c ON c.user_id = s.user_id
                        AND c.sess_no = s.sess_no
      WHERE s.event_type = 'purchase' AND s.ts >= c.c_ts
      GROUP BY 1, 2
    ),
    all_sessions AS (
      SELECT DISTINCT user_id, sess_no FROM sess
    )
    SELECT CASE WHEN p.p_ts IS NOT NULL THEN 3
                WHEN c.c_ts IS NOT NULL THEN 2
                WHEN v.v_ts IS NOT NULL THEN 1
                ELSE 0 END AS stage,
           CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM all_sessions a
    LEFT JOIN v ON v.user_id = a.user_id AND v.sess_no = a.sess_no
    LEFT JOIN c ON c.user_id = a.user_id AND c.sess_no = a.sess_no
    LEFT JOIN p ON p.user_id = a.user_id AND p.sess_no = a.sess_no
    GROUP BY 1
    """,
)
def q_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-session ordered funnel view → click → purchase: how
    many SESSIONS (30-min inactivity scope) progress through each
    stage in order — the conversion diagnostic at the granularity
    product teams actually optimize, vs q_events_funnel's lifetime
    view.

    Sessionization (the engine's standard lag-gap + cumulative-sum)
    feeds three stage aggregates keyed (user, session); every join
    and aggregate shares that composite-key partitioning, and stage
    candidate sets shrink monotonically, so AQE broadcasts the later
    stages.  All comparisons are exact timestamps.
    """
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    order = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(order)
    new_sess = F.when(
        prev_ts.isNull()
        | (F.unix_micros("ts") - F.unix_micros(prev_ts) >= 1800000000),
        1,
    ).otherwise(0)
    sess = ev.select(
        "user_id", "event_id", "ts", "event_type",
        new_sess.alias("new_sess"),
    ).select(
        "*",
        F.sum("new_sess")
        .over(order.rowsBetween(W.unboundedPreceding, 0))
        .alias("sess_no"),
    )
    key = ["user_id", "sess_no"]
    v = (
        sess.filter(F.col("event_type") == "view")
        .groupBy(*key)
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        sess.filter(F.col("event_type") == "click")
        .join(v, key)
        .filter(F.col("ts") >= F.col("v_ts"))
        .groupBy(*key)
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        sess.filter(F.col("event_type") == "purchase")
        .join(c, key)
        .filter(F.col("ts") >= F.col("c_ts"))
        .groupBy(*key)
        .agg(F.min("ts").alias("p_ts"))
    )
    stage = (
        F.when(F.col("p_ts").isNotNull(), 3)
        .when(F.col("c_ts").isNotNull(), 2)
        .when(F.col("v_ts").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        sess.select(*key)
        .distinct()
        .join(v, key, "left")
        .join(c, key, "left")
        .join(p, key, "left")
        .groupBy(stage.alias("stage"))
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )


@register(
    "q_events_episodes",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_errors
      FROM events GROUP BY 1
    ),
    flagged AS (
      SELECT h, (CAST(n_errors AS DOUBLE) / n_events > 0.25) AS breach
      FROM hourly
    ),
    runs AS (
      SELECT h, breach,
             CAST(row_number() OVER (ORDER BY h) AS BIGINT)
               - CAST(row_number() OVER (PARTITION BY breach
                                         ORDER BY h) AS BIGINT) AS grp
      FROM flagged
    )
    SELECT MIN(h) AS episode_start,
           CAST(COUNT(*) AS BIGINT) AS duration_hours
    FROM runs WHERE breach GROUP BY grp
    """,
)
def q_events_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert episode collapsing: consecutive breach hours (error rate
    > 25%) merged into single episodes with start and duration — the
    flap-suppression step between raw threshold flags (q_events_slo)
    and a page, spelled as gaps-and-islands on a boolean series (the
    difference of two row_numbers is constant exactly within a run).

    The fat table reduces to hourly flags first; the double
    row_number trick is two window passes over that tiny series and
    needs no lag/lead state.  All arithmetic integer-exact.
    """
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count("*").alias("n_events"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("n_errors"),
    )
    flagged = hourly.select(
        "h",
        (
            F.col("n_errors").cast("double") / F.col("n_events") > 0.25
        ).alias("breach"),
    )
    runs = flagged.select(
        "h",
        "breach",
        (
            F.row_number().over(W.orderBy("h")).cast("bigint")
            - F.row_number()
            .over(W.partitionBy("breach").orderBy("h"))
            .cast("bigint")
        ).alias("grp"),
    )
    return (
        runs.filter(F.col("breach"))
        .groupBy("grp")
        .agg(
            F.min("h").alias("episode_start"),
            F.count("*").alias("duration_hours"),
        )
        .select("episode_start", "duration_hours")
    )


@register(
    "q_funnel_timing",
    oracle="""
    WITH u AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS s_ts
      FROM events GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS c_ts
      FROM events e JOIN u ON e.user_id = u.user_id
      WHERE e.event_type = 'click' AND e.ts >= u.s_ts
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
      GROUP BY e.user_id
    ),
    gaps AS (
      SELECT u.user_id,
             date_diff('microsecond', u.s_ts, c.c_ts) // 1000000
               AS signup_to_click_s,
             date_diff('microsecond', c.c_ts, p.p_ts) // 1000000
               AS click_to_purchase_s
      FROM u JOIN c ON c.user_id = u.user_id
      LEFT JOIN p ON p.user_id = u.user_id
      WHERE u.s_ts IS NOT NULL
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           quantile_cont(signup_to_click_s, 0.5) AS median_s2c_s,
           quantile_cont(click_to_purchase_s, 0.5) AS median_c2p_s,
           ROUND(CAST(SUM(signup_to_click_s) AS DOUBLE) / COUNT(*), 6)
             AS mean_s2c_s
    FROM gaps
    """,
)
def q_funnel_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel stage timing: how long users take from signup to first
    click and from click to first purchase (exact medians + mean
    seconds) — the latency half of the conversion story
    q_events_funnel counts, and the input to "where do users stall?"
    prioritization.

    Reuses the funnel's monotone stage aggregates, then differences
    exact integer microseconds and floor-divides to seconds
    identically in both engines; medians interpolate on integers
    (null click-to-purchase gaps — non-purchasers — are skipped by
    both engines' quantile over the LEFT-joined column).
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    u = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.col("ts"))
        ).alias("s_ts")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(u.filter(F.col("s_ts").isNotNull()), "user_id")
        .filter(F.col("ts") >= F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    secs = lambda a, b: F.expr(
        f"(unix_micros({b}) - unix_micros({a})) div 1000000"
    )
    gaps = (
        u.filter(F.col("s_ts").isNotNull())
        .join(c, "user_id")
        .join(p, "user_id", "left")
        .select(
            secs("s_ts", "c_ts").alias("signup_to_click_s"),
            secs("c_ts", "p_ts").alias("click_to_purchase_s"),
        )
    )
    return gaps.agg(
        F.count("*").alias("n_users"),
        F.percentile("signup_to_click_s", 0.5).alias("median_s2c_s"),
        F.percentile("click_to_purchase_s", 0.5).alias("median_c2p_s"),
        F.round(
            F.sum("signup_to_click_s").cast("double") / F.count("*"), 6
        ).alias("mean_s2c_s"),
    )


@register(
    "q_stats_wilson",
    oracle="""
    WITH s AS (
      SELECT p.p_brand,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS DOUBLE) AS r
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    )
    SELECT p_brand, CAST(n AS BIGINT) AS n_lines,
           CAST(r AS BIGINT) AS n_returned,
           ROUND(r / n, 6) AS return_rate,
           ROUND((r / n + 1.9208 / n
                  - 1.96 * sqrt((r / n) * (1 - r / n) / n
                                + 0.9604 / (n * n)))
                 / (1 + 3.8416 / n), 6) AS wilson_lower
    FROM s
    ORDER BY wilson_lower DESC, p_brand LIMIT 10
    """,
)
def q_stats_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return-rate ranking by Wilson lower confidence bound (z=1.96):
    the "sort by rating" estimator that stops a brand with 3/3
    returns outranking one with 290/300 — small samples get pulled
    toward the prior, exactly what naive rate sorting gets wrong.

    One join + aggregate reduces the fact table to per-brand integer
    (n, r); the Wilson closed form (z² constants 1.9208/0.9604/3.8416
    spelled inline so both engines parse identical literals) runs on
    identical doubles; top-10 is a deterministic TakeOrdered.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    s = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("double").alias("n"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            )
            .cast("double")
            .alias("r"),
        )
    )
    n, r = F.col("n"), F.col("r")
    ph = r / n
    wilson = (
        ph
        + 1.9208 / n
        - 1.96 * F.sqrt(ph * (1 - ph) / n + 0.9604 / (n * n))
    ) / (1 + 3.8416 / n)
    return (
        s.select(
            "p_brand",
            n.cast("bigint").alias("n_lines"),
            r.cast("bigint").alias("n_returned"),
            F.round(ph, 6).alias("return_rate"),
            F.round(wilson, 6).alias("wilson_lower"),
        )
        .orderBy(F.col("wilson_lower").desc(), "p_brand")
        .limit(10)
    )


@register(
    "q_events_cumulative_users",
    oracle="""
    WITH first AS (
      SELECT user_id, CAST(MIN(ts) AS DATE) AS first_day
      FROM events GROUP BY user_id
    ),
    newbies AS (
      SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS n_new
      FROM first GROUP BY 1
    ),
    dau AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
      FROM events GROUP BY 1
    )
    SELECT d.day, COALESCE(n.n_new, 0) AS n_new, d.n_active,
           CAST(SUM(COALESCE(n.n_new, 0)) OVER (ORDER BY d.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cumulative_users
    FROM dau d LEFT JOIN newbies n ON n.day = d.day
    """,
)
def q_events_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct users over time without a running-distinct
    operator: each user counts once on their FIRST day, and the
    cumulative sum of first-appearances IS the exact distinct-to-date
    — the first-seen-flag trick that turns an O(n·days) repeated
    distinct into two ordinary aggregations (the growth chart on
    every dashboard).

    One user-level min, one day-level rollup, one tiny window —
    every count exact.  Paired with daily actives for the
    new-vs-returning split at a glance.
    """
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("first_day")
    )
    newbies = first.groupBy(
        F.col("first_day").alias("day")
    ).agg(F.count("*").alias("n_new"))
    dau = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.countDistinct("user_id").alias("n_active")
    )
    run = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return (
        dau.join(newbies, "day", "left")
        .select(
            "day",
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            "n_active",
        )
        .withColumn(
            "cumulative_users", F.sum("n_new").over(run)
        )
    )


@register(
    "q_orders_hhi",
    oracle="""
    WITH cust AS (
      SELECT c.c_mktsegment, o.o_custkey,
             SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS units
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    seg AS (
      SELECT c_mktsegment, SUM(units) AS total_units,
             CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM cust GROUP BY 1
    )
    SELECT cust.c_mktsegment, seg.n_customers,
           ROUND(SUM((CAST(cust.units AS DOUBLE) / seg.total_units)
                     * (CAST(cust.units AS DOUBLE) / seg.total_units))
                 * 10000, 6) AS hhi
    FROM cust JOIN seg ON cust.c_mktsegment = seg.c_mktsegment
    GROUP BY cust.c_mktsegment, seg.n_customers
    """,
)
def q_orders_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration index per market segment
    (Σ share², ×10,000 on the antitrust scale): is segment revenue
    spread across many customers or captive to a few?  The
    concentration-risk complement to q_orders_pareto's 80% cut.

    Per-customer shares divide exact integer cents by the segment
    total (identical doubles); the Σ share² runs over each segment's
    customer list — association noise ~1e-15 against values ~1e-2,
    absorbed at 6 dp.  Two aggregations sharing the segment key, one
    broadcast join back.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    cust = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_custkey")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("units")
        )
    )
    seg = cust.groupBy("c_mktsegment").agg(
        F.sum("units").alias("total_units"),
        F.count("*").alias("n_customers"),
    )
    share = F.col("units").cast("double") / F.col("total_units")
    return (
        cust.join(F.broadcast(seg), "c_mktsegment")
        .groupBy("c_mktsegment", "n_customers")
        .agg(
            F.round(F.sum(share * share) * 10000, 6).alias("hhi")
        )
    )


@register(
    "q_events_autocorr",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT n AS x,
             lead(n) OVER (ORDER BY day) AS y
      FROM daily
    ),
    s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS cnt,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(SUM(y * y) AS DOUBLE) AS syy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy
      FROM pairs WHERE y IS NOT NULL
    )
    SELECT CAST(cnt AS BIGINT) AS n_pairs,
           ROUND((cnt * sxy - sx * sy)
                 / sqrt((cnt * sxx - sx * sx)
                        * (cnt * syy - sy * sy)), 6) AS lag1_autocorr
    FROM s
    """,
)
def q_events_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the daily event-count series — the
    one-number "is today predictive of tomorrow?" check that decides
    whether a forecasting model is worth fitting at all (≈0 here:
    the fixture's volume is flat by construction, which is the
    finding).

    The fat table reduces to one row per day; ``lead`` pairs each
    day with the next, and Pearson r comes from the same exact
    integer moment sums as q_stats_regression — engine-identical
    doubles, one tiny window, no float accumulation.
    """
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("n")
    )
    pairs = daily.select(
        F.col("n").alias("x"),
        F.lead("n").over(W.orderBy("day")).alias("y"),
    ).filter(F.col("y").isNotNull())
    s = pairs.agg(
        F.count("*").cast("double").alias("cnt"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    cnt, sx, sy = F.col("cnt"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return s.select(
        cnt.cast("bigint").alias("n_pairs"),
        F.round(
            (cnt * sxy - sx * sy)
            / F.sqrt((cnt * sxx - sx * sx) * (cnt * syy - sy * sy)),
            6,
        ).alias("lag1_autocorr"),
    )


@register(
    "q_feature_scale",
    oracle="""
    WITH b AS (
      SELECT MIN(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS lo,
             MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS hi
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                          - b.lo) AS DOUBLE)
                 / COUNT(*) / (b.hi - b.lo), 6) AS mean_scaled,
           ROUND(CAST(MIN(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                          - b.lo) AS DOUBLE) / (b.hi - b.lo), 6)
             AS min_scaled,
           ROUND(CAST(MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                          - b.lo) AS DOUBLE) / (b.hi - b.lo), 6)
             AS max_scaled
    FROM orders CROSS JOIN b
    GROUP BY o_orderpriority, b.lo, b.hi
    """,
)
def q_feature_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max feature scaling with a per-group audit: order totals
    normalized to [0,1] against global bounds, summarized per
    priority — the standard pre-model normalization, with the
    mean/min/max-after-scaling profile that catches a stale bounds
    file the moment new data exceeds it.

    Global bounds ride in as a broadcast 1-row cross join (computed
    once, never per-row); the scaled statistics are reconstructed
    from exact integer cent sums — Σ(x−lo) as BIGINT, one double
    division at the end — so the profile is engine-identical rather
    than a row-wise float average.
    """
    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    b = o.agg(
        F.min(cents).alias("lo"), F.max(cents).alias("hi")
    )
    span = (F.col("hi") - F.col("lo")).cast("double")
    shifted = cents - F.col("lo")
    return (
        o.crossJoin(F.broadcast(b))
        .groupBy("o_orderpriority", "lo", "hi")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(shifted).alias("ssum"),
            F.min(shifted).alias("smin"),
            F.max(shifted).alias("smax"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            F.round(
                F.col("ssum").cast("double") / F.col("n_orders") / span,
                6,
            ).alias("mean_scaled"),
            F.round(F.col("smin").cast("double") / span, 6).alias(
                "min_scaled"
            ),
            F.round(F.col("smax").cast("double") / span, 6).alias(
                "max_scaled"
            ),
        )
    )


@register(
    "q_events_hourly_profile",
    oracle="""
    WITH h AS (
      SELECT event_type, EXTRACT(hour FROM ts) AS hour_of_day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    t AS (SELECT event_type, SUM(n) AS total,
                 MAX(n) AS peak_n FROM h GROUP BY 1)
    SELECT h.event_type, h.hour_of_day, h.n,
           ROUND(CAST(h.n AS DOUBLE) / t.total, 6) AS share,
           (h.n = t.peak_n) AS is_peak
    FROM h JOIN t ON h.event_type = t.event_type
    """,
)
def q_events_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day activity profile per event type with peak-hour
    flags — the diurnal fingerprint that separates bot traffic (flat)
    from human traffic (peaked), and the feature behind send-time
    optimization.

    One 120-cell aggregate from the fat table, totals and peaks
    joined back broadcast-size; shares divide exact integers.  Hour
    extraction is UTC in both engines (fixture timestamps are
    naive) — timezone-aware profiles localize BEFORE extracting,
    never after aggregating.
    """
    ev = table(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.hour("ts").cast("bigint").alias("hour_of_day")
    ).agg(F.count("*").alias("n"))
    t = h.groupBy("event_type").agg(
        F.sum("n").alias("total"), F.max("n").alias("peak_n")
    )
    return h.join(F.broadcast(t), "event_type").select(
        "event_type",
        "hour_of_day",
        "n",
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias(
            "share"
        ),
        (F.col("n") == F.col("peak_n")).alias("is_peak"),
    )


@register(
    "q_win_rank_change",
    oracle="""
    WITH halves AS (
      SELECT p.p_brand,
             CASE WHEN o.o_orderdate < TIMESTAMP '1998-01-01'
                  THEN 'h1' ELSE 'h2' END AS half,
             SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
               AS units
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT p_brand, half, units,
             CAST(row_number() OVER (PARTITION BY half
               ORDER BY units DESC, p_brand) AS BIGINT) AS rnk
      FROM halves
    )
    SELECT a.p_brand,
           a.rnk AS rank_h1, b.rnk AS rank_h2,
           a.rnk - b.rnk AS rank_gain
    FROM ranked a JOIN ranked b
      ON a.p_brand = b.p_brand AND a.half = 'h1' AND b.half = 'h2'
    ORDER BY rank_gain DESC, a.p_brand LIMIT 15
    """,
)
def q_win_rank_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Movers-and-shakers: brand revenue rank in the second half of
    the period vs the first, sorted by rank gain — the
    period-over-period leaderboard delta behind every "trending"
    module (rank deltas are robust where raw revenue deltas are
    skew-dominated).

    The three-way join reduces to |brands|×2 cells before ranking;
    per-half ranks are deterministic (units, brand) windows over
    those cells, self-joined on brand — broadcast-scale all the way
    after the one fact-table aggregate.
    """
    from pyspark.sql import Window as W

    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    p = table(spark, sf_dir, "part")
    halves = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            "p_brand",
            F.when(
                F.col("o_orderdate") < F.lit("1998-01-01"), "h1"
            )
            .otherwise("h2")
            .alias("half"),
        )
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("bigint")
            ).alias("units")
        )
    )
    ranked = halves.withColumn(
        "rnk",
        F.row_number()
        .over(
            W.partitionBy("half").orderBy(
                F.col("units").desc(), "p_brand"
            )
        )
        .cast("bigint"),
    )
    a = ranked.filter(F.col("half") == "h1").select(
        "p_brand", F.col("rnk").alias("rank_h1")
    )
    b = ranked.filter(F.col("half") == "h2").select(
        F.col("p_brand").alias("brand2"), F.col("rnk").alias("rank_h2")
    )
    return (
        a.join(b, a.p_brand == b.brand2)
        .select(
            "p_brand",
            "rank_h1",
            "rank_h2",
            (F.col("rank_h1") - F.col("rank_h2")).alias("rank_gain"),
        )
        .orderBy(F.col("rank_gain").desc(), "p_brand")
        .limit(15)
    )


@register(
    "q_orders_bridge",
    oracle="""
    WITH yr AS (
      SELECT EXTRACT(year FROM l_shipdate) AS y,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS qty,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS DOUBLE) / 100.0 AS rev
      FROM lineitem GROUP BY 1
    ),
    pairs AS (
      SELECT y, qty, rev,
             lag(qty) OVER (ORDER BY y) AS qty0,
             lag(rev) OVER (ORDER BY y) AS rev0
      FROM yr
    )
    SELECT CAST(y AS BIGINT) AS year,
           ROUND(rev - rev0, 2) AS delta_revenue,
           ROUND((qty - qty0) * (rev0 / qty0), 2) AS volume_effect,
           ROUND(qty * (rev / qty - rev0 / qty0), 2) AS price_effect
    FROM pairs WHERE qty0 IS NOT NULL
    """,
)
def q_orders_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue bridge: ΔR decomposed into a volume
    effect ((q₁−q₀)·p₀) and a price/mix effect (q₁·(p₁−p₀)) — the
    finance explain-the-delta waterfall, and an identity the oracle
    enforces (the two effects sum exactly to ΔR by construction).

    Yearly totals are exact integer quantities and cents; the
    decomposition is a lag window over ≤|years| rows of identical
    doubles.  2-dp rounding matches the money display convention —
    the underlying identity holds to full double precision.
    """
    from pyspark.sql import Window as W

    li = table(spark, sf_dir, "lineitem")
    yr = li.groupBy(
        F.year("l_shipdate").alias("y")
    ).agg(
        F.sum(F.col("l_quantity").cast("bigint"))
        .cast("double")
        .alias("qty"),
        (
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("bigint")
            ).cast("double")
            / 100.0
        ).alias("rev"),
    )
    w = W.orderBy("y")
    pairs = yr.select(
        "y",
        "qty",
        "rev",
        F.lag("qty").over(w).alias("qty0"),
        F.lag("rev").over(w).alias("rev0"),
    ).filter(F.col("qty0").isNotNull())
    return pairs.select(
        F.col("y").cast("bigint").alias("year"),
        F.round(F.col("rev") - F.col("rev0"), 2).alias("delta_revenue"),
        F.round(
            (F.col("qty") - F.col("qty0"))
            * (F.col("rev0") / F.col("qty0")),
            2,
        ).alias("volume_effect"),
        F.round(
            F.col("qty")
            * (F.col("rev") / F.col("qty") - F.col("rev0") / F.col("qty0")),
            2,
        ).alias("price_effect"),
    )


@register(
    "q_stats_gini",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS i
      FROM cust
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(cents) AS tot,
             SUM(CAST(i AS DECIMAL(38, 0)) * cents) AS num
      FROM ranked
    )
    SELECT n AS n_customers,
           ROUND(CAST(tot AS DOUBLE) / 100.0, 2) AS total_revenue,
           ROUND(2.0 * CAST(num AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE))
                 - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE),
                 6) AS gini
    FROM agg
    """,
)
def q_stats_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration via the
    rank formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over ascending-sorted
    per-customer revenue — the standard inequality measure next to
    the HHI (q_orders_hhi) and Pareto share (q_orders_pareto).

    Exactness: revenue in integer cents, rank·value products summed
    as DECIMAL(38,0) (rank up to 1e9 × 1e9-cent values stays inside
    38 digits at any realistic scale), one final double expression
    mirrored token-for-token in the oracle.  The unpartitioned
    row_number is the one single-reducer step; at 100 TB replace it
    with the two-pass distributed rank (repartitionByRange on cents,
    per-partition counts collected to the driver as offsets) — the
    formula itself only needs Σ(i·xᵢ), which that pass computes
    without a global sort on one executor.
    """
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("bigint")
        ).alias("cents")
    )
    ranked = cust.select(
        "cents",
        F.row_number()
        .over(W.orderBy("cents", "o_custkey"))
        .alias("i"),
    )
    agg = ranked.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").alias("tot"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("cents")).alias(
            "num"
        ),
    )
    n = F.col("n").cast("double")
    return agg.select(
        F.col("n").alias("n_customers"),
        F.round(F.col("tot").cast("double") / 100.0, 2).alias(
            "total_revenue"
        ),
        F.round(
            2.0 * F.col("num").cast("double")
            / (n * F.col("tot").cast("double"))
            - (n + 1.0) / n,
            6,
        ).alias("gini"),
    )


@register(
    "q_stats_ks",
    oracle="""
    WITH s AS (
      SELECT value,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a
      FROM events
      WHERE event_type IN ('purchase', 'click')
    ),
    c AS (
      SELECT value,
             SUM(a) OVER (ORDER BY value) AS ca,
             SUM(1 - a) OVER (ORDER BY value) AS cb,
             SUM(a) OVER () AS n1,
             SUM(1 - a) OVER () AS n2
      FROM s
    ),
    d AS (
      SELECT value,
             ABS(CAST(ca AS BIGINT) * CAST(n2 AS BIGINT)
                 - CAST(cb AS BIGINT) * CAST(n1 AS BIGINT)) AS dn,
             CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2
      FROM c
    ),
    m AS (SELECT MAX(dn) AS mx FROM d)
    SELECT d.n1 AS n_purchase,
           d.n2 AS n_click,
           ROUND(CAST(m.mx AS DOUBLE)
                 / (CAST(d.n1 AS DOUBLE) * CAST(d.n2 AS DOUBLE)),
                 6) AS ks_stat,
           MIN(d.value) AS ks_at
    FROM d CROSS JOIN m
    WHERE d.dn = m.mx
    GROUP BY d.n1, d.n2, m.mx
    """,
)
def q_stats_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the purchase
    and click value distributions — the exact max-ECDF-gap drift
    test that complements the Jensen–Shannon corpus drift
    (q_text_jsd): D = max|F₁(v) − F₂(v)|, plus the value where the
    gap peaks.

    Exact-integer discipline end to end: cumulative counts come from
    the SQL-default RANGE frame (ties collapse correctly — all peers
    of a value enter the ECDF together), the gap is compared as the
    integer |ca·n₂ − cb·n₁| so the argmax needs no float equality,
    and the single division happens once at the end.  The ordered
    window is one global sort; at 100 TB the same cumulative counts
    come from repartitionByRange + per-partition prefix sums (the
    gap-check then maxes per partition and once at the driver).
    """
    from pyspark.sql import Window as W

    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select(
            "value",
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("a"),
        )
    )
    wcum = W.orderBy("value").rangeBetween(
        W.unboundedPreceding, W.currentRow
    )
    wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    c = e.select(
        "value",
        F.sum("a").over(wcum).alias("ca"),
        F.sum(1 - F.col("a")).over(wcum).alias("cb"),
        F.sum("a").over(wall).alias("n1"),
        F.sum(1 - F.col("a")).over(wall).alias("n2"),
    )
    d = c.select(
        "value",
        F.abs(
            F.col("ca").cast("bigint") * F.col("n2").cast("bigint")
            - F.col("cb").cast("bigint") * F.col("n1").cast("bigint")
        ).alias("dn"),
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
    )
    m = d.agg(F.max("dn").alias("mx"))
    return (
        d.join(F.broadcast(m))
        .filter(F.col("dn") == F.col("mx"))
        .groupBy("n1", "n2", "mx")
        .agg(F.min("value").alias("ks_at"))
        .select(
            F.col("n1").alias("n_purchase"),
            F.col("n2").alias("n_click"),
            F.round(
                F.col("mx").cast("double")
                / (
                    F.col("n1").cast("double")
                    * F.col("n2").cast("double")
                ),
                6,
            ).alias("ks_stat"),
            "ks_at",
        )
    )


@register(
    "q_skyline",
    oracle="""
    SELECT p.p_partkey, p.p_name, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice
        AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice
             OR q.p_size > p.p_size)
    )
    """,
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) operator: the parts not dominated on
    (minimize p_retailprice, maximize p_size) — the classic
    multi-criteria shortlist the reference's ranking surfaces need.

    The oracle states dominance as the O(n²) NOT EXISTS; the Spark
    plan is the O(n log n) sort formulation: collapse to one row per
    distinct price carrying that price's max size, take two running
    maxima over the price order (strictly-cheaper and
    cheaper-or-equal), and a part survives iff no strictly-cheaper
    price reaches its size and no cheaper-or-equal price beats it.
    Ties are exact: equal (price, size) duplicates dominate neither
    and both stay on the frontier.  The per-price collapse is one
    small aggregation; the two windows run over |distinct prices|
    rows, and the join back is on price — at 100 TB the windowed
    frame is still tiny relative to the fact table, broadcastable.
    """
    from pyspark.sql import Window as W

    p = table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_retailprice", "p_size"
    )
    per_price = p.groupBy("p_retailprice").agg(
        F.max("p_size").alias("msize")
    )
    w = W.orderBy("p_retailprice")
    pp = per_price.select(
        "p_retailprice",
        F.max("msize")
        .over(w.rowsBetween(W.unboundedPreceding, -1))
        .alias("m_lt"),
        F.max("msize")
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .alias("m_le"),
    )
    return (
        p.join(F.broadcast(pp), "p_retailprice")
        .filter(
            ~(
                (F.coalesce("m_lt", F.lit(-1)) >= F.col("p_size"))
                | (F.col("m_le") > F.col("p_size"))
            )
        )
        .select("p_partkey", "p_name", "p_retailprice", "p_size")
    )


@register(
    "q_stats_jackknife",
    oracle="""
    WITH b AS (
      SELECT c_custkey % 10 AS block,
             CAST(COUNT(*) AS BIGINT) AS n_b,
             SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS tot_b
      FROM customer GROUP BY 1
    ),
    o AS (SELECT SUM(n_b) AS n, SUM(tot_b) AS tot FROM b),
    th AS (
      SELECT b.block,
             ROUND(CAST(o.tot - b.tot_b AS DOUBLE)
                   / CAST(o.n - b.n_b AS DOUBLE) / 100.0, 6) AS th6
      FROM b CROSS JOIN o
    ),
    tb AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nblocks,
             ROUND(CAST(SUM(CAST(th6 AS DECIMAL(27, 6))) AS DOUBLE)
                   / 10.0, 6) AS thbar
      FROM th
    ),
    ssq AS (
      SELECT tb.nblocks, tb.thbar,
             CAST(SUM(CAST(ROUND((th.th6 - tb.thbar)
                                 * (th.th6 - tb.thbar), 10)
                           AS DECIMAL(38, 12))) AS DOUBLE) AS s2
      FROM th CROSS JOIN tb GROUP BY tb.nblocks, tb.thbar
    )
    SELECT ssq.nblocks AS n_blocks,
           ROUND(CAST(o.tot AS DOUBLE) / CAST(o.n AS DOUBLE)
                 / 100.0, 6) AS theta_mean,
           ROUND(SQRT(0.9 * ssq.s2), 6) AS jackknife_se
    FROM ssq CROSS JOIN o
    """,
)
def q_stats_jackknife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-a-block jackknife standard error for the mean account
    balance: split customers into 10 deterministic key blocks,
    recompute the mean leaving each block out, and SE =
    √((B−1)/B · Σ(θᵢ−θ̄)²) — the resampling-free uncertainty
    estimate (bootstrap needs RNG, which can never oracle-check;
    the jackknife is exact arithmetic end to end).

    Block sums are integer cents; each leave-one-out mean is one
    division rounded to 6 dp, and the 10-value spread is squared
    via explicit multiply (POW implementations may differ in the
    last ulp between engines) and summed as DECIMAL(38,12) so no
    order-dependent double accumulation exists anywhere.  The
    per-block rollup is the only fact-table pass — this is the
    map-side-combinable pattern that scales to any row count.
    """
    c = table(spark, sf_dir, "customer")
    b = c.groupBy((F.col("c_custkey") % 10).alias("block")).agg(
        F.count("*").cast("bigint").alias("n_b"),
        F.sum(
            F.round(F.col("c_acctbal") * 100).cast("bigint")
        ).alias("tot_b"),
    )
    o = b.agg(F.sum("n_b").alias("n"), F.sum("tot_b").alias("tot"))
    th = b.crossJoin(F.broadcast(o)).select(
        "block",
        F.round(
            (F.col("tot") - F.col("tot_b")).cast("double")
            / (F.col("n") - F.col("n_b")).cast("double")
            / 100.0,
            6,
        ).alias("th6"),
    )
    tb = th.agg(
        F.count("*").cast("bigint").alias("nblocks"),
        F.round(
            F.sum(F.col("th6").cast("decimal(27,6)")).cast("double")
            / 10.0,
            6,
        ).alias("thbar"),
    )
    ssq = (
        th.crossJoin(F.broadcast(tb))
        .groupBy("nblocks", "thbar")
        .agg(
            F.sum(
                F.round(
                    (F.col("th6") - F.col("thbar"))
                    * (F.col("th6") - F.col("thbar")),
                    10,
                ).cast("decimal(38,12)")
            )
            .cast("double")
            .alias("s2")
        )
    )
    return ssq.crossJoin(F.broadcast(o)).select(
        F.col("nblocks").alias("n_blocks"),
        F.round(
            F.col("tot").cast("double") / F.col("n").cast("double")
            / 100.0,
            6,
        ).alias("theta_mean"),
        F.round(F.sqrt(0.9 * F.col("s2")), 6).alias("jackknife_se"),
    )


@register(
    "q_stats_ttest",
    oracle="""
    WITH c AS (
      SELECT event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events WHERE event_type IN ('purchase', 'click')
    ),
    s AS (
      SELECT
        SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
          AS n1,
        SUM(CASE WHEN event_type = 'purchase' THEN c ELSE 0 END)
          AS s1,
        SUM(CASE WHEN event_type = 'purchase' THEN c * c ELSE 0 END)
          AS q1,
        SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n2,
        SUM(CASE WHEN event_type = 'click' THEN c ELSE 0 END) AS s2,
        SUM(CASE WHEN event_type = 'click' THEN c * c ELSE 0 END)
          AS q2
      FROM c
    ),
    v AS (
      SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100.0 AS m1,
        CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 100.0 AS m2,
        CAST(n1 * q1 - s1 * s1 AS DOUBLE)
          / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0))
          / 10000.0 AS v1,
        CAST(n2 * q2 - s2 * s2 AS DOUBLE)
          / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0))
          / 10000.0 AS v2
      FROM s
    )
    SELECT n1 AS n_purchase, n2 AS n_click,
           ROUND(m1 - m2, 6) AS mean_diff,
           ROUND((m1 - m2) / SQRT(v1 / n1 + v2 / n2), 6) AS t_stat,
           ROUND((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
                 / ((v1 / n1) * (v1 / n1) / (n1 - 1.0)
                    + (v2 / n2) * (v2 / n2) / (n2 - 1.0)),
                 6) AS welch_df
    FROM v
    """,
)
def q_stats_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test (unequal variances) on purchase vs
    click values: mean difference, t statistic, and the
    Welch–Satterthwaite degrees of freedom — the continuous-metric
    companion to the proportion z-test (q_ab_test) and the χ²
    independence test (q_stats_chi2).

    Counts, sums, and sums of squares accumulate as exact 64-bit
    integers of cents (n·Σc² − (Σc)² is the integer variance
    numerator), so every float appears only in the final fixed
    expression tree, mirrored token-for-token in the oracle.  One
    conditional aggregation pass over the filtered scan — no
    shuffle beyond the single global agg, partial-combined
    map-side.
    """
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("bigint").alias("c"),
        )
    )
    P = F.col("event_type") == "purchase"
    C = F.col("event_type") == "click"
    s = ev.agg(
        F.sum(F.when(P, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(P, F.col("c")).otherwise(0)).alias("s1"),
        F.sum(F.when(P, F.col("c") * F.col("c")).otherwise(0)).alias(
            "q1"
        ),
        F.sum(F.when(C, 1).otherwise(0)).alias("n2"),
        F.sum(F.when(C, F.col("c")).otherwise(0)).alias("s2"),
        F.sum(F.when(C, F.col("c") * F.col("c")).otherwise(0)).alias(
            "q2"
        ),
    )
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    v = s.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        (F.col("s1").cast("double") / n1d / 100.0).alias("m1"),
        (F.col("s2").cast("double") / n2d / 100.0).alias("m2"),
        (
            (F.col("n1") * F.col("q1") - F.col("s1") * F.col("s1"))
            .cast("double")
            / (n1d * (n1d - 1.0))
            / 10000.0
        ).alias("v1"),
        (
            (F.col("n2") * F.col("q2") - F.col("s2") * F.col("s2"))
            .cast("double")
            / (n2d * (n2d - 1.0))
            / 10000.0
        ).alias("v2"),
    )
    se1 = F.col("v1") / F.col("n1")
    se2 = F.col("v2") / F.col("n2")
    return v.select(
        F.col("n1").alias("n_purchase"),
        F.col("n2").alias("n_click"),
        F.round(F.col("m1") - F.col("m2"), 6).alias("mean_diff"),
        F.round(
            (F.col("m1") - F.col("m2")) / F.sqrt(se1 + se2), 6
        ).alias("t_stat"),
        F.round(
            (se1 + se2) * (se1 + se2)
            / (
                se1 * se1 / (F.col("n1") - 1.0)
                + se2 * se2 / (F.col("n2") - 1.0)
            ),
            6,
        ).alias("welch_df"),
    )


@register(
    "q_stats_theilsen",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS DOUBLE) / 100.0 AS rev
      FROM orders GROUP BY 1
    ),
    sl AS (
      SELECT (b.rev - a.rev)
             / CAST(b.day - a.day AS DOUBLE) AS slope
      FROM daily a JOIN daily b
        ON b.day > a.day AND b.day <= a.day + 30
    ),
    o AS (
      SELECT slope,
             ROW_NUMBER() OVER (ORDER BY slope) AS rn,
             COUNT(*) OVER () AS n
      FROM sl
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_pairs,
           ROUND(AVG(slope), 6) AS theilsen_slope
    FROM o
    WHERE rn = CAST(FLOOR((n + 1) / 2.0) AS BIGINT)
       OR rn = CAST(FLOOR(n / 2.0) AS BIGINT) + 1
    """,
)
def q_stats_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded Theil–Sen robust trend slope of daily revenue: the
    median of pairwise slopes over all day pairs up to 30 days
    apart — the outlier-immune alternative to the OLS slope
    (q_stats_regression); banding bounds the pair count at
    |days|·30 instead of |days|², which is what makes the
    estimator feasible on an unbounded series (the standard
    practical variant).

    The pair generation is a self range-join (bucketable by month
    like q_join_range_bucketed at scale); each slope is one double
    division of identical inputs in both engines.  The median picks
    value(s) by rank, and the even-count case averages exactly two
    doubles — IEEE addition is commutative, so two-value AVG is
    order-safe where an n-value SUM is not.
    """
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        (
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).cast("double")
            / 100.0
        ).alias("rev")
    )
    a = daily.alias("a")
    b = daily.alias("b")
    sl = a.join(
        b,
        (F.col("b.day") > F.col("a.day"))
        & (F.col("b.day") <= F.date_add(F.col("a.day"), 30)),
    ).select(
        (
            (F.col("b.rev") - F.col("a.rev"))
            / F.datediff(F.col("b.day"), F.col("a.day")).cast("double")
        ).alias("slope")
    )
    ranked = sl.select(
        "slope",
        F.row_number().over(W.orderBy("slope")).alias("rn"),
        F.count("*")
        .over(W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .alias("n"),
    )
    lo = F.floor((F.col("n") + 1) / 2.0).cast("bigint")
    hi = F.floor(F.col("n") / 2.0).cast("bigint") + 1
    return (
        ranked.filter((F.col("rn") == lo) | (F.col("rn") == hi))
        .agg(
            F.max("n").cast("bigint").alias("n_pairs"),
            F.round(F.avg("slope"), 6).alias("theilsen_slope"),
        )
    )


@register(
    "q_stats_anova",
    oracle="""
    WITH c AS (
      SELECT event_type AS g,
             CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events
    ),
    s AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(c) AS sc, SUM(c * c) AS qc
      FROM c GROUP BY g
    ),
    t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             SUM(n) AS nn, SUM(sc) AS tt, SUM(qc) AS qq,
             SUM(CAST(ROUND(CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
                            / CAST(n AS DOUBLE), 6)
                      AS DECIMAL(38, 8))) AS ssb_num
      FROM s
    )
    SELECT k AS k_groups, CAST(nn AS BIGINT) AS n_total,
      ROUND((CAST(ssb_num AS DOUBLE)
             - CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE)
               / CAST(nn AS DOUBLE)) / 10000.0, 4) AS ss_between,
      ROUND((CAST(qq AS DOUBLE) - CAST(ssb_num AS DOUBLE))
            / 10000.0, 4) AS ss_within,
      ROUND(((CAST(ssb_num AS DOUBLE)
              - CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE)
                / CAST(nn AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0))
            / ((CAST(qq AS DOUBLE) - CAST(ssb_num AS DOUBLE))
               / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))),
            6) AS f_stat
    FROM t
    """,
)
def q_stats_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-test across the five event-type groups on
    event value: between-group vs within-group variance — the
    k-group generalization of Welch's t (q_stats_ttest) for "does
    this categorical feature move the metric at all".

    Group moments (n, Σc, Σc²) are exact integer cents; the only
    cross-group float reduction, Σ(Σc)²/n over the five groups, is
    rounded per group to 6 dp and summed as DECIMAL(38,8), so group
    arrival order cannot change the result.  F is one fixed
    expression over that single row.  Two aggregations total:
    per-group (map-combinable over the fact scan) and the 5-row
    final — nothing here grows with data size except the scan.
    """
    ev = table(spark, sf_dir, "events").select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    )
    s = ev.groupBy("g").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("qc"),
    )
    t = s.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n").alias("nn"),
        F.sum("sc").alias("tt"),
        F.sum("qc").alias("qq"),
        F.sum(
            F.round(
                F.col("sc").cast("double")
                * F.col("sc").cast("double")
                / F.col("n").cast("double"),
                6,
            ).cast("decimal(38,8)")
        ).alias("ssb_num"),
    )
    kd = F.col("k").cast("double")
    nd = F.col("nn").cast("double")
    ttd = F.col("tt").cast("double")
    ssbn = F.col("ssb_num").cast("double")
    qqd = F.col("qq").cast("double")
    ssb = ssbn - ttd * ttd / nd
    ssw = qqd - ssbn
    return t.select(
        F.col("k").alias("k_groups"),
        F.col("nn").cast("bigint").alias("n_total"),
        F.round(ssb / 10000.0, 4).alias("ss_between"),
        F.round(ssw / 10000.0, 4).alias("ss_within"),
        F.round((ssb / (kd - 1.0)) / (ssw / (nd - kd)), 6).alias(
            "f_stat"
        ),
    )


@register(
    "q_stats_spearman",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             CAST(COUNT(*) AS BIGINT) AS x,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS y
      FROM orders GROUP BY o_custkey
    ),
    rk AS (
      SELECT
        2 * RANK() OVER (ORDER BY x) + COUNT(*) OVER (PARTITION BY x)
          - 1 AS rx,
        2 * RANK() OVER (ORDER BY y) + COUNT(*) OVER (PARTITION BY y)
          - 1 AS ry
      FROM cust
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(rx) AS sx, SUM(ry) AS sy,
             SUM(rx * ry) AS sxy,
             SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy
      FROM rk
    )
    SELECT n AS n_customers,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE)
                             * CAST(sy AS DOUBLE))),
                 6) AS spearman_rho
    FROM s
    """,
)
def q_stats_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between a customer's order count and
    total spend, with proper average ranks for ties — the monotonic
    association measure that survives the heavy-tailed spend
    distribution where Pearson (inside q_stats_regression) is
    dominated by whales.

    Average ranks are kept integral by doubling: 2·r̄ = 2·rank +
    ties − 1 (rank() is the min-rank, ties the partition count), so
    every sum (Σr, Σr², Σrᵣrᵧ) is an exact 64-bit integer and ρ is
    one fixed expression.  Doubled ranks cap at 2n — products at
    4n², so sums fit int64 through n ≈ 10⁶ customers per group of
    this shape; promote the three product sums to DECIMAL(38,0)
    beyond that.  Two rank windows over the per-customer rollup are
    the only sorts; the fact table is touched once.
    """
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.count("*").cast("bigint").alias("x"),
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("bigint")
        ).alias("y"),
    )
    rk = cust.select(
        (
            2 * F.rank().over(W.orderBy("x"))
            + F.count("*").over(W.partitionBy("x"))
            - 1
        ).alias("rx"),
        (
            2 * F.rank().over(W.orderBy("y"))
            + F.count("*").over(W.partitionBy("y"))
            - 1
        ).alias("ry"),
    )
    s = rk.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    return s.select(
        F.col("n").alias("n_customers"),
        F.round(
            (nd * sxy - sx * sy)
            / F.sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy)),
            6,
        ).alias("spearman_rho"),
    )


@register(
    "q_stats_levene",
    oracle="""
    WITH c AS (
      SELECT event_type AS g,
             CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events
    ),
    med AS (
      SELECT g,
             CAST(ROUND(2 * quantile_cont(c, 0.5)) AS BIGINT) AS med2
      FROM c GROUP BY g
    ),
    dev AS (
      SELECT c.g, ABS(2 * c.c - med.med2) AS z
      FROM c JOIN med ON med.g = c.g
    ),
    s AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(z) AS sz, SUM(z * z) AS qz
      FROM dev GROUP BY g
    ),
    t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             SUM(n) AS nn, SUM(sz) AS tt, SUM(qz) AS qq,
             SUM(CAST(ROUND(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
                            / CAST(n AS DOUBLE), 6)
                      AS DECIMAL(38, 8))) AS ssb_num
      FROM s
    )
    SELECT k AS k_groups, CAST(nn AS BIGINT) AS n_total,
           ROUND(((CAST(ssb_num AS DOUBLE)
                   - CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE)
                     / CAST(nn AS DOUBLE))
                  / (CAST(k AS DOUBLE) - 1.0))
                 / ((CAST(qq AS DOUBLE) - CAST(ssb_num AS DOUBLE))
                    / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))),
                 6) AS levene_w
    FROM t
    """,
)
def q_stats_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levene's test (Brown–Forsythe median variant) for variance
    homogeneity across the five event-type groups — the assumption
    check for ANOVA (q_stats_anova) and the t-test's equal-variance
    cousin: one-way ANOVA applied to |xᵢ − median_g|.

    Doubling keeps everything integral: 2·median of integer cents
    is an exact integer (interpolation lands on .0 or .5), so the
    deviations |2c − med2| and their moments are exact int64; the
    only cross-group float reduction reuses the ANOVA decimal
    discipline.  The per-group exact median uses the established
    percentile parity; its scalable form is q_agg_median_scalable's
    value-counts pass per group.
    """
    ev = table(spark, sf_dir, "events").select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    )
    med = ev.groupBy("g").agg(
        F.round(2 * F.expr("percentile(c, 0.5)"))
        .cast("bigint")
        .alias("med2")
    )
    dev = ev.join(F.broadcast(med), "g").select(
        "g", F.abs(2 * F.col("c") - F.col("med2")).alias("z")
    )
    s = dev.groupBy("g").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("z").alias("sz"),
        F.sum(F.col("z") * F.col("z")).alias("qz"),
    )
    t = s.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n").alias("nn"),
        F.sum("sz").alias("tt"),
        F.sum("qz").alias("qq"),
        F.sum(
            F.round(
                F.col("sz").cast("double")
                * F.col("sz").cast("double")
                / F.col("n").cast("double"),
                6,
            ).cast("decimal(38,8)")
        ).alias("ssb_num"),
    )
    kd = F.col("k").cast("double")
    nd = F.col("nn").cast("double")
    ssbn = F.col("ssb_num").cast("double")
    ssb = ssbn - F.col("tt").cast("double") * F.col("tt").cast(
        "double"
    ) / nd
    ssw = F.col("qq").cast("double") - ssbn
    return t.select(
        F.col("k").alias("k_groups"),
        F.col("nn").cast("bigint").alias("n_total"),
        F.round((ssb / (kd - 1.0)) / (ssw / (nd - kd)), 6).alias(
            "levene_w"
        ),
    )


@register(
    "q_orders_latency",
    oracle="""
    WITH lat AS (
      SELECT o.o_orderkey, o.o_orderpriority,
             CAST(MIN(CAST(l.l_shipdate AS DATE))
                  - CAST(o.o_orderdate AS DATE) AS BIGINT)
               AS days_to_first_ship
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderpriority,
               CAST(o.o_orderdate AS DATE)
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(CAST(SUM(days_to_first_ship) AS DOUBLE)
                 / COUNT(*), 6) AS mean_days,
           ROUND(quantile_cont(days_to_first_ship, 0.5), 6)
             AS p50_days,
           ROUND(quantile_cont(days_to_first_ship, 0.9), 6)
             AS p90_days
    FROM lat GROUP BY o_orderpriority
    """,
)
def q_orders_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-first-ship latency distribution by priority class:
    days from order placement to the earliest lineitem ship date,
    with mean/p50/p90 per priority — the fulfilment-SLA readout
    that checks whether '1-URGENT' actually ships faster, i.e. an
    operational join metric over both fact tables.

    Latency is exact integer days (DATE subtraction ↔ datediff);
    the mean is an integer-sum ratio and the percentiles ride the
    established exact-percentile parity.  The orders↔lineitem join
    shuffles once on orderkey (the natural co-partition key for
    bucketing both facts at scale — q_join_bucketed's layout makes
    this join shuffle-free).
    """
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    # Round-10 (guide §2.3 "aggregate before you shuffle"): the
    # earliest ship date is per-ORDERKEY state, so take the min on
    # the lineitem side BEFORE the join — the exchange then carries
    # one map-side-combined (key, date) row per order instead of
    # every lineitem row, and the join's 1:N fan-out disappears.
    # min-over-joined-rows ≡ min-per-key for a 1:N key join, so the
    # latency rows are bit-identical.
    first = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.min(F.col("l_shipdate").cast("date")).alias("first_ship")
    )
    lat = (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.col("o_orderdate").cast("date").alias("od"),
        )
        .join(first, "o_orderkey")
        .select(
            "o_orderpriority",
            F.datediff(F.col("first_ship"), F.col("od"))
            .cast("bigint")
            .alias("days_to_first_ship"),
        )
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.round(
            F.sum("days_to_first_ship").cast("double") / F.count("*"),
            6,
        ).alias("mean_days"),
        F.round(
            F.expr("percentile(days_to_first_ship, 0.5)"), 6
        ).alias("p50_days"),
        F.round(
            F.expr("percentile(days_to_first_ship, 0.9)"), 6
        ).alias("p90_days"),
    )


@register(
    "q_stats_qq",
    oracle="""
    WITH p AS (
      SELECT quantile_cont(value,
               [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS q
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT quantile_cont(value,
               [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS q
      FROM events WHERE event_type = 'click'
    )
    SELECT CAST(d.i AS INT) AS decile,
           ROUND(p.q[d.i], 6) AS q_purchase,
           ROUND(c.q[d.i], 6) AS q_click,
           ROUND(p.q[d.i] - c.q[d.i], 6) AS qq_gap
    FROM (SELECT UNNEST(generate_series(1, 9)) AS i) d
    CROSS JOIN p CROSS JOIN c
    """,
)
def q_stats_qq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile–quantile comparison of purchase vs click values at
    each decile — the distribution-shape diagnostic that locates
    WHERE two distributions diverge (tails vs body), where the KS
    statistic (q_stats_ks) only says THAT they diverge and by how
    much at the single worst point.

    Both decile vectors come from one exact multi-percentile pass
    per side (the array form, as in q_agg_multiquantile), exploded
    against a 9-row index — identical linear interpolation in both
    engines, 6-dp rounded.  Two filtered scans, no windows, no
    joins beyond two broadcast singletons.
    """
    ev = table(spark, sf_dir, "events")
    probs = "array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D)"
    p = ev.filter(F.col("event_type") == "purchase").agg(
        F.expr(f"percentile(value, {probs})").alias("qp")
    )
    c = ev.filter(F.col("event_type") == "click").agg(
        F.expr(f"percentile(value, {probs})").alias("qc")
    )
    idx = spark.range(1, 10).select(
        F.col("id").cast("int").alias("decile")
    )
    return (
        idx.crossJoin(F.broadcast(p))
        .crossJoin(F.broadcast(c))
        .select(
            "decile",
            F.round(F.element_at("qp", F.col("decile")), 6).alias(
                "q_purchase"
            ),
            F.round(F.element_at("qc", F.col("decile")), 6).alias(
                "q_click"
            ),
            F.round(
                F.element_at("qp", F.col("decile"))
                - F.element_at("qc", F.col("decile")),
                6,
            ).alias("qq_gap"),
        )
    )


@register(
    "q_stats_runs",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS c
      FROM orders GROUP BY 1
    ),
    med AS (
      SELECT CAST(ROUND(2 * quantile_cont(c, 0.5)) AS BIGINT) AS m2
      FROM daily
    ),
    signed AS (
      SELECT day, CASE WHEN 2 * c > m2 THEN 1 ELSE 0 END AS s
      FROM daily CROSS JOIN med WHERE 2 * c <> m2
    ),
    runs AS (
      SELECT s,
             CASE WHEN LAG(s) OVER (ORDER BY day) IS NULL
                    OR LAG(s) OVER (ORDER BY day) <> s
                  THEN 1 ELSE 0 END AS is_new
      FROM signed
    ),
    agg AS (
      SELECT CAST(SUM(s) AS BIGINT) AS n1,
             CAST(SUM(1 - s) AS BIGINT) AS n2,
             CAST(SUM(is_new) AS BIGINT) AS r
      FROM runs
    )
    SELECT n1 AS n_above, n2 AS n_below, r AS n_runs,
           ROUND((CAST(r AS DOUBLE)
                  - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
                 / SQRT(2.0 * n1 * n2
                        * (2.0 * n1 * n2 - n1 - n2)
                        / ((CAST(n1 + n2 AS DOUBLE))
                           * (CAST(n1 + n2 AS DOUBLE))
                           * (n1 + n2 - 1.0))), 6) AS z_stat
    FROM agg
    """,
)
def q_stats_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test for serial randomness of daily
    revenue around its median: too FEW sign-runs means trending,
    too MANY means oscillation — the model-free autocorrelation
    alarm beside the exact lag-1 autocorrelation
    (q_events_autocorr) and CUSUM changepoint.

    Signs come from exact integer comparison against the doubled
    median (exact-median days drop, per the standard definition);
    the run count is a LAG-transition sum, all int64 to the final
    z expression.  One daily rollup + one ordered window over
    |days| rows.
    """
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("bigint")
        ).alias("c")
    )
    med = daily.agg(
        F.round(2 * F.expr("percentile(c, 0.5)"))
        .cast("bigint")
        .alias("m2")
    )
    signed = (
        daily.crossJoin(F.broadcast(med))
        .filter(2 * F.col("c") != F.col("m2"))
        .select(
            "day",
            (2 * F.col("c") > F.col("m2")).cast("int").alias("s"),
        )
    )
    lag_s = F.lag("s").over(W.orderBy("day"))
    runs = signed.select(
        "s",
        F.when(
            lag_s.isNull() | (lag_s != F.col("s")), 1
        ).otherwise(0).alias("is_new"),
    )
    agg = runs.agg(
        F.sum("s").cast("bigint").alias("n1"),
        F.sum(1 - F.col("s")).cast("bigint").alias("n2"),
        F.sum("is_new").cast("bigint").alias("r"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    n1d = n1.cast("double")
    rd_ = F.col("r").cast("double")
    er = 2.0 * n1 * n2 / (n1 + n2) + 1.0
    vr = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / (
            (n1 + n2).cast("double")
            * (n1 + n2).cast("double")
            * (n1 + n2 - 1.0)
        )
    )
    return agg.select(
        n1.alias("n_above"),
        n2.alias("n_below"),
        F.col("r").alias("n_runs"),
        F.round((rd_ - er) / F.sqrt(vr), 6).alias("z_stat"),
    )


@register(
    "q_orders_aging",
    oracle="""
    WITH snap AS (
      SELECT MAX(CAST(o_orderdate AS DATE)) AS s FROM orders
    ),
    aged AS (
      SELECT o_orderpriority,
             CAST(snap.s - CAST(o_orderdate AS DATE) AS BIGINT)
               AS age_days,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders CROSS JOIN snap
      WHERE o_orderstatus <> 'F'
    )
    SELECT o_orderpriority,
           CASE WHEN age_days <= 30 THEN '0-30'
                WHEN age_days <= 90 THEN '31-90'
                WHEN age_days <= 365 THEN '91-365'
                ELSE '365+' END AS age_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_open,
           CAST(SUM(cents) AS DOUBLE) / 100.0 AS open_value
    FROM aged
    GROUP BY 1, 2
    """,
)
def q_orders_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order aging report: non-fulfilled orders bucketed by age
    at the data's snapshot date, by priority — the
    accounts-receivable-style backlog view ops teams page on (how
    much URGENT value has sat open for more than a year?).

    The snapshot is MAX(orderdate) — derived, not a literal, so
    the report is scale-factor-portable; ages are exact integer
    days and bucket edges integer comparisons.  One broadcast of
    the 1-row snapshot into a single map-side-combinable
    aggregation.
    """
    o = table(spark, sf_dir, "orders")
    snap = o.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("s")
    )
    aged = (
        o.filter(F.col("o_orderstatus") != "F")
        .crossJoin(F.broadcast(snap))
        .select(
            "o_orderpriority",
            F.datediff(
                F.col("s"), F.col("o_orderdate").cast("date")
            )
            .cast("bigint")
            .alias("age_days"),
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("cents"),
        )
    )
    bucket = (
        F.when(F.col("age_days") <= 30, "0-30")
        .when(F.col("age_days") <= 90, "31-90")
        .when(F.col("age_days") <= 365, "91-365")
        .otherwise("365+")
    )
    return aged.groupBy(
        "o_orderpriority", bucket.alias("age_bucket")
    ).agg(
        F.count("*").cast("bigint").alias("n_open"),
        (F.sum("cents").cast("double") / 100.0).alias("open_value"),
    )


@register(
    "q_stats_kruskal",
    oracle="""
    WITH c AS (
      SELECT event_type AS g,
             CAST(ROUND(value * 100) AS BIGINT) AS c
      FROM events
    ),
    rk AS (
      SELECT g,
             2 * RANK() OVER (ORDER BY c)
               + COUNT(*) OVER (PARTITION BY c) - 1 AS r2
      FROM c
    ),
    s AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(r2) AS BIGINT) AS s2
      FROM rk GROUP BY g
    ),
    t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             SUM(n) AS nn,
             SUM(CAST(ROUND(CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                            / CAST(n AS DOUBLE), 6)
                      AS DECIMAL(38, 8))) AS num
      FROM s
    )
    SELECT k AS k_groups, CAST(nn AS BIGINT) AS n_total,
           ROUND(3.0 * CAST(num AS DOUBLE)
                 / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0))
                 - 3.0 * (CAST(nn AS DOUBLE) + 1.0), 6) AS h_stat
    FROM t
    """,
)
def q_stats_kruskal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H test across the five event-type groups — the
    rank-based (distribution-free) one-way ANOVA for when the
    normality behind q_stats_anova can't be assumed: H =
    12/(N(N+1))·Σ(R̄ᵍ²·nᵍ) − 3(N+1), computed on tie-averaged
    ranks (no tie-correction factor; ranks over 2-dp cents tie
    rarely and the oracle matches the same definition exactly).

    Doubled ranks (2r̄ = 2·rank + ties − 1, the q_stats_spearman
    identity) keep every per-group rank sum integral; the only
    cross-group float reduction reuses the ANOVA decimal rounding
    discipline, and 12/(4·N(N+1)) folds into 3/(N(N+1)) because
    the doubled sums square to 4× — all in one fixed expression.
    """
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events").select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    )
    rk = ev.select(
        "g",
        (
            2 * F.rank().over(W.orderBy("c"))
            + F.count("*").over(W.partitionBy("c"))
            - 1
        ).alias("r2"),
    )
    s = rk.groupBy("g").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("r2").cast("bigint").alias("s2"),
    )
    t = s.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n").alias("nn"),
        F.sum(
            F.round(
                F.col("s2").cast("double")
                * F.col("s2").cast("double")
                / F.col("n").cast("double"),
                6,
            ).cast("decimal(38,8)")
        ).alias("num"),
    )
    nd = F.col("nn").cast("double")
    return t.select(
        F.col("k").alias("k_groups"),
        F.col("nn").cast("bigint").alias("n_total"),
        F.round(
            3.0 * F.col("num").cast("double") / (nd * (nd + 1.0))
            - 3.0 * (nd + 1.0),
            6,
        ).alias("h_stat"),
    )


@register(
    "q_orders_milestones",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS c
      FROM orders GROUP BY 1
    ),
    cum AS (
      SELECT day,
             SUM(c) OVER (ORDER BY day) AS cum_cents
      FROM daily
    ),
    tot AS (SELECT MAX(cum_cents) AS t FROM cum),
    ms AS (
      SELECT m.m,
             CAST(FLOOR(CAST(tot.t AS DOUBLE) * m.m / 10.0)
                  AS BIGINT) AS threshold
      FROM (SELECT UNNEST([1, 2, 3, 4, 5, 6, 7, 8, 9]) AS m) m
      CROSS JOIN tot
    )
    SELECT CAST(ms.m * 10 AS INT) AS pct_of_total,
           ROUND(CAST(ms.threshold AS DOUBLE) / 100.0, 2)
             AS threshold_revenue,
           MIN(cum.day) AS crossed_on
    FROM ms JOIN cum ON cum.cum_cents >= ms.threshold
    GROUP BY ms.m, ms.threshold
    """,
)
def q_orders_milestones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue milestone crossings: the first day cumulative revenue
    reached each decile of the final total — the pacing readout
    ("we hit 50% of the period's revenue by day X") that turns a
    cumulative curve into calendar milestones, and the linearized
    view a finance review reads next to the drawdown
    (q_win_drawdown).

    Thresholds derive from the data (deciles of the exact final
    cents), the crossing test is an integer comparison, and each
    milestone's day is a MIN — the same exact-argmin discipline
    as everywhere.  One running-sum window; the 9-row milestone
    frame broadcasts into the crossing join.
    """
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("bigint")
        ).alias("c")
    )
    cum = daily.select(
        "day",
        F.sum("c").over(W.orderBy("day")).alias("cum_cents"),
    )
    tot = cum.agg(F.max("cum_cents").alias("t"))
    ms = (
        spark.range(1, 10)
        .select(F.col("id").alias("m"))
        .crossJoin(F.broadcast(tot))
        .select(
            "m",
            F.floor(
                F.col("t").cast("double") * F.col("m") / 10.0
            )
            .cast("bigint")
            .alias("threshold"),
        )
    )
    return (
        cum.join(
            F.broadcast(ms),
            F.col("cum_cents") >= F.col("threshold"),
        )
        .groupBy("m", "threshold")
        .agg(F.min("day").alias("crossed_on"))
        .select(
            (F.col("m") * 10).cast("int").alias("pct_of_total"),
            F.round(
                F.col("threshold").cast("double") / 100.0, 2
            ).alias("threshold_revenue"),
            "crossed_on",
        )
    )


@register(
    "q_stats_lorenz",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT rev,
             NTILE(10) OVER (ORDER BY rev, o_custkey) AS decile
      FROM cust
    ),
    dec AS (
      SELECT CAST(decile AS BIGINT) AS decile,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(rev) AS BIGINT) AS decile_rev_cents
      FROM ranked GROUP BY decile
    ),
    tot AS (SELECT CAST(SUM(decile_rev_cents) AS BIGINT) AS t FROM dec)
    SELECT decile, n_customers, decile_rev_cents,
           CAST(SUM(decile_rev_cents) OVER (ORDER BY decile) AS BIGINT)
             AS cum_rev_cents,
           ROUND(CAST(SUM(decile_rev_cents) OVER (ORDER BY decile)
                      AS DOUBLE) / t, 6) AS cum_share
    FROM dec CROSS JOIN tot
    """,
)
def q_stats_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of customer revenue concentration in deciles —
    the curve BEHIND q_stats_gini's scalar: cumulative revenue share
    of the poorest 10%, 20%, … richest 10%, the table an inequality
    or whale-risk review actually reads.

    Decile assignment uses NTILE over the (rev, custkey) total order
    (engine-identical boundaries); everything else is exact integer
    cents with one display division.  Per-customer rollup is
    map-side-combinable; the windows run over 10 rows.
    """
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev")
    )
    ranked = cust.select(
        "rev",
        F.ntile(10).over(W.orderBy("rev", "o_custkey")).alias("decile"),
    )
    dec = ranked.groupBy(
        F.col("decile").cast("bigint").alias("decile")
    ).agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.sum("rev").cast("bigint").alias("decile_rev_cents"),
    )
    tot = dec.agg(
        F.sum("decile_rev_cents").cast("bigint").alias("t")
    )
    wc = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    return dec.crossJoin(F.broadcast(tot)).select(
        "decile",
        "n_customers",
        "decile_rev_cents",
        F.sum("decile_rev_cents").over(wc).cast("bigint").alias(
            "cum_rev_cents"
        ),
        F.round(
            F.sum("decile_rev_cents").over(wc).cast("double") / F.col("t"),
            6,
        ).alias("cum_share"),
    )


@register(
    "q_customer_repeat_conversion",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderdate,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ),
    firsts AS (
      SELECT o_custkey, o_orderdate AS d1 FROM ranked WHERE rn = 1
    ),
    seconds AS (
      SELECT o_custkey, o_orderdate AS d2 FROM ranked WHERE rn = 2
    ),
    joined AS (
      SELECT f.o_custkey,
             CAST(date_diff('day', f.d1, s.d2) AS BIGINT) AS gap_days
      FROM firsts f LEFT JOIN seconds s ON s.o_custkey = f.o_custkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_first_buyers,
           CAST(SUM(CASE WHEN gap_days IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_repeat,
           CAST(SUM(CASE WHEN gap_days <= 90 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_repeat_90d,
           ROUND(CAST(SUM(CASE WHEN gap_days <= 90 THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS conv_90d,
           CAST(MEDIAN(gap_days) AS DOUBLE) AS median_gap_days
    FROM joined
    """,
)
def q_customer_repeat_conversion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Second-purchase conversion — the retention KPI growth teams
    live on: of all first-time buyers, how many ever bought again,
    how many within 90 days, and the median days-to-second-purchase.
    Complements q_orders_interarrival (all-gap statistics) with the
    FIRST-to-SECOND transition specifically.

    First/second orders come from one ranking window per customer
    (deterministic (date, orderkey) tie-break); the median gap is the
    exact median of integer day gaps (both engines take the midpoint
    average of the two central values on even counts — a .5-exact
    double).  One shuffle on custkey, everything after is bounded.
    """
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = o.select(
        "o_custkey", "o_orderdate", F.row_number().over(w).alias("rn")
    )
    firsts = ranked.filter(F.col("rn") == 1).select(
        "o_custkey", F.col("o_orderdate").alias("d1")
    )
    seconds = ranked.filter(F.col("rn") == 2).select(
        F.col("o_custkey").alias("ck2"), F.col("o_orderdate").alias("d2")
    )
    joined = firsts.join(
        seconds, firsts.o_custkey == seconds.ck2, "left"
    ).select(
        F.datediff(F.col("d2").cast("date"), F.col("d1").cast("date"))
        .cast("bigint")
        .alias("gap_days")
    )
    return joined.agg(
        F.count("*").cast("bigint").alias("n_first_buyers"),
        F.sum(F.when(F.col("gap_days").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_repeat"),
        F.sum(F.when(F.col("gap_days") <= 90, 1).otherwise(0))
        .cast("bigint")
        .alias("n_repeat_90d"),
        F.round(
            F.sum(F.when(F.col("gap_days") <= 90, 1).otherwise(0))
            .cast("double")
            / F.count("*"),
            6,
        ).alias("conv_90d"),
        F.median("gap_days").cast("double").alias("median_gap_days"),
    )


@register(
    "q_ml_pr_curve",
    oracle="""
    WITH scored AS (
      SELECT CAST(ROUND(1.0 / (1.0 + EXP(-(value - 50.0) / 10.0)), 6)
                  AS DECIMAL(18,6)) AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    thr AS (
      SELECT CAST(UNNEST(generate_series(1, 9)) AS BIGINT) AS t
    ),
    cells AS (
      SELECT thr.t,
             CAST(SUM(CASE WHEN s >= thr.t / 10.0 THEN y ELSE 0 END)
                  AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN s >= thr.t / 10.0 THEN 1 - y ELSE 0 END)
                  AS BIGINT) AS fp,
             CAST(SUM(y) AS BIGINT) AS pos
      FROM scored CROSS JOIN thr
      GROUP BY thr.t
    )
    SELECT t AS threshold_decile, tp, fp,
           CAST(pos - tp AS BIGINT) AS fn,
           ROUND(CASE WHEN tp + fp = 0 THEN 0.0
                 ELSE CAST(tp AS DOUBLE) / (tp + fp) END, 6)
             AS precision_,
           ROUND(CAST(tp AS DOUBLE) / pos, 6) AS recall_
    FROM cells
    """,
)
def q_ml_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision-recall curve at the nine decile thresholds of the
    logistic score — the threshold-picking table that completes the
    model-eval shelf (q_ml_auc ranks, q_ml_score_ks separates,
    q_ml_calibration trusts the probabilities; this one chooses the
    operating point).

    The 9× threshold fan-out is a broadcast cross join; every
    precision/recall cell is an exact integer ratio.  At 100 TB the
    scored table is scanned once (the cross join replicates rows
    9×, map-side, before one combinable aggregate — no shuffle
    amplification on the raw stream).
    """
    e = table(spark, sf_dir, "events")
    s = F.round(
        1.0 / (1.0 + F.exp(-(F.col("value") - 50.0) / 10.0)), 6
    ).cast("decimal(18,6)")
    y = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    scored = e.select(s.alias("s"), y.alias("y"))
    thr = spark.range(1, 10).select(F.col("id").alias("t"))
    cells = (
        scored.crossJoin(F.broadcast(thr))
        .groupBy("t")
        .agg(
            F.sum(
                F.when(F.col("s") >= F.col("t") / 10.0, F.col("y"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("tp"),
            F.sum(
                F.when(F.col("s") >= F.col("t") / 10.0, 1 - F.col("y"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("fp"),
            F.sum("y").cast("bigint").alias("pos"),
        )
    )
    return cells.select(
        F.col("t").alias("threshold_decile"),
        "tp",
        "fp",
        (F.col("pos") - F.col("tp")).cast("bigint").alias("fn"),
        F.round(
            F.when(F.col("tp") + F.col("fp") == 0, 0.0).otherwise(
                F.col("tp").cast("double") / (F.col("tp") + F.col("fp"))
            ),
            6,
        ).alias("precision_"),
        F.round(F.col("tp").cast("double") / F.col("pos"), 6).alias(
            "recall_"
        ),
    )


@register(
    "q_orders_discount_impact",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           (SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * CAST(ROUND(l_discount * 100) AS BIGINT)) / 1000000.0)
             AS forgone_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
      AND ROUND(l_discount * 100) BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
)
def q_orders_discount_impact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Revenue-change-from-discount what-if (the TPC-H Q6 shape):
    Σ extendedprice·discount over a year of shipments with mid-range
    discounts and small quantities — "how much revenue would we
    reclaim by eliminating these discounts", the simplest
    filter-heavy scan-aggregate in the warehouse canon and a pure
    pushdown showcase: every predicate reaches the Parquet scan, no
    join, no shuffle beyond the 1-row combine.

    Money stays exact: price and discount are cent/percent BIGINTs,
    multiplied as integers and divided once for display (the discount
    filter compares ROUNDED integer percents, dodging the 0.07-is-
    0.070000000000000007 float-literal trap both engines share).
    """
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & F.round(F.col("l_discount") * 100).between(5, 7)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.count("*").cast("bigint").alias("n_lines"),
        (
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("bigint")
                * F.round(F.col("l_discount") * 100).cast("bigint")
            )
            / 1000000.0
        ).alias("forgone_revenue"),
    )


@register(
    "q_search_ctr_position",
    oracle="""
    WITH ranked AS (
      SELECT (CAST(json_extract(props, '$.k') AS INTEGER) % 10) + 1
               AS position,
             event_type
      FROM events
      WHERE event_type IN ('view', 'click')
        AND json_extract(props, '$.k') IS NOT NULL
    ),
    curve AS (
      SELECT position,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS impressions,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS clicks
      FROM ranked GROUP BY position
    )
    SELECT position, impressions, clicks,
           ROUND(CAST(clicks AS DOUBLE) / impressions, 6) AS ctr,
           ROUND(CAST(SUM(clicks) OVER (ORDER BY position
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS DOUBLE)
                 / SUM(clicks) OVER (), 6) AS cum_click_share
    FROM curve
    """,
)
def q_search_ctr_position(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CTR-by-position curve — the signature Search-Console metric of
    the reference's domain (per-position impressions, clicks, CTR,
    and cumulative click share: the decay curve showing how much
    traffic each SERP rank captures).  The fixture has no GSC table,
    so the rank is derived deterministically from the event payload
    (``k % 10 + 1``) with views as impressions and clicks as clicks —
    identical derivation in both engines, so the curve is value-hash
    exact.

    Scale shape: scan-side JSON extract (JVM ``get_json_object``, no
    UDF) + one partial-agg shuffle on 10 position keys; the window
    pass runs over the 10-row curve, not the events.  CTR and the
    share divide AFTER integer aggregation (exact counts, one rounded
    division per output row).
    """
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click")
    )
    pos = (
        F.get_json_object("props", "$.k").cast("int") % 10 + 1
    ).alias("position")
    # Null guard (round-2 advisor): an event without props.$.k would
    # yield a NULL position, and the cumulative window diverges between
    # engines (Spark windows order NULLS FIRST ascending, DuckDB NULLS
    # LAST).  Filter nulls identically on both sides before the agg.
    curve = (
        ev.select(pos, "event_type")
        .filter(F.col("position").isNotNull())
        .groupBy("position")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("impressions"),
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("clicks"),
        )
    )
    from pyspark.sql import Window as W

    cum = W.orderBy("position").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return curve.select(
        "position",
        "impressions",
        "clicks",
        F.round(
            F.col("clicks").cast("double") / F.col("impressions"), 6
        ).alias("ctr"),
        F.round(
            F.sum("clicks").over(cum).cast("double")
            / F.sum("clicks").over(
                W.orderBy(F.lit(1)).rowsBetween(
                    W.unboundedPreceding, W.unboundedFollowing
                )
            ),
            6,
        ).alias("cum_click_share"),
    )


@register(
    "q_search_query_report",
    oracle="""
    WITH base AS (
      SELECT (CAST(json_extract(props, '$.k') AS INTEGER) % 50)
               AS query_id,
             ((CAST(json_extract(props, '$.k') AS INTEGER) % 10) + 1)
               AS position,
             event_type
      FROM events
      WHERE event_type IN ('view', 'click')
        AND json_extract(props, '$.k') IS NOT NULL
    )
    SELECT query_id,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS impressions,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS clicks,
           ROUND(CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                          END) AS DOUBLE)
                 / NULLIF(SUM(CASE WHEN event_type = 'view' THEN 1
                              ELSE 0 END), 0), 6) AS ctr,
           ROUND(CAST(SUM(CASE WHEN event_type = 'view' THEN position
                          ELSE 0 END) AS DOUBLE)
                 / NULLIF(SUM(CASE WHEN event_type = 'view' THEN 1
                              ELSE 0 END), 0), 6) AS avg_position
    FROM base
    GROUP BY query_id
    """,
)
def q_search_query_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Search-Console query report — per-query impressions,
    clicks, CTR, and impression-weighted average position: the exact
    table the reference's ingest stage pulls from the GSC API per
    (date, query) before any model sees it.  The fixture has no GSC
    table, so query_id and position are derived deterministically
    from the event payload (``k % 50`` / ``k % 10 + 1``) with views
    as impressions — identical derivation in both engines.

    Scale shape: scan-side JSON extract (JVM ``get_json_object``, no
    UDF), single partial-agg shuffle on 50 query keys; the two
    divisions happen AFTER integer aggregation (exact counts, two
    rounded divides per output row).  Zero-impression groups yield
    NULL ctr/avg_position in both engines (when-guard ↔ NULLIF).
    """
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click")
    )
    k = F.get_json_object("props", "$.k").cast("int")
    base = ev.select(
        (k % 50).alias("query_id"),
        (k % 10 + 1).alias("position"),
        "event_type",
    ).filter(F.col("query_id").isNotNull())
    is_view = F.when(F.col("event_type") == "view", 1).otherwise(0)
    is_click = F.when(F.col("event_type") == "click", 1).otherwise(0)
    agg = base.groupBy("query_id").agg(
        F.sum(is_view).cast("bigint").alias("impressions"),
        F.sum(is_click).cast("bigint").alias("clicks"),
        F.sum(is_view * F.col("position"))
        .cast("bigint")
        .alias("pos_sum"),
    )
    imp_nz = F.when(
        F.col("impressions") > 0, F.col("impressions").cast("double")
    )  # NULL when 0 impressions — mirrors the oracle's NULLIF
    return agg.select(
        "query_id",
        "impressions",
        "clicks",
        F.round(F.col("clicks").cast("double") / imp_nz, 6).alias("ctr"),
        F.round(F.col("pos_sum").cast("double") / imp_nz, 6).alias(
            "avg_position"
        ),
    )


@register(
    "q_search_cannibalization",
    oracle="""
    WITH per_page AS (
      SELECT (CAST(json_extract(props, '$.k') AS INTEGER) % 50)
               AS query_id,
             (user_id % 20) AS page_id,
             CAST(COUNT(*) AS BIGINT) AS clicks
      FROM events
      WHERE event_type = 'click'
        AND json_extract(props, '$.k') IS NOT NULL
      GROUP BY 1, 2
    ),
    shares AS (
      SELECT query_id, page_id, clicks,
             CAST(clicks AS DOUBLE)
               / SUM(clicks) OVER (PARTITION BY query_id) AS share
      FROM per_page
    )
    SELECT query_id,
           CAST(COUNT(*) AS BIGINT) AS n_pages,
           CAST(SUM(clicks) AS BIGINT) AS total_clicks,
           ROUND(MAX(share), 6) AS top_page_share,
           CAST(SUM(CASE WHEN share >= 0.2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_competing
    FROM shares
    GROUP BY query_id
    """,
)
def q_search_cannibalization(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Keyword cannibalization audit — for each query, how many pages
    split its clicks and how concentrated the winner is.  Queries
    with several pages each holding a meaningful click share
    (``n_competing >= 2``) are the classic SEO cannibalization
    signal the reference's domain cares about.  page_id is derived
    deterministically (``user_id % 20``) since the fixture carries no
    page URL.

    Scale shape: one shuffle keyed on (query_id, page_id) for the
    count, then the share window and the final rollup both run keyed
    on query_id — Spark reuses the hash partitioning (subset-key
    clustering), so the whole query is two exchanges end-to-end and
    per-key window state is bounded by pages-per-query (≤20 here,
    site-page-count at real scale).  The 0.2 boundary compares
    IEEE-identical doubles (exact integer counts divided once) in
    both engines.
    """
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    )
    k = F.get_json_object("props", "$.k").cast("int")
    per_page = (
        ev.select(
            (k % 50).alias("query_id"),
            (F.col("user_id") % 20).alias("page_id"),
        )
        .filter(F.col("query_id").isNotNull())
        .groupBy("query_id", "page_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("clicks"))
    )
    from pyspark.sql import Window as W

    tot = W.partitionBy("query_id")
    shares = per_page.withColumn(
        "share",
        F.col("clicks").cast("double") / F.sum("clicks").over(tot),
    )
    return shares.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pages"),
        F.sum("clicks").cast("bigint").alias("total_clicks"),
        F.round(F.max("share"), 6).alias("top_page_share"),
        F.sum(F.when(F.col("share") >= 0.2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_competing"),
    )


@register(
    "q_search_position_drift",
    oracle="""
    WITH weekly AS (
      SELECT (CAST(json_extract(props, '$.k') AS INTEGER) % 50)
               AS query_id,
             CAST(date_trunc('week', ts) AS DATE) AS week,
             CAST(SUM((CAST(json_extract(props, '$.k') AS INTEGER)
                       % 10) + 1) AS BIGINT) AS pos_sum,
             CAST(COUNT(*) AS BIGINT) AS impressions
      FROM events
      WHERE event_type = 'view'
        AND json_extract(props, '$.k') IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT query_id, week,
           ROUND(CAST(pos_sum AS DOUBLE) / impressions, 6)
             AS avg_position,
           ROUND(CAST(pos_sum AS DOUBLE) / impressions
                 - LAG(CAST(pos_sum AS DOUBLE) / impressions) OVER (
                     PARTITION BY query_id ORDER BY week), 6)
             AS drift
    FROM weekly
    """,
)
def q_search_position_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Week-over-week ranking drift per query — the trend signal the
    reference's intent models consume (a query whose average position
    decays week over week is losing the SERP).  Positive drift =
    rank number grew = ranking worsened.

    Scale shape: partial-agg shuffle on (query_id, week) — integer
    pos_sum/count merge map-side — then the lag window runs over the
    tiny weekly aggregate (50 queries × weeks), not the events.  The
    division happens after exact integer aggregation in both engines,
    so drift is IEEE-identical and survives the driver's value hash.
    """
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "view"
    )
    k = F.get_json_object("props", "$.k").cast("int")
    weekly = (
        ev.select(
            (k % 50).alias("query_id"),
            F.date_trunc("week", "ts").cast("date").alias("week"),
            (k % 10 + 1).alias("position"),
        )
        .filter(F.col("query_id").isNotNull())
        .groupBy("query_id", "week")
        .agg(
            F.sum("position").cast("bigint").alias("pos_sum"),
            F.count(F.lit(1)).cast("bigint").alias("impressions"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy("week")
    avg_pos = F.col("pos_sum").cast("double") / F.col("impressions")
    return weekly.select(
        "query_id",
        "week",
        F.round(avg_pos, 6).alias("avg_position"),
        F.round(avg_pos - F.lag(avg_pos).over(w), 6).alias("drift"),
    )


@register(
    "q_events_sequence_pattern",
    oracle="""
    WITH coded AS (
      SELECT user_id,
             string_agg(substring(event_type, 1, 1), ''
                        ORDER BY ts, event_id) AS seq
      FROM events
      GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(seq) AS BIGINT) AS seq_len,
           CAST(len(regexp_extract_all(seq, 'c[^p]*p')) AS BIGINT)
             AS n_click_to_purchase,
           CAST(len(regexp_extract_all(seq, 'ee+')) AS BIGINT)
             AS n_error_bursts
    FROM coded
    """,
)
def q_events_sequence_pattern(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sequence-pattern mining (MATCH_RECOGNIZE-style, expressed
    relationally): each user's ordered event history is encoded as a
    character string (first letter of event_type, order pinned by
    (ts, event_id)), then behavioural motifs are counted with regex —
    'c[^p]*p' = a click eventually converting with no purchase in
    between (the non-greedy funnel unit), 'ee+' = consecutive-error
    bursts.  The encode-then-regex trick turns arbitrary
    order-sensitive sequence patterns into one groupBy + two codegen
    expressions — no UDF, no self-join, no iteration, and the regex
    state machine is O(sequence length) per user, the same bound a
    native MATCH_RECOGNIZE engine gives.  Each user's string is bounded
    by their event count; the shuffle is the one groupBy on user_id.
    """
    ev = table(spark, sf_dir, "events")
    coded = ev.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "ts",
                        "event_id",
                        F.substring("event_type", 1, 1).alias("c"),
                    )
                )
            ).getField("c"),
        ).alias("seq")
    )
    return coded.select(
        "user_id",
        F.length("seq").cast("bigint").alias("seq_len"),
        F.regexp_count("seq", F.lit("c[^p]*p"))
        .cast("bigint")
        .alias("n_click_to_purchase"),
        F.regexp_count("seq", F.lit("ee+"))
        .cast("bigint")
        .alias("n_error_bursts"),
    )
