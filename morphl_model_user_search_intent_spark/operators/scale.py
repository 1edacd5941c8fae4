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

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import lsum, units
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
    "q_split_assign",
    oracle="""
    WITH h AS (
      SELECT l_returnflag, l_quantity,
             ((l_orderkey % 1000000) * 2654435761
              + l_linenumber * 7919) % 4294967296 AS hv
      FROM lineitem
    )
    SELECT CASE WHEN hv < 3435973836 THEN 'train'
                WHEN hv < 3865470565 THEN 'val'
                ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty
    FROM h
    GROUP BY 1
    """,
)
def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split assignment (80/10/10) via a
    Knuth multiplicative hash of the row's natural key — the
    reproducible-sampling primitive a training-data pipeline needs.

    ``df.sample``/``randomSplit`` are seed-dependent AND
    partition-layout-dependent: repartition the input and the split
    membership changes.  Hashing the natural key is stable across
    engines, runs, partitionings, and incremental re-ingests (a row's
    split never changes when new data arrives) — which is why the
    exact same arithmetic runs in DuckDB and hash-matches.  The
    modulus keeps every intermediate below 2^52, exact in both
    engines' BIGINT (and even in doubles).

    Thresholds: 0.8 * 2^32 = 3435973836.8 → floor; 0.9 * 2^32 =
    3865470566.4 → floor.
    """
    li = table(spark, sf_dir, "lineitem")
    hv = (
        (F.col("l_orderkey") % 1_000_000) * F.lit(2654435761)
        + F.col("l_linenumber") * 7919
    ) % F.lit(4294967296)
    split = (
        F.when(hv < 3435973836, "train")
        .when(hv < 3865470565, "val")
        .otherwise("test")
    )
    return (
        li.groupBy(split.alias("split"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(27,6)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


N_JOIN_SALT = 8


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    unique_col: str,
    n: int = N_JOIN_SALT,
) -> DataFrame:
    """Skew-proof equi-join: shard the big side's hot keys n ways and
    replicate the small side once per shard, so no single task owns a
    whole hot key.

    Use when the small side is too big to broadcast AND the big side's
    join key is skewed beyond what AQE's split threshold handles (AQE
    splits a skewed partition, but every split still re-reads the same
    unsplittable small-side partition).  The salt is a deterministic
    hash of ``unique_col`` (not ``rand()``) so speculative/retried
    tasks route rows identically.  Cost: small side × n.
    """
    big_s = big.withColumn(
        "_jsalt", F.pmod(F.xxhash64(unique_col), F.lit(n)).cast("int")
    )
    small_s = small.withColumn(
        "_jsalt", F.explode(F.array(*[F.lit(i) for i in range(n)]))
    )
    return big_s.join(small_s, [key, "_jsalt"]).drop("_jsalt")


@register(
    "q_join_salted",
    oracle="""
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(e.value * w.weight AS DECIMAL(27,6)))
                AS DOUBLE) AS weighted_value
    FROM events e
    JOIN (VALUES ('click', 0.5), ('view', 0.1), ('purchase', 5.0),
                 ('signup', 2.0), ('error', 0.0)) AS w(event_type, weight)
      ON e.event_type = w.event_type
    GROUP BY e.event_type
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join demonstrated on the textbook skew shape: a 100k-row
    fact whose join key has FIVE distinct values (event_type) joined
    to a per-type weight table.

    A plain shuffle join puts ~20% of the fact table on each of 5
    reducers no matter how many executors exist; :func:`salted_join`
    spreads each type over 8 shards (40 evenly-loaded tasks).  The
    ``merge`` hint forces the shuffle path — at fixture scale Catalyst
    would broadcast the 5-row side, which is the right plan when the
    small side fits; salting is the documented fallback when it does
    not.  Result is bit-identical to the unsalted join (the oracle).
    """
    ev = table(spark, sf_dir, "events")
    weights = spark.createDataFrame(
        [
            ("click", 0.5),
            ("view", 0.1),
            ("purchase", 5.0),
            ("signup", 2.0),
            ("error", 0.0),
        ],
        "event_type string, weight double",
    ).hint("merge")
    joined = salted_join(ev, weights, "event_type", "event_id")
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("value") * F.col("weight")).cast("decimal(27,6)"))
        .cast("double")
        .alias("weighted_value"),
    )


@register(
    "q_sink_partitioned",
    oracle="""
    SELECT CAST(ts AS DATE) AS event_date, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-12'
    GROUP BY 1, 2
    """,
)
def q_sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-partitioned Parquet sink + partition-pruned read-back —
    the storage layout the 100 TB events table actually uses
    (SURVEY.md §4: partition events by date; Cassandra's date-keyed
    rows re-expressed as Hive-style partitions).

    Writes events once as ``event_date=YYYY-MM-DD/`` directories under
    scratch, then reads back with a 3-day filter: the filter binds to
    partition VALUES (directory pruning — ``PartitionFilters`` in the
    plan, gated in tests/test_plans.py), so the scan touches 3 of 30
    directories and the other 90% of the data is never opened.  The
    oracle aggregates the original un-partitioned parquet: the
    round-trip through the partitioned layout must be lossless.
    """
    import os

    from ..sources.formats import SCRATCH, _tag

    path = os.path.join(SCRATCH, f"part-events-{_tag(sf_dir)}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            table(spark, sf_dir, "events")
            .withColumn("event_date", F.col("ts").cast("date"))
            .write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(path)
        )
    back = spark.read.parquet(path).filter(
        F.col("event_date").between("2024-01-10", "2024-01-12")
    )
    return back.groupBy("event_date", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(27,6)"))
        .cast("double")
        .alias("total_value"),
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


@register(
    "q_merge_upsert",
    oracle="""
    WITH upd AS (
      SELECT o_orderkey, o_orderpriority,
             o_totalprice * 1.1 AS new_price
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey + 10000000, 'NEW-ROW',
             o_totalprice * 0.5
      FROM orders WHERE o_orderkey % 1000 = 0
    )
    SELECT COALESCE(u.o_orderkey, b.o_orderkey) AS o_orderkey,
           COALESCE(u.o_orderpriority, b.o_orderpriority) AS o_orderpriority,
           CAST(COALESCE(u.new_price, b.o_totalprice) AS DOUBLE) AS price
    FROM orders b
    FULL JOIN upd u ON b.o_orderkey = u.o_orderkey
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert semantics (update-matched + insert-unmatched) as a
    full outer join + COALESCE — the Spark-native stand-in for the
    reference's Cassandra feature write-back, where every write IS an
    upsert (SURVEY.md §3.1 stage 2: computed features upserted by
    key).

    The updates side is derived deterministically from the base (every
    7th key re-priced, every 1000th key inserted as a new row) so the
    operator is fully oracle-checked.  Shape: one shuffle on the merge
    key for each side; at scale the base side keeps its bucketed
    layout (q_join_bucketed) so only the delta shuffles — the
    classic incremental-upsert plan.  The single multiply per row is
    IEEE-deterministic cross-engine (no reassociation), so no decimal
    discipline is needed.
    """
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    upd = (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            F.col("o_orderkey").alias("u_key"),
            F.col("o_orderpriority").alias("u_prio"),
            (F.col("o_totalprice") * 1.1).alias("new_price"),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 1000 == 0).select(
                (F.col("o_orderkey") + 10_000_000).alias("u_key"),
                F.lit("NEW-ROW").alias("u_prio"),
                (F.col("o_totalprice") * 0.5).alias("new_price"),
            )
        )
    )
    return (
        o.join(upd, o.o_orderkey == upd.u_key, "full")
        .select(
            F.coalesce("u_key", "o_orderkey").alias("o_orderkey"),
            F.coalesce("u_prio", "o_orderpriority").alias(
                "o_orderpriority"
            ),
            F.coalesce("new_price", "o_totalprice")
            .cast("double")
            .alias("price"),
        )
    )


@register(
    "q_sink_sorted",
    oracle="""
    SELECT CAST(l_shipdate AS DATE) AS ship_day,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-06-01'
      AND l_shipdate <  TIMESTAMP '1995-07-01'
    GROUP BY 1
    """,
)
def q_sink_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-clustered Parquet layout: lineitem range-partitioned AND
    sorted by ship date, then read back with a one-month filter.

    ``repartitionByRange(shipdate).sortWithinPartitions(shipdate)``
    gives every output file a narrow min/max shipdate span, so the
    pushed-down filter (verified in PushedFilters) lets the Parquet
    reader skip whole files/row-groups on footer stats — the
    time-series clustering that turns a 100 TB scan into a
    read-only-June scan without Hive partitioning's directory
    explosion (complementary to q_sink_partitioned's date dirs:
    cluster WITHIN coarser partitions).  Oracle aggregates the
    original table — the re-layout must be lossless.
    """
    import os

    from ..sources.formats import SCRATCH, _tag

    path = os.path.join(SCRATCH, f"sorted-lineitem-{_tag(sf_dir)}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            table(spark, sf_dir, "lineitem")
            .select("l_shipdate", "l_quantity")
            .repartitionByRange(8, "l_shipdate")
            .sortWithinPartitions("l_shipdate")
            .write.mode("overwrite")
            .parquet(path)
        )
    back = spark.read.parquet(path).filter(
        (F.col("l_shipdate") >= F.lit("1995-06-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1995-07-01").cast("timestamp_ntz"))
    )
    return back.groupBy(
        F.col("l_shipdate").cast("date").alias("ship_day")
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(27,6)"))
        .cast("double")
        .alias("sum_qty"),
    )


@register(
    "q_sample_stratified",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM (
      SELECT lang, n_chars,
             (doc_id * 2654435761) % 4294967296 AS hv
      FROM documents
    )
    WHERE hv < CASE lang
      WHEN 'en' THEN 4294967296
      WHEN 'de' THEN 2147483648
      WHEN 'es' THEN 1073741824
      WHEN 'fr' THEN  536870912
      ELSE            268435456 END
    GROUP BY lang
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling — the training-data *mixture*
    primitive: keep 100% of `en`, 50% `de`, 25% `es`, 12.5% `fr`,
    6.25% `zh` documents.

    ``sampleBy`` uses ``rand()`` (retried tasks resample → flaky at
    scale); instead the keep/drop decision is a pure function of the
    row key — Knuth multiplicative hash of ``doc_id`` compared to a
    per-stratum threshold in [0, 2^32).  Embarrassingly parallel: a
    scan-local filter, no shuffle, no driver state, reproducible
    across retries/speculation/engines — which is why the same
    arithmetic runs verbatim as the DuckDB oracle.
    """
    rate_threshold = {
        "en": 4294967296,
        "de": 2147483648,
        "es": 1073741824,
        "fr": 536870912,
        "zh": 268435456,
    }
    d = table(spark, sf_dir, "documents")
    thr = F.when(F.col("lang") == "en", F.lit(rate_threshold["en"]))
    for lang in ("de", "es", "fr"):
        thr = thr.when(F.col("lang") == lang, F.lit(rate_threshold[lang]))
    thr = thr.otherwise(F.lit(rate_threshold["zh"]))
    hv = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(4294967296))
    return (
        d.filter(hv < thr)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


@register(
    "q_scd2_intervals",
    oracle="""
    WITH changes AS (
      SELECT user_id, event_type, ts, event_id
      FROM (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      )
      WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, event_type,
           ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           CAST(row_number() OVER w AS BIGINT) AS version,
           (lead(ts) OVER w IS NULL) AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-log → SCD type-2 dimension: compact each user's event
    stream to the rows where ``event_type`` actually changed, then
    emit versioned validity intervals (valid_from / valid_to /
    version / is_current) — the warehouse pattern for tracking
    attribute history (the reference family's per-user behavioral
    state in Cassandra, re-expressed as an auditable interval table).

    Two window passes over the SAME (user_id, ts, event_id)
    partitioning+ordering: lag() marks changes, lead()+row_number()
    build intervals over the survivors — one shuffle total, Spark
    reuses the sort for both windows and the deterministic event_id
    tie-break keeps both engines identical.  At 100 TB the pattern
    holds: state per user is one sort run, no driver involvement.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = table(spark, sf_dir, "events")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select("user_id", "event_type", "ts", "event_id")
    )
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).cast("bigint").alias("version"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


def zorder_key(x, y, bits: int = 16):
    """Morton (Z-order) interleave of two ``bits``-bit columns.

    Bit i of x lands at position 2i, bit i of y at 2i+1 — pure
    shift/mask arithmetic that whole-stage codegen compiles to
    branch-free longs (no UDF).
    """
    z = F.lit(0)
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


@register(
    "q_sink_zorder",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           (SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0)
             AS sum_price
    FROM orders
    WHERE o_custkey % 16 = 3
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def q_sink_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order-clustered Parquet layout: orders laid out along a
    Morton curve over (custkey, order day), then read back with a
    two-dimensional filter.

    Range-partitioning on ONE key (q_sink_sorted) only prunes filters
    on that key; interleaving the bits of both keys gives every file
    a tight min/max box in BOTH dimensions, so customer-slice AND
    date-slice scans each skip most row groups — the standard
    multi-dimensional clustering for a 100 TB fact table queried
    along more than one axis.  The z-value is layout-only (dropped
    after write); the oracle aggregates the ORIGINAL table, so the
    re-layout must be lossless.
    """
    import os

    from ..sources.formats import SCRATCH, _tag

    path = os.path.join(SCRATCH, f"zorder-orders-{_tag(sf_dir)}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        o = table(spark, sf_dir, "orders")
        day = F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).cast("bigint")
        zval = zorder_key(
            F.pmod(F.col("o_custkey"), F.lit(65536)),
            F.pmod(day, F.lit(65536)),
        )
        (
            o.withColumn("_z", zval)
            .repartitionByRange(8, "_z")
            .sortWithinPartitions("_z")
            .drop("_z")
            .write.mode("overwrite")
            .parquet(path)
        )
    back = spark.read.parquet(path).filter(
        (F.pmod(F.col("o_custkey"), F.lit(16)) == 3)
        & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    return back.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        lsum(units("o_totalprice", 100), 100, "sum_price"),
    )


@register(
    "q_agg_incremental",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           (SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0)
             AS sum_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_agg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance (materialized-view refresh):
    a persisted partial-state table for the history (orders before
    1999) is combined with a freshly-computed delta (1999 onward) —
    and must equal the full recompute, which is the oracle.

    The state rows are ALGEBRAIC partials (count, exact unit sum) —
    mergeable by addition, so refresh cost is O(delta + |groups|),
    never a rescan of history.  This is the 100 TB daily-refresh
    pattern: yesterday's state + today's partition, with the
    finalization (one division) applied only at read time.  The
    scaled-long discipline makes the merge exact: long + long carries
    no float error regardless of merge order.
    """
    import os

    from ..sources.formats import SCRATCH, _tag

    cut = F.lit("1999-01-01").cast("timestamp_ntz")
    o = table(spark, sf_dir, "orders")
    path = os.path.join(SCRATCH, f"aggstate-orders-{_tag(sf_dir)}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            o.filter(F.col("o_orderdate") < cut)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(units("o_totalprice", 100)).alias("price_units"),
            )
            .write.mode("overwrite")
            .parquet(path)
        )
    state = spark.read.parquet(path)
    delta = (
        o.filter(F.col("o_orderdate") >= cut)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(units("o_totalprice", 100)).alias("price_units"),
        )
    )
    return (
        state.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n").alias("n_orders"),
            (F.sum("price_units") / F.lit(100.0)).alias("sum_price"),
        )
    )


@register(
    "q_sample_pergroup",
    oracle="""
    SELECT source, doc_id, lang, n_chars FROM (
      SELECT source, doc_id, lang, n_chars,
             row_number() OVER (
               PARTITION BY source
               ORDER BY (doc_id * 2654435761) % 4294967296, doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= 3
    """,
)
def q_sample_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sampling: 3 pseudo-random documents
    from every source — the eval-set / spot-check primitive (pull a
    stable handful of examples per corpus slice for human review).

    Ordering by a multiplicative hash of the key gives a uniform
    shuffle of each group that is reproducible across runs, engines,
    and partitionings (unlike rand() or a per-partition take).  The
    rank-k filter uses the same WindowGroupLimit push-down as
    q_win_topk: each partition keeps ≤ k rows per group before the
    shuffle, so the window never materializes whole groups at scale.
    """
    d = table(spark, sf_dir, "documents")
    hv = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(4294967296))
    w = Window.partitionBy("source").orderBy(hv, "doc_id")
    return (
        d.select("source", "doc_id", "lang", "n_chars")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@register("q_profile_skew", oracle=None)
def q_profile_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-balance diagnostic: row counts per physical partition
    after hash-repartitioning lineitem 32 ways on its join key —
    the check run before committing to a partitioning strategy at
    scale (a hot key shows up as one oversized partition here long
    before it shows up as a straggler task on the cluster).

    Rows-only (partition layout is engine/config-specific by nature);
    the pytest gate asserts conservation (counts sum to the table
    total) and balance (max/min within a small factor for a
    well-hashed key).
    """
    li = table(spark, sf_dir, "lineitem").repartition(32, "l_orderkey")
    return (
        li.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@register(
    "q_sink_compact",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           (SUM(CAST(round(l_quantity) AS BIGINT)) / 1.0) AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_sink_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction: a deliberately over-partitioned copy of
    lineitem (64 files) is rewritten into a handful of right-sized
    files, then aggregated — the table-maintenance job every
    streaming/incremental sink needs (micro-batches produce small
    files; scans pay per-file open + listing cost until compaction).

    ``coalesce`` (not ``repartition``) does the rewrite without a
    shuffle: readers merge input splits.  At scale the target file
    count comes from bytes/target_size; the pytest gate checks the
    file count actually dropped and the oracle (original table)
    proves losslessness.
    """
    import os

    from ..sources.formats import SCRATCH, _tag

    small = os.path.join(SCRATCH, f"small-files-{_tag(sf_dir)}")
    compact = os.path.join(SCRATCH, f"compacted-{_tag(sf_dir)}")
    if not os.path.exists(os.path.join(small, "_SUCCESS")):
        (
            table(spark, sf_dir, "lineitem")
            .select("l_returnflag", "l_quantity")
            .repartition(64)
            .write.mode("overwrite")
            .parquet(small)
        )
    if not os.path.exists(os.path.join(compact, "_SUCCESS")):
        (
            spark.read.parquet(small)
            .coalesce(2)
            .write.mode("overwrite")
            .parquet(compact)
        )
    return (
        spark.read.parquet(compact)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (F.sum(units("l_quantity", 1)) / F.lit(1.0)).alias("sum_qty"),
        )
    )


@register(
    "q_join_dpp",
    oracle="""
    WITH d AS (SELECT DISTINCT CAST(ts AS DATE) AS event_date
               FROM events),
    mondays AS (
      SELECT event_date FROM d
      WHERE (date_diff('day', DATE '2024-01-01', event_date) % 7) = 0
    )
    SELECT e.event_date, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(27,6))) AS DOUBLE)
             AS total_value
    FROM (SELECT CAST(ts AS DATE) AS event_date, value FROM events) e
    JOIN mondays m ON e.event_date = m.event_date
    GROUP BY e.event_date
    """,
)
def q_join_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: fact side is the date-partitioned
    events layout (q_sink_partitioned's directories), dim side is a
    filtered date dimension (Mondays) joined on the partition column.
    The filter is only known at runtime through the join, so static
    pruning can't help — Catalyst instead broadcasts the dim, builds
    the in-list of surviving dates, and injects it into the fact
    scan's PartitionFilters (``dynamicpruningexpression`` in the
    plan, gated in tests/test_plans.py).  At 100 TB this is the
    difference between scanning 30 days and scanning the 4 the dim
    selects — the core mechanism behind star-schema date filtering.

    Weekday comes from portable day arithmetic (2024-01-01 is a
    Monday), not engine locale; the oracle replays the same join on
    the un-partitioned table, proving the pruned scan is lossless.
    """
    import os

    from ..sources.formats import SCRATCH, _tag

    path = os.path.join(SCRATCH, f"part-events-{_tag(sf_dir)}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            table(spark, sf_dir, "events")
            .withColumn("event_date", F.col("ts").cast("date"))
            .write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(path)
        )
    fact = spark.read.parquet(path)
    dim = (
        table(spark, sf_dir, "events")
        .select(F.col("ts").cast("date").alias("event_date"))
        .distinct()
        .filter(
            F.datediff(F.col("event_date"), F.lit("2024-01-01")) % 7 == 0
        )
    )
    return (
        fact.join(F.broadcast(dim), "event_date")
        .groupBy("event_date")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(27,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )


@register(
    "q_join_range_bucketed",
    oracle="""
    WITH b AS (SELECT date_trunc('hour', MIN(ts)) AS lo FROM events),
    c AS (
      SELECT i AS campaign_id,
             lo + INTERVAL (i * 33) HOUR AS c_start,
             lo + INTERVAL (i * 33 + 24) HOUR AS c_end
      FROM b, (SELECT UNNEST(generate_series(0, 19)) AS i)
    )
    SELECT c.campaign_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM c JOIN events e
      ON e.ts >= c.c_start AND e.ts < c.c_end
    GROUP BY c.campaign_id
    """,
)
def q_join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed interval join — the 100 TB spelling of "events within
    campaign windows".  A pure range predicate forces a nested-loop
    plan (every event × every campaign); bucketing by day converts it
    to an equi join: campaigns explode into the day buckets they
    overlap (≤2 each), events carry their own day, the join runs as a
    hash join on the bucket, and the original BETWEEN survives as a
    cheap residual filter.  Work scales with |overlapping pairs|, not
    |events|·|campaigns| — the plan gate asserts no NestedLoop
    remains.

    The 20 overlapping 24 h campaign windows derive deterministically
    from the data's min hour (spaced 33 h), so both engines join
    identical intervals; the oracle runs the naive theta join,
    proving bucket+residual is lossless.
    """
    ev = table(spark, sf_dir, "events")
    bounds = ev.agg(F.date_trunc("hour", F.min("ts")).alias("lo"))
    c = (
        bounds.select(
            F.explode(F.sequence(F.lit(0), F.lit(19))).alias("i"), "lo"
        )
        .select(
            F.col("i").alias("campaign_id"),
            F.expr("timestampadd(HOUR, i * 33, lo)").alias("c_start"),
            F.expr("timestampadd(HOUR, i * 33 + 24, lo)").alias("c_end"),
        )
    )
    cb = c.select(
        "*",
        F.explode(
            F.sequence(
                F.date_trunc("day", "c_start"),
                F.date_trunc(
                    "day", F.expr("c_end - interval 1 microsecond")
                ),
                F.expr("interval 1 day"),
            )
        ).alias("bucket"),
    )
    eb = ev.select(
        "ts", "user_id", F.date_trunc("day", "ts").alias("bucket")
    )
    return (
        eb.join(
            F.broadcast(cb),
            (eb.bucket == cb.bucket)
            & (eb.ts >= cb.c_start)
            & (eb.ts < cb.c_end),
        )
        .groupBy("campaign_id")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "q_join_pit",
    oracle="""
    WITH nonp AS (
      SELECT user_id, event_type, ts, event_id FROM events
      WHERE event_type <> 'purchase'
    ),
    changes AS (
      SELECT user_id, event_type, ts, event_id
      FROM (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER w AS prev_type
        FROM nonp
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      )
      WHERE prev_type IS NULL OR event_type <> prev_type
    ),
    dim AS (
      SELECT user_id, event_type AS state,
             ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to
      FROM changes
    ),
    facts AS (
      SELECT user_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    )
    SELECT d.state,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           SUM(f.cents) / 100.0 AS revenue
    FROM facts f JOIN dim d
      ON d.user_id = f.user_id
     AND f.ts >= d.valid_from
     AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    GROUP BY d.state
    """,
)
def q_join_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension join: each purchase looked up against
    the SCD2 state interval (q_scd2_intervals' machinery over the
    NON-purchase activity stream — the purchase can't be its own
    state) that was valid AT THE PURCHASE'S OWN TIMESTAMP — the leakage-free feature
    lookup ML training pipelines must use instead of joining today's
    dimension onto yesterday's facts.

    Equi-join on the entity key with the validity window as a
    residual predicate — each fact matches exactly one version, so
    the join output equals the fact count (the PIT invariant; the
    oracle proves it).  Per-user version lists are short, so the
    residual scan is bounded; at extreme version counts the bucketed
    range-join machinery (q_join_range_bucketed) applies unchanged.
    """
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nonp = ev.filter(F.col("event_type") != "purchase")
    changes = (
        nonp.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select("user_id", "event_type", "ts", "event_id")
    )
    dim = changes.select(
        F.col("user_id").alias("d_user"),
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    return (
        facts.join(
            dim,
            (facts.user_id == dim.d_user)
            & (facts.ts >= dim.valid_from)
            & (dim.valid_to.isNull() | (facts.ts < dim.valid_to)),
        )
        .groupBy("state")
        .agg(
            F.count("*").alias("n_purchases"),
            (F.sum("cents") / 100.0).alias("revenue"),
        )
    )


@register(
    "q_merge_cdc",
    oracle="""
    WITH cdc AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 11 = 0 THEN 'D'
                  WHEN o_orderkey % 7 = 0 THEN 'U'
                  ELSE 'I' END AS op,
             o_totalprice * 1.05 AS new_price
      FROM orders
      WHERE o_orderkey % 11 = 0 OR o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey + 20000000, 'I', o_totalprice * 0.25
      FROM orders WHERE o_orderkey % 500 = 0
    ),
    merged AS (
      SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
             CASE
               WHEN c.op = 'D' THEN NULL
               WHEN c.op IS NOT NULL THEN
                 CAST(c.new_price AS DOUBLE)
               ELSE CAST(b.o_totalprice AS DOUBLE)
             END AS price,
             c.op
      FROM orders b
      FULL JOIN cdc c ON b.o_orderkey = c.o_orderkey
    )
    SELECT
      CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_base,
      CAST(SUM(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT)
        AS n_deleted,
      CAST(SUM(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT)
        AS n_updated,
      CAST(SUM(CASE WHEN op = 'I' THEN 1 ELSE 0 END) AS BIGINT)
        AS n_inserted,
      CAST(COUNT(price) AS BIGINT) AS n_final,
      ROUND(CAST(SUM(CAST(ROUND(price * 100) AS BIGINT)) AS DOUBLE)
            / 100.0, 2) AS final_revenue
    FROM merged
    """,
)
def q_merge_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CDC apply — inserts, updates, AND deletes in one merge:
    a deterministic change set (delete every 11th key, update every
    7th, insert shifted keys) applied to the base via full-outer
    join with op-dispatched survivorship; deleted rows drop out of
    the final count and revenue.  This is the Delta/Iceberg
    MERGE WHEN MATCHED DELETE shape expressed in pure DataFrame
    algebra — what q_merge_upsert lacks (no delete arm) and what a
    warehouse sync job actually replays.

    The audit row pins every op count plus the post-merge row count
    and revenue (scaled-long), so a wrong survivorship branch can't
    hide.  One shuffle join on the key; at scale the CDC side is
    the small one and broadcasts.
    """
    o = table(spark, sf_dir, "orders")
    is_d = F.col("o_orderkey") % 11 == 0
    is_u = F.col("o_orderkey") % 7 == 0
    cdc = (
        o.filter(is_d | is_u)
        .select(
            "o_orderkey",
            F.when(is_d, "D").otherwise("U").alias("op"),
            (F.col("o_totalprice") * 1.05).alias("new_price"),
        )
        .unionAll(
            o.filter(F.col("o_orderkey") % 500 == 0).select(
                (F.col("o_orderkey") + 20000000).alias("o_orderkey"),
                F.lit("I").alias("op"),
                (F.col("o_totalprice") * 0.25).alias("new_price"),
            )
        )
    )
    b = o.select(
        F.col("o_orderkey").alias("b_key"), "o_totalprice"
    )
    merged = b.join(
        cdc, b.b_key == cdc.o_orderkey, "full_outer"
    ).select(
        F.when(F.col("op") == "D", F.lit(None).cast("double"))
        .when(
            F.col("op").isNotNull(),
            F.col("new_price").cast("double"),
        )
        .otherwise(F.col("o_totalprice").cast("double"))
        .alias("price"),
        "op",
    )
    n_base = o.count()
    return merged.agg(
        F.lit(n_base).cast("bigint").alias("n_base"),
        F.sum((F.col("op") == "D").cast("int"))
        .cast("bigint")
        .alias("n_deleted"),
        F.sum((F.col("op") == "U").cast("int"))
        .cast("bigint")
        .alias("n_updated"),
        F.sum((F.col("op") == "I").cast("int"))
        .cast("bigint")
        .alias("n_inserted"),
        F.count("price").cast("bigint").alias("n_final"),
        F.round(
            F.sum(
                F.round(F.col("price") * 100).cast("bigint")
            ).cast("double")
            / 100.0,
            2,
        ).alias("final_revenue"),
    )
