"""File-format sources and sinks (SURVEY.md §2.1).

The reference ingests JSON REST payloads and persists to Cassandra
(SURVEY.md §1.1 [K]); here the ingestion formats are demonstrated as
oracle-checked round-trips: write a projection of the fixture data to
CSV / JSON-lines / Parquet under the repo-local scratch dir, read it
back with an explicit schema (never inferSchema in production), and
aggregate — the oracle runs the same aggregate against the original
parquet, so any round-trip corruption breaks the hash.

Cassandra itself is deliberately not ported: partitioned Parquet +
(at 100 TB) date/tenant partition columns is the idiomatic Spark
stand-in (SURVEY.md §2.1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dsum
from ..io import table
from ..registry import register

# Repo-local scratch (gitignored) — the sandbox forbids writes outside
# the repo, and tests/driver runs must not collide.
SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".scratch",
)

_EVENT_COLS_SCHEMA = "event_id bigint, event_type string, k int"


def _event_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-valued projection of events — lossless under text
    round-trips (doubles are kept out deliberately; binary formats
    carry them, text formats here only prove the source machinery)."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


_AGG_ORACLE = """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
"""


def _agg(df: DataFrame) -> DataFrame:
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").alias("sum_k"),
    )


def _tag(sf_dir: str) -> str:
    return os.path.basename(sf_dir.rstrip("/"))


@register("q_source_csv", oracle=_AGG_ORACLE)
def q_source_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source: write → read with explicit schema → aggregate.
    The oracle aggregates the original parquet, so the CSV layer must
    be lossless for the hash to match."""
    path = os.path.join(SCRATCH, f"csv-{_tag(sf_dir)}")
    _event_projection(spark, sf_dir).write.mode("overwrite").option(
        "header", True
    ).csv(path)
    back = spark.read.schema(_EVENT_COLS_SCHEMA).option("header", True).csv(
        path
    )
    return _agg(back)


@register("q_source_json", oracle=_AGG_ORACLE)
def q_source_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source (the reference's API-payload landing format),
    explicit schema, aggregated against the parquet oracle."""
    path = os.path.join(SCRATCH, f"json-{_tag(sf_dir)}")
    _event_projection(spark, sf_dir).write.mode("overwrite").json(path)
    back = spark.read.schema(_EVENT_COLS_SCHEMA).json(path)
    return _agg(back)


@register(
    "q_sink_parquet",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS total
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet sink round-trip: aggregate → write (snappy parquet) →
    read back.  Doubles survive exactly (binary format), so the oracle
    checks the full write→read path bit-for-bit.

    At 100 TB the write would add ``.partitionBy(date_col)`` —
    partition columns are what later enables partition pruning and
    dynamic partition pruning on the read side.
    """
    path = os.path.join(SCRATCH, f"sink-{_tag(sf_dir)}")
    o = table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "total"),
    )
    agg.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


@register(
    "q_source_orc",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           (SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0)
             AS sum_price
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_source_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip: lineitem re-materialized as ORC (zstd), read
    back, aggregated — the second columnar format a warehouse must
    speak (Hive/Trino interchange).  ORC carries the same
    stripe-level min/max statistics and predicate-pushdown contract
    as Parquet, so the scan-side design rules (§2.1) transfer
    unchanged.  The oracle aggregates the ORIGINAL parquet table:
    the format conversion must be lossless.
    """
    import os

    path = os.path.join(SCRATCH, f"orc-lineitem-{_tag(sf_dir)}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            table(spark, sf_dir, "lineitem")
            .select(
                "l_returnflag", "l_linestatus", "l_extendedprice"
            )
            .write.mode("overwrite")
            .option("compression", "zstd")
            .orc(path)
        )
    back = spark.read.orc(path)
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        (
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            / F.lit(100.0)
        ).alias("sum_price"),
    )


@register("q_source_binaryfile", oracle=None)
def q_source_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary ingestion via the ``binaryFile`` source — the
    entry point for multimodal corpora (images/audio land as whole
    files; SURVEY.md §2.11): each file becomes (path, length,
    content: binary) with no decode on read.

    Rows-only (file metadata isn't a DuckDB view); the pytest gate
    checks length == os.path.getsize and content prefix == the real
    bytes.  At scale the reader parallelizes per-file and prunes by
    pathGlobFilter/modifiedAfter — list-then-fetch, never a
    driver-side loop.
    """
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(sf_dir)
    )
    return df.select(
        F.reverse(F.split("path", "/")).getItem(0).alias("file_name"),
        "length",
        F.substring("content", 1, 4).alias("magic"),
    )


@register(
    "q_schema_evolution",
    oracle="""
    WITH merged AS (
      SELECT o_orderkey, o_totalprice,
             CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END
               AS o_orderpriority
      FROM orders
    )
    SELECT COALESCE(o_orderpriority, '<pre-schema>') AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS DOUBLE) / 100.0 AS total_price
    FROM merged GROUP BY 1
    """,
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: an old parquet batch written before a
    column existed (even keys: orderkey+price only) merged with a new
    batch that added ``o_orderpriority`` (odd keys) via
    ``mergeSchema`` — the lakehouse reality that a 100 TB table is
    never rewritten when a column lands, readers must union footers.

    The merged scan yields NULL priority for pre-schema files; the
    aggregate proves the union is lossless (exact cent totals match
    recomputing from the source table).  mergeSchema costs one footer
    read per file at planning time — at scale, keep schema in the
    catalog instead; the read path is identical.
    """
    base = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    p1 = os.path.join(SCRATCH, f"evo-v1-{_tag(sf_dir)}")
    p2 = os.path.join(SCRATCH, f"evo-v2-{_tag(sf_dir)}")
    if not os.path.exists(os.path.join(p1, "_SUCCESS")):
        base.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", "o_totalprice"
        ).write.mode("overwrite").parquet(p1)
    if not os.path.exists(os.path.join(p2, "_SUCCESS")):
        base.filter(F.col("o_orderkey") % 2 == 1).write.mode(
            "overwrite"
        ).parquet(p2)
    merged = spark.read.option("mergeSchema", "true").parquet(p1, p2)
    return merged.groupBy(
        F.coalesce("o_orderpriority", F.lit("<pre-schema>")).alias(
            "priority"
        )
    ).agg(
        F.count("*").alias("n_orders"),
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).cast(
                "double"
            )
            / 100.0
        ).alias("total_price"),
    )


@register("q_meta_skipping", oracle=None)
def q_meta_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-footer data-skipping manifest: write orders range-laid-out
    by order date (8 files), then read back ONLY the Parquet footer
    statistics and decide, per file, whether a 1996–1997 date slice
    could skip it — the metadata index a table format (Delta/Iceberg
    zone maps) maintains, built here from raw Parquet footers.

    The manifest is driver-side by design: footers are a few KB per
    file regardless of data size, which is exactly why min/max
    skipping scales — a 100 TB table's pruning decision reads
    metadata proportional to |files|, not |rows|.  Rows-only check
    (the skip decision depends on physical layout, which SQL over the
    logical table cannot see; q_sink_zorder hash-checks losslessness
    of the re-layout itself).
    """
    import pyarrow.parquet as pq

    path = os.path.join(SCRATCH, f"skipmeta-orders-{_tag(sf_dir)}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        o = table(spark, sf_dir, "orders")
        (
            o.repartitionByRange(8, "o_orderdate")
            .sortWithinPartitions("o_orderdate")
            .write.mode("overwrite")
            .parquet(path)
        )
    lo, hi = "1996-01-01", "1997-12-31"
    rows = []
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, fname)).metadata
        for rg in range(md.num_row_groups):
            grp = md.row_group(rg)
            stats = {
                grp.column(i).path_in_schema: grp.column(i).statistics
                for i in range(grp.num_columns)
            }
            s = stats["o_orderdate"]
            dmin = str(s.min)[:10]
            dmax = str(s.max)[:10]
            rows.append(
                (fname, rg, grp.num_rows, dmin, dmax,
                 dmax < lo or dmin > hi)
            )
    return spark.createDataFrame(
        rows,
        "file string, row_group int, n_rows bigint, "
        "min_orderdate string, max_orderdate string, skippable boolean",
    ).orderBy("file", "row_group")


@register(
    "q_source_csv_malformed",
    oracle="""
    SELECT CAST(6 AS BIGINT) AS n_rows,
           CAST(3 AS BIGINT) AS n_good,
           CAST(3 AS BIGINT) AS n_corrupt,
           CAST(80 AS BIGINT) AS sum_k_good
    """,
)
def q_source_csv_malformed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PERMISSIVE-mode CSV ingestion of a deliberately dirty file:
    well-formed rows parse, malformed rows land in
    ``_corrupt_record`` instead of failing the job — the
    quarantine-don't-crash contract a production ingest layer must
    honor (FAILFAST is one config flip away when the contract is
    strictness instead).

    The dirty file is staged deterministically (fixed literal rows:
    short rows, non-numeric junk, one blank); the query returns the
    good/corrupt split and the sum over successfully-parsed values,
    all of which the pytest gate pins exactly.

    ORACLE-CHECKED (round-7 promotion, golden-value oracle like
    q_json_variant_schema): the staged file is a fixed literal, so
    the correct quarantine split is a constant — 6 physical rows, 3
    parsed, 3 quarantined (junk numeric, short row, free-text line;
    the blank line is skipped by the CSV reader), parsed-value sum
    80.  The corrupt-capture column itself is engine-specific
    machinery, exercised by reaching those constants.
    """
    path = os.path.join(SCRATCH, f"csv-dirty-{_tag(sf_dir)}")
    os.makedirs(path, exist_ok=True)
    fpath = os.path.join(path, "part-0.csv")
    if not os.path.exists(fpath):
        with open(fpath, "w") as fh:
            fh.write(
                "1,click,10\n"
                "2,view,20\n"
                "3,purchase,not_a_number\n"
                "4,signup\n"
                "oops\n"
                "5,error,50\n"
            )
    df = (
        spark.read.schema(
            "event_id BIGINT, event_type STRING, k BIGINT, "
            "_corrupt_record STRING"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
        .cache()
    )
    good = F.col("_corrupt_record").isNull()
    return df.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(good.cast("int")).cast("bigint").alias("n_good"),
        F.sum((~good).cast("int")).cast("bigint").alias("n_corrupt"),
        F.sum(F.when(good, F.col("k"))).cast("bigint").alias(
            "sum_k_good"
        ),
    )


@register(
    "q_source_text",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT)
             AS total_words
    FROM documents
    GROUP BY lang
    """,
)
def q_source_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-oriented text source round-trip (``spark.read.text`` — the
    rawest ingestion path an LLM-data pipeline has: one line per
    record, parse-your-own fields).  Documents are serialized as
    ``doc_id<TAB>lang<TAB>text`` lines (fixture text verified free of
    tabs/newlines), read back as raw lines, re-parsed with
    ``split(value, '\\t', 3)``, and aggregated; the oracle computes
    the same aggregate from the original table, so any line-level
    corruption (split records, encoding, lost rows) breaks the hash.

    At 100 TB this is the WET/CC-style ingest shape: text files split
    by line across tasks, schema applied in the engine, bad lines
    quarantined (q_source_csv_malformed shows the quarantine half).
    """
    path = os.path.join(SCRATCH, f"text-{_tag(sf_dir)}")
    d = table(spark, sf_dir, "documents")
    lines = d.select(
        F.concat_ws(
            "\t",
            F.col("doc_id").cast("string"),
            "lang",
            "text",
        ).alias("value")
    )
    lines.write.mode("overwrite").text(path)
    raw = spark.read.text(path)
    parsed = raw.select(
        F.split("value", "\t", 3).alias("f")
    ).select(
        F.col("f")[0].cast("bigint").alias("doc_id"),
        F.col("f")[1].alias("lang"),
        F.col("f")[2].alias("text"),
    )
    return parsed.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        F.sum(F.size(F.split(F.trim("text"), " ")))
        .cast("bigint")
        .alias("total_words"),
    )


@register(
    "q_source_partition_pruning",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events
    WHERE date_trunc('day', ts) BETWEEN TIMESTAMP '2024-01-10 00:00:00'
                                    AND TIMESTAMP '2024-01-12 00:00:00'
    GROUP BY event_type
    """,
)
def q_source_partition_pruning(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Partitioned-table source with partition pruning: events
    re-materialized as date-partitioned Parquet (the layout any
    100 TB event lake uses), then read back with a partition-column
    predicate so the scan touches only the 3 matching directories —
    the oracle aggregates the same 3 days from the raw table, so a
    pruning bug that drops or duplicates partitions breaks the hash.

    The plan gate (test_plans) asserts PartitionFilters reach the
    scan.  At scale this layout is what makes time-range queries
    O(days touched) instead of O(table); the partition column is a
    DATE string (not a timestamp) precisely so pruning happens at
    planning time against directory names.
    """
    path = os.path.join(SCRATCH, f"events-by-day-{_tag(sf_dir)}")
    e = table(spark, sf_dir, "events")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            e.withColumn(
                "event_date", F.date_trunc("day", "ts").cast("date")
            )
            .repartition("event_date")
            .write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(path)
        )
    back = spark.read.parquet(path).filter(
        F.col("event_date").between("2024-01-10", "2024-01-12")
    )
    return back.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("value_cents"),
    )


@register("q_source_xml", oracle=_AGG_ORACLE)
def q_source_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source (Spark 4 native ``xml`` format, the spark-xml
    package folded into core): write the integer event projection as
    ``<row>`` elements, read it back with an explicit schema (XML
    inference is even less production-safe than CSV's), aggregate
    against the parquet oracle.

    Scale posture: XML is a landing format, not a processing format —
    the read is a one-pass conversion into parquet exactly like the
    CSV/JSON sources; rowTag splitting parallelizes per-file, so a
    10k-file XML drop fans out across the cluster like any other
    ``FileScan``.
    """
    path = os.path.join(SCRATCH, f"xml-{_tag(sf_dir)}")
    _event_projection(spark, sf_dir).write.mode("overwrite").option(
        "rowTag", "row"
    ).option("rootTag", "rows").format("xml").save(path)
    back = (
        spark.read.schema(_EVENT_COLS_SCHEMA)
        .option("rowTag", "row")
        .format("xml")
        .load(path)
    )
    return _agg(back)


@register(
    "q_source_lineage",
    oracle="""
    WITH span AS (
      SELECT MIN(epoch_us(ts)) AS lo,
             GREATEST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)), 1) AS w
      FROM events
    ),
    b AS (
      SELECT LEAST(3, CAST(((epoch_us(ts) - span.lo) * 4) // span.w
                           AS INT)) AS bucket,
             event_id
      FROM events, span
    )
    SELECT 'bucket-' || bucket || '.parquet' AS file_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(event_id) AS BIGINT) AS min_event_id,
           CAST(MAX(event_id) AS BIGINT) AS max_event_id
    FROM b
    GROUP BY 1
    """,
)
def q_source_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Input-file provenance via the hidden ``_metadata`` struct: the
    events table staged as 4 time-bucketed parquet files (the
    streaming stage), then per-file row counts and event-id ranges
    keyed by ``_metadata.file_name`` — the lineage readout an audit
    or incremental-reprocess pipeline needs ("which physical file did
    this row come from, and what does each file cover?").

    The oracle cannot see Spark's metadata column, so it replays the
    EXACT integer staging rule (b = min(3, (ts−lo)·4 div span)) over
    the logical view and predicts what each file must contain —
    parity proves _metadata.file_name maps rows to physical files
    precisely as the staging placed them.  _metadata is generated at
    scan time (no extra I/O); the rollup is one map-side-combined
    groupBy on a scan-local column, shuffle-free at any scale.
    """
    from ..streaming.ops import _staged_time_buckets

    path = _staged_time_buckets(spark, sf_dir)
    ev = spark.read.parquet(path).select(
        F.col("_metadata.file_name").alias("file_name"), "event_id"
    )
    return ev.groupBy("file_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("event_id").cast("bigint").alias("min_event_id"),
        F.max("event_id").cast("bigint").alias("max_event_id"),
    )
