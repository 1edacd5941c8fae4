"""UDF / UDAF / grouped-map surface (SURVEY.md §2.12) plus the batch
"embed" hook (§2.11).

Policy: UDFs are the slow path (serde across the JVM↔Python boundary).
Every operator here exists to prove the surface works and how it's
kept cheap — Arrow-batched pandas UDFs, never row-at-a-time in hot
paths (q_udf_scalar is the deliberate row-at-a-time exhibit, with its
SQL twin showing what Catalyst does natively).
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

from ..io import table
from ..registry import register


@register(
    "q_udf_scalar",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000.0 THEN 'platinum'
                WHEN o_totalprice >= 150000.0 THEN 'gold'
                WHEN o_totalprice >=  50000.0 THEN 'silver'
                ELSE 'bronze' END AS tier
    FROM orders
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python scalar UDF (the reference's rule-based
    labeler idiom) with an exact SQL CASE twin as oracle.

    This is the anti-pattern exhibit: each row crosses the JVM↔Python
    boundary.  Correct, but q_case_when shows the native form that
    stays in codegen — at 100 TB the UDF version costs ~100× more.
    """

    @F.udf("string")
    def tier(price: float) -> str:
        if price >= 300000.0:
            return "platinum"
        if price >= 150000.0:
            return "gold"
        if price >= 50000.0:
            return "silver"
        return "bronze"

    o = table(spark, sf_dir, "orders")
    return o.select("o_orderkey", tier("o_totalprice").alias("tier"))


@register(
    "q_udf_pandas",
    oracle="""
    SELECT o_orderkey,
           ROUND(ln(1 + o_totalprice) * 2.0, 9) AS log_score
    FROM orders
    """,
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF (Arrow batches, numpy kernel) —
    the sanctioned shape when Python is unavoidable."""

    @F.pandas_udf("double")
    def log_score(s: pd.Series) -> pd.Series:
        return np.round(np.log1p(s) * 2.0, 9)

    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", log_score("o_totalprice").alias("log_score")
    )


@register(
    "q_udf_grouped_agg",
    oracle="""
    SELECT o_orderpriority,
           ROUND(exp(avg(ln(o_totalprice))), 6) AS geo_mean
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (UDAF): per-priority geometric
    mean, oracle-twinned as exp(avg(ln(x)))."""

    @F.pandas_udf("double")
    def geo_mean(s: pd.Series) -> float:
        return float(np.round(np.exp(np.log(s).mean()), 6))

    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        geo_mean("o_totalprice").alias("geo_mean")
    )


@register(
    "q_udf_grouped_map",
    oracle="""
    SELECT event_id, event_type,
           CASE WHEN cnt > 1
                THEN CAST(rk - 1 AS DOUBLE) / CAST(cnt - 1 AS DOUBLE)
                ELSE 0.0 END AS pct
    FROM (
      SELECT event_id, event_type,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rk,
             count(*) OVER (PARTITION BY event_type) AS cnt
      FROM events
    )
    """,
)
def q_udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas``: percentile-normalize event values
    within each event_type (pct = 0-based rank / (n-1), ties broken by
    event_id; singleton groups map to 0.0) — the rank-based feature
    transform robust to outliers that z-scoring is not.

    ORACLE-CHECKED (promoted from rows-only, round-6 item 4): every
    output value is one IEEE division of two exactly-represented
    integers, so pandas and any SQL engine produce bit-identical
    doubles — unlike the previous z-score form, whose float reduction
    order differed between pandas and SQL.  The pytest twin now
    asserts exact equality against the built-in window form.

    applyInPandas guarantees each group arrives as ONE frame (never
    split across Arrow batches), which is the property this exhibit
    pins; at 100 TB the same transform would use the window-function
    twin (no Python boundary) unless the per-group logic genuinely
    needs pandas.
    """

    def pct_rank(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["value", "event_id"]).reset_index(drop=True)
        denom = len(pdf) - 1
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "pct": [
                    (i / denom) if denom else 0.0 for i in range(len(pdf))
                ],
            }
        )

    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").applyInPandas(
        pct_rank, schema="event_id bigint, event_type string, pct double"
    )


def _sorted_group_batches(
    it: "Iterator[pd.DataFrame]", key: str
) -> "Iterator[pd.DataFrame]":
    """Re-chunk an iterator of ``key``-sorted pandas batches so that no
    group (run of equal ``key`` values) is ever split across yielded
    frames: each batch's trailing group is held back and prepended to
    the next batch (Arrow batch boundaries are an implementation
    detail; group integrity is the contract grouped kernels need)."""
    carry: pd.DataFrame | None = None
    for pdf in it:
        if carry is not None and len(carry):
            pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
        if not len(pdf):
            continue
        # rows of the final key value may continue in the next batch
        cut = int(
            pdf[key].searchsorted(pdf[key].iloc[-1], side="left")
        )
        carry = pdf.iloc[cut:]
        if cut:
            yield pdf.iloc[:cut]
    if carry is not None and len(carry):
        yield carry


def _map_sorted_user_groups(
    df: DataFrame, kernel, schema: str
) -> DataFrame:
    """Grouped-kernel execution without per-group invocation (guide
    §4.1/§4.2): one hash exchange on user_id + a partition-local sort
    — byte-for-byte the same shuffle ``groupBy().applyInPandas`` pays
    — then a ``mapInPandas`` whose task runs ``kernel`` over whole
    batches of MANY users at once.  ``kernel`` receives frames sorted
    by (user_id, ts) in which no user is split (see
    `_sorted_group_batches`)."""

    def run(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in _sorted_group_batches(it, "user_id"):
            yield kernel(pdf)

    return (
        df.repartition("user_id")
        .sortWithinPartitions("user_id", "ts")
        .mapInPandas(run, schema=schema)
    )


def _group_bounds(uid: "np.ndarray") -> "np.ndarray":
    """Start offsets of each run of equal values in a sorted array
    (plus the terminating length), as one int array."""
    new_grp = np.empty(len(uid), dtype=bool)
    new_grp[0] = True
    np.not_equal(uid[1:], uid[:-1], out=new_grp[1:])
    return np.append(np.flatnonzero(new_grp), len(uid))


def _bursts_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Multi-user trailing-window kernel: RANGE-frame count = hi − lo
    from two searchsorted passes per user SLICE (numpy views — no
    per-user pandas frame, no per-user serde; an epoch-ns offset trick
    that would fuse the groups into one global searchsorted overflows
    int64 at thousands of users, so the slices stay explicit).
    Per user this is exactly ``np.searchsorted(tsv, tsv - 1h, 'left')``
    / ``(tsv, tsv, 'right')`` of the original per-group kernel."""
    uid = pdf["user_id"].to_numpy()
    # Normalize to ns explicitly: newer pandas/pyarrow may hand Arrow
    # timestamps through as datetime64[us], and a raw int64 view of
    # that would silently make the 1-hour window 1000× too large.
    ts = pdf["ts"].to_numpy().astype("datetime64[ns]")
    t = ts.view("int64")
    hour = 3_600_000_000_000  # 1 h in ns
    bounds = _group_bounds(uid)
    lo = np.empty(len(t), dtype=np.int64)
    hi = np.empty(len(t), dtype=np.int64)
    for s, e in zip(bounds[:-1], bounds[1:]):
        sub = t[s:e]
        lo[s:e] = s + np.searchsorted(sub, sub - hour, side="left")
        hi[s:e] = s + np.searchsorted(sub, sub, side="right")
    n = hi - lo
    keep = n >= 2
    return pd.DataFrame(
        {
            "user_id": uid[keep],
            "burst_start": ts[lo[keep]],
            "burst_end": ts[keep],
            "n": n[keep].astype("int32"),
        }
    )


@register(
    "q_udtf_explode_sessions",
    oracle="""
    SELECT user_id, burst_start, burst_end, n FROM (
      SELECT user_id,
             min(ts) OVER w AS burst_start,
             ts AS burst_end,
             CAST(count(*) OVER w AS INT) AS n
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                   AND CURRENT ROW)
    ) WHERE n >= 2
    """,
)
def q_udtf_explode_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF-shaped operator (0..n output rows per input row): each
    user expands to one row per event whose trailing 1-hour window
    holds ≥2 events — the window's span and size.

    ORACLE-CHECKED (promoted from rows-only, round-6 item 4): the
    per-event trailing window is computed PEER-INCLUSIVELY with
    ``searchsorted`` over timestamp VALUES — events carrying the same
    timestamp get identical (start, end, n) rows — which is exactly
    ANSI RANGE-frame semantics, so a ``RANGE BETWEEN INTERVAL 1 HOUR
    PRECEDING AND CURRENT ROW`` window is the SQL twin.

    Round-10 optimization (guide §4.1: per-group invocation "has
    scalar-UDF-like overheads; reach for mapInArrow/mapInPandas when
    volume is high"): the previous ``groupBy().applyInPandas`` built
    one pandas frame per USER — thousands of tiny groups whose
    per-call machinery dominated the vectorized kernel.  Now ONE
    shuffle partitions by user and sorts (user_id, ts) — the same
    bytes the grouped-map exchange moved — and a ``mapInPandas`` task
    processes ALL of its users per batch through numpy slice views
    (`_bursts_kernel`), with no per-user pandas frame or serde.  A
    user spanning an Arrow batch boundary is carried into the next
    batch (`_sorted_group_batches`), so results are
    batch-layout-independent.  Measured at sf0.1: noop-sink
    6.2 s → ~0.5 s, identical oracle hash.
    """
    return _map_sorted_user_groups(
        table(spark, sf_dir, "events").select("user_id", "ts"),
        _bursts_kernel,
        "user_id bigint, burst_start timestamp, "
        "burst_end timestamp, n int",
    )


_EMBED_DIM = 16


def _embed_tokens(toks: list[str]) -> list[float]:
    """Deterministic hashing-trick embedding (md5 → bucket, ±sign),
    L2-normalized.  Stable across processes (no PYTHONHASHSEED
    dependence) so tests can pin goldens."""
    v = [0.0] * _EMBED_DIM
    for w in toks:
        h = hashlib.md5(w.encode()).digest()
        v[h[0] % _EMBED_DIM] += 1.0 if h[1] % 2 == 0 else -1.0
    norm = math.sqrt(sum(x * x for x in v))
    return [x / norm for x in v] if norm else v


@register("q_embed_text", oracle=None)
def q_embed_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch "embed" hook (§2.11): Arrow-batched pandas UDF mapping
    text → 16-dim unit vector via a deterministic hashing trick.

    Rows-only ONLY because the driver canonicalizer cannot hash
    array cells — the VALUES are fully oracle-checked through
    :func:`q_embed_text_long`, the same pipeline exploded to
    (doc_id, dim, weight) rows, which DuckDB reproduces bit-for-bit
    (md5 exists in both engines); a pytest pins this wide form to
    the long twin row-for-row.

    This is the integration point where a real model (ONNX/torch
    worker per executor) would plug in; the contract — Arrow batch in,
    fixed-dim ``array<double>`` out, stateless per batch — is what the
    engine guarantees at 100 TB (model loading would be memoized per
    worker process, batch size bounded by Arrow batch config).
    """

    @F.pandas_udf(ArrayType(DoubleType()))
    def embed(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: _embed_tokens(t.split()))

    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", embed(F.trim("text")).alias("embedding"))


@register(
    "q_embed_text_long",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
      FROM documents
    ),
    tk AS (
      SELECT doc_id,
             strpos('0123456789abcdef', substr(md5(w), 2, 1)) - 1 AS b,
             CASE WHEN strpos('02468ace', substr(md5(w), 4, 1)) > 0
                  THEN 1 ELSE -1 END AS s
      FROM toks WHERE w <> ''
    ),
    votes AS (
      SELECT doc_id, b, SUM(s) AS v FROM tk GROUP BY doc_id, b
    ),
    grid AS (
      SELECT d.doc_id, g.b, COALESCE(v.v, 0) AS v
      FROM documents d
      CROSS JOIN range(0, 16) g(b)
      LEFT JOIN votes v ON v.doc_id = d.doc_id AND v.b = g.b
    ),
    norms AS (
      SELECT doc_id, sqrt(CAST(SUM(v * v) AS DOUBLE)) AS nrm
      FROM grid GROUP BY doc_id
    )
    SELECT g.doc_id, CAST(g.b AS INT) AS dim,
           ROUND(CASE WHEN n.nrm > 0
                      THEN CAST(g.v AS DOUBLE) / n.nrm
                      ELSE 0.0 END, 6) AS weight
    FROM grid g JOIN norms n USING (doc_id)
    """,
)
def q_embed_text_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embed hook's VALUE-HASH oracle twin (round-6 item 4:
    promote rows-only keys): q_embed_text's vectors exploded to one
    (doc_id, dim, weight) row per component, rounded at 6 dp
    JVM-side.

    Every weight is exactly-reproducible arithmetic: the md5 hashing
    trick exists in both engines (bucket = digest byte 0 mod 16 =
    the 2nd hex nibble; sign = byte 1 parity = the 4th hex nibble's
    parity), per-bucket votes are integer sums, the norm is the sqrt
    of an exact integer, and each component is ONE IEEE division —
    so the DuckDB reconstruction hash-matches bit-for-bit, closing
    the oracle gap the wide array form cannot (the driver
    canonicalizer cannot hash array cells)."""
    wide = q_embed_text(spark, sf_dir)
    return wide.select(
        "doc_id", F.posexplode("embedding").alias("dim", "weight")
    ).select("doc_id", "dim", F.round("weight", 6).alias("weight"))


@register(
    "q_udtf_parse_props",
    oracle="""
    SELECT event_id, 'k' AS key,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS val
    FROM events
    """,
)
def q_udtf_parse_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Spark-4 Python UDTF (``@F.udtf`` + LATERAL join): a
    class-based table function exploding each event's JSON props into
    (key, value) rows — the generic payload-flattening contract for
    arbitrary-schema JSON that ``from_json`` (fixed schema) can't
    express.

    The UDTF runs row-at-a-time in the Python worker — fine for a
    parse-and-emit function, and the LATERAL correlation keeps it
    streaming (no shuffle added).  The oracle is expressible only
    because the fixture's props carry exactly one key ('k'); the
    operator itself handles any object.

    Round-11 (guide §2.5): the per-row Python parse is exactly the
    "per-row-expensive work above an unsplittable scan" case —
    ``spread`` fans the LATERAL's Python workers out (no-op on
    splittable layouts; measured 1.55 → 0.57 s at sf0.1).
    """
    from ..io import spread, table as load_table

    @F.udtf(returnType="key string, val bigint")
    class ParseProps:
        def eval(self, props: str):
            import json

            for k, v in json.loads(props).items():
                yield (k, int(v))

    spark.udtf.register("parse_props", ParseProps)
    spread(
        load_table(spark, sf_dir, "events"), spark, sf_dir, "events"
    ).createOrReplaceTempView("events_for_udtf")
    return spark.sql(
        """
        SELECT e.event_id, p.key, p.val
        FROM events_for_udtf e, LATERAL parse_props(e.props) p
        """
    )


@register(
    "q_udf_map_arrow",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
             / 10000.0 AS revenue
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_udf_map_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the zero-copy Arrow-native batch API (one step
    below Pandas UDFs: no pandas conversion, raw RecordBatches).  The
    Python side computes exact discounted-revenue units with pyarrow
    compute kernels; Spark finishes with an ordinary partial-agg
    groupBy, so only the per-batch projection crosses the JVM↔Python
    boundary.

    Exactness: cents and discount points are recovered by rounding
    (values sit within 1e-9 of the integer, so pyarrow's half-to-even
    cannot disagree with SQL's half-up), then all arithmetic is int64
    — the same scaled-long discipline as the flagship Q1
    (functions/exact.py), giving bit-identical doubles after the one
    final division.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_discount"
    )
    out_schema = "l_returnflag string, rev_units bigint"

    def rev_units(batches):
        for b in batches:
            cents = pc.cast(
                pc.round(pc.multiply(b.column("l_extendedprice"), 100.0)),
                pa.int64(),
            )
            pts = pc.cast(
                pc.round(pc.multiply(b.column("l_discount"), 100.0)),
                pa.int64(),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("l_returnflag"),
                    pc.multiply(cents, pc.subtract(pa.scalar(100), pts)),
                ],
                names=["l_returnflag", "rev_units"],
            )

    return (
        li.mapInArrow(rev_units, out_schema)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            (F.sum("rev_units") / F.lit(10000.0)).alias("revenue"),
        )
    )


@register("q_text_compressibility", oracle=None)
def q_text_compressibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality signal: zlib-compressed size over raw
    size per document, bucketed into a per-source profile — highly
    compressible text is repetitive/templated (boilerplate, spam,
    generated filler), so corpus builds threshold on this alongside
    the C4 filters.  No SQL twin (zlib lives outside both engines) —
    rows-only driver check; the pytest gate pins determinism and the
    ratio's (0, ~1.1] range.

    A vectorized Pandas UDF (zlib level 6 — deterministic bytes for
    a given input across platforms) keeps the Python boundary to one
    Arrow batch per partition; everything around it is JVM-side.
    """
    import pandas as pd

    @F.pandas_udf("double")
    def comp_ratio(texts: pd.Series) -> pd.Series:
        import zlib

        return texts.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), 6))
            / max(len(t.encode("utf-8")), 1)
        )

    d = table(spark, sf_dir, "documents")
    return (
        d.select("source", comp_ratio("text").alias("ratio"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("ratio"), 4).alias("mean_ratio"),
            F.round(F.min("ratio"), 4).alias("min_ratio"),
            F.round(F.max("ratio"), 4).alias("max_ratio"),
        )
    )


@register(
    "q_udf_apply_arrow",
    oracle="""
    WITH x AS (
      SELECT event_id, event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    m AS (
      SELECT event_type,
             CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS mean_c
      FROM x GROUP BY 1
    )
    SELECT x.event_id,
           ROUND((x.cents - m.mean_c) / 100.0, 6) AS value_demeaned
    FROM x JOIN m ON x.event_type = m.event_type
    """,
)
def q_udf_apply_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``applyInArrow`` grouped-map (Spark 4): per-group demeaning
    executed as one pyarrow Table in, one Table out per group — the
    Arrow-native sibling of ``applyInPandas`` (no pandas conversion),
    for when the per-group logic is itself columnar.

    Demeaning centers each purchase against its group mean — the
    leave-nothing-behind feature-standardization step.  Exact cents
    are computed JVM-side BEFORE the boundary, the Python side does
    only integer-sum/count arithmetic identical to the oracle's, so
    the group-local result is engine-exact despite crossing Arrow.
    Per-group state must fit one Arrow table — fine for bounded
    groups; unbounded groups use the window spelling instead.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    ev = table(spark, sf_dir, "events")
    x = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )

    def demean(t: pa.Table) -> pa.Table:
        cents = t.column("cents")
        mean_c = pc.sum(cents).as_py() / t.num_rows
        out = pc.round(
            pc.divide(
                pc.subtract(pc.cast(cents, pa.float64()), mean_c), 100.0
            ),
            ndigits=6,
        )
        return pa.Table.from_arrays(
            [t.column("event_id"), out],
            names=["event_id", "value_demeaned"],
        )

    return x.groupBy("event_type").applyInArrow(
        demean, "event_id bigint, value_demeaned double"
    )


@register(
    "q_udf_cogroup",
    oracle="""
    SELECT o.o_orderkey,
           CAST(COUNT(l.l_orderkey) AS BIGINT) AS n_items,
           ROUND(CAST(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                      AS DOUBLE) / 100.0, 2) AS header_price,
           ROUND(CAST(COALESCE(SUM(CAST(ROUND(l.l_extendedprice
                                             * 100) AS BIGINT)), 0)
                      AS DOUBLE) / 100.0, 2) AS items_total
    FROM orders o
    LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_totalprice
    """,
)
def q_udf_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped ``applyInPandas``: orders and lineitem are
    co-partitioned by a BUCKET of the order key, and each bucket's
    TWO pandas frames arrive together in one Python call — the
    header-vs-detail reconciliation shape a single-input
    grouped-map can't express without a pre-join.  Bucketing is
    the throughput lever: cogrouping on the raw key means one
    Python round-trip per order (measured 30 s for 15k keys);
    64 buckets amortize the interpreter to ~64 vectorized calls
    (~2 s) while pandas groupby does the per-order math inside —
    the same batching discipline a 100 TB run needs, where
    per-key Python invocation is never acceptable.

    Fully oracle-checked: the pandas arithmetic is exact integer
    cents (int64 in numpy), so the output hashes against the
    plain SQL join — the Python path honoring the engine's
    exactness discipline.
    """
    import pandas as pd

    def reconcile(
        key: tuple, o_pdf: pd.DataFrame, l_pdf: pd.DataFrame
    ) -> pd.DataFrame:
        hdr = pd.DataFrame(
            {
                "o_orderkey": o_pdf["o_orderkey"],
                "header_cents": (o_pdf["o_totalprice"] * 100)
                .round()
                .astype("int64"),
            }
        )
        if len(l_pdf):
            det = (
                pd.DataFrame(
                    {
                        "o_orderkey": l_pdf["l_orderkey"],
                        "cents": (l_pdf["l_extendedprice"] * 100)
                        .round()
                        .astype("int64"),
                    }
                )
                .groupby("o_orderkey", as_index=False)
                .agg(n_items=("cents", "size"),
                     items_cents=("cents", "sum"))
            )
        else:
            det = pd.DataFrame(
                {"o_orderkey": [], "n_items": [], "items_cents": []}
            )
        m = hdr.merge(det, on="o_orderkey", how="left")
        m["n_items"] = m["n_items"].fillna(0).astype("int64")
        m["items_cents"] = (
            m["items_cents"].fillna(0).astype("int64")
        )
        return pd.DataFrame(
            {
                "o_orderkey": m["o_orderkey"],
                "n_items": m["n_items"],
                "header_price": (m["header_cents"] / 100.0).round(2),
                "items_total": (m["items_cents"] / 100.0).round(2),
            }
        )

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice",
        (F.col("o_orderkey") % 64).alias("bucket"),
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice",
        (F.col("l_orderkey") % 64).alias("bucket"),
    )
    return (
        o.groupBy("bucket")
        .cogroup(li.groupBy("bucket"))
        .applyInPandas(
            reconcile,
            schema="o_orderkey bigint, n_items bigint, "
            "header_price double, items_total double",
        )
    )


_DEBOUNCE_US = 21_600_000_000  # 6-hour cooldown


@register(
    "q_udf_debounce",
    oracle=f"""
    WITH RECURSIVE ev AS (
      SELECT user_id, epoch_us(ts) AS t FROM events
    ),
    kept(user_id, t) AS (
      SELECT user_id, MIN(t) FROM ev GROUP BY user_id
      UNION ALL
      SELECT k.user_id,
             (SELECT MIN(e.t) FROM ev e
              WHERE e.user_id = k.user_id
                AND e.t >= k.t + {_DEBOUNCE_US})
      FROM kept k
      WHERE (SELECT MIN(e.t) FROM ev e
             WHERE e.user_id = k.user_id
               AND e.t >= k.t + {_DEBOUNCE_US}) IS NOT NULL
    ),
    ks AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_kept
      FROM kept GROUP BY user_id
    ),
    tot AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM ev GROUP BY user_id
    )
    SELECT t.user_id, t.n_events, ks.n_kept,
           CAST(t.n_events - ks.n_kept AS BIGINT) AS n_suppressed
    FROM tot t JOIN ks ON ks.user_id = t.user_id
    """,
)
def q_udf_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy alert debounce with a 6-hour cooldown per user: keep an
    event only if ≥6h has passed since the last KEPT event — the
    alert-fatigue suppressor every monitoring pipeline needs.  This
    is a chained recurrence (each decision depends on the previous
    KEPT time, not the previous row), which no window frame or
    closed-form rewrite can express — exactly the case SURVEY.md §7's
    operator tiers reserve for ``applyInPandas``: per-key grouped
    state in vectorized Arrow batches, the (b)-tier custom-operator
    escape hatch.  The DuckDB oracle replays the same greedy chain as
    a recursive CTE, so the Python path is fully hash-checked — the
    strongest check any UDF operator here carries.

    Scale posture: state per group is one timestamp; groups shuffle
    once on user_id and stream through Arrow in bounded batches.  The
    streaming twin would be ``applyInPandasWithState`` with the same
    per-key loop (see streaming/ops.py's stateful pattern).

    Round-10 optimization (guide §4.1, same move as
    q_udtf_explode_sessions): ``groupBy().applyInPandas`` invoked the
    Python kernel once per USER — a 1-row pandas frame constructed
    per group dwarfed the greedy chain itself.  The same exchange +
    partition-local (user_id, t) sort now feeds a ``mapInPandas``
    kernel that advances ALL of its users' cooldown chains in
    lock-step rounds — one ``searchsorted`` per still-active user per
    round over that user's slice (the chain for one user has ≤
    ceil(activity-span / 6 h) kept events, so rounds are bounded,
    each round is O(active users · log n), and total work stays
    linear in kept events).
    Greedy semantics are unchanged: round r keeps, for every user
    still active, the first event ≥ last-kept + 6 h — exactly the
    per-row loop's decisions, and the oracle's recursive CTE.
    Measured at sf0.1: noop-sink 3.4 s → ~0.4 s, identical hash.
    """
    e = table(spark, sf_dir, "events").select(
        "user_id", F.expr("unix_micros(ts)").alias("ts")
    )

    def debounce_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        uid = pdf["user_id"].to_numpy()
        t = pdf["ts"].to_numpy()  # int64 µs, sorted within user
        bounds = _group_bounds(uid)
        starts, ends = bounds[:-1], bounds[1:]
        n_events = ends - starts
        # lock-step greedy chains: every user keeps its first event,
        # then repeatedly jumps to the first event ≥ last + cooldown
        kept = np.ones(len(starts), dtype=np.int64)
        pos = starts.copy()  # index of each user's last KEPT event
        active = np.arange(len(starts))
        while len(active):
            nxt = np.empty(len(active), dtype=np.int64)
            for i, gi in enumerate(active):
                s = pos[gi] + 1
                e_ = ends[gi]
                nxt[i] = s + np.searchsorted(
                    t[s:e_], t[pos[gi]] + _DEBOUNCE_US, side="left"
                )
            alive = nxt < ends[active]
            pos[active[alive]] = nxt[alive]
            kept[active[alive]] += 1
            active = active[alive]
        return pd.DataFrame(
            {
                "user_id": uid[starts],
                "n_events": n_events,
                "n_kept": kept,
                "n_suppressed": n_events - kept,
            }
        )

    return _map_sorted_user_groups(
        e,
        debounce_kernel,
        "user_id bigint, n_events bigint, "
        "n_kept bigint, n_suppressed bigint",
    )


@register(
    "q_udf_ema",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev,
             CAST(ROW_NUMBER() OVER (ORDER BY CAST(o_orderdate AS DATE))
                  AS BIGINT) AS rn
      FROM orders GROUP BY 1
    ),
    ema(rn, d, rev, e) AS (
      SELECT rn, d, rev, CAST(rev AS DOUBLE) FROM daily WHERE rn = 1
      UNION ALL
      SELECT dd.rn, dd.d, dd.rev,
             (2.0 / 15.0) * dd.rev + (13.0 / 15.0) * ema.e
      FROM ema JOIN daily dd ON dd.rn = ema.rn + 1
    ),
    n AS (SELECT CAST(MAX(rn) AS BIGINT) AS nmax FROM daily)
    SELECT d, rev AS rev_cents, ROUND(e / 100, 4) AS ema_14d
    FROM ema CROSS JOIN n
    WHERE rn > nmax - 30
    """,
)
def q_udf_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilder-style 14-period EMA of daily revenue (α = 2/15),
    reported for the last 30 days — the RECURSIVE smoother that,
    unlike q_win_holt's closed-form linear filter, genuinely carries
    state forward from t₀ and therefore cannot be a window frame.
    Second member of the grouped-state family q_udf_debounce opened:
    ``applyInPandas`` runs the sequential chain in one Arrow batch
    (the daily series is bounded by calendar, so one group ≪ one
    partition), and the DuckDB oracle replays the IDENTICAL float
    chain as a recursive CTE — same operands, same IEEE op order ⇒
    bit-identical doubles, rounded only for display.

    At scale the per-series state is two doubles; many independent
    series (one per metric/tenant) parallelize as groups, which is
    the real deployment shape.
    """
    import pandas as pd  # noqa: F811

    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev")
    ).withColumn("g", F.lit(1))

    def ema(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d").reset_index(drop=True)
        e = None
        out = []
        for rev in pdf["rev"].to_numpy():
            rev = float(rev)
            e = rev if e is None else (2.0 / 15.0) * rev + (13.0 / 15.0) * e
            out.append(e)
        pdf["ema"] = out
        return pdf.tail(30)[["d", "rev", "ema"]]

    res = daily.groupBy("g").applyInPandas(
        ema, schema="d date, rev bigint, ema double"
    )
    return res.select(
        "d",
        F.col("rev").alias("rev_cents"),
        F.round(F.col("ema") / 100, 4).alias("ema_14d"),
    )


@register(
    "q_udf_pandas_iter",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def q_udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-form Pandas UDF (``Iterator[pd.Series] ->
    Iterator[pd.Series]``): the variant that amortizes one-time setup
    (model load, dictionary build) across every Arrow batch of a
    partition instead of paying it per batch — the signature a 100 TB
    scoring pipeline uses so a 2 GB model loads once per worker, not
    once per 10k rows.  Here the "model" is a trivial cents quantizer
    (floor(v·100 + 0.5) — double-space identical in both engines);
    the downstream exact integer aggregate is what the oracle hashes.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def to_cents(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        scale = 100.0  # stand-in for per-worker one-time init
        for s in batches:
            yield np.floor(s * scale + 0.5).astype("int64")

    ev = table(spark, sf_dir, "events")
    return (
        ev.withColumn("cents", to_cents("value"))
        .groupBy("event_type")
        .agg(
            F.sum("cents").cast("bigint").alias("total_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )
