"""Persisted inverted-index lifecycle for lexical (BM25) retrieval.

Round 8: q_text_bm25 proves the scorer, but it re-derives tokenized
term frequencies from raw text on EVERY query — at 100 TB that is a
full-corpus tokenize per search.  A production search stack maintains
the derivation as a lake artifact instead: an inverted POSTINGS table
(term, doc_id, tf) hash-bucketed on the term so a query's terms prune
to their buckets' files, plus a DOC-STATS sidecar (doc_id, length) for
the BM25 length normalization — the same build→serve→append lifecycle
the ANN store (llm/index.py) gives dense retrieval, applied to the
sparse side.

Serve-time cost shape: the postings scan is partition-pruned to the
query terms' buckets (|terms|/N_BUCKETS of the index), df/N/avgdl are
tiny aggregates, and the scorer is the exact q_text_bm25 closed form
— so serve-from-index is ORACLE-CHECKABLE against the same SQL as the
from-scratch query, which is the whole correctness story: the index
is a materialized view that must never drift from its definition.

Append (new documents between rebuilds) is pure file addition: the
delta's postings land in their terms' bucket dirs, docstats appends,
and global stats (N, avgdl, df) are derived AT SERVE from the unioned
relations — so a fold-in is exact by construction, never stale
(q_text_index_append oracle-checks serve-after-append ≡ full-corpus
BM25 bit-for-bit).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import register
from ..session import configure
from .analysis import tokens

N_BUCKETS = 64
_QUERY = ("hash", "join", "scan")  # the standing q_text_bm25 query
_TOP_K = 15


def _bucket(col) -> F.Column:
    return F.pmod(F.xxhash64(col), F.lit(N_BUCKETS)).cast("int")


def _postings_and_stats(d: DataFrame) -> tuple[DataFrame, DataFrame]:
    toks = d.select("doc_id", F.explode(tokens()).alias("term"))
    postings = (
        toks.groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
        .withColumn("bucket", _bucket(F.col("term")))
    )
    docstats = toks.groupBy("doc_id").agg(
        F.count("*").cast("double").alias("len")
    )
    return postings, docstats


def build_text_index(
    spark: SparkSession,
    sf_dir: str,
    half: bool = False,
) -> str:
    """Stage (idempotent per corpus fingerprint) the inverted index:
    ``postings/`` hive-partitioned on the term's hash bucket,
    ``docstats/`` flat.  ``half=True`` builds over even doc_ids only —
    the 'stale index' fixture for the append path."""
    from ..sources.formats import SCRATCH, _tag

    configure(spark)
    suffix = "-half" if half else ""
    root = os.path.join(
        SCRATCH, f"textindex{suffix}-{_tag(sf_dir)}"
    )
    ready = os.path.join(root, "_READY")
    import pyarrow.parquet as pq  # corpus fingerprint, footer-only

    p = os.path.join(sf_dir, "documents.parquet")
    files = (
        sorted(
            os.path.join(r, f)
            for r, _, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet")
        )
        if os.path.isdir(p)
        else [p]
    )
    n = sum(pq.read_metadata(f).num_rows for f in files)
    sz = sum(os.path.getsize(f) for f in files)
    mt = max(int(os.path.getmtime(f)) for f in files)
    # rows+bytes+mtime, the engine's standard staging fingerprint —
    # rows alone would serve a stale index over regenerated fixtures
    note = f"textindex-v1{suffix} rows={n} bytes={sz} mtime={mt}"
    try:
        if open(ready).read().strip() == note:
            return root
    except OSError:
        pass
    shutil.rmtree(root, ignore_errors=True)
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    if half:
        d = d.filter(F.col("doc_id") % 2 == 0)
    postings, docstats = _postings_and_stats(d)
    postings.write.partitionBy("bucket").parquet(
        os.path.join(root, "postings")
    )
    docstats.write.parquet(os.path.join(root, "docstats"))
    with open(ready, "w") as fh:
        fh.write(note)
    return root


def append_text_index(
    spark: SparkSession, root: str, delta: DataFrame
) -> None:
    """Fold new documents in WITHOUT a rebuild: the delta's postings
    append into their terms' bucket dirs (file addition — existing
    files untouched), docstats appends.  Global stats are derived at
    serve, so the fold is exact the moment the files land."""
    postings, docstats = _postings_and_stats(delta)
    # Round-10 (guide §6 "aim for fewer, larger output files"):
    # cluster postings by their bucket before the partitioned write —
    # without this every write task holds rows of MANY buckets and the
    # fold emits tasks×buckets tiny files; clustered, each touched
    # bucket gains exactly one file per fold, which is also what keeps
    # the serve-side file count (and compaction debt) linear in folds.
    postings.repartition("bucket").write.mode("append").partitionBy(
        "bucket"
    ).parquet(os.path.join(root, "postings"))
    docstats.write.mode("append").parquet(
        os.path.join(root, "docstats")
    )


def serve_bm25(
    spark: SparkSession,
    root: str,
    terms: tuple[str, ...] = _QUERY,
    top_k: int = _TOP_K,
) -> DataFrame:
    """BM25 top-k FROM THE INDEX: the postings scan carries a bucket
    partition predicate (|terms| buckets of 64 listed — the pytest
    plan gate pins the pruning), df/N/avgdl are tiny aggregates over
    the index relations, and the scorer is q_text_bm25's exact closed
    form with the same 6-dp round and (score, doc_id) tie-break."""
    buckets = [
        r[0]
        for r in spark.createDataFrame(
            [(t,) for t in terms], "term string"
        )
        .select(_bucket(F.col("term")))
        .collect()
    ]
    postings = spark.read.parquet(os.path.join(root, "postings"))
    tf = postings.filter(
        F.col("bucket").isin(sorted(set(buckets)))
        & F.col("term").isin(*terms)
    ).select("doc_id", "term", "tf")
    dl = spark.read.parquet(os.path.join(root, "docstats"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("len") / F.count("*")).alias("avglen"),
    )
    df = tf.groupBy("term").agg(
        F.count("*").cast("double").alias("df")
    )
    idf = F.log(
        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    term_score = (
        idf
        * F.col("tf")
        * 2.2
        / (
            F.col("tf")
            + 1.2 * (0.25 + 0.75 * F.col("len") / F.col("avglen"))
        )
    )
    return (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(term_score), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(top_k)
    )


_BM25_ORACLE = """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS word
      FROM documents
    ),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS len
           FROM toks GROUP BY doc_id),
    stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                     SUM(len) / COUNT(*) AS avglen
              FROM dl),
    tf AS (SELECT doc_id, word, CAST(COUNT(*) AS DOUBLE) AS tf
           FROM toks WHERE word IN ('hash', 'join', 'scan')
           GROUP BY 1, 2),
    df AS (SELECT word, CAST(COUNT(*) AS DOUBLE) AS df
           FROM tf GROUP BY word)
    SELECT tf.doc_id,
           ROUND(SUM(
             ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (0.25 + 0.75 * dl.len / s.avglen))
           ), 6) AS bm25
    FROM tf
    JOIN df ON df.word = tf.word
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN stats s
    GROUP BY tf.doc_id
    ORDER BY bm25 DESC, tf.doc_id LIMIT 15
"""


@register("q_text_index_serve", oracle=_BM25_ORACLE)
def q_text_index_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical serve-from-index (round 8): BM25 top-15 for the
    standing query answered from the PERSISTED inverted index —
    no tokenization, no raw-text scan; the postings read lists only
    the query terms' hash-bucket partitions.  Oracle-checked against
    the SAME SQL as q_text_bm25 (the from-scratch derivation), which
    pins the materialized view to its definition: a stale or partial
    index cannot hash-match.  The sparse twin of q_sim_index_serve."""
    root = build_text_index(spark, sf_dir)
    return serve_bm25(spark, root)


@register("q_text_index_append", oracle=_BM25_ORACLE)
def q_text_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index APPEND (round 8): a stale index built over the even half
    of the corpus absorbs the odd half as a fold-in — postings files
    added to their bucket dirs, stats derived at serve — and the
    post-append serve must reproduce FULL-corpus BM25 bit-for-bit
    (same oracle as the serve key).  Pure file addition: existing
    postings files are untouched (pytest-pinned), so concurrent
    readers of the old file set keep a consistent stale view — the
    sparse twin of q_sim_index_rebuild's delta fold."""
    from ..sources.formats import SCRATCH, _tag

    configure(spark)
    root = build_text_index(spark, sf_dir, half=True)
    marker = os.path.join(root, "_APPENDED")
    if not os.path.exists(marker):
        # no marker = the fold never completed on this staging —
        # a partial fold (crash mid-append, or any stray write) would
        # serve silently-wrong stats, so rebuild the half index from
        # scratch before folding
        shutil.rmtree(root, ignore_errors=True)
        root = build_text_index(spark, sf_dir, half=True)
        delta = (
            table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .filter(F.col("doc_id") % 2 == 1)
        )
        append_text_index(spark, root, delta)
        with open(marker, "w") as fh:
            fh.write("odd-half folded")
    return serve_bm25(spark, root)


def compact_text_index(spark: SparkSession, root: str) -> str:
    """COMPACT the postings store (the lifecycle step streaming folds
    make necessary: every micro-batch append adds one file per touched
    bucket, and serve-time listing cost grows with the file tail).
    One distributed job rewrites the postings hive-partitioned into a
    fresh directory (one right-sized file per bucket) and publishes it
    with an atomic rename swap — readers resolve the postings path
    per-serve, so they see either the old file set or the new one,
    never a mix; the retired directory is removed after the swap (the
    same stage-then-swap protocol the ANN snapshot store uses).
    Content is untouched — the BM25 oracle holds bit-for-bit across
    the compaction (q_text_index_compact)."""
    postings_dir = os.path.join(root, "postings")
    staging = os.path.join(root, f".compact-{os.getpid()}")
    df = spark.read.parquet(postings_dir)
    (
        df.repartition("bucket")
        .write.partitionBy("bucket")
        .parquet(staging)
    )
    retired = os.path.join(root, f".retired-{os.getpid()}")
    os.rename(postings_dir, retired)
    os.rename(staging, postings_dir)
    shutil.rmtree(retired, ignore_errors=True)
    return postings_dir


@register("q_text_index_compact", oracle=_BM25_ORACLE)
def q_text_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index COMPACTION (round 8): the half-index + streamed
    odd-half fold (the append exercise's layout — one small postings
    file per bucket per fold) is compacted to one file per bucket via
    the stage-then-swap protocol, then served — the oracle is the
    same full-corpus BM25 SQL, so the rewrite must be lossless
    through the swap.  Completes the sparse lifecycle's symmetry with
    the ANN store: build → serve → append/streaming fold → COMPACT;
    the pytest pins the physical effect (≤1 postings file per bucket
    afterwards) and that a concurrent reader's resolved path flips
    atomically."""
    from ..sources.formats import SCRATCH, _tag

    configure(spark)
    # PRIVATE root built from scratch: compaction mutates the store,
    # and the shared half-index fixture is itself mutated by the
    # append exercise (copying it would double-fold the delta)
    root = os.path.join(SCRATCH, f"textindex-compact-{_tag(sf_dir)}")
    marker = os.path.join(root, "_COMPACTED")
    half = build_text_index(spark, sf_dir, half=True)
    src_note = open(os.path.join(half, "_READY")).read().strip()
    note = f"compact-of {src_note}"
    try:
        ok = open(marker).read().strip() == note
    except OSError:
        ok = False
    if not ok:
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root, exist_ok=True)
        d = table(spark, sf_dir, "documents").select("doc_id", "text")
        even_p, even_s = _postings_and_stats(
            d.filter(F.col("doc_id") % 2 == 0)
        )
        even_p.write.partitionBy("bucket").parquet(
            os.path.join(root, "postings")
        )
        even_s.write.parquet(os.path.join(root, "docstats"))
        append_text_index(
            spark, root, d.filter(F.col("doc_id") % 2 == 1)
        )
        compact_text_index(spark, root)
        with open(marker, "w") as fh:
            fh.write(note)
    return serve_bm25(spark, root)
