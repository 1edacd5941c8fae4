"""Central registry of (query, oracle) pairs — the driver contract.

Every operator module registers its queries here via :func:`register`.
``queries()`` / ``oracle_sql()`` feed ``__spark_entry__.py`` directly;
the pytest mirror iterates the same registry, so the local gate and the
driver gate exercise identical code.

Discipline (SURVEY.md §5.2): alias every computed column identically in
the Spark plan and the DuckDB SQL; round float aggregates in BOTH
engines before they reach the driver's value hash; cast integer sums to
BIGINT in DuckDB (whose SUM(int) is HUGEINT).
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# One shared cache for ALL registered queries, so a single eviction
# sweep covers every entry: {(query_name, id(session), sf_dir):
# (DataFrame, session)}.  The session is held STRONGLY — that makes
# the `is` identity check sound (no id() reuse while the entry lives)
# — and entries for stopped sessions are evicted on the next cache
# access anywhere, so a stopped session pins its JVM-side plan state
# only until the next query build, not for the life of the process.
_PLAN_CACHE: dict[tuple[str, int, str], tuple[DataFrame, SparkSession]] = {}


def clear_plan_cache() -> int:
    """Drop every memoized DataFrame and return how many were held.

    A cached DataFrame that has EXECUTED pins more than plan metadata:
    its QueryExecution holds the physical plan, whose
    BroadcastExchangeExec nodes keep their materialized relations
    (the built HashedRelation lives in the local-mode JVM heap until
    the DataFrame becomes unreachable and the ContextCleaner runs).
    One driver run (≤50 queries) never notices, but a full-registry
    sweep accumulates hundreds of executed plans in one JVM — the
    r4 sweep OOM'd building q_tpch_q08's broadcast at query ~380.
    Long sweeps call this alongside ``spark.catalog.clearCache()``
    in their periodic eviction."""
    n = len(_PLAN_CACHE)
    _PLAN_CACHE.clear()
    return n


def _session_stopped(spark: SparkSession) -> bool:
    try:
        jsc = spark.sparkContext._jsc
        return jsc is None or jsc.sc().isStopped()
    except Exception:  # torn-down py4j gateway etc.
        return True


def _plan_cached(fn: QueryFn, name: str) -> QueryFn:
    """Engine-level plan cache: memoize the BUILT DataFrame per
    (session, sf_dir).

    Building a query plan through the DataFrame API costs hundreds of
    py4j round-trips plus Catalyst analysis — measured 0.3–0.6 s per
    headline query at local[32], i.e. MORE than executing it at sf0.1
    (~0.1 s).  Caching the built DataFrame skips that re-construction,
    and Spark additionally reuses the cached plan's materialized
    shuffle outputs across re-executions (upstream stages skip).

    Consistency contract — SNAPSHOT semantics, like any prepared
    statement over immutable data: the cached plan pins its file
    listing at build time and reuses shuffle output, so it will NOT
    observe files rewritten under the same path after the first
    build.  That is the right contract here (the driver fixtures are
    immutable per session, keyed by sf_dir); pipelines that rewrite
    inputs in place must use ``QuerySpec.fresh`` — and the bench
    (bench.py) times ``fresh`` builds for exactly that reason, so
    its headline number never credits cache reuse.  Keyed by live
    session identity (strong ref; stopped sessions evicted on the
    next cache access — see ``_PLAN_CACHE``) and sf_dir.
    """
    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        key = (name, id(spark), sf_dir)
        hit = _PLAN_CACHE.get(key)
        if (
            hit is not None
            and hit[1] is spark
            and not _session_stopped(spark)
        ):
            return hit[0]
        for k in [
            k for k, v in _PLAN_CACHE.items() if _session_stopped(v[1])
        ]:
            del _PLAN_CACHE[k]
        df = fn(spark, sf_dir)
        _PLAN_CACHE[key] = (df, spark)
        return df

    return wrapped


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn  # plan-cached (see _plan_cached)
    oracle: str | None  # DuckDB SQL; None → rows-only driver check
    doc: str = ""
    raw: QueryFn | None = None  # uncached builder — use for plan
    # inspection: a cached DataFrame that has already executed prints
    # AQE's finalized plan (initial + final sections), which breaks
    # operator-count assertions and PLANS.md canonical dumps.

    def fresh(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        """Build an uncached DataFrame (fresh logical plan)."""
        return (self.raw or self.fn)(spark, sf_dir)


REGISTRY: dict[str, QuerySpec] = {}

# The driver samples the FIRST 50 keys of ``queries()`` for its
# oracle-checked CORRECTNESS artifact.  Insertion order follows module
# import order, which front-loads join/text long-tail variants; this
# explicit priority list instead surfaces one representative per
# SURVEY.md §2 family (flagship first) so the driver's 50-slot window
# covers the whole §2 core.  Every key listed here has a full DuckDB
# oracle.  Keys not listed keep their insertion order after these.
#
# Round-6 rotation (round-5 verdict item 5): eight redundant family
# members rotated out to the full sweep (filtered/rollup aggs,
# analytic window, multi-key sort, except, sim threshold + retrieval
# eval, null-semantics filter — every family keeps ≥1 representative
# and the one-per-family gate still passes) to expose eight
# never-driver-graded keys: a TPC-H pick (q09), the LOCF window, two
# dedup scale paths (SemDeDup clusters + connected components), the
# ACID table layer (MERGE + time travel), the auto-skew sessionize
# dispatcher, and the ANN delta compaction.  Prior rotations:
# round 5 swapped in the round-4/5 additions (URL dedup, hybrid RRF,
# span corruption, curation funnel, index serve, chunked sessionize).
PRIORITY_ORDER: tuple[str, ...] = (
    # §2.4 aggregates (flagship first; scalable median: first grade)
    "q_agg_hash", "q_agg_median_scalable",
    # §2.5 windows / §2.6 sorts (EWMA recursion: first grade;
    # pagination rep never graded)
    "q_win_ewma", "q_sort_offset",
    # §2.7 set ops + dedup (bag algebra + the SAMPLED detector eval —
    # both first grades; eval carries the round-10 sampled column)
    "q_set_bag", "q_dedup_eval",
    # §2.8 scalar suites (window policy: one slot per suite)
    "q_str_funcs", "q_date_funcs", "q_math_funcs", "q_array_funcs",
    "q_map_funcs", "q_json_funcs",
    # §2.9 event-time + streaming (multi-batch ingest was
    # oracle-promoted in r9 and never graded; hidden-partition ingest
    # and chained dedup+window: first grades)
    "q_sessionize", "q_stream_multi_batch",
    "q_stream_table_ingest_hidden", "q_stream_dedup_window",
    # §2.11 similarity / multimodal (SRP-LSH + manifest: first)
    "q_sim_srp_lsh", "q_multimodal_manifest",
    # lakehouse round-9/10 additions, never driver-graded: TIMESTAMP
    # AS OF, transform evolution, DESCRIBE HISTORY (+metrics),
    # metadata-only COUNT, DV-delete CDC, additive schema evolution
    "q_table_time_travel_ts", "q_table_transform_evolution",
    "q_table_history", "q_table_count_metadata",
    "q_table_cdc_delete_dv", "q_table_add_column",
    # SQL surface over the engine (never graded): windowed SQL,
    # recursive CTE, |> pipes, SQL over the ACID table, and the
    # round-10 DML statement executor (UPDATE/DELETE/INSERT chain +
    # star-form MERGE INTO, both oracle-checked end-to-end)
    "q_sql_window", "q_sql_recursive", "q_sql_pipe",
    "q_sql_acid_table", "q_sql_dml", "q_sql_merge_into",
    # §2.1 sources / sinks / scans (partition-pruned source + sorted
    # sink: first grades; bare-scan rep never driver-graded)
    "q_source_partition_pruning", "q_sink_sorted", "q_scan_parquet",
    # §2.2 projection / predicates (held stem reps)
    "q_project", "q_filter_null", "q_case_when",
    # round-10 schema features, never graded: column defaults,
    # generated columns, identity columns, row tracking — all four
    # oracle-checked end-to-end (the row-tracking oracle states exact
    # ids through a CoW merge + compaction)
    "q_table_column_default", "q_table_generated",
    "q_table_identity", "q_table_row_tracking",
    # round-10 refs layer, never graded: write-audit-publish cycle +
    # vacuum-protected named tag
    "q_table_wap", "q_table_tag",
    # §2.3 joins (dynamic partition pruning: first grade; bloom/PIT
    # yield their slots to the round-10 surface, sweep-green)
    "q_join_dpp",
    # §2.12 UDFs (cogrouped applyInPandas: first grade)
    "q_udf_cogroup",
    # TPC-H never-graded pick (pricing summary; q03/q06/q18 yield
    # their slots to the round-10 surface — all 22 stay sweep-green
    # at three SFs every round)
    "q_tpch_q01",
    # analytics long tail, all first grades: OLS regression,
    # PageRank, funnel (retention/ROC-AUC/HLL++ yield their slots —
    # sweep-green), C4 filter
    "q_stats_regression", "q_graph_pagerank",
    "q_events_funnel", "q_corpus_c4",
    # §2.10 text
    "q_text_readability",
)
# Round-10 rotation (r9 verdict item 2): with 164 of 497 keys ever
# driver-graded, this window seats 38 FIRST-TIME keys — the r9
# verdict's named stragglers (q_table_time_travel_ts,
# q_sql_acid_table, q_stream_table_ingest_hidden, q_stream_multi_batch)
# plus the round-10 additions (q_table_transform_evolution, the
# sampled q_dedup_eval, metrics-backed q_table_history) and a
# never-graded spread across TPC-H, SQL surface, joins (DPP/bloom/
# PIT), stats, graph, events, corpus, sketch, and text families.
# The 12 held slots are the stem-policy representatives
# (one per §2.8 suite, flagship agg, sessionize, scan/project/
# filter/case) — all green in CORRECTNESS_r09.
# Late-round-10 reseat: the round-10 surface additions — refs layer
# (q_table_wap, q_table_tag), schema features (q_table_column_default,
# q_table_generated, q_table_identity, q_table_row_tracking), and the
# DML statement executor (q_sql_dml, q_sql_merge_into) — take the
# slots of q_tpch_q18/q03/q06, q_events_retention, q_join_bloom,
# q_join_pit, q_ml_auc, and q_sketch_hllpp (all sweep-green at three
# SFs; their §2 families keep in-window reps).  The §2 one-per-family
# policy (test_registry_order) stays satisfied, with two stems now
# held by NEVER-graded alternates (q_sort_offset for q_sort_,
# q_scan_parquet for q_scan_) instead of their multiply-graded
# siblings.
# Rotated OUT (driver-graded green in r8/r9, still verified by every
# full sweep): q_agg_distinct, q_agg_salted, q_win_topk,
# q_sort_limit, q_set_intersect, q_dedup_exact,
# q_dedup_minhash_portable, q_stream_tumbling, q_stream_table_erasure,
# q_stream_text_index, q_stream_table_ingest_partitioned, q_sim_knn,
# q_sim_hybrid_rrf_indexed, q_multimodal, the r8/r9 q_table_* block,
# q_source_acid_table(_pruned), q_text_index_*, q_udf_grouped_map,
# q_sink_partitioned, q_filter_pred, q_join_asof, q_tpch_q05,
# q_text_wordcount, q_corpus_gopher.
# Earlier rotations: see git history of this block (rounds 5-9).


def _ordered_names() -> list[str]:
    """Registry keys with PRIORITY_ORDER first, then insertion order."""
    prioritized = [n for n in PRIORITY_ORDER if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in set(prioritized)]
    return prioritized + rest


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query key: {name}")
        cached = _plan_cached(fn, name)
        REGISTRY[name] = QuerySpec(
            name, cached, oracle, doc or (fn.__doc__ or ""), raw=fn
        )
        return cached

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
