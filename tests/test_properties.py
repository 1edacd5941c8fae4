"""Property-based algebraic laws (SURVEY.md §5.2.4) on small generated
frames: the invariants every relational engine must satisfy,
independent of the fixture data."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F

from morphl_model_user_search_intent_spark import REGISTRY

from conftest import SF_DIR

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),  # k
        st.integers(min_value=-1000, max_value=1000),  # v
    ),
    min_size=0,
    max_size=60,
)

_settings = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(rows or [(0, 0)], "k int, v int").limit(
        len(rows)
    )


@given(rows=rows_strategy)
@_settings
def test_filter_commutes_with_project(spark, rows):
    df = _df(spark, rows)
    a = df.filter(F.col("k") > 0).select("v")
    b = df.select("v", "k").filter(F.col("k") > 0).select("v")
    assert sorted(r.v for r in a.collect()) == sorted(
        r.v for r in b.collect()
    )


@given(rows=rows_strategy)
@_settings
def test_union_counts_add(spark, rows):
    df = _df(spark, rows)
    assert df.unionAll(df).count() == 2 * df.count()


@given(rows=rows_strategy)
@_settings
def test_distinct_idempotent(spark, rows):
    df = _df(spark, rows)
    d1 = df.distinct()
    assert d1.count() == d1.distinct().count()
    assert d1.count() <= df.count()


@given(rows=rows_strategy)
@_settings
def test_topk_is_sorted_prefix(spark, rows):
    df = _df(spark, rows)
    full = [
        (r.k, r.v)
        for r in df.orderBy(F.col("v").desc(), F.col("k")).collect()
    ]
    top = [
        (r.k, r.v)
        for r in df.orderBy(F.col("v").desc(), F.col("k")).limit(5).collect()
    ]
    assert top == full[:5]


@given(rows=rows_strategy)
@_settings
def test_groupby_sum_partitions_total(spark, rows):
    df = _df(spark, rows)
    total = df.agg(F.sum("v")).collect()[0][0]
    by_k = df.groupBy("k").agg(F.sum("v").alias("s")).agg(F.sum("s"))
    assert by_k.collect()[0][0] == total


@given(rows=rows_strategy)
@_settings
def test_semi_plus_anti_partition_left(spark, rows):
    df = _df(spark, rows)
    right = df.filter(F.col("v") % 2 == 0).select("k").distinct()
    semi = df.join(right, "k", "left_semi").count()
    anti = df.join(right, "k", "left_anti").count()
    assert semi + anti == df.count()


cents_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),  # group key
        # a 2-dp fixed-point value, constructed from exact cents
        st.integers(min_value=-10_000_000, max_value=10_000_000),
    ),
    min_size=1,
    max_size=60,
)


@given(rows=cents_strategy)
@_settings
def test_scaled_long_sum_equals_decimal_sum(spark, rows):
    # The two exact-aggregation disciplines (functions/exact.py) must
    # agree bit-for-bit on any 2-dp fixed-point column.
    from morphl_model_user_search_intent_spark.functions.exact import (
        dsum,
        lsum,
        units,
    )

    df = spark.createDataFrame(
        [(k, c / 100.0) for k, c in rows], "k int, x double"
    )
    got = (
        df.groupBy("k")
        .agg(
            lsum(units("x", 100), 100, "fast"),
            dsum("x", "general"),
        )
        .collect()
    )
    for r in got:
        assert r.fast == r.general, (r.k, r.fast, r.general)


@given(rows=cents_strategy)
@_settings
def test_salted_join_equals_plain_join(spark, rows):
    from morphl_model_user_search_intent_spark.operators.scale import (
        salted_join,
    )

    big = spark.createDataFrame(
        [(k, c, i) for i, (k, c) in enumerate(rows)], "k int, v long, uid long"
    )
    small = spark.createDataFrame(
        [(k, k * 10) for k in range(5)], "k int, w int"
    )
    plain = sorted(
        (r.k, r.v, r.w) for r in big.join(small, "k").collect()
    )
    salted = sorted(
        (r.k, r.v, r.w)
        for r in salted_join(big, small, "k", "uid", n=4).collect()
    )
    assert salted == plain


def test_profile_skew_conserves_and_balances(spark):
    from morphl_model_user_search_intent_spark import REGISTRY
    from conftest import SF_DIR
    from morphl_model_user_search_intent_spark.io import table as load_table

    rows = REGISTRY["q_profile_skew"].fn(spark, SF_DIR).collect()
    total = load_table(spark, SF_DIR, "lineitem").count()
    counts = [r.n_rows for r in rows]
    assert sum(counts) == total
    # well-hashed unique-ish key → no partition dominates
    assert max(counts) <= 5 * max(1, min(counts))


def test_compaction_reduces_file_count(spark):
    import glob
    import os

    from morphl_model_user_search_intent_spark import REGISTRY
    from morphl_model_user_search_intent_spark.sources.formats import (
        SCRATCH,
        _tag,
    )
    from conftest import SF_DIR

    REGISTRY["q_sink_compact"].fn(spark, SF_DIR).collect()
    tag = _tag(SF_DIR)
    n_small = len(glob.glob(os.path.join(SCRATCH, f"small-files-{tag}", "*.parquet")))
    n_compact = len(glob.glob(os.path.join(SCRATCH, f"compacted-{tag}", "*.parquet")))
    assert n_small == 64
    assert n_compact <= 2


def test_zorder_key_is_injective():
    from morphl_model_user_search_intent_spark.operators.scale import (
        zorder_key,
    )

    # pure-python mirror of the bit interleave
    def z(x, y, bits=16):
        out = 0
        for i in range(bits):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    seen = {}
    for x in range(0, 64, 7):
        for y in range(0, 64, 5):
            v = z(x, y)
            assert v not in seen, (x, y, seen[v])
            seen[v] = (x, y)
    # locality: unit steps move the z-value by a bounded amount in the
    # interleaved low bits
    assert z(3, 5) != z(5, 3)


def test_metric_range_invariants(spark):
    """Closed-form ranges the statistical operators must respect —
    checked on live fixture output, not synthetic toys."""
    gini = REGISTRY["q_stats_gini"].fn(spark, SF_DIR).collect()[0]
    assert 0.0 <= gini.gini < 1.0

    auc = REGISTRY["q_ml_auc"].fn(spark, SF_DIR).collect()[0]
    assert 0.0 <= auc.auc <= 1.0

    ks = REGISTRY["q_stats_ks"].fn(spark, SF_DIR).collect()[0]
    assert 0.0 <= ks.ks_stat <= 1.0

    sil = REGISTRY["q_sim_silhouette"].fn(spark, SF_DIR).collect()
    assert all(-1.0 <= r.mean_silhouette <= 1.0 for r in sil)

    ndcg = REGISTRY["q_ml_ndcg"].fn(spark, SF_DIR).collect()
    assert all(r.ndcg is None or 0.0 <= r.ndcg <= 1.0 for r in ndcg)


def test_bloom_has_no_false_negatives(spark):
    rows = REGISTRY["q_sketch_bloom"].fn(spark, SF_DIR).collect()
    for r in rows:
        # one-sided error: present => hit, and false_positive is
        # exactly (hit and not present)
        if r.in_vocab:
            assert r.bloom_hit
        assert r.false_positive == (r.bloom_hit and not r.in_vocab)


def test_sketch_estimates_dominate_exact(spark):
    cm = REGISTRY["q_sketch_countmin"].fn(spark, SF_DIR).collect()
    assert all(r.cm_estimate >= r.n_exact for r in cm)

    km = REGISTRY["q_sketch_bottomk"].fn(spark, SF_DIR).collect()[0]
    # KMV is unbiased, not one-sided — but must land within 50% on
    # 256-of-N order statistics at fixture scale
    assert abs(km.rel_err) < 0.5


def test_revenue_bridge_identity(spark):
    rows = REGISTRY["q_orders_bridge"].fn(spark, SF_DIR).collect()
    for r in rows:
        # volume + price effects must reconstruct the delta to the cent
        assert abs(r.volume_effect + r.price_effect - r.delta_revenue) < 0.02


def test_mmr_picks_are_distinct_and_first_is_most_relevant(spark):
    rows = REGISTRY["q_sim_mmr"].fn(spark, SF_DIR).collect()
    ids = [r.vec_id for r in rows]
    assert len(set(ids)) == 5
    assert rows[0].max_sim_selected == 0.0
    assert rows[0].rel == max(r.rel for r in rows)


def test_new_metric_range_invariants(spark):
    """Closed-form ranges for the round-3 statistical operators."""
    b = REGISTRY["q_events_iat_burstiness"].fn(spark, SF_DIR).collect()
    assert all(-1.0 <= r.burstiness <= 1.0 for r in b)

    mi = REGISTRY["q_stats_mutual_info"].fn(spark, SF_DIR).collect()[0]
    assert mi.mi_nats >= -1e-9  # MI is non-negative up to rounding
    assert mi.h_y_nats > 0.0
    assert mi.mi_nats <= mi.h_y_nats + 1e-9  # MI ≤ H(Y)

    psi = REGISTRY["q_ml_psi"].fn(spark, SF_DIR).collect()
    assert all(r.psi_term >= -1e-9 for r in psi)  # each term ≥ 0

    disp = REGISTRY["q_stats_dispersion"].fn(spark, SF_DIR).collect()
    assert all(r.dispersion_index > 0.0 for r in disp)

    ttr = REGISTRY["q_text_ttr_curve"].fn(spark, SF_DIR).collect()
    assert all(0.0 < r.avg_ttr <= 1.0 for r in ttr)
    # TTR falls (weakly) as docs get longer: first decile ≥ last
    first = min(ttr, key=lambda r: r.length_decile)
    last = max(ttr, key=lambda r: r.length_decile)
    assert first.avg_ttr >= last.avg_ttr

    tau = REGISTRY["q_stats_kendall"].fn(spark, SF_DIR).collect()[0]
    # tau_b is NULL when one variable is constant (all pairs tied) —
    # the sf0.001 fixture has one order/day, so tolerate the degenerate
    assert tau.tau_b is None or -1.0 <= tau.tau_b <= 1.0

    kappa = REGISTRY["q_stats_kappa"].fn(spark, SF_DIR).collect()[0]
    assert -1.0 <= kappa.kappa <= 1.0

    jac = REGISTRY["q_graph_jaccard"].fn(spark, SF_DIR).collect()
    assert all(0.0 < r.jaccard <= 1.0 for r in jac)

    cal = REGISTRY["q_ml_calibration"].fn(spark, SF_DIR).collect()
    assert all(0.0 <= r.brier <= 1.0 + 1e-9 for r in cal)
    assert all(0.0 <= r.obs_rate <= 1.0 for r in cal)


def test_debounce_conserves_and_suppresses(spark):
    """Debounce keeps ≥1 event per active user and never more than
    the user generated; totals reconcile exactly."""
    rows = REGISTRY["q_udf_debounce"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_kept <= r.n_events
        assert r.n_suppressed == r.n_events - r.n_kept


def test_control_chart_limits_bracket_center(spark):
    rows = REGISTRY["q_win_control_chart"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.lcl < r.center < r.ucl
        if r.status == "above_ucl":
            assert r.n_events > r.ucl
        elif r.status == "below_lcl":
            assert r.n_events < r.lcl


# --- as-of join semantics vs pandas merge_asof (a third, independent
# implementation next to the Spark pattern and the DuckDB oracle) ---

_asof_strategy = st.tuples(
    # left probes: (key, t)
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=1000),
        ),
        min_size=1,
        max_size=25,
    ),
    # right quotes: unique (key, t) so backward-asof has a unique winner
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=1000),
        ),
        min_size=1,
        max_size=25,
        unique=True,
    ),
)


@given(data=_asof_strategy)
@_settings
def test_asof_pattern_matches_pandas_merge_asof(spark, data):
    import pandas as pd
    from pyspark.sql import Window

    left_rows, right_rows = data
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)],
        "lid int, k int, t int",
    )
    right = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(right_rows)],
        "rid int, rk int, rt int",
    )
    cand = left.join(
        right,
        (F.col("rk") == F.col("k")) & (F.col("rt") <= F.col("t")),
        "left",
    )
    w = Window.partitionBy("lid").orderBy(
        F.col("rt").desc_nulls_last(), F.col("rid").desc_nulls_last()
    )
    got = {
        r.lid: r.rt
        for r in cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    pl = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)],
        columns=["lid", "k", "t"],
    ).sort_values(["t", "lid"], kind="mergesort")
    pr = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(right_rows)],
        columns=["rid", "k", "rt"],
    ).sort_values(["rt", "rid"], kind="mergesort")
    merged = pd.merge_asof(
        pl, pr, left_on="t", right_on="rt", by="k", direction="backward"
    )
    want = {
        int(r.lid): (None if pd.isna(r.rt) else int(r.rt))
        for r in merged.itertuples()
    }
    assert got == want


# --- sessionize gap boundary: Spark lag+cumsum pattern vs a linear
# Python reference, with offsets clustered around the 1800 s gap ---

_session_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # user
        st.integers(min_value=0, max_value=8),  # gap selector
    ),
    min_size=1,
    max_size=30,
)

_GAPS = [0, 1, 1799, 1800, 1801, 3600, 5, 60, 7200]  # seconds


@given(rows=_session_strategy)
@_settings
def test_sessionize_gap_boundary_matches_reference(spark, rows):
    from pyspark.sql import Window

    # build per-user strictly-increasing timestamps from the gaps
    per_user: dict[int, list[int]] = {}
    events = []
    for u, gsel in rows:
        ts = per_user.get(u, 0) + _GAPS[gsel]
        per_user[u] = ts
        events.append((len(events), u, ts))
    # Python reference: new session when gap > 1800 s (strictly)
    want = 0
    last: dict[int, int] = {}
    for _, u, ts in sorted(events, key=lambda e: (e[1], e[2], e[0])):
        if u not in last or ts - last[u] > 1800:
            want += 1
        last[u] = ts
    df = spark.createDataFrame(
        events, "eid int, user int, ts_s long"
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    w = Window.partitionBy("user").orderBy("ts", "eid")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(
        F.lag("ts").over(w)
    )
    new_s = (
        F.when(F.lag("ts").over(w).isNull(), 1)
        .when(gap_us > 1800 * 1_000_000, 1)
        .otherwise(0)
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = (
        df.withColumn("ns", new_s)
        .withColumn("sid", F.sum("ns").over(run))
        .groupBy("user", "sid")
        .count()
    )
    assert sessions.count() == want


# ---- cross-engine LSH parity on GENERATED corpora (regression class:
# the sf0.1 band-grouping divergence — oracle CAST(j/2) round-half-even
# vs Spark floor(j/2) — was invisible at the fixture's sf0.01 because
# no borderline candidate pair existed there.  Random corpora with
# planted near-dups hunt for data-dependent divergence directly.) ----

words_strategy = st.lists(
    st.sampled_from(
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon".split()
    ),
    min_size=5,
    max_size=30,
)


@given(
    docs=st.lists(words_strategy, min_size=3, max_size=8),
    data=st.data(),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
def test_minhash_portable_matches_oracle_on_random_corpus(
    spark, docs, data, tmp_path_factory
):
    """q_dedup_minhash_portable's full pipeline (shingle → signature →
    band → candidate → agreement) must agree with its DuckDB oracle on
    ARBITRARY corpora, not just the fixture: each random corpus gets a
    planted near-dup (one doc re-emitted with a single word changed)
    so the candidate machinery actually fires."""
    import duckdb
    import os
    import uuid

    # Plant a near-dup of doc 0: same words, last word swapped.
    base = list(docs[0])
    dup = base[:-1] + ["omega"]
    texts = [" ".join(d) for d in docs] + [" ".join(dup)]
    rows = [(i, t, "en", "gen", len(t)) for i, t in enumerate(texts)]
    sdir = str(tmp_path_factory.mktemp("prop-lsh")) + "/" + uuid.uuid4().hex[:8]
    os.makedirs(sdir, exist_ok=True)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sdir, "documents.parquet")
    )
    spec = REGISTRY["q_dedup_minhash_portable"]
    sdf = spec.fresh(spark, sdir)
    scols = sorted(sdf.columns)
    srows = sorted(
        tuple(r[c] for c in scols) for r in sdf.collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(sdir, 'documents.parquet')}/*.parquet')"
    )
    cur = con.execute(spec.oracle)
    dcols = [d[0] for d in cur.description]
    order = sorted(range(len(dcols)), key=lambda i: dcols[i])
    drows = sorted(
        tuple(row[i] for i in order) for row in cur.fetchall()
    )
    con.close()
    assert scols == sorted(dcols)
    assert srows == drows


# URL strategy: scheme/host/path/query/fragment parts drawn so that
# generated URLs cover case variants, default and non-default ports,
# trailing slashes, utm_* and regular params, and fragments — the full
# input domain canonicalize_url claims to normalize.
_url_strategy = st.builds(
    lambda scheme, up, host, port, segs, slash, params, frag: (
        (scheme.upper() if up else scheme)
        + "://"
        + host
        + port
        + "/"
        + "/".join(segs)
        + ("/" if slash and segs else "")
        + ("?" + "&".join(params) if params else "")
        + ("#" + frag if frag else "")
    ),
    scheme=st.sampled_from(["http", "https"]),
    up=st.booleans(),
    host=st.sampled_from(
        ["a.example.org", "B.Example.ORG", "x.io", "WWW.X.IO"]
    ),
    port=st.sampled_from(["", ":443", ":80", ":8080"]),
    segs=st.lists(
        st.sampled_from(["doc", "alt", "p1", "Q2"]), max_size=3
    ),
    slash=st.booleans(),
    params=st.lists(
        st.sampled_from(
            ["lang=en", "ref=search", "utm_source=feed",
             "utm_campaign=promo", "q=a+b", "id=7"]
        ),
        max_size=4,
        unique=True,
    ),
    frag=st.sampled_from(["", "sec-2", "top"]),
)


@given(urls=st.lists(_url_strategy, min_size=1, max_size=25))
@_settings
def test_url_canonicalization_idempotent(spark, urls):
    """canonicalize(canonicalize(u)) == canonicalize(u): a canonical
    URL must be a fixed point of the transform, or dedup groups would
    depend on how many times a crawler re-normalized a link.  Also:
    no utm_ param, fragment, default port, or trailing slash survives,
    and scheme/host come out lowered."""
    from morphl_model_user_search_intent_spark.llm.dedup import (
        canonicalize_url,
    )

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = canonicalize_url(df).select(
        "url", F.col("canonical_url").alias("c1")
    )
    twice = canonicalize_url(
        once.select(F.col("c1").alias("url"))
    ).select(F.col("url").alias("c1b"), "canonical_url")
    for r in twice.collect():
        assert r.canonical_url == r.c1b, (r.c1b, r.canonical_url)
    for r in once.collect():
        c = r.c1
        assert "#" not in c and "utm_" not in c, (r.url, c)
        scheme, rest = c.split("://", 1)
        hp = rest.split("/", 1)[0]
        # only the DEFAULT port for the scheme is stripped —
        # http://h:443 and https://h:80 are non-default and must stay
        if scheme == "https":
            assert not hp.endswith(":443"), c
        if scheme == "http":
            assert not hp.endswith(":80"), c
        assert scheme == scheme.lower()
        hostpart = rest.split("/", 1)[0]
        assert hostpart == hostpart.lower(), (r.url, c)
        pathpart = rest.split("?", 1)[0]
        assert pathpart == "" or not pathpart.endswith("//"), c


# ---- sessionization: chunked == independent ground truth ---------------
# The planted-fixture test (tests/test_events.py) checks chunked ==
# serial SPARK; this property checks both against an INDEPENDENT
# pure-Python sessionizer on adversarial generated inputs — duplicate
# timestamps (tie-break by event_id), gaps exactly AT the 1800 s
# boundary (strictly-greater split rule), NULL values, single-event
# users — under both an interval (day) and an interleaved (event_id%3)
# chunking.

_sess_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # user_id
        st.integers(min_value=0, max_value=200_000),  # seconds offset
        st.one_of(
            st.none(),
            st.integers(min_value=0, max_value=9999),  # value cents
        ),
    ),
    min_size=1,
    max_size=40,
)


@_settings
@given(_sess_rows)
def test_chunked_sessionize_matches_python_ground_truth(spark, rows):
    import datetime as dt

    from morphl_model_user_search_intent_spark.operators.events import (
        sessionize_chunked,
    )

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    # snap some offsets onto exact 1800 s multiples so boundary gaps
    # (split iff gap > 1800 s STRICTLY) are actually exercised
    data = [
        (
            u,
            i,  # event_id = generation order
            base + dt.timedelta(seconds=(sec // 600) * 600),
            None if cents is None else cents / 100.0,
        )
        for i, (u, sec, cents) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "user_id bigint, event_id bigint, ts timestamp, value double",
    )

    # independent ground truth (pure Python, no Spark)
    expected = {}
    by_user: dict = {}
    for u, eid, ts, v in data:
        by_user.setdefault(u, []).append((ts, eid, v))
    for u, evs in by_user.items():
        evs.sort()
        sid = 0
        prev = None
        for ts, eid, v in evs:
            if prev is None or (ts - prev).total_seconds() > 1800:
                sid += 1
                expected[(u, sid)] = [0, ts, ts, 0, False]
            e = expected[(u, sid)]
            e[0] += 1
            e[2] = max(e[2], ts)
            if v is not None:
                e[3] += round(v * 100)
                e[4] = True
            prev = ts
    exp = {
        k: (n, s, t, (units / 100.0) if has else None)
        for k, (n, s, t, units, has) in expected.items()
    }

    for chunk in (
        F.col("ts").cast("date"),
        (F.col("event_id") % 3).cast("int"),
    ):
        got = {
            (r.user_id, r.session_id): (
                r.n_events,
                r.session_start,
                r.session_end,
                r.session_value,
            )
            for r in sessionize_chunked(df, chunk).collect()
        }
        assert got == exp, (got, exp)


@given(
    files=st.lists(
        st.tuples(
            st.integers(0, 9),              # partition value (or None-marker)
            st.booleans(),                  # records partition value?
            st.integers(0, 100),            # zone lo
            st.integers(0, 100),            # zone width
            st.booleans(),                  # records zone stats?
        ),
        min_size=1,
        max_size=40,
    ),
    want=st.lists(st.integers(0, 9), min_size=1, max_size=4),
    box=st.tuples(st.integers(0, 100), st.integers(0, 100)),
)
@settings(max_examples=200, deadline=None)
def test_manifest_pruning_is_never_lossy(files, want, box):
    """PROPERTY (r8): for ANY manifest layout — files with/without
    recorded partition values (partition evolution) and with/without
    zone stats — resolve_files + zone skipping keep EVERY file that
    could contain a qualifying row.  The model enumerates which files
    a brute-force reader would need; pruning must be a superset of
    exactly those (lossless), and must never keep a file whose
    RECORDED metadata excludes it (effective)."""
    from morphl_model_user_search_intent_spark.sources.acid import (
        resolve_files,
    )

    lo_q, hi_q = min(box), max(box)
    manifest_files = []
    partitions = {}
    stats = {}
    for i, (pv, has_pv, zlo, zw, has_zone) in enumerate(files):
        name = f"f{i:03d}.parquet"
        path = f"/t/data/{name}"
        manifest_files.append(path)
        if has_pv:
            partitions[name] = {"day": pv}
        if has_zone:
            stats[name] = {"rows": 1, "cols": {"k": [zlo, zlo + zw]}}
    m = {
        "files": manifest_files,
        "partitions": partitions,
        "stats": stats,
    }
    kept = set(resolve_files(m, {"day": want}))
    # model: a file MAY hold qualifying rows unless its RECORDED
    # partition value excludes it
    for i, (pv, has_pv, zlo, zw, has_zone) in enumerate(files):
        path = f"/t/data/f{i:03d}.parquet"
        may_qualify = (not has_pv) or (pv in want)
        if may_qualify:
            assert path in kept, "lossy partition prune"
        else:
            assert path not in kept, "ineffective partition prune"
    # zone layer (the scan()/scan_table_multi predicate): same
    # contract against the recorded [lo, hi]
    for i, (pv, has_pv, zlo, zw, has_zone) in enumerate(files):
        name = f"f{i:03d}.parquet"
        s = stats.get(name, {}).get("cols", {}).get("k")
        zone_keeps = s is None or (s[0] <= hi_q and s[1] >= lo_q)
        may_intersect = (not has_zone) or not (
            zlo > hi_q or zlo + zw < lo_q
        )
        assert zone_keeps == may_intersect


@given(
    files=st.lists(
        st.tuples(
            st.integers(0, 9),   # partition value
            st.booleans(),       # records partition value?
            st.booleans(),       # value recorded as string form?
        ),
        min_size=1,
        max_size=40,
    ),
    want=st.lists(
        st.one_of(
            st.integers(0, 9),
            st.integers(0, 9).map(str),  # type-mismatched filter
        ),
        min_size=1,
        max_size=4,
    ),
)
@settings(max_examples=200, deadline=None)
def test_indexed_resolution_equals_linear_for_any_layout(files, want):
    """PROPERTY (r9): for ANY manifest layout — evolution gaps,
    int/string recorded values, type-mismatched filter values — the
    serialized-index path (pidx) returns exactly the linear walk's
    file set, and both satisfy the lossless model (a file is pruned
    ONLY when its recorded value excludes every wanted value under
    typed-or-string-form equality)."""
    from morphl_model_user_search_intent_spark.sources.acid import (
        _build_pidx,
        resolve_files,
    )

    manifest_files, partitions = [], {}
    for i, (pv, has_pv, as_str) in enumerate(files):
        name = f"f{i:03d}.parquet"
        manifest_files.append(f"/t/data/{name}")
        if has_pv:
            partitions[name] = {"day": str(pv) if as_str else pv}
    linear = {"files": manifest_files, "partitions": partitions}
    indexed = dict(linear)
    indexed["pidx"] = _build_pidx(manifest_files, partitions)
    f = {"day": want}
    got_l = set(resolve_files(linear, f))
    got_i = set(resolve_files(indexed, f))
    assert got_i == got_l
    # r10 two-level manifest: the chunk-descriptor path must return
    # the identical file set for the same arbitrary layout
    import tempfile

    from morphl_model_user_search_intent_spark.sources.acid import (
        Manifest,
        _chunk_blocks,
    )

    with tempfile.TemporaryDirectory() as td:
        descs = _chunk_blocks(td, manifest_files, partitions, {})
        chunked = Manifest({"version": 1, "chunks": descs}, td)
        got_c = set(resolve_files(chunked, f))
    assert got_c == got_l
    wstr = {str(w) for w in want}
    for i, (pv, has_pv, as_str) in enumerate(files):
        path = f"/t/data/f{i:03d}.parquet"
        may_qualify = (not has_pv) or (str(pv) in wstr)
        assert (path in got_l) == may_qualify
