"""Iterative graph algorithms on DataFrames (PageRank).

The reference family's behavioral models sit on user/item interaction
graphs (SURVEY.md §1.1); PageRank over a co-purchase graph is the
canonical "importance" feature such pipelines feed a ranker.  Spark has
no built-in PageRank on DataFrames — the idiomatic spelling is a
driver-side loop of join→groupBy rounds, each one an ordinary shuffle
Catalyst optimizes like any other (partial aggs, AQE).  At 100 TB the
loop wants ``.checkpoint()`` every few rounds to truncate lineage and a
stable hash partitioning on ``src``/``dst`` so every round reuses the
same exchange; at fixture scale the unrolled 5-round plan is small
enough to run as one job.

Cross-engine determinism: ranks are fixed-point BIGINT units (1e12 =
mass 1.0) and every step is integer arithmetic — ``DIV`` for the
out-degree split and the damping factor 0.85 applied as ``·17 DIV
20``.  Float summation order can never matter because there are no
floats until the final display division.  The DuckDB oracle unrolls
the same five rounds as chained CTEs (recursive CTEs disallow
aggregation in the recursive term), computing byte-identical BIGINTs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import register

SCALE = 1_000_000_000_000  # rank mass 1.0 in integer units

_PR_ITER = """
    r{k} AS MATERIALIZED (
      SELECT e.dst AS node,
             base.b + (17 * CAST(SUM(r{j}.r // deg.outdeg) AS BIGINT)) // 20
               AS r
      FROM r{j}
      JOIN e   ON e.src   = r{j}.node
      JOIN deg ON deg.src = r{j}.node
      CROSS JOIN base
      GROUP BY e.dst, base.b
    )"""

_PR_ORACLE = (
    """
    WITH op AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS MATERIALIZED (
      -- MATERIALIZED hints throughout: DuckDB inlines plain CTEs, so
      -- the unrolled 5-iteration chain re-expanded the 25M-edge
      -- self-join per reference — at sf1.0 the oracle spilled >60 GB
      -- and died on disk; materialization computes each stage once.
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2
    ),
    deg AS MATERIALIZED (
            SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
            FROM e GROUP BY src),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
    base AS (SELECT (3 * 1000000000000) // (20 * n) AS b FROM nn),
    r0 AS MATERIALIZED (
           SELECT src AS node, 1000000000000 // nn.n AS r
           FROM deg CROSS JOIN nn),"""
    + ",".join(_PR_ITER.format(k=k, j=k - 1) for k in range(1, 6))
    + """
    SELECT node, r AS rank_units,
           ROUND(r / 1000000000000.0, 9) AS rank
    FROM r5 ORDER BY r DESC, node LIMIT 20
    """
)


@register("q_graph_pagerank", oracle=_PR_ORACLE)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five damped PageRank rounds over the part co-purchase graph.

    Nodes: parts; edges: both directions of "appeared in the same
    order" (deduped).  Symmetric edges mean every node has out-degree
    ≥1, so there is no dangling-mass term.  Each round is one
    edges⋈ranks join (shuffle on the node key, bounded fan-out per
    order: ≤7 parts → ≤42 directed pairs) plus one partial-aggregated
    groupBy — the same shuffle key every round, so a pre-partitioned
    edge table amortizes to a single exchange at scale.
    """
    li = table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a, b = op.alias("a"), op.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
        # Round-10 optimization: materialize the edge build once —
        # deg, e2's cache population, nn and the rank seed are
        # separate consumers (nn/ranks execute as their own broadcast
        # jobs) and each re-ran the distinct self-join; actions share
        # no shuffle output.  Measured at sf0.1 (build+collect):
        # 6.2 s → 4.2 s, identical top-20.
        .localCheckpoint()
    )
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    e2 = e.join(deg, "src").cache()  # reused every round
    nn = deg.agg(F.count("*").alias("n"))
    base = nn.select(
        F.expr(f"(3 * CAST({SCALE} AS BIGINT)) div (20 * n)").alias("b")
    )
    ranks = (
        deg.select(F.col("src").alias("node"))
        .crossJoin(F.broadcast(nn))
        .select("node", F.expr(f"CAST({SCALE} AS BIGINT) div n").alias("r"))
    )
    for _ in range(5):
        ranks = (
            ranks.join(e2, ranks.node == e2.src)
            .groupBy("dst")
            .agg(F.sum(F.expr("r div outdeg")).alias("s"))
            .crossJoin(F.broadcast(base))
            .select(
                F.col("dst").alias("node"),
                F.expr("b + (17 * s) div 20").alias("r"),
            )
        )
    return (
        ranks.select(
            "node",
            F.col("r").alias("rank_units"),
            F.round(F.col("r") / F.lit(float(SCALE)), 9).alias("rank"),
        )
        .orderBy(F.col("rank_units").desc(), "node")
        .limit(20)
    )


@register(
    "q_graph_twohop",
    oracle="""
    WITH op AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS MATERIALIZED (
      -- MATERIALIZED hints throughout: DuckDB inlines plain CTEs, so
      -- the unrolled 5-iteration chain re-expanded the 25M-edge
      -- self-join per reference — at sf1.0 the oracle spilled >60 GB
      -- and died on disk; materialization computes each stage once.
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2
    ),
    seeds AS (SELECT DISTINCT src FROM e WHERE src % 50 = 0),
    hop1 AS (SELECT e.src, e.dst FROM e JOIN seeds USING (src)),
    hop2 AS (
      SELECT h.src, e2.dst
      FROM hop1 h JOIN e e2 ON e2.src = h.dst
      WHERE e2.dst <> h.src
      GROUP BY 1, 2
    )
    SELECT s.src AS part,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM hop1
            WHERE hop1.src = s.src) AS n_direct,
           CAST(COUNT(*) AS BIGINT) AS n_twohop,
           CAST(SUM(CASE WHEN h1.dst IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new_at_2
    FROM hop2 s
    LEFT JOIN hop1 h1 ON h1.src = s.src AND h1.dst = s.dst
    GROUP BY s.src
    """,
)
def q_graph_twohop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop neighborhoods on the co-purchase graph for a
    deterministic seed sample: direct neighbors, distinct 2-hop
    reach, and how many of those are NEW at hop 2 — the expansion
    profile behind "customers also bought" candidate generation and
    graph feature engineering (a flat hop-2 curve means a clustered
    graph; steep means broad discovery).

    Frontier-expansion spelling: seeds ⋈ edges ⋈ edges with dedup at
    each hop — the standard BFS-by-joins that scales as |frontier|·
    avg-degree per hop (seeds are sampled 1-in-50 precisely because
    hop-2 frontiers grow quadratically; production runs shard seeds
    the same way).  All counts exact; the anti-membership flag comes
    from a left join against hop 1.
    """
    li = table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a, b = op.alias("a"), op.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
    )
    hop1 = e.filter(F.col("src") % 50 == 0)
    n_direct = hop1.groupBy("src").agg(F.count("*").alias("n_direct"))
    e2 = e.select(
        F.col("src").alias("mid"), F.col("dst").alias("dst2")
    )
    hop2 = (
        hop1.join(e2, hop1.dst == e2.mid)
        .filter(F.col("dst2") != F.col("src"))
        .select("src", F.col("dst2").alias("dst"))
        .distinct()
    )
    h1m = hop1.select(
        F.col("src").alias("m_src"),
        F.col("dst").alias("m_dst"),
        F.lit(1).alias("direct"),
    )
    return (
        hop2.join(
            h1m,
            (hop2.src == h1m.m_src) & (hop2.dst == h1m.m_dst),
            "left",
        )
        .groupBy("src")
        .agg(
            F.count("*").alias("n_twohop"),
            F.sum(
                F.when(F.col("direct").isNull(), 1).otherwise(0)
            ).alias("n_new_at_2"),
        )
        .join(n_direct, "src")
        .select(
            F.col("src").alias("part"),
            "n_direct",
            "n_twohop",
            "n_new_at_2",
        )
    )


@register(
    "q_graph_triangles",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    edges AS (
      SELECT a.vec_id AS s, b.vec_id AS t
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.35
    ),
    tri AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM edges e1
      JOIN edges e2 ON e2.s = e1.t
      JOIN edges e3 ON e3.s = e1.s AND e3.t = e2.t
    ),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT s AS node FROM edges
            UNION ALL SELECT t FROM edges)
      GROUP BY node
    ),
    wedge AS (
      SELECT SUM(d * (d - 1) / 2) AS n_wedges,
             CAST(COUNT(*) AS BIGINT) AS n_nodes
      FROM deg
    ),
    ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM edges)
    SELECT ne.n_edges, wedge.n_nodes, tri.n_triangles,
           CAST(wedge.n_wedges AS BIGINT) AS n_wedges,
           CASE WHEN wedge.n_wedges > 0 THEN
             ROUND(3.0 * CAST(tri.n_triangles AS DOUBLE)
                   / CAST(wedge.n_wedges AS DOUBLE), 6)
           END AS global_clustering
    FROM ne CROSS JOIN wedge CROSS JOIN tri
    """,
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting + global clustering coefficient on the
    embedding similarity graph (edges = cosine ≥ 0.35, the
    q_sim_threshold edge set): C = 3·triangles/wedges — the graph
    statistic distinguishing clique-like near-dup clusters from
    star-shaped hub noise, alongside PageRank (q_graph_pagerank)
    and components (q_dedup_clusters).

    Edge build: the blocked numpy cosine kernel
    (``llm.similarity._blocked_pair_cosines``) — vectorized
    mapInPandas blocks, IEEE-identical doubles to the JVM fold,
    emitting only near-threshold pairs through Arrow.  This replaced
    an interpreted all-pairs BroadcastNestedLoopJoin (the round-6
    verdict's one scale-killer: 1651s in the sf1.0 sweep vs
    q_sim_threshold's 75s on the same edge definition).

    Triangle count: edges are ORIENTED BY DEGREE — each undirected
    edge directed from its lower-(degree, id) endpoint to the higher
    — then two partitioned self-joins close the wedges.  Under this
    total order every triangle appears exactly once, and wedge
    fan-out from a hub of degree d is bounded: a hub receives most
    of its edges as in-edges, so its out-degree (what the wedge join
    fans out on) is O(sqrt(m)) in the worst case — the standard
    skew-robust formulation (Schank–Wagner / Cohen MapReduce
    triangles), instead of raw-id orientation where one hot low-id
    hub fans out its full degree.  Wedge counts are exact integers
    from the undirected degree table.
    """
    from ..llm.similarity import _blocked_pair_cosines

    edges = (
        _blocked_pair_cosines(spark, sf_dir, 0.35)
        .filter(F.round(F.col("c"), 6) >= 0.35)
        .select(F.col("va").alias("s"), F.col("vb").alias("t"))
    ).cache()
    deg = (
        edges.select(F.col("s").alias("node"))
        .unionAll(edges.select(F.col("t").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("d"))
    )
    # Degree-oriented edges: u -> v iff (deg[u], u) < (deg[v], v).
    # The degree table is |V| rows — broadcast it to both endpoints.
    ds = F.broadcast(deg).select(
        F.col("node").alias("s"), F.col("d").alias("d_s")
    )
    dt = F.broadcast(deg).select(
        F.col("node").alias("t"), F.col("d").alias("d_t")
    )
    fwd = (F.col("d_s") < F.col("d_t")) | (
        (F.col("d_s") == F.col("d_t")) & (F.col("s") < F.col("t"))
    )
    oriented = (
        edges.join(ds, "s")
        .join(dt, "t")
        .select(
            F.when(fwd, F.col("s")).otherwise(F.col("t")).alias("u"),
            F.when(fwd, F.col("t")).otherwise(F.col("s")).alias("v"),
        )
    ).cache()
    e2 = oriented.select(F.col("u").alias("u2"), F.col("v").alias("v2"))
    e3 = oriented.select(F.col("u").alias("u3"), F.col("v").alias("v3"))
    tri = (
        oriented.join(e2, F.col("u2") == F.col("v"))
        .join(
            e3,
            (F.col("u3") == F.col("u")) & (F.col("v3") == F.col("v2")),
        )
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )
    wedge = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("n_wedges"),
        F.count("*").cast("bigint").alias("n_nodes"),
    )
    ne = edges.agg(F.count("*").cast("bigint").alias("n_edges"))
    out = (
        ne.crossJoin(wedge)
        .crossJoin(tri)
        .select(
            "n_edges",
            "n_nodes",
            "n_triangles",
            F.col("n_wedges").cast("bigint").alias("n_wedges"),
            F.when(
                F.col("n_wedges") > 0,
                F.round(
                    3.0 * F.col("n_triangles").cast("double")
                    / F.col("n_wedges").cast("double"),
                    6,
                ),
            ).alias("global_clustering"),
        )
    )
    return out


# --------------------------------------------------------------- LPA

_LPA_ROUNDS = 3

_LPA_EDGES = """
    op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS t
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    lbl0 AS (SELECT DISTINCT s AS node, s AS lbl FROM edges)
"""


def _lpa_round_sql(i: int) -> str:
    return f"""
    lbl{i} AS (
      SELECT node, lbl FROM (
        SELECT e.t AS node, lb.lbl AS lbl, COUNT(*) AS c,
               ROW_NUMBER() OVER (
                 PARTITION BY e.t
                 ORDER BY COUNT(*) DESC, lb.lbl) AS rn
        FROM edges e JOIN lbl{i - 1} lb ON lb.node = e.s
        GROUP BY e.t, lb.lbl
      ) q WHERE rn = 1
    )"""


@register(
    "q_graph_labelprop",
    oracle="WITH "
    + _LPA_EDGES
    + ","
    + ",".join(_lpa_round_sql(i) for i in range(1, _LPA_ROUNDS + 1))
    + f"""
    , comm AS (
      SELECT lbl AS community, CAST(COUNT(*) AS BIGINT) AS n_members,
             CAST(MIN(node) AS BIGINT) AS min_node,
             CAST(MAX(node) AS BIGINT) AS max_node
      FROM lbl{_LPA_ROUNDS} GROUP BY lbl
    )
    SELECT community, n_members, min_node, max_node
    FROM comm WHERE n_members >= 2
    """,
)
def q_graph_labelprop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (3 rounds)
    on the part co-purchase graph: every node adopts the most frequent
    label among its neighbors each round (tie → smallest label) — the
    Raghavan et al. LPA, the near-linear-time community algorithm that
    complements component-finding (q_dedup_clusters finds *connected*
    groups; LPA finds *densely linked* ones inside them).  Output:
    communities of ≥2 members with size and node-range.

    Fully deterministic despite LPA's reputation: synchronous updates
    + total tie-break (count DESC, label ASC) make every round a pure
    function of the last, so 3 unrolled CTE rounds in DuckDB reproduce
    the Spark loop bit-for-bit.  Each round is one shuffle join
    (labels⋈edges on the source key) + one count aggregate + one
    per-node argmax (WindowGroupLimit bounds it); label lineage is
    localCheckpoint-truncated per round, the same bounded-round
    discipline as PageRank above.  Edges are hash-partitioned and
    sorted by src once (cached), so every round's join reuses that
    one exchange — the 100 TB posture, shipped since round 10.
    """
    li = table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.alias("a")
    b = op.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("s"),
            F.col("b.l_partkey").alias("t"),
        )
        .distinct()
        # Round-10 optimization (guide §2.4): every round's
        # labels⋈edges join keys on s, so hash-partition + sort the
        # edge table by s ONCE and cache it — the per-round label
        # localCheckpoints are eager actions, so round 1 materializes
        # the cache and rounds 2-3 (and the final agg) plan against
        # the known hashpartitioning(s)/sorted layout, skipping the
        # edge-side Exchange and Sort.  A/B at sf0.1 (warm collect,
        # idle local[32]): localCheckpoint 3.84-6.04 s / plain cache
        # 4.21 s / this form 2.88-3.02 s, identical communities.
        # (Repartitioning BEFORE the distinct measured 3.90 s — it
        # ships the un-deduplicated pair set, losing the map-side
        # partial dedup; deliberately not done.)
        .repartition(
            int(spark.conf.get("spark.sql.shuffle.partitions")), "s"
        )
        .sortWithinPartitions("s")
        .cache()
    )
    labels = edges.select(F.col("s").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    from pyspark.sql import Window as W

    for _ in range(_LPA_ROUNDS):
        cnt = (
            edges.join(
                labels.toDF("s", "s_lbl"), "s"
            )
            .groupBy(F.col("t").alias("node"), F.col("s_lbl").alias("lbl"))
            .agg(F.count("*").alias("c"))
        )
        labels = (
            cnt.withColumn(
                "rn",
                F.row_number().over(
                    W.partitionBy("node").orderBy(
                        F.col("c").desc(), F.col("lbl")
                    )
                ),
            )
            .filter(F.col("rn") == 1)
            .select("node", "lbl")
            .localCheckpoint()
        )
    return (
        labels.groupBy(F.col("lbl").alias("community"))
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.min("node").cast("bigint").alias("min_node"),
            F.max("node").cast("bigint").alias("max_node"),
        )
        .filter(F.col("n_members") >= 2)
    )


@register(
    "q_graph_adamic",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    deg AS (
      SELECT o, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY o
    ),
    w AS (
      SELECT o, CAST(ROUND(1.0 / LN(CAST(d AS DOUBLE)), 8)
                     AS DECIMAL(18,8)) AS w
      FROM deg WHERE d >= 2
    ),
    pairs AS (
      SELECT a.p AS p1, b.p AS p2, w.w
      FROM edges a
      JOIN edges b ON a.o = b.o AND a.p < b.p
      JOIN w ON w.o = a.o
    ),
    aa AS (
      SELECT p1, p2,
             CAST(COUNT(*) AS BIGINT) AS n_common,
             SUM(w) AS aa_score
      FROM pairs GROUP BY p1, p2
    )
    SELECT p1, p2, n_common,
           ROUND(CAST(aa_score AS DOUBLE), 6) AS aa
    FROM aa
    ORDER BY aa_score DESC, p1, p2
    LIMIT 20
    """,
)
def q_graph_adamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the part co-purchase graph —
    parts sharing many SMALL orders are more related than parts
    sharing huge ones: AA(p₁,p₂) = Σ_{o ∈ common} 1/ln(deg(o)).  The
    standard similar-item candidate generator a behavioral model
    (SURVEY.md §1.1 user/item graphs) feeds its ranker.

    Scale posture: the self-join explodes each order into C(deg,2)
    pairs, so cost is bounded by the per-order line count (≤7 in
    TPC-H-shaped data; a real pipeline caps deg before the join — the
    same guard q_dedup_minhash applies to bucket sizes).  Weights are
    rounded to DECIMAL(18,8) before the per-pair sum so the float
    total is order-independent; ranking compares the exact decimal.
    Top-20 via TakeOrdered (rank-based, no global sort
    materialization).
    """
    li = table(spark, sf_dir, "lineitem")
    # Round-10 (guide §5, the kcore/pagerank fix): the distinct edge
    # base feeds the self-join's two sides AND the per-order weight
    # aggregate — the weight subtree shares no exchange with the join
    # sides, so the 600k-row distinct ran twice.  One eager
    # localCheckpoint materializes it once for all three consumers.
    edges = (
        li.select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .localCheckpoint()
    )
    deg = edges.groupBy("o").agg(F.count("*").cast("bigint").alias("d"))
    w = deg.filter(F.col("d") >= 2).select(
        "o",
        F.round(1.0 / F.log(F.col("d").cast("double")), 8)
        .cast("decimal(18,8)")
        .alias("w"),
    )
    a = edges.alias("a")
    b = edges.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.o") == F.col("b.o"))
            & (F.col("a.p") < F.col("b.p")),
        )
        .join(w.alias("wd"), F.col("wd.o") == F.col("a.o"))
        .select(
            F.col("a.p").alias("p1"),
            F.col("b.p").alias("p2"),
            F.col("wd.w").alias("w"),
        )
    )
    aa = pairs.groupBy("p1", "p2").agg(
        F.count("*").cast("bigint").alias("n_common"),
        F.sum("w").alias("aa_score"),
    )
    return (
        aa.orderBy(
            F.col("aa_score").desc(), F.col("p1"), F.col("p2")
        )
        .limit(20)
        .select(
            "p1",
            "p2",
            "n_common",
            F.round(F.col("aa_score").cast("double"), 6).alias("aa"),
        )
    )


@register(
    "q_graph_jaccard",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    pdeg AS (
      SELECT p, CAST(COUNT(*) AS BIGINT) AS dp FROM edges GROUP BY p
    ),
    common AS (
      SELECT a.p AS p1, b.p AS p2, CAST(COUNT(*) AS BIGINT) AS c
      FROM edges a JOIN edges b ON a.o = b.o AND a.p < b.p
      GROUP BY 1, 2
    )
    SELECT p1, p2, c AS n_common,
           CAST(d1.dp AS BIGINT) AS deg1, CAST(d2.dp AS BIGINT) AS deg2,
           ROUND(CAST(c AS DOUBLE) / (d1.dp + d2.dp - c), 6) AS jaccard
    FROM common
    JOIN pdeg d1 ON d1.p = p1
    JOIN pdeg d2 ON d2.p = p2
    WHERE c >= 2
    ORDER BY CAST(c AS DOUBLE) / (d1.dp + d2.dp - c) DESC, p1, p2
    LIMIT 20
    """,
)
def q_graph_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node-neighborhood Jaccard link prediction on the part
    co-purchase graph — J(p₁,p₂) = |N₁∩N₂| / |N₁∪N₂| over order
    neighborhoods, the degree-normalized complement to
    q_graph_adamic (which weights by order size instead).

    Common-neighbor counts come from the same bounded per-order
    self-join (C(deg,2) pairs, deg ≤ order line count); degrees are a
    broadcast-sized side.  The ratio is one double division — bitwise
    identical across engines for BIGINT inputs — and the top-20
    ordering tie-breaks on (p1, p2), so the LIMIT boundary is
    deterministic.  TakeOrdered, no global sort materialization.
    """
    li = table(spark, sf_dir, "lineitem")
    # Round-10: same materialize-once as q_graph_adamic — the degree
    # subtree re-ran the distinct alongside the self-join sides.
    edges = (
        li.select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .localCheckpoint()
    )
    pdeg = edges.groupBy("p").agg(F.count("*").cast("bigint").alias("dp"))
    a = edges.alias("a")
    b = edges.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.o") == F.col("b.o"))
            & (F.col("a.p") < F.col("b.p")),
        )
        .groupBy(
            F.col("a.p").alias("p1"), F.col("b.p").alias("p2")
        )
        .agg(F.count("*").cast("bigint").alias("c"))
        .filter(F.col("c") >= 2)
    )
    d1 = pdeg.select(F.col("p").alias("p1"), F.col("dp").alias("deg1"))
    d2 = pdeg.select(F.col("p").alias("p2"), F.col("dp").alias("deg2"))
    jac = F.col("c").cast("double") / (
        F.col("deg1") + F.col("deg2") - F.col("c")
    )
    return (
        common.join(d1, "p1")
        .join(d2, "p2")
        .orderBy(jac.desc(), "p1", "p2")
        .limit(20)
        .select(
            "p1",
            "p2",
            F.col("c").alias("n_common"),
            "deg1",
            "deg2",
            F.round(jac, 6).alias("jaccard"),
        )
    )


@register(
    "q_graph_degree_dist",
    oracle="""
    WITH op AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS MATERIALIZED (
      -- MATERIALIZED hints throughout: DuckDB inlines plain CTEs, so
      -- the unrolled 5-iteration chain re-expanded the 25M-edge
      -- self-join per reference — at sf1.0 the oracle spilled >60 GB
      -- and died on disk; materialization computes each stage once.
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2
    ),
    deg AS (
      SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY src
    ),
    bucketed AS (
      SELECT CASE WHEN d = 1 THEN '01'
                  WHEN d = 2 THEN '02'
                  WHEN d <= 4 THEN '03-04'
                  WHEN d <= 8 THEN '05-08'
                  WHEN d <= 16 THEN '09-16'
                  WHEN d <= 32 THEN '17-32'
                  WHEN d <= 64 THEN '33-64'
                  ELSE '65+' END AS degree_bucket,
             d
      FROM deg
    )
    SELECT degree_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MIN(d) AS BIGINT) AS min_degree,
           CAST(MAX(d) AS BIGINT) AS max_degree,
           CAST(SUM(d) AS BIGINT) AS sum_degree
    FROM bucketed
    GROUP BY degree_bucket
    """,
)
def q_graph_degree_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the part co-purchase graph in doubling
    buckets — the first diagnostic run on ANY production graph before
    choosing join strategies: a heavy tail here is exactly what makes
    naive self-joins explode, so this histogram is the input to the
    skew-handling decisions (salting thresholds, degree caps) that
    q_graph_adamic/q_dedup_minhash document.

    Integer-only: distinct edges → per-node degree count → CASE
    bucket → count/min/max/sum per bucket, all map-side-combinable
    shuffles on bounded keys.
    """
    li = table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a, b = op.alias("a"), op.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count("*").cast("bigint").alias("d"))
    bucket = (
        F.when(F.col("d") == 1, "01")
        .when(F.col("d") == 2, "02")
        .when(F.col("d") <= 4, "03-04")
        .when(F.col("d") <= 8, "05-08")
        .when(F.col("d") <= 16, "09-16")
        .when(F.col("d") <= 32, "17-32")
        .when(F.col("d") <= 64, "33-64")
        .otherwise("65+")
    )
    return deg.select(bucket.alias("degree_bucket"), "d").groupBy(
        "degree_bucket"
    ).agg(
        F.count("*").cast("bigint").alias("n_nodes"),
        F.min("d").cast("bigint").alias("min_degree"),
        F.max("d").cast("bigint").alias("max_degree"),
        F.sum("d").cast("bigint").alias("sum_degree"),
    )


_KCORE_K = 3

# MATERIALIZED: each peel round references the previous edge set
# THREE times (degree count + two keep joins); DuckDB inlines plain
# CTEs, so the unrolled rounds re-expanded the base 25M-edge
# self-join ~3^r times — the sf1.0 oracle spilled to disk death.
_KCORE_PEEL = """
    deg{r} AS MATERIALIZED (
      SELECT src, CAST(COUNT(*) AS BIGINT) AS d
      FROM e{p} GROUP BY src
    ),
    keep{r} AS MATERIALIZED (SELECT src FROM deg{r} WHERE d >= {k}),
    e{r} AS MATERIALIZED (
      SELECT e.src, e.dst FROM e{p} e
      JOIN keep{r} ka ON ka.src = e.src
      JOIN keep{r} kb ON kb.src = e.dst
    )"""


@register(
    "q_graph_kcore",
    oracle=(
        """
    WITH op AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS MATERIALIZED (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2
    ),"""
        + ",".join(
            _KCORE_PEEL.format(r=r, p=r - 1, k=_KCORE_K)
            for r in (1, 2, 3)
        )
        + """
    SELECT 1 AS round,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM keep1) AS n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM e1) AS n_edges
    UNION ALL
    SELECT 2,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM keep2),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM e2)
    UNION ALL
    SELECT 3,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM keep3),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM e3)
    """
    ),
)
def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three peeling rounds toward the 3-core of the co-purchase
    graph: repeatedly drop nodes with degree < 3 and their incident
    edges, reporting (nodes, edges) after each round — the
    densest-substructure triage (community cores, spam rings) that
    complements q_graph_degree_dist (static histogram) with the
    iterative view.  Full k-core runs to fixpoint; three rounds are
    unrolled so the DuckDB twin can replay them as chained CTEs and
    hash-check every intermediate.

    Each round is one degree aggregate + one semi-join-shaped edge
    filter — the same join/agg building blocks as PageRank, shuffling
    on the node key every time (a real deployment pre-partitions the
    edge table once and reuses the exchange).
    """
    li = table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a, b = op.alias("a"), op.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
        # Round-10 optimization: materialize the base edge set ONCE.
        # Without this, round 1 rebuilt the distinct self-join three
        # times (the peel join's deg input, the peeled-edge
        # checkpoint, and keep.count() each executed it) — separate
        # actions share no shuffle output.  Same for `keep` below:
        # checkpointing it serves both the two-sided peel join and
        # the n_nodes count from one materialization.  Measured at
        # sf0.1: 7.1 s → 4.7 s, identical rows.  (An alternating
        # join-key scheme that pre-partitions the edge set and ends
        # each round partitioned for the next — one big exchange per
        # round instead of two — measured a wash, 5.02 ≈ 5.07 s: at
        # this round count the per-round fixed job cost dominates the
        # saved exchange.  Deliberately kept in this simpler form.)
        .localCheckpoint()
    )
    rows = []
    for rnd in (1, 2, 3):
        deg = e.groupBy("src").agg(F.count("*").alias("d"))
        keep = (
            deg.filter(F.col("d") >= _KCORE_K)
            .select("src")
            .localCheckpoint()
        )
        e = (
            e.join(keep.withColumnRenamed("src", "ka"), F.col("src") == F.col("ka"))
            .join(keep.withColumnRenamed("src", "kb"), F.col("dst") == F.col("kb"))
            .select("src", "dst")
            .localCheckpoint()
        )
        n_nodes = keep.count()
        n_edges = e.count()
        rows.append((rnd, n_nodes, n_edges))
    return spark.createDataFrame(
        rows, "round int, n_nodes bigint, n_edges bigint"
    )
