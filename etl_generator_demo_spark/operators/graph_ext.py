"""Round-8 graph family: community detection and graph statistics over
the part co-purchase graph.

Completes the relationship-mining surface begun by ``g_triangle_count``
/ ``g_pagerank_tree`` / ``g_clustering_coefficient`` in
``hierarchy.py`` — the reference exposes its join graph to users
(``/root/reference/sample_metadata.py:68-74``), and these are the
operators a user of that surface runs to MINE the relationships rather
than merely traverse them.

Discipline (same as the rest of the iterative family):

- every iteration is an aggregate-join keyed on a graph key (node or
  edge) — partial aggregation shuffles one row per (node, label), never
  per edge-visit;
- fixed iteration counts, unrolled-CTE oracles — both engines run the
  identical synchronous schedule, so results are hash-exact;
- ``localCheckpoint(eager=True)`` per round cuts lineage growth (the
  O(log n)-round lesson from ``dedup_clusters.py``);
- all scores integer fixed-point (e6/e9) or FLOOR-scaled ratios of
  exact integer sums — nothing can wobble between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .hierarchy import copurchase_edges
from .relational import t

#: Synchronous label-propagation rounds. Fixed (not run-to-convergence):
#: synchronous LPA can 2-cycle on bipartite structures, so a fixed
#: schedule is the only deterministic cross-engine contract; 4 rounds
#: propagates labels across a diameter-8 neighborhood which saturates
#: the co-purchase fixture (and is the standard "few sweeps" regime of
#: Raghavan et al. 2007).
LPA_ROUNDS = 4

#: Peeling rounds for the fixed-round k-core approximation. Each round
#: removes every node of current degree < k; the true k-core is the
#: fixpoint, reached here when a round removes nothing (the fixture
#: converges in 3; a 100 TB run sizes rounds ~O(log n) like the
#: connected-components operator).
KCORE_K = 3
KCORE_ROUNDS = 4

#: Adamic-Adar center cap: wedges are enumerated at their common
#: neighbor, a Σdeg² relation that a hub node makes quadratic. Capping
#: the CENTER degree (standard hub-capped AA) bounds it at cap²·n while
#: only discounting the near-zero 1/ln(deg) contributions of mega-hubs;
#: identical cap in the oracle keeps the check exact.
AA_CENTER_CAP = 64

_EDGES_SQL = """
    e AS (
        SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    sym AS (
        SELECT pa AS u, pb AS v FROM e
        UNION ALL
        SELECT pb AS u, pa AS v FROM e
    )
"""


def _sym(edges: DataFrame) -> DataFrame:
    return edges.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionAll(
        edges.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )


def label_propagation(edges: DataFrame, rounds: int = LPA_ROUNDS) -> DataFrame:
    """(node, community) after ``rounds`` synchronous LPA sweeps.

    Initial label = own id; each sweep every node adopts the most
    frequent label among its neighbors, ties broken by SMALLEST label
    (min-label determinism, as in the connected-components operator).
    The arg-max is the aggregate ``max(struct(c, -label))`` — one
    partial-aggregable reduction per node, no window — so each round is
    exactly two keyed shuffles (neighbor-label count, per-node max),
    each carrying at most one row per (node, distinct neighbor label).
    Every node has degree ≥ 1 by construction (the node set is the edge
    endpoints), so the count relation covers all nodes every round."""
    sym = _sym(edges).localCheckpoint(eager=True)
    labels = sym.select("u").distinct().select(
        F.col("u").alias("node"), F.col("u").cast("long").alias("label")
    )
    for _ in range(rounds):
        nbr = sym.join(
            labels.select(F.col("node").alias("v"), "label"), "v"
        ).select(F.col("u").alias("node"), "label")
        cnt = nbr.groupBy("node", "label").agg(F.count(F.lit(1)).alias("c"))
        labels = (
            cnt.groupBy("node")
            .agg(
                F.max(
                    F.struct(F.col("c"), (-F.col("label")).alias("nl"))
                ).alias("m")
            )
            .select("node", (-F.col("m.nl")).cast("long").alias("label"))
            .localCheckpoint(eager=True)
        )
    return labels


def _lpa_oracle_ctes(rounds: int = LPA_ROUNDS) -> str:
    """Unrolled-CTE LPA over the co-purchase graph, ending in a CTE
    named ``lab{rounds}`` with columns (node, label)."""
    sql = f"""
    WITH {_EDGES_SQL},
    lab0 AS (SELECT DISTINCT u AS node, CAST(u AS BIGINT) AS label FROM sym)
    """
    for k in range(1, rounds + 1):
        sql += f""",
    cnt{k} AS (
        SELECT s.u AS node, l.label, CAST(COUNT(*) AS BIGINT) AS c
        FROM sym s JOIN lab{k - 1} l ON l.node = s.v
        GROUP BY s.u, l.label
    ),
    lab{k} AS (
        SELECT node, label FROM (
            SELECT node, label,
                   ROW_NUMBER() OVER (
                       PARTITION BY node ORDER BY c DESC, label ASC
                   ) AS rn
            FROM cnt{k}
        ) WHERE rn = 1
    )
    """
    return sql


@register(
    "g_label_propagation",
    oracle=_lpa_oracle_ctes()
    + f"""
    SELECT node, label AS community FROM lab{LPA_ROUNDS} ORDER BY node
    """,
    survey_ids=("J3", "A1", "U1"),
)
def g_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) over the part co-purchase graph — the graph family's
    community member, after the census (`g_triangle_count`), centrality
    (`g_pagerank_tree`), and cohesion (`g_clustering_coefficient`)
    operators. Emits every node's community label after LPA_ROUNDS
    fixed sweeps; min-label tie-break makes the sweep schedule the only
    degree of freedom, and fixing it makes the result hash-exact
    against the unrolled-CTE oracle. Scale: each sweep is two keyed
    shuffles bounded by Σ|distinct neighbor labels| ≤ |sym edges|;
    label state is one long per node; localCheckpoint per sweep keeps
    lineage flat — the identical shape to the proven log-round
    connected-components operator (`dedup_clusters.py`)."""
    labels = label_propagation(copurchase_edges(t(spark, sf_dir, "lineitem")))
    return labels.select("node", F.col("label").alias("community")).orderBy(
        "node"
    )


@register(
    "g_community_sizes",
    oracle=_lpa_oracle_ctes()
    + f"""
    , members AS (
        SELECT label AS community, node FROM lab{LPA_ROUNDS}
    ),
    internal AS (
        SELECT ma.community, CAST(COUNT(*) AS BIGINT) AS internal_edges
        FROM e
        JOIN members ma ON ma.node = e.pa
        JOIN members mb ON mb.node = e.pb
        WHERE ma.community = mb.community
        GROUP BY ma.community
    ),
    deg AS (
        SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY u
    )
    SELECT m.community,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(d.deg) AS BIGINT) AS degree_sum,
           COALESCE(ANY_VALUE(i.internal_edges), 0) AS internal_edges
    FROM members m
    JOIN deg d ON d.node = m.node
    LEFT JOIN internal i ON i.community = m.community
    GROUP BY m.community
    ORDER BY n_members DESC, m.community
    LIMIT 25
    """,
    survey_ids=("J3", "A1", "O4"),
)
def g_community_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 LPA communities by size with their internal edge count
    and degree mass — the summary a curation pipeline reads before
    deciding whether a 'community' is a real product cluster or one
    giant percolated blob (n_members vs internal_edges tells which).
    All integers; the internal-edge count joins the edge list to the
    label map on each endpoint — two broadcast-able joins at fixture
    scale, two co-keyed shuffles at 100 TB."""
    edges = copurchase_edges(t(spark, sf_dir, "lineitem")).localCheckpoint(
        eager=True
    )
    labels = label_propagation(edges)
    members = labels.select(F.col("label").alias("community"), "node")
    deg = (
        _sym(edges)
        .groupBy(F.col("u").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    internal = (
        edges.join(
            members.select(F.col("node").alias("pa"), F.col("community").alias("ca")),
            "pa",
        )
        .join(
            members.select(F.col("node").alias("pb"), F.col("community").alias("cb")),
            "pb",
        )
        .filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("internal_edges"))
    )
    return (
        members.join(deg, "node")
        .groupBy("community")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum("deg").cast("long").alias("degree_sum"),
        )
        .join(internal, "community", "left")
        .select(
            "community",
            "n_members",
            "degree_sum",
            F.coalesce(F.col("internal_edges"), F.lit(0))
            .cast("long")
            .alias("internal_edges"),
        )
        .orderBy(F.col("n_members").desc(), "community")
        .limit(25)
    )


@register(
    "g_modularity_lpa",
    oracle=_lpa_oracle_ctes()
    + f"""
    , members AS (SELECT label AS community, node FROM lab{LPA_ROUNDS}),
    deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg
            FROM sym GROUP BY u),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e),
    ec AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS sum_ec
        FROM e
        JOIN members ma ON ma.node = e.pa
        JOIN members mb ON mb.node = e.pb
        WHERE ma.community = mb.community
    ),
    dc AS (
        SELECT CAST(SUM(dsum * dsum) AS BIGINT) AS sum_dc2
        FROM (
            SELECT mm.community, CAST(SUM(d.deg) AS BIGINT) AS dsum
            FROM members mm JOIN deg d ON d.node = mm.node
            GROUP BY mm.community
        )
    ),
    nc AS (SELECT CAST(COUNT(DISTINCT label) AS BIGINT) AS n_communities
           FROM lab{LPA_ROUNDS})
    SELECT m.m AS n_edges, nc.n_communities, ec.sum_ec, dc.sum_dc2,
           CAST(FLOOR(
               1000000.0 * (4.0 * m.m * ec.sum_ec - dc.sum_dc2)
               / (4.0 * m.m * m.m)
           ) AS BIGINT) AS modularity_e6
    FROM m, ec, dc, nc
    """,
    survey_ids=("J3", "A2", "U1"),
)
def g_modularity_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q of the LPA partition, one row — the quality
    score that says whether the propagated communities beat a random
    cut (Q>0). Q = Σ_c(e_c/m − (d_c/2m)²) is carried as the exact
    integer pair (4m·Σe_c − Σd_c², 4m²) and FLOOR-scaled once at the
    end — the double division is the only float op and both engines
    perform the identical (int-exact-to-double) operation, so e6 floors
    agree. (Int64 holds to m ~ 1.5e9 edges; the 100 TB spelling carries
    the two sums as DECIMAL(38,0), same plan.)"""
    edges = copurchase_edges(t(spark, sf_dir, "lineitem")).localCheckpoint(
        eager=True
    )
    labels = label_propagation(edges)
    members = labels.select(F.col("label").alias("community"), "node")
    deg = (
        _sym(edges)
        .groupBy(F.col("u").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    m = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    sum_ec = (
        edges.join(
            members.select(F.col("node").alias("pa"), F.col("community").alias("ca")),
            "pa",
        )
        .join(
            members.select(F.col("node").alias("pb"), F.col("community").alias("cb")),
            "pb",
        )
        .filter(F.col("ca") == F.col("cb"))
        .agg(F.count(F.lit(1)).cast("long").alias("sum_ec"))
    )
    sum_dc2 = (
        members.join(deg, "node")
        .groupBy("community")
        .agg(F.sum("deg").cast("long").alias("dsum"))
        .agg(F.sum(F.col("dsum") * F.col("dsum")).cast("long").alias("sum_dc2"))
    )
    n_comm = labels.agg(
        F.countDistinct("label").cast("long").alias("n_communities")
    )
    return (
        m.crossJoin(F.broadcast(n_comm))
        .crossJoin(F.broadcast(sum_ec))
        .crossJoin(F.broadcast(sum_dc2))
        .select(
            "n_edges",
            "n_communities",
            "sum_ec",
            "sum_dc2",
            F.floor(
                1000000.0
                * (
                    4.0 * F.col("n_edges") * F.col("sum_ec")
                    - F.col("sum_dc2")
                )
                / (4.0 * F.col("n_edges") * F.col("n_edges"))
            )
            .cast("long")
            .alias("modularity_e6"),
        )
    )


def _kcore_oracle() -> str:
    sql = f"""
    WITH {_EDGES_SQL},
    s0 AS (SELECT u, v FROM sym)
    """
    prev = "s0"
    for r in range(1, KCORE_ROUNDS + 1):
        sql += f""",
    keep{r} AS (
        SELECT u AS node FROM {prev}
        GROUP BY u HAVING COUNT(*) >= {KCORE_K}
    ),
    s{r} AS (
        SELECT s.u, s.v FROM {prev} s
        JOIN keep{r} ka ON ka.node = s.u
        JOIN keep{r} kb ON kb.node = s.v
    )
    """
        prev = f"s{r}"
    sql += f"""
    SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS core_deg
    FROM {prev}
    GROUP BY u
    ORDER BY node
    """
    return sql


@register(
    "g_kcore_membership",
    oracle=_kcore_oracle(),
    survey_ids=("J3", "A1", "A4", "U1"),
)
def g_kcore_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core membership by fixed-round peeling: each round drops
    every node whose CURRENT degree is below k and the edges touching
    it, the standard iterative k-core algorithm with a fixed round
    budget (KCORE_ROUNDS; the fixture reaches the true 3-core fixpoint
    — a round that removes nothing — inside the budget, and the
    unrolled oracle runs the identical schedule either way). Output is
    the surviving nodes with their in-core degree: the dense backbone
    of the co-purchase graph, which is what a recommender mines and a
    sampler must not break. Each peel is one degree aggregate + two
    semi-join-shaped edge filters, all keyed on node — no shuffle
    carries more than the live edge list."""
    sym = _sym(
        copurchase_edges(t(spark, sf_dir, "lineitem"))
    ).localCheckpoint(eager=True)
    for _ in range(KCORE_ROUNDS):
        keep = (
            sym.groupBy("u")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= KCORE_K)
            .select(F.col("u").alias("node"))
        )
        sym = (
            sym.join(keep.select(F.col("node").alias("u")), "u", "left_semi")
            .join(keep.select(F.col("node").alias("v")), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
    return (
        sym.groupBy(F.col("u").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("core_deg"))
        .orderBy("node")
    )


@register(
    "g_degree_assortativity",
    oracle=f"""
    WITH {_EDGES_SQL},
    deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg
            FROM sym GROUP BY u),
    pairs AS (
        SELECT da.deg AS x, db.deg AS y
        FROM sym s
        JOIN deg da ON da.node = s.u
        JOIN deg db ON db.node = s.v
    ),
    sums AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m2,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sx2
        FROM pairs
    )
    SELECT m2, sx, sxy, sx2,
           CAST(FLOOR(
               1000000.0 * (m2 * sxy - sx * sx) / (m2 * sx2 - sx * sx)
           ) AS BIGINT) AS assortativity_e6
    FROM sums
    """,
    survey_ids=("J3", "A2"),
)
def g_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002): Pearson correlation of
    endpoint degrees over the directed edge list — do high-degree parts
    co-purchase with other hubs (r>0, social-network-like) or with
    leaves (r<0, technological/hub-spoke)? Because the symmetrized edge
    list makes the x and y marginals identical, the Pearson quotient
    needs NO square root: r = (M·Σxy − (Σx)²)/(M·Σx² − (Σx)²), a ratio
    of exact BIGINT sums FLOOR-scaled once (the raw sums ship in the
    row so the e6 value is auditable). One degree aggregate + two
    node-keyed joins + one global sum — nothing wider than the edge
    list ever shuffles."""
    sym = _sym(copurchase_edges(t(spark, sf_dir, "lineitem")))
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    pairs = (
        sym.join(deg.select(F.col("node").alias("u"), F.col("deg").alias("x")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("deg").alias("y")), "v")
        .select("x", "y")
    )
    sums = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("m2"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sx2"),
    )
    return sums.select(
        "m2",
        "sx",
        "sxy",
        "sx2",
        F.floor(
            1000000.0
            * (F.col("m2") * F.col("sxy") - F.col("sx") * F.col("sx"))
            / (F.col("m2") * F.col("sx2") - F.col("sx") * F.col("sx"))
        )
        .cast("long")
        .alias("assortativity_e6"),
    )


@register(
    "g_adamic_adar_topk",
    oracle=f"""
    WITH {_EDGES_SQL},
    deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg
            FROM sym GROUP BY u),
    centers AS (
        SELECT node, deg FROM deg WHERE deg BETWEEN 2 AND {AA_CENTER_CAP}
    ),
    wedges AS (
        SELECT s1.v AS a, s2.v AS b,
               CAST(FLOOR(1000000000.0 / LN(c.deg)) AS BIGINT) AS term_e9
        FROM sym s1
        JOIN sym s2 ON s1.u = s2.u AND s1.v < s2.v
        JOIN centers c ON c.node = s1.u
    ),
    scored AS (
        SELECT a, b, CAST(SUM(term_e9) AS BIGINT) AS aa_e9,
               CAST(COUNT(*) AS BIGINT) AS common_neighbors
        FROM wedges
        GROUP BY a, b
    )
    SELECT s.a AS node_a, s.b AS node_b, s.common_neighbors, s.aa_e9
    FROM scored s
    LEFT JOIN e ON e.pa = s.a AND e.pb = s.b
    WHERE e.pa IS NULL
    ORDER BY s.aa_e9 DESC, s.a, s.b
    LIMIT 25
    """,
    survey_ids=("J3", "J5", "A1", "O4"),
)
def g_adamic_adar_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction: for UNLINKED part pairs, score
    sum over common neighbors u of 1/ln(deg u) — rare shared neighbors count more
    — and emit the top-25 predicted edges. Wedges are enumerated at
    their center with the center's degree capped at AA_CENTER_CAP
    (hub-capped AA: a mega-hub's 1/ln(deg) terms are the flattest
    signal and its wedge set is the quadratic one — the cap bounds the
    wedge relation at cap²·n rows while the oracle applies the same cap
    so the check stays exact). Per-term e9 floor BEFORE the sum keeps
    the aggregate integer-exact under any summation order; the
    anti-join against the edge list makes it a PREDICTION (existing
    edges excluded)."""
    edges = copurchase_edges(t(spark, sf_dir, "lineitem")).localCheckpoint(
        eager=True
    )
    sym = _sym(edges)
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    centers = deg.filter(
        (F.col("deg") >= 2) & (F.col("deg") <= AA_CENTER_CAP)
    )
    wedges = (
        sym.alias("s1")
        .join(sym.alias("s2"), "u")
        .filter(F.col("s1.v") < F.col("s2.v"))
        .join(
            centers.select(F.col("node").alias("u"), "deg"), "u"
        )
        .select(
            F.col("s1.v").alias("a"),
            F.col("s2.v").alias("b"),
            F.floor(1000000000.0 / F.log(F.col("deg"))).cast("long").alias(
                "term_e9"
            ),
        )
    )
    scored = wedges.groupBy("a", "b").agg(
        F.sum("term_e9").cast("long").alias("aa_e9"),
        F.count(F.lit(1)).cast("long").alias("common_neighbors"),
    )
    unlinked = scored.join(
        edges,
        (scored["a"] == edges["pa"]) & (scored["b"] == edges["pb"]),
        "left_anti",
    )
    return (
        unlinked.select(
            F.col("a").alias("node_a"),
            F.col("b").alias("node_b"),
            "common_neighbors",
            "aa_e9",
        )
        .orderBy(F.col("aa_e9").desc(), "node_a", "node_b")
        .limit(25)
    )


@register(
    "g_degree_histogram",
    oracle=f"""
    WITH {_EDGES_SQL},
    deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg
            FROM sym GROUP BY u)
    SELECT deg, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM deg
    GROUP BY deg
    ORDER BY deg
    """,
    survey_ids=("J3", "A1", "O1"),
)
def g_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph — the first plot
    anyone makes of a graph (is it scale-free? where do the hubs
    start?) and the input that justifies `g_adamic_adar_topk`'s hub cap
    and the skew toolbox's salting thresholds. Two map-combined
    aggregates; output is bounded by max degree, independent of graph
    size."""
    sym = _sym(copurchase_edges(t(spark, sf_dir, "lineitem")))
    return (
        sym.groupBy(F.col("u").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .groupBy("deg")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .orderBy("deg")
    )


# ---------------------------------------------------------------------------
# (placed here to keep analytics_ext.py under its current review size;
# the time-series monitor kit it extends lives in analytics_ext.py)

STL_HALF = 3  # centered moving-average half-width: 7-day trend window


@register(
    "x4_stl_daily_revenue",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(value) AS BIGINT)) AS BIGINT) AS rev
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(CAST(ts AS TIMESTAMP) AS DATE)
    ),
    seq AS (
        SELECT day, rev, ROW_NUMBER() OVER (ORDER BY day) AS idx,
               CAST(day - DATE '1970-01-01' AS BIGINT) % 7 AS dow_idx
        FROM daily
    ),
    tr AS (
        SELECT day, rev, idx, dow_idx,
               CAST(SUM(rev) OVER w7 AS BIGINT) AS sum7,
               CAST(COUNT(*) OVER w7 AS BIGINT) AS n7
        FROM seq
        WINDOW w7 AS (ORDER BY idx
                      ROWS BETWEEN {STL_HALF} PRECEDING
                               AND {STL_HALF} FOLLOWING)
    ),
    det AS (
        SELECT *, CASE WHEN n7 = {2 * STL_HALF + 1}
                       THEN {2 * STL_HALF + 1} * rev - sum7 END AS detr7
        FROM tr
    ),
    seas AS (
        SELECT dow_idx,
               CAST(SUM(detr7) AS BIGINT) AS s_sum,
               CAST(COUNT(detr7) AS BIGINT) AS s_n
        FROM det WHERE detr7 IS NOT NULL
        GROUP BY dow_idx
    )
    SELECT d.day, d.rev,
           CASE WHEN d.n7 = {2 * STL_HALF + 1}
                THEN CAST(FLOOR(100.0 * d.sum7 / {2 * STL_HALF + 1}) AS BIGINT)
           END AS trend_e2,
           CASE WHEN d.n7 = {2 * STL_HALF + 1}
                THEN CAST(FLOOR(100.0 * s.s_sum
                                / ({2 * STL_HALF + 1} * s.s_n)) AS BIGINT)
           END AS seasonal_e2,
           CASE WHEN d.n7 = {2 * STL_HALF + 1}
                THEN 100 * d.rev
                     - CAST(FLOOR(100.0 * d.sum7 / {2 * STL_HALF + 1}) AS BIGINT)
                     - CAST(FLOOR(100.0 * s.s_sum
                                  / ({2 * STL_HALF + 1} * s.s_n)) AS BIGINT)
           END AS remainder_e2
    FROM det d
    LEFT JOIN seas s ON s.dow_idx = d.dow_idx
    ORDER BY d.day
    """,
    survey_ids=("W3", "A1", "F4", "U1"),
)
def x4_stl_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite seasonal decomposition of the daily purchase-revenue
    series: trend = centered 7-day moving average over the observed-day
    sequence, seasonal = day-of-week means of the detrended series,
    remainder = what's left — joining Mann-Kendall (trend direction),
    CUSUM (level shifts) and ACF (periodicity) to complete the
    time-series monitor kit in analytics_ext.py. Exactness: the
    detrended series is carried ×7 (detr7 = 7·rev − sum7, an exact
    BIGINT — the n-scaled-deviation trick from CUSUM/ACF), day-of-week
    comes from epoch-day arithmetic (both engines' DOW builtins
    disagree on numbering), and the only float ops are two
    FLOOR(100.0·int/int) scalings whose operands are exact — so the e2
    fixed-point outputs cannot drift. Edge days without a full 7-day
    window carry NULL components, never a shortened average. The day
    grid is |days|-bounded (the documented lattice-bounded window
    class); the one full-data pass is the daily rollup."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = (
        ev.groupBy(F.to_date(F.col("ts").cast("timestamp")).alias("day"))
        .agg(F.sum(F.floor("value").cast("long")).cast("long").alias("rev"))
        .localCheckpoint(eager=True)
    )
    return stl_decompose(daily)


def stl_decompose(daily: DataFrame) -> DataFrame:
    """STL-lite core over a (day, rev) relation — split out so the
    closed-form pytest anchors (pure-linear series → zero seasonal and
    remainder; pure-weekly series → exact seasonal recovery) can run it
    on synthetic inputs."""
    from pyspark.sql import Window

    width = 2 * STL_HALF + 1
    seq = daily.select(
        "day",
        "rev",
        F.row_number().over(Window.orderBy("day")).alias("idx"),
        (F.datediff("day", F.lit("1970-01-01")).cast("long") % 7).alias(
            "dow_idx"
        ),
    )
    w7 = Window.orderBy("idx").rowsBetween(-STL_HALF, STL_HALF)
    tr = seq.select(
        "day",
        "rev",
        "dow_idx",
        F.sum("rev").over(w7).cast("long").alias("sum7"),
        F.count(F.lit(1)).over(w7).cast("long").alias("n7"),
    )
    det = tr.withColumn(
        "detr7",
        F.when(F.col("n7") == width, width * F.col("rev") - F.col("sum7")),
    )
    seas = (
        det.filter(F.col("detr7").isNotNull())
        .groupBy("dow_idx")
        .agg(
            F.sum("detr7").cast("long").alias("s_sum"),
            F.count("detr7").cast("long").alias("s_n"),
        )
    )
    trend_e2 = F.floor(100.0 * F.col("sum7") / width).cast("long")
    seasonal_e2 = F.floor(
        100.0 * F.col("s_sum") / (width * F.col("s_n"))
    ).cast("long")
    full = F.col("n7") == width
    return (
        det.join(F.broadcast(seas), "dow_idx", "left")
        .select(
            "day",
            "rev",
            F.when(full, trend_e2).alias("trend_e2"),
            F.when(full, seasonal_e2).alias("seasonal_e2"),
            F.when(
                full, 100 * F.col("rev") - trend_e2 - seasonal_e2
            ).alias("remainder_e2"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Round 9: exact weakly-connected components + component-size histogram
# ---------------------------------------------------------------------------

#: High-quantity co-purchase threshold: both endpoints of an edge must
#: be lines with l_quantity >= this. The unfiltered co-purchase graph
#: collapses into ONE 2000-part component at sf0.01 (probed) — a
#: degenerate WCC instance; thresholding keeps the realistic shape
#: (one giant component + a tail of small ones: 103 components, max
#: 1237, at sf0.01) that actually exercises min-label propagation and
#: the size histogram.
WCC_HIGH_QTY = 45

#: Unrolled oracle rounds for the synchronous min-label + pointer-
#: doubling schedule. The hybrid converges in O(log n) rounds
#: (propagation moves the min one hop, compression halves remaining
#: label-chain length — the dedup_clusters bound); 20 > 2*log2(n) for
#: the sf0.01 giant component (n=1237, log2≈10.3). The Spark side runs
#: the SAME schedule to its proven label-sum fixpoint, so a
#: hypothetical non-convergence at 20 rounds would surface as a loud
#: hash mismatch, never a silent agreement.
WCC_ROUNDS = 20

_WCC_EDGES_SQL = f"""
    e AS (
        SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        WHERE a.l_quantity >= {WCC_HIGH_QTY} AND b.l_quantity >= {WCC_HIGH_QTY}
    ),
    sym AS (
        SELECT pa AS u, pb AS v FROM e
        UNION ALL
        SELECT pb AS u, pa AS v FROM e
    )
"""


def _wcc_label_cte() -> str:
    """Unrolled synchronous min-label propagation + pointer doubling:
    the exact SQL twin of ``dedup_clusters.connected_components``'s
    per-round transformation (propagate: label <- min(own, neighbor
    labels); compress: label <- label-of-label)."""
    steps = ["l0 AS (SELECT DISTINCT u AS id, u AS label FROM sym)"]
    for k in range(1, WCC_ROUNDS + 1):
        steps.append(f"""
    p{k} AS MATERIALIZED (
        SELECT l.id, LEAST(l.label, COALESCE(MIN(lab.label), l.label)) AS label
        FROM l{k - 1} l
        LEFT JOIN sym s ON s.u = l.id
        LEFT JOIN l{k - 1} lab ON lab.id = s.v
        GROUP BY l.id, l.label
    ),
    l{k} AS MATERIALIZED (
        SELECT a.id, LEAST(a.label, COALESCE(b.label, a.label)) AS label
        FROM p{k} a LEFT JOIN p{k} b ON b.id = a.label
    )""")
    return ",".join(steps)


def wcc_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(part_id, component_id) over the high-quantity co-purchase
    graph via the proven O(log n)-round pointer-doubling machinery."""
    from .dedup_clusters import connected_components

    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") >= WCC_HIGH_QTY
    )
    edges = copurchase_edges(li)
    nodes = (
        edges.select(F.col("pa").alias("part_id"))
        .union(edges.select("pb"))
        .distinct()
    )
    cc = connected_components(
        nodes, edges, id_col="part_id", a_col="pa", b_col="pb"
    )
    return cc.select(
        F.col("part_id").cast("long").alias("part_id"),
        F.col("cluster_id").cast("long").alias("component_id"),
    )


@register(
    "g_wcc_components",
    oracle=f"""
    WITH {_WCC_EDGES_SQL},
    {_wcc_label_cte()}
    SELECT id AS part_id, CAST(label AS BIGINT) AS component_id
    FROM l{WCC_ROUNDS}
    ORDER BY part_id
    """,
    survey_ids=("J3", "A1", "X2"),
)
def g_wcc_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weakly-connected components of the high-quantity
    co-purchase graph — the 100 TB WCC spelling: iterative min-label
    propagation WITH pointer doubling (label <- label-of-label each
    round), reusing ``dedup_clusters.connected_components``. Each round
    is two narrow keyed joins + one groupBy, shuffling one row per
    (node, neighbor-label); compression halves remaining label-chain
    length per round, so convergence is O(log n) rounds even on the
    giant component's longest induced path — never O(diameter) — with
    per-round localCheckpoint keeping the plan O(1) deep. Convergence
    is PROVEN per run by the label-sum fixpoint (labels only decrease;
    unchanged sum => fixed point), and the fixpoint is the true WCC
    (at fixpoint every node's label <= all neighbors' => constant per
    component = min reachable id). The oracle runs the identical
    schedule unrolled {WCC_ROUNDS} rounds (LPA-family idiom); LPA
    (g_label_propagation) approximates communities — this closes the
    family with the exact partition. Reference grounding: the FK
    relationship graph the reference exposes to its NL->SQL users
    (sample_metadata.py:68-74)."""
    return wcc_components(spark, sf_dir).orderBy("part_id")


@register(
    "g_wcc_size_histogram",
    oracle=f"""
    WITH {_WCC_EDGES_SQL},
    {_wcc_label_cte()},
    sizes AS (
        SELECT label, CAST(COUNT(*) AS BIGINT) AS component_size
        FROM l{WCC_ROUNDS} GROUP BY label
    )
    SELECT component_size, CAST(COUNT(*) AS BIGINT) AS n_components
    FROM sizes
    GROUP BY component_size
    ORDER BY component_size
    """,
    survey_ids=("J3", "A1"),
)
def g_wcc_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Component-size histogram of the exact WCC partition — the
    one-line diagnostic that tells a dedup/graph pipeline whether its
    graph is 'one giant hairball' (threshold too loose) or healthy
    (giant component + power-law tail). Two map-combined groupBys over
    the component assignment; at 100 TB both shuffles carry one row
    per component then one per distinct size."""
    cc = wcc_components(spark, sf_dir)
    return (
        cc.groupBy("component_id")
        .agg(F.count(F.lit(1)).cast("long").alias("component_size"))
        .groupBy("component_size")
        .agg(F.count(F.lit(1)).cast("long").alias("n_components"))
        .orderBy("component_size")
    )


# ---------------------------------------------------------------------------
# Round 9: exact BFS hop distance from the hub part
# ---------------------------------------------------------------------------

#: Unrolled BFS rounds. Fixture graphs are REGENERATED each round with
#: fresh seeds, and the hub eccentricity moves with them (measured 19
#: at sf0.01 / 30 at sf0.1 on the r14 seed — the r13 seed's sf0.1
#: eccentricity fit inside the old 24). 40 leaves seed margin; the
#: Spark side runs the SAME frontier expansion to a proven fixpoint,
#: so an insufficient unroll still surfaces as a loud error, never a
#: silent short histogram. DuckDB's MATERIALIZED per-round CTEs make
#: the post-fixpoint rounds cheap no-ops.
BFS_ROUNDS = 40


def _bfs_cte() -> str:
    steps = [
        """
    deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY u),
    src AS (SELECT u FROM deg ORDER BY d DESC, u LIMIT 1),
    d0 AS (SELECT u AS id, CAST(0 AS BIGINT) AS dist FROM src)"""
    ]
    for k in range(1, BFS_ROUNDS + 1):
        steps.append(f"""
    d{k} AS MATERIALIZED (
        SELECT id, MIN(dist) AS dist FROM (
            SELECT id, dist FROM d{k - 1}
            UNION ALL
            SELECT s.u AS id, d.dist + 1 AS dist
            FROM d{k - 1} d JOIN sym s ON s.v = d.id
        ) GROUP BY id
    )""")
    return ",".join(steps)


@register(
    "g_bfs_hop_histogram",
    oracle=f"""
    WITH {_WCC_EDGES_SQL},
    {_bfs_cte()},
    nodes AS (SELECT DISTINCT u AS id FROM sym)
    SELECT d.dist AS hops, CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM nodes n LEFT JOIN d{BFS_ROUNDS} d ON d.id = n.id
    GROUP BY d.dist
    ORDER BY hops NULLS LAST
    """,
    survey_ids=("J3", "A1"),
)
def g_bfs_hop_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact single-source BFS over the high-quantity co-purchase
    graph: hop distance from the HUB part (max degree, min-id ties) to
    every part, summarized as a hop histogram; parts outside the hub's
    component report NULL hops (257 of 1494 at sf0.01 — the same
    thresholded graph as `g_wcc_components`, so the two queries
    cross-validate: NULL count = non-giant component mass).

    The distributed spelling is frontier expansion as an aggregate
    join — each round joins the CURRENT distance relation to the edge
    list and takes per-node MIN(dist) over old ∪ propagated, with
    per-round localCheckpoint — run to a PROVEN fixpoint (row count
    and dist sum both stable; distances only ever decrease). Rounds =
    eccentricity (19 here), each shuffling at most one row per
    (node, incoming distance) — the Pregel iteration spelled in two
    keyed shuffles, no vertex program needed. The oracle unrolls the
    identical schedule {BFS_ROUNDS} rounds."""
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") >= WCC_HIGH_QTY
    )
    sym = _sym(copurchase_edges(li)).localCheckpoint(eager=True)
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    src = int(deg.orderBy(F.desc("d"), "u").first()["u"])  # hub scalar
    dist = spark.createDataFrame([(src, 0)], "id long, dist long")
    prev = (0, 0)
    for _ in range(BFS_ROUNDS + 6):
        cand = sym.join(
            dist.select(F.col("id").alias("v"), "dist"), "v"
        ).select(F.col("u").alias("id"), (F.col("dist") + 1).alias("dist"))
        dist = (
            dist.unionByName(cand)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        row = dist.agg(
            F.count(F.lit(1)).alias("n"), F.sum("dist").alias("s")
        ).first()
        cur = (int(row["n"]), int(row["s"] or 0))
        if cur == prev:  # fixpoint: no new node, no shorter path
            break
        prev = cur
    else:
        raise RuntimeError("BFS did not converge within the round budget")
    nodes = sym.select(F.col("u").alias("id")).distinct()
    return (
        nodes.join(dist, "id", "left")
        .groupBy(F.col("dist").alias("hops"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
        .orderBy(F.col("hops").asc_nulls_last())
    )
