"""Hierarchy traversal over self-referential FKs — SURVEY.md §2 J-family.

The reference's schemas ground two self-referential FKs
(``sample_metadata.py:99`` employees.manager_id -> employees.id,
``:41`` categories.parent_id -> categories.id); "who reports to whom,
transitively" is the first real query a user of that HR schema runs.
The fixture has no employees table, so the registered queries derive a
deterministic tree over ``customer``: parent(c) = c DIV 10 (NULL when
0), giving 9 roots and depth ~ log10(max custkey) — the same shape at
every SF, closed under the table (every parent id exists).

Both traversals are ITERATIVE pointer-doubling DataFrame loops, not
per-row recursion — O(log depth) rounds, each a narrow join +
``localCheckpoint`` to cut lineage (same discipline as
``dedup_clusters.connected_components``):

- ``ancestor_walk``: (id, root_id, depth) — each round composes the
  current "known ancestor at distance d" with THAT ancestor's state,
  doubling the compressed distance until everyone points at a root.
- ``ancestor_pairs``: the materialized transitive closure
  (id, anc_id, dist >= 1) — P_{k+1} = P_k ∪ (P_k ∘ P_k), the classic
  log-rounds path-doubling construction; on a tree (one parent per
  node) the closure has exactly sum(depth) rows, so the output is
  linear in the input for log-depth hierarchies.

At 100 TB: every round shuffles on the ancestor id only (two long
columns + a small int), never the payload; depth of a corporate
hierarchy or category tree is tens at worst, so rounds ~ 5-6. The
oracle side is DuckDB ``WITH RECURSIVE`` — the exact SQL a warehouse
user would write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_generator_demo_spark.operators.relational import t
from etl_generator_demo_spark.registry import register


def ancestor_walk(
    nodes: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent",
    max_iter: int = 20,
) -> DataFrame:
    """(id, root_id, depth) for every node of a forest given
    (id, parent) rows, parent NULL at roots. Pointer doubling: the
    state row (id, anc, depth) means "anc is my ancestor exactly
    `depth` hops up"; composing with anc's own state doubles the
    compressed distance per round, so convergence is O(log depth).
    Fixpoint = unchanged SUM(depth) (depths only grow, bounded by the
    true depth). Raises after `max_iter` rounds rather than silently
    returning a partial walk. Parents must exist as node ids (a
    dangling FK drops the subtree, exactly like the recursive-CTE
    formulation never reaching it)."""
    state = nodes.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.col(parent_col), F.col(id_col)).alias("anc"),
        F.when(F.col(parent_col).isNull(), F.lit(0)).otherwise(F.lit(1)).alias("depth"),
    ).localCheckpoint(eager=True)
    prev_sum = None
    for _ in range(max_iter):
        hop = state.select(
            F.col("id").alias("h_id"),
            F.col("anc").alias("h_anc"),
            F.col("depth").alias("h_depth"),
        )
        state = (
            state.join(hop, state["anc"] == hop["h_id"])
            .select(
                "id",
                F.col("h_anc").alias("anc"),
                (F.col("depth") + F.col("h_depth")).alias("depth"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = state.agg(F.sum("depth")).first()[0]
        if cur_sum == prev_sum:
            return state.select("id", F.col("anc").alias("root_id"), "depth")
        prev_sum = cur_sum
    raise RuntimeError(f"ancestor_walk did not converge in {max_iter} rounds")


def ancestor_pairs(
    nodes: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent",
    max_iter: int = 20,
) -> DataFrame:
    """Materialized transitive closure (id, anc_id, dist >= 1) of a
    forest: every (node, proper ancestor) pair with its hop count.
    Path doubling — P ∪ (P ∘ P) per round — reaches all distances in
    O(log depth) rounds; the distinct() collapses the re-derived
    short paths (pair count is monotone, so an unchanged COUNT is the
    fixpoint)."""
    pairs = (
        nodes.filter(F.col(parent_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.col(parent_col).alias("anc_id"),
            F.lit(1).alias("dist"),
        )
        .localCheckpoint(eager=True)
    )
    prev_n = None
    for _ in range(max_iter):
        up = pairs.select(
            F.col("id").alias("u_id"),
            F.col("anc_id").alias("u_anc"),
            F.col("dist").alias("u_dist"),
        )
        composed = pairs.join(up, pairs["anc_id"] == up["u_id"]).select(
            "id", F.col("u_anc").alias("anc_id"), (F.col("dist") + F.col("u_dist")).alias("dist")
        )
        pairs = pairs.unionByName(composed).distinct().localCheckpoint(eager=True)
        cur_n = pairs.count()
        if cur_n == prev_n:
            return pairs
        prev_n = cur_n
    raise RuntimeError(f"ancestor_pairs did not converge in {max_iter} rounds")


def _customer_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic forest over customer: parent = c_custkey DIV 10,
    NULL when DIV yields 0 — custkey 0..9 are the roots (0 would
    otherwise be its own parent: DIV 10 of 0 is 0)."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("id"),
        F.nullif((F.col("c_custkey") / 10).cast("long"), F.lit(0)).alias("parent"),
    )


# ===========================================================================
# Driver-checkable queries
# ===========================================================================

@register(
    "j_hierarchy_depth",
    oracle="""
    WITH RECURSIVE tree AS (
        SELECT c_custkey AS id, c_custkey AS root_id, 0 AS depth
        FROM customer WHERE c_custkey // 10 = 0
        UNION ALL
        SELECT c.c_custkey, tr.root_id, tr.depth + 1
        FROM customer c JOIN tree tr ON c.c_custkey // 10 = tr.id
        WHERE c.c_custkey >= 10  -- custkey 0: 0 // 10 = 0 would self-loop forever
    )
    SELECT id, root_id, depth
    FROM tree
    ORDER BY id
    """,
    survey_ids=("J3", "U1"),
)
def j_hierarchy_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Org-chart depth: every node's root ancestor and level, computed
    by the O(log depth) pointer-doubling walk vs the warehouse-native
    recursive CTE. Grounding: sample_metadata.py:99 manager chains."""
    return ancestor_walk(_customer_tree(spark, sf_dir)).orderBy("id")


@register(
    "j_hierarchy_ancestors",
    oracle="""
    WITH RECURSIVE anc AS (
        SELECT c_custkey AS id, c_custkey // 10 AS anc_id, 1 AS dist
        FROM customer WHERE c_custkey // 10 >= 1
        UNION ALL
        SELECT a.id, c.c_custkey // 10, a.dist + 1
        FROM anc a JOIN customer c ON c.c_custkey = a.anc_id
        WHERE c.c_custkey // 10 >= 1
    )
    SELECT id, anc_id, dist
    FROM anc
    ORDER BY id, dist
    """,
    survey_ids=("J3", "U1"),
)
def j_hierarchy_ancestors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive "reports-to" closure: every (node, proper ancestor,
    hop count) pair — the materialized form a warehouse keeps for
    subtree filters (`WHERE anc_id = X` selects X's whole org). Path
    doubling vs recursive CTE."""
    return ancestor_pairs(_customer_tree(spark, sf_dir)).orderBy("id", "dist")


PAGERANK_ITERS, PAGERANK_DAMPING = 3, 0.85


def _pagerank_oracle() -> str:
    """Unrolled fixed-iteration PageRank SQL: each iteration is one
    CTE (no recursive aggregate needed). Edges: child -> parent,
    out-degree 1; root (dangling) mass is NOT redistributed — the
    'lossy' PageRank variant, identical on both engines.

    r14 exactness rewrite: ranks are EXACT BIGINTs in units of
    rank·n/20³ (d = 0.85 = 17/20, so after k ≤ 3 iterations every
    value is an integer multiple of 20^(3-k) in that scale — each
    `(17·Σchild) // 20` divides exactly; proof in g_pagerank_tree's
    docstring). The old float spelling floored rank·n at an e6
    boundary and a reseeded fixture landed one node within 1 ulp of
    a boundary (Spark 1.424999 vs DuckDB 1.425) — summation-order
    float drift, the exact failure class the repo's integer-scaling
    discipline exists to kill."""
    iters = PAGERANK_ITERS
    sql = """
    WITH nodes AS (
        SELECT c_custkey AS id,
               CASE WHEN c_custkey // 10 = 0 THEN NULL
                    ELSE c_custkey // 10 END AS parent
        FROM customer
    ),
    r0 AS (SELECT id, parent, CAST(8000 AS BIGINT) AS r FROM nodes)
    """
    prev = "r0"
    for k in range(1, iters + 1):
        sql += f""",
    r{k} AS (
        SELECT cur.id, cur.parent,
               CAST(1200 + (17 * COALESCE(SUM(child.r), 0)) // 20
                    AS BIGINT) AS r
        FROM {prev} cur
        LEFT JOIN {prev} child ON child.parent = cur.id
        GROUP BY cur.id, cur.parent
    )
    """
        prev = f"r{k}"
    sql += f"""
    SELECT id,
           CAST(r * 125 AS DOUBLE) / 1000000 AS rank_scaled
    FROM {prev}
    ORDER BY id
    """
    return sql


@register("g_pagerank_tree", oracle=_pagerank_oracle(), survey_ids=("J3", "U1"))
def g_pagerank_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (3 rounds, d=0.85) over the customer
    tree — the iterative numeric-fixpoint shape (contrast the boolean
    fixpoints of connected components / ancestor walk). Each round is
    ONE aggregate-join on the parent key: contributions group by
    target BEFORE joining rank state, so the shuffle carries one row
    per node, and ``localCheckpoint`` cuts lineage per round exactly
    like the other iterative operators. Root (dangling) mass is not
    redistributed — the lossy variant, mirrored exactly by the
    unrolled-CTE oracle; ranks are reported scaled by N (≈1.0).

    r14 exactness rewrite (a reseeded fixture landed one rank 1 ulp
    from an e6 floor boundary — Spark 1.424999 vs DuckDB 1.425):
    ranks are EXACT BIGINTs in units of rank·n/20³. With
    d = 0.85 = 17/20 the update is R_k = 1200 + (17·Σ_child R_{k-1})/20
    (1200 = 0.15·20³), and induction gives R_k ≡ 0 (mod 20^(3-k)):
    R₀ = 20³, a sum of multiples of 20^(4-k) divided by 20 is a
    multiple of 20^(3-k), and 1200 = 3·20² is one too. So every
    `(17·Σ) DIV 20` divides with remainder 0 for the 3 configured
    iterations — no float exists anywhere until the final division of
    the integer R·125 by 10⁶, which both engines perform on identical
    integers. Summation-order drift is impossible by construction,
    for ANY fixture seed."""
    nodes = _customer_tree(spark, sf_dir).localCheckpoint(eager=True)
    ranks = nodes.withColumn("r", F.lit(8000).cast("long"))
    for _ in range(PAGERANK_ITERS):
        contrib = (
            ranks.filter(F.col("parent").isNotNull())
            .groupBy("parent")
            .agg(F.sum("r").alias("child_mass"))
            .select(F.col("parent").alias("_target"), "child_mass")
        )
        ranks = (
            ranks.join(contrib, ranks["id"] == contrib["_target"], "left")
            .select(
                "id",
                "parent",
                F.expr(
                    "CAST(1200 + (17 * COALESCE(child_mass, 0L)) DIV 20 AS BIGINT)"
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(
        "id",
        ((F.col("r") * 125).cast("double") / 1_000_000).alias("rank_scaled"),
    ).orderBy("id")


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Undirected distinct co-purchase edges (pa < pb): two parts are
    linked when some order contains both. The self-join is co-keyed on
    l_orderkey (no shuffle beyond the key repartition); per-order line
    counts are small and bounded, so the pair explosion is ~C(k,2) per
    order, never corpus-quadratic."""
    li = lineitem.select("l_orderkey", "l_partkey")
    return (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .distinct()
    )


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Global triangle census of an undirected graph via DEGREE-ORDERED
    orientation (the node-iterator++ of Schank & Wagner / Cohen's
    MapReduce formulation): orient each edge from its lower-(deg, id)
    endpoint to the higher one, enumerate wedges only at each edge's
    source, and close them against the undirected edge set. Orientation
    caps out-degree at O(sqrt(m)), so the wedge relation — the only
    super-linear intermediate — is sum(outdeg²) = O(m^1.5) worst case
    instead of sum(deg²), which is what makes the plan survive hub
    nodes at 100 TB. Returns one row:
    (n_nodes, n_edges, n_wedges, n_triangles, gcc_ppm)."""
    deg = (
        edges.select(F.col("pa").alias("node"))
        .unionAll(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("node").alias("pa"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("pb"), F.col("deg").alias("deg_b"))
    ranked = edges.join(da, "pa").join(db, "pb")
    # orientation order: (deg, id) — ties broken by id, total order
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("pa") < F.col("pb"))
    )
    oriented = ranked.select(
        F.when(a_first, F.col("pa")).otherwise(F.col("pb")).alias("src"),
        F.when(a_first, F.col("pb")).otherwise(F.col("pa")).alias("dst"),
    )
    wedges = (
        oriented.alias("e1")
        .join(oriented.alias("e2"), "src")
        .filter(F.col("e1.dst") < F.col("e2.dst"))
        .select(F.col("e1.dst").alias("v"), F.col("e2.dst").alias("w"))
    )
    closing = edges.select(F.col("pa").alias("v"), F.col("pb").alias("w"))
    # semi join on the (min,max)-keyed undirected edge set: each
    # triangle closes exactly once, at its orientation-minimal vertex
    n_tri = wedges.join(closing, ["v", "w"], "left_semi").count()
    totals = (
        deg.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            (F.sum(F.col("deg") * (F.col("deg") - 1)) / 2).cast("long").alias("n_wedges"),
        )
        .crossJoin(edges.agg(F.count(F.lit(1)).alias("n_edges")))
    )
    return totals.select(
        "n_nodes",
        F.col("n_edges").cast("long").alias("n_edges"),
        "n_wedges",
        F.lit(n_tri).cast("long").alias("n_triangles"),
        F.expr(
            f"CAST({3 * n_tri * 1_000_000}L DIV n_wedges AS BIGINT)"
        ).alias("gcc_ppm"),
    )


@register(
    "g_triangle_count",
    oracle="""
    WITH e AS (
        SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
        SELECT node, COUNT(*) AS deg FROM (
            SELECT pa AS node FROM e UNION ALL SELECT pb AS node FROM e
        ) GROUP BY node
    ),
    tri AS (
        SELECT COUNT(*) AS n_triangles
        FROM e e1
        JOIN e e2 ON e2.pa = e1.pb
        JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg)       AS n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM e)         AS n_edges,
           (SELECT CAST(SUM(deg * (deg - 1)) AS BIGINT) // 2 FROM deg) AS n_wedges,
           CAST(n_triangles AS BIGINT)                      AS n_triangles,
           -- BIGINT // BIGINT: exact floor. The old spelling divided
           -- by SUM(..)/2 — a DOUBLE in DuckDB — and a reseeded
           -- fixture landed gcc within 1 ulp of an integer (38246
           -- exact vs 38247 float); the Spark side's integer DIV was
           -- already exact.
           CAST((3 * n_triangles * 1000000)
                // (SELECT CAST(SUM(deg * (deg - 1)) AS BIGINT) // 2 FROM deg)
                AS BIGINT) AS gcc_ppm
    FROM tri
    """,
    survey_ids=("J3", "A2"),
)
def g_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census + global clustering coefficient of the part
    co-purchase graph (market-basket structure: how cliquish are
    baskets). The oracle closes triangles with the naive a<b<c 3-way
    self-join; the engine uses degree-ordered orientation — hash
    equality proves the oriented enumeration exact, triangle for
    triangle."""
    edges = copurchase_edges(t(spark, sf_dir, "lineitem"))
    return triangle_stats(edges)


MINSUP_PAIRS = 3


@register(
    "x4_association_rules",
    oracle=f"""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM op),
    item AS (SELECT l_partkey, COUNT(*) AS sup FROM op GROUP BY l_partkey),
    pairs AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS sup_ab
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= {MINSUP_PAIRS}
    )
    SELECT pa, pb,
           CAST(p.sup_ab AS BIGINT) AS sup_ab,
           CAST(ia.sup AS BIGINT) AS sup_a,
           CAST(ib.sup AS BIGINT) AS sup_b,
           CAST(FLOOR(p.sup_ab * 1000000.0 / ia.sup) AS BIGINT) AS conf_a_to_b_e6,
           CAST(FLOOR(p.sup_ab * 1000000.0 * n.n_orders
                      / (ia.sup * ib.sup)) AS BIGINT) AS lift_e6
    FROM pairs p
    JOIN item ia ON ia.l_partkey = p.pa
    JOIN item ib ON ib.l_partkey = p.pb
    CROSS JOIN n
    ORDER BY pa, pb
    """,
    survey_ids=("X4", "A1", "J3"),
)
def x4_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over co-purchased parts: pair
    support ≥ {MINSUP_PAIRS} with confidence(a→b) and lift in exact
    e6 fixed-point (integer counts through one float division both
    engines compute identically). The A-priori first level — at 100 TB
    the co-keyed per-order pair generation (bounded C(k,2) per basket)
    + map-combined support counting is exactly how FP-growth's
    frequent-pair seed set is mined; item supports broadcast back onto
    the surviving pairs."""
    op = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = op.select("l_orderkey").distinct().count()
    item = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("sup"))
    pairs = (
        op.alias("a")
        .join(op.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("sup_ab"))
        .filter(F.col("sup_ab") >= MINSUP_PAIRS)
    )
    ia = item.select(F.col("l_partkey").alias("pa"), F.col("sup").alias("sup_a"))
    ib = item.select(F.col("l_partkey").alias("pb"), F.col("sup").alias("sup_b"))
    return (
        pairs.join(F.broadcast(ia), "pa")
        .join(F.broadcast(ib), "pb")
        .select(
            "pa",
            "pb",
            F.col("sup_ab").cast("long").alias("sup_ab"),
            F.col("sup_a").cast("long").alias("sup_a"),
            F.col("sup_b").cast("long").alias("sup_b"),
            F.floor(F.col("sup_ab") * 1_000_000.0 / F.col("sup_a"))
            .cast("long")
            .alias("conf_a_to_b_e6"),
            F.floor(
                F.col("sup_ab") * 1_000_000.0 * n_orders
                / (F.col("sup_a") * F.col("sup_b"))
            )
            .cast("long")
            .alias("lift_e6"),
        )
        .orderBy("pa", "pb")
    )


# ---------------------------------------------------------------------------
# Native recursive CTE through the SQL front door (Spark 4 WITH RECURSIVE)
# ---------------------------------------------------------------------------
_RECURSIVE_TREE_SQL = """
    WITH RECURSIVE tree AS (
        SELECT c_custkey AS id, c_custkey AS root_id, CAST(0 AS BIGINT) AS depth
        FROM customer WHERE c_custkey {div} 10 = 0
        UNION ALL
        SELECT c.c_custkey, tr.root_id, tr.depth + 1
        FROM customer c JOIN tree tr ON c.c_custkey {div} 10 = tr.id
        WHERE c.c_custkey >= 10
    )
    SELECT id, root_id, depth
    FROM tree
    ORDER BY id
    """


@register(
    "u_recursive_cte_depth",
    oracle=_RECURSIVE_TREE_SQL.format(div="//"),
    survey_ids=("U1", "J3"),
)
def u_recursive_cte_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-user spelling of the org-chart walk: Spark 4's native
    ``WITH RECURSIVE`` (recursive CTEs landed in 4.0), the SAME query
    text DuckDB runs modulo the integer-division operator (Spark
    ``DIV`` / DuckDB ``//``). This is the third tier of the hierarchy
    family: `j_hierarchy_depth` (pointer doubling, O(log depth)
    rounds, the 100 TB shape), its transitive-closure sibling, and now
    the front-door recursive form a warehouse user types directly.
    Scale note: Spark executes WITH RECURSIVE as iterated union steps
    — one distributed join PER LEVEL (O(depth) rounds), so on deep
    hierarchies the pointer-doubling operator remains the engine's
    recommended tier; this query exists because the SQL surface must
    accept the standard spelling."""
    from etl_generator_demo_spark.catalog import Catalog

    Catalog(spark, sf_dir).register_views(("customer",))
    return spark.sql(_RECURSIVE_TREE_SQL.format(div="DIV"))


@register(
    "g_clustering_coefficient",
    oracle="""
    WITH e AS (
        SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    sym AS (
        SELECT pa AS u, pb AS v FROM e
        UNION ALL
        SELECT pb AS u, pa AS v FROM e
    ),
    deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg
            FROM sym GROUP BY u),
    tri AS (
        SELECT u, CAST(COUNT(*) AS BIGINT) AS tri
        FROM (
            SELECT s1.u, s1.v AS a, s2.v AS b
            FROM sym s1
            JOIN sym s2 ON s1.u = s2.u AND s1.v < s2.v
            JOIN e ON e.pa = s1.v AND e.pb = s2.v
        )
        GROUP BY u
    )
    SELECT d.node, d.deg, COALESCE(t.tri, 0) AS tri,
           CAST((2 * COALESCE(t.tri, 0) * 1000000)
                // (d.deg * (d.deg - 1)) AS BIGINT) AS lcc_e6
    FROM deg d
    LEFT JOIN tri t ON t.u = d.node
    WHERE d.deg >= 3
    ORDER BY lcc_e6 DESC, d.node
    LIMIT 20
    """,
    survey_ids=("J3", "A1", "O4"),
)
def g_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCAL clustering coefficient per node — 2·tri(v)/(deg(v)·
    (deg(v)−1)), the per-node counterpart of `g_triangle_count`'s
    global census: which parts sit inside cliquish co-purchase
    neighborhoods (community seeds) vs hub-and-spoke ones. The
    per-node triangle counts reuse the degree-ordered orientation:
    wedges enumerate only at each edge's lower-(deg,id) endpoint —
    O(m^1.5) worst case, hub-safe — and every closed triangle
    (src, v, w) credits its THREE corners via one explode, so the
    per-node credit relation is 3·|triangles| rows. Exact integers
    end to end (e6 via integer division); the oracle closes triangles
    with the naive symmetric 3-way self-join — hash equality proves
    the oriented enumeration exact, corner for corner."""
    edges = copurchase_edges(t(spark, sf_dir, "lineitem"))
    deg = (
        edges.select(F.col("pa").alias("node"))
        .unionAll(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    da = deg.select(F.col("node").alias("pa"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("pb"), F.col("deg").alias("deg_b"))
    ranked = edges.join(da, "pa").join(db, "pb")
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("pa") < F.col("pb"))
    )
    oriented = ranked.select(
        F.when(a_first, F.col("pa")).otherwise(F.col("pb")).alias("src"),
        F.when(a_first, F.col("pb")).otherwise(F.col("pa")).alias("dst"),
    )
    wedges = (
        oriented.alias("e1")
        .join(oriented.alias("e2"), "src")
        .filter(F.col("e1.dst") < F.col("e2.dst"))
        .select("src", F.col("e1.dst").alias("v"), F.col("e2.dst").alias("w"))
    )
    closing = edges.select(F.col("pa").alias("v"), F.col("pb").alias("w"))
    triangles = wedges.join(closing, ["v", "w"], "left_semi")
    corner_credit = triangles.select(
        F.explode(F.array("src", "v", "w")).alias("node")
    )
    tri = corner_credit.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("tri")
    )
    return (
        deg.filter(F.col("deg") >= 3)
        .join(tri, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce(F.col("tri"), F.lit(0)).cast("long").alias("tri"),
        )
        .select(
            "node",
            "deg",
            "tri",
            F.expr("CAST((2 * tri * 1000000) DIV (deg * (deg - 1)) AS LONG)").alias(
                "lcc_e6"
            ),
        )
        .orderBy(F.col("lcc_e6").desc(), "node")
        .limit(20)
    )
