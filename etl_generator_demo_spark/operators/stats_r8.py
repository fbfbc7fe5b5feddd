"""Round-8 statistics and attribution extensions.

- Markov removal-effect attribution: the principled multi-touch model
  (first/last/linear are heuristics; removal effect answers "how much
  conversion disappears without this channel"). Transition counting is
  the distributed part (windows over billions of events); the
  absorption solve runs on the collected transition matrix — a
  bounded-parameter fetch like the k-means centroid collect, since the
  state space is the event taxonomy (≤7 states), not the data.
- Entropy rate of the event process (conditional next-event entropy).
- Kendall tau-b rank correlation from the binned contingency table —
  the O(cells²) formulation, never documents².
- Cramér's V effect size over the χ² contingency machinery.

Exactness: e9-floored-log integer sums, DECIMAL(38,0)/unbounded-int
products (r7 overflow advice), FLOOR-scaled final ratios.

Reference parity: these are reachable analyses for the reference's
NL->SQL users (``/root/reference/sample_metadata.py`` exposes events
and document tables); the reference delegates the SQL to an LLM and
the math to PostgreSQL — here each is a first-class engine operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from .relational import t

#: Non-converting channels of the fixture event taxonomy, i.e. every
#: event type except the absorbing conversion 'purchase'. Fixed (not
#: data-derived) so the unrolled oracle and the Spark solve agree on
#: the variant set by construction.
CHANNELS = ("click", "error", "signup", "view")

#: Fixed-point scale for absorption probabilities (conversion prob in
#: units of 1e-12) and synchronous iteration count. 24 iterations of a
#: 5-transient-state chain converge far below the e12 floor; fixed
#: schedule = deterministic cross-engine contract (same reasoning as
#: LPA_ROUNDS).
MARKOV_SCALE = 1_000_000_000_000
MARKOV_ITERS = 24

# Shared journey CTE: per-user event sequence truncated at the FIRST
# purchase (the standard attribution convention: one conversion per
# journey), START prepended, non-converting journeys closed with END.
_JOURNEY_SQL = """
    base AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        FROM events
    ),
    fp AS (
        SELECT user_id, MIN(rn) AS prn FROM base
        WHERE event_type = 'purchase' GROUP BY user_id
    ),
    j AS (
        SELECT b.user_id, b.event_type, b.rn
        FROM base b LEFT JOIN fp ON fp.user_id = b.user_id
        WHERE fp.prn IS NULL OR b.rn <= fp.prn
    ),
    hops AS (
        SELECT event_type AS s,
               COALESCE(LEAD(event_type) OVER (PARTITION BY user_id ORDER BY rn),
                        CASE WHEN event_type = 'purchase' THEN NULL ELSE 'END' END)
                   AS tgt
        FROM j
        UNION ALL
        SELECT 'START' AS s, event_type AS tgt FROM j WHERE rn = 1
    ),
    trans AS MATERIALIZED (
        SELECT s, tgt, CAST(COUNT(*) AS BIGINT) AS n
        FROM hops WHERE tgt IS NOT NULL GROUP BY s, tgt
    ),
    den AS MATERIALIZED (
        SELECT s, CAST(SUM(n) AS BIGINT) AS den FROM trans GROUP BY s
    )
"""


def _markov_oracle() -> str:
    """Unrolled synchronous absorption iteration, identical integer
    floor arithmetic to the Spark-side solve (HUGEINT products — the
    DuckDB spelling of the unbounded-int discipline). The attribution
    share uses the pmod floor-division idiom on HUGEINT (never a
    double FLOOR: effect_e12·1e6 ≈ 1e18 exceeds a double's 2^53 exact
    range — r8 advice), exactly mirroring Python's ``//``; the idiom
    assumes the effect total is positive, which holds whenever any
    channel carries conversions (removal effects are non-negative)."""
    chans = ", ".join(f"('{c}')" for c in ("base",) + CHANNELS)
    steps = [
        """
    v0 AS (SELECT rm, s, CAST(0 AS HUGEINT) AS val FROM vden)"""
    ]
    for k in range(MARKOV_ITERS):
        # LEFT JOIN on vtrans (r8 advice): a state whose every outgoing
        # transition targets the removed channel keeps its vden row with
        # val 0 (COALESCE of the all-NULL SUM) instead of dropping out of
        # v_k — so a variant where one channel owns all of START's
        # transitions still yields its START row (conv 0), matching the
        # Spark-side solve's row set.
        steps.append(f"""
    v{k + 1} AS MATERIALIZED (
        SELECT d.rm, d.s,
               (COALESCE(SUM(CASE WHEN tr.tgt = 'purchase'
                         THEN CAST(tr.n AS HUGEINT) * {MARKOV_SCALE}
                         WHEN tr.tgt = 'END' THEN CAST(0 AS HUGEINT)
                         ELSE CAST(tr.n AS HUGEINT) * COALESCE(pv.val, 0) END),
                         CAST(0 AS HUGEINT))
                // d.den) AS val
        FROM vden d
        LEFT JOIN vtrans tr ON tr.rm = d.rm AND tr.s = d.s
        LEFT JOIN v{k} pv ON pv.rm = d.rm AND pv.s = tr.tgt
        GROUP BY d.rm, d.s, d.den
    )""")
    final = f"""
    WITH {_JOURNEY_SQL},
    variants AS (SELECT * FROM (VALUES {chans}) v(rm)),
    vtrans AS MATERIALIZED (
        SELECT v.rm, tr.s, tr.tgt, tr.n
        FROM variants v JOIN trans tr
          ON tr.s <> v.rm AND tr.tgt <> v.rm
    ),
    vden AS MATERIALIZED (
        SELECT v.rm, d.s, d.den FROM variants v JOIN den d ON d.s <> v.rm
    ),
    {",".join(steps)},
    conv AS (
        SELECT rm, CAST(val AS BIGINT) AS conv_e12
        FROM v{MARKOV_ITERS} WHERE s = 'START'
    ),
    effects AS (
        SELECT c.rm AS channel,
               b.conv_e12 AS base_conv_e12,
               c.conv_e12 AS removed_conv_e12,
               b.conv_e12 - c.conv_e12 AS removal_effect_e12
        FROM conv c, (SELECT conv_e12 FROM conv WHERE rm = 'base') b
        WHERE c.rm <> 'base'
    ),
    scaled AS (
        SELECT channel, base_conv_e12, removed_conv_e12, removal_effect_e12,
               CAST(removal_effect_e12 AS HUGEINT) * 1000000 AS num,
               NULLIF(CAST((SELECT SUM(removal_effect_e12) FROM effects)
                           AS HUGEINT), 0) AS tot
        FROM effects
    )
    SELECT channel, base_conv_e12, removed_conv_e12, removal_effect_e12,
           -- the pmod floor-division idiom is floor-exact only for tot > 0
           -- (r9 advice): NULL out attribution when the effect total is
           -- non-positive, mirrored on the Spark side
           CASE WHEN tot > 0
                THEN CAST((num - ((num % tot + tot) % tot)) // tot AS BIGINT)
                ELSE NULL END AS attribution_e6
    FROM scaled
    ORDER BY channel
    """
    return final


@register(
    "x4_markov_attribution",
    oracle=_markov_oracle(),
    survey_ids=("X4", "W2", "A1", "J1"),
)
def x4_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain removal-effect attribution. Journeys (truncated at
    first purchase, START prepended, END-closed) yield a transition
    count matrix; conversion probability from START is solved by 24
    synchronous fixed-point iterations; each channel's credit is the
    drop in conversion when journeys through it are severed (its
    transitions redirect to END while denominators stay original).

    The distributed work is the journey/transition windows over the
    full event log; the solve operates on the ≤(states+2)² collected
    matrix — a bounded parameter fetch (the state space is the event
    taxonomy, not the data), exactly the k-means-centroid collect
    idiom. Arithmetic is integer fixed-point (e12 scale, floor
    division, unbounded Python ints == DuckDB HUGEINT), so the
    24-step schedule is hash-exact against the unrolled-CTE oracle."""
    ev = t(spark, sf_dir, "events")
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = ev.select(
        "user_id", "event_type", F.row_number().over(w_seq).alias("rn")
    )
    fp = (
        base.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("prn"))
    )
    j = base.join(fp, "user_id", "left").filter(
        F.col("prn").isNull() | (F.col("rn") <= F.col("prn"))
    )
    w_j = Window.partitionBy("user_id").orderBy("rn")
    hops = j.select(
        F.col("event_type").alias("s"),
        F.coalesce(
            F.lead("event_type").over(w_j),
            F.when(F.col("event_type") == "purchase", F.lit(None)).otherwise(
                F.lit("END")
            ),
        ).alias("tgt"),
    ).unionByName(
        j.filter(F.col("rn") == 1).select(
            F.lit("START").alias("s"), F.col("event_type").alias("tgt")
        )
    )
    trans_rows = (
        hops.filter(F.col("tgt").isNotNull())
        .groupBy("s", "tgt")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()  # bounded: |taxonomy+2|² cells, not data-sized
    )
    trans = {(r["s"], r["tgt"]): int(r["n"]) for r in trans_rows}
    den = {}
    for (s, _), n in trans.items():
        den[s] = den.get(s, 0) + n

    def solve(removed: str | None) -> int:
        """Conversion prob from START (e12 fixed point) with `removed`
        severed; exact ints, floor division — mirrors the oracle."""
        states = [s for s in den if s != removed]
        val = {s: 0 for s in states}
        for _ in range(MARKOV_ITERS):
            nxt = {}
            for s in states:
                num = 0
                for (a, b), n in trans.items():
                    if a != s or b == removed:
                        continue
                    if b == "purchase":
                        num += n * MARKOV_SCALE
                    elif b != "END":
                        num += n * val.get(b, 0)
                nxt[s] = num // den[s]
            val = nxt
        return val.get("START", 0)

    base_conv = solve(None)
    effects = {c: base_conv - solve(c) for c in CHANNELS}
    total = sum(effects.values())
    rows = [
        Row(
            channel=c,
            base_conv_e12=base_conv,
            removed_conv_e12=base_conv - effects[c],
            removal_effect_e12=effects[c],
            # attribution is defined only for a positive effect total
            # (pmod floor idiom in the oracle is floor-exact only there);
            # non-positive total -> NULL in both engines (r9 advice)
            attribution_e6=(effects[c] * 1_000_000) // total
            if total > 0
            else None,
        )
        for c in sorted(CHANNELS)
    ]
    schema = (
        "channel string, base_conv_e12 long, removed_conv_e12 long, "
        "removal_effect_e12 long, attribution_e6 long"
    )
    return spark.createDataFrame(rows, schema=schema)


@register(
    "x4_entropy_rate_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY CAST(ts AS TIMESTAMP), event_id)
                   AS next_type
        FROM events
    ),
    tr AS (
        SELECT event_type AS s, next_type AS tgt, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
    ),
    agg AS (
        SELECT s, CAST(SUM(n) AS BIGINT) AS n_from,
               CAST(SUM(n * CAST(FLOOR(LN(n) * 1000000000) AS BIGINT))
                    AS BIGINT) AS slog
        FROM tr GROUP BY s
    )
    SELECT s AS from_type, n_from,
           CAST(FLOOR((LN(CAST(n_from AS DOUBLE))
                       - CAST(slog AS DOUBLE)
                         / (CAST(n_from AS DOUBLE) * 1000000000.0))
                      * 1000000) AS BIGINT) AS h_cond_nats_e6
    FROM agg
    ORDER BY from_type
    """,
    survey_ids=("X4", "W2", "A1"),
)
def x4_entropy_rate_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the user event process: H(next | current) per
    current state — how predictable the next action is from here. Low
    conditional entropy states are funnel bottlenecks (the next step
    is forced); uniform-high states are browsing. Same exact-sum
    identity as the Shannon-entropy operator (H = ln n − Σ n·L(n)/n·1e9
    with L = e9-floored log), applied to the transition relation —
    taxonomy²-bounded, one window pass + one aggregate."""
    ev = t(spark, sf_dir, "events")
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        ev.select(
            F.col("event_type").alias("s"),
            F.lead("event_type").over(w_seq).alias("tgt"),
        )
        .filter(F.col("tgt").isNotNull())
        .groupBy("s", "tgt")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    agg = tr.groupBy("s").agg(
        F.sum("n").cast("long").alias("n_from"),
        F.sum(F.col("n") * F.floor(F.log("n") * 1_000_000_000).cast("long"))
        .cast("long")
        .alias("slog"),
    )
    return agg.select(
        F.col("s").alias("from_type"),
        "n_from",
        F.floor(
            (
                F.log(F.col("n_from").cast("double"))
                - F.col("slog").cast("double")
                / (F.col("n_from").cast("double") * 1_000_000_000.0)
            )
            * 1_000_000
        )
        .cast("long")
        .alias("h_cond_nats_e6"),
    ).orderBy("from_type")


@register(
    "x4_kendall_tau_bins",
    oracle="""
    WITH cells AS (
        SELECT CAST(n_chars // 200 AS BIGINT) AS x,
               CAST(len(string_split(text, ' ')) // 5 AS BIGINT) AS y,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2
    ),
    cd AS (
        SELECT
            CAST(SUM(CASE WHEN b.y > a.y
                     THEN CAST(a.n AS DECIMAL(38,0)) * CAST(b.n AS DECIMAL(38,0))
                     ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS c,
            CAST(SUM(CASE WHEN b.y < a.y
                     THEN CAST(a.n AS DECIMAL(38,0)) * CAST(b.n AS DECIMAL(38,0))
                     ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS d
        FROM cells a JOIN cells b ON a.x < b.x
    ),
    nn AS (SELECT CAST(SUM(n) AS DECIMAL(38,0)) AS n_docs FROM cells),
    tx AS (
        SELECT CAST(SUM(CAST(tn AS DECIMAL(38,0)) * (CAST(tn AS DECIMAL(38,0)) - 1)
                    / 2) AS DECIMAL(38,0)) AS ties
        FROM (SELECT x, SUM(n) AS tn FROM cells GROUP BY x)
    ),
    ty AS (
        SELECT CAST(SUM(CAST(tn AS DECIMAL(38,0)) * (CAST(tn AS DECIMAL(38,0)) - 1)
                    / 2) AS DECIMAL(38,0)) AS ties
        FROM (SELECT y, SUM(n) AS tn FROM cells GROUP BY y)
    )
    SELECT CAST(nn.n_docs AS BIGINT) AS n_docs,
           CAST(cd.c AS BIGINT) AS concordant,
           CAST(cd.d AS BIGINT) AS discordant,
           CAST(FLOOR(CAST(cd.c - cd.d AS DOUBLE) * 1000000.0
                      / SQRT(CAST((nn.n_docs * (nn.n_docs - 1) / 2 - tx.ties)
                                  AS DOUBLE)
                             * CAST((nn.n_docs * (nn.n_docs - 1) / 2 - ty.ties)
                                    AS DOUBLE)))
                AS BIGINT) AS tau_b_e6
    FROM cd, nn, tx, ty
    """,
    survey_ids=("X4", "J7", "A2"),
)
def x4_kendall_tau_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between document length and token
    count (binned), computed from the contingency table: concordant/
    discordant mass is Σ n_xy·n_x'y' over cell pairs with x'>x — an
    O(cells²) bounded join, never the O(n²) document-pair join the
    textbook definition implies. Tie corrections (tau-b) from the
    marginals. Products carried as DECIMAL(38,0) (n(n−1)/2 overflows
    int64 past ~4.3e9 rows); the only float is the final
    exact→double sqrt ratio, identical in both engines."""
    docs = t(spark, sf_dir, "documents")
    dec = "decimal(38,0)"
    cells = (
        docs.select(
            (F.col("n_chars") / 200).cast("long").alias("x"),
            (F.size(F.split("text", " ")) / 5).cast("long").alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=True)
    )
    a = cells.select(
        F.col("x").alias("xa"), F.col("y").alias("ya"), F.col("n").alias("na")
    )
    b = cells.select(
        F.col("x").alias("xb"), F.col("y").alias("yb"), F.col("n").alias("nb")
    )
    cd = a.join(b, F.col("xa") < F.col("xb")).agg(
        F.sum(
            F.when(
                F.col("yb") > F.col("ya"),
                F.col("na").cast(dec) * F.col("nb").cast(dec),
            ).otherwise(F.lit(0).cast(dec))
        )
        .cast(dec)
        .alias("c"),
        F.sum(
            F.when(
                F.col("yb") < F.col("ya"),
                F.col("na").cast(dec) * F.col("nb").cast(dec),
            ).otherwise(F.lit(0).cast(dec))
        )
        .cast(dec)
        .alias("d"),
    )
    nn = cells.agg(F.sum("n").cast(dec).alias("n_docs"))
    tx = (
        cells.groupBy("x")
        .agg(F.sum("n").cast(dec).alias("tn"))
        .agg(
            F.sum(F.col("tn") * (F.col("tn") - 1) / 2).cast(dec).alias("ties_x")
        )
    )
    ty = (
        cells.groupBy("y")
        .agg(F.sum("n").cast(dec).alias("tn"))
        .agg(
            F.sum(F.col("tn") * (F.col("tn") - 1) / 2).cast(dec).alias("ties_y")
        )
    )
    j = cd.crossJoin(nn).crossJoin(tx).crossJoin(ty)
    n0 = F.col("n_docs") * (F.col("n_docs") - 1) / 2
    return j.select(
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("c").cast("long").alias("concordant"),
        F.col("d").cast("long").alias("discordant"),
        F.floor(
            (F.col("c") - F.col("d")).cast("double")
            * 1_000_000.0
            / F.sqrt(
                (n0 - F.col("ties_x")).cast("double")
                * (n0 - F.col("ties_y")).cast("double")
            )
        )
        .cast("long")
        .alias("tau_b_e6"),
    )


@register(
    "x4_cramers_v_lang_source",
    oracle="""
    WITH obs AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
        FROM documents GROUP BY lang, source
    ),
    langs AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS row_tot FROM obs GROUP BY lang),
    srcs  AS (SELECT source, CAST(SUM(o) AS BIGINT) AS col_tot FROM obs GROUP BY source),
    tot   AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
    grid AS (
        SELECT l.lang, s.source, l.row_tot, s.col_tot, COALESCE(obs.o, 0) AS o
        FROM langs l
        CROSS JOIN srcs s
        LEFT JOIN obs ON obs.lang = l.lang AND obs.source = s.source
    ),
    cells AS (
        SELECT CAST(FLOOR(
                   POWER(o - row_tot * col_tot / CAST(n AS DOUBLE), 2)
                   / (row_tot * col_tot / CAST(n AS DOUBLE)) * 1000000
               ) AS BIGINT) AS contrib_e6
        FROM grid, tot
    ),
    chi AS (SELECT CAST(SUM(contrib_e6) AS BIGINT) AS chi2_e6 FROM cells),
    dims AS (
        SELECT (SELECT n FROM tot) AS n,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM langs) AS r,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM srcs) AS c
    )
    SELECT d.n, d.r AS n_langs, d.c AS n_sources, chi.chi2_e6,
           CAST(FLOOR(SQRT((chi.chi2_e6 / 1000000.0)
                           / (d.n * LEAST(d.r - 1, d.c - 1))) * 1000000)
                AS BIGINT) AS cramers_v_e6
    FROM chi, dims d
    """,
    survey_ids=("X4", "A1", "J4"),
)
def x4_cramers_v_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V effect size for the lang × source association — the
    [0,1]-normalized companion to the χ² statistic (χ² grows with N
    even for a fixed association strength; V = sqrt(χ²/(N·min(r−1,
    c−1))) does not). Identical per-cell e6-floored contributions as
    x4_chi2_lang_source (so the two operators can never disagree on
    the same data), one extra closed-form projection. Contingency
    grid is |langs|×|sources|-bounded."""
    docs = t(spark, sf_dir, "documents")
    obs = (
        docs.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
        # |langs|×|sources| cells: checkpoint once so the four margin
        # branches reuse the counted table instead of re-scanning the
        # corpus (same idiom as x4_chi2_lang_source)
        .localCheckpoint()
    )
    langs = obs.groupBy("lang").agg(F.sum("o").cast("long").alias("row_tot"))
    srcs = obs.groupBy("source").agg(F.sum("o").cast("long").alias("col_tot"))
    tot = obs.agg(F.sum("o").cast("long").alias("n"))
    grid = (
        langs.crossJoin(srcs)
        .join(obs, ["lang", "source"], "left")
        .select(
            "lang",
            "source",
            "row_tot",
            "col_tot",
            F.coalesce(F.col("o"), F.lit(0)).alias("o"),
        )
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("row_tot") * F.col("col_tot") / F.col("n").cast("double")
    cells = grid.select(
        F.floor(F.pow(F.col("o") - e, 2) / e * 1_000_000)
        .cast("long")
        .alias("contrib_e6")
    )
    chi = cells.agg(F.sum("contrib_e6").cast("long").alias("chi2_e6"))
    dims = (
        tot.crossJoin(langs.agg(F.count(F.lit(1)).cast("long").alias("r")))
        .crossJoin(srcs.agg(F.count(F.lit(1)).cast("long").alias("c")))
    )
    return chi.crossJoin(F.broadcast(dims)).select(
        "n",
        F.col("r").alias("n_langs"),
        F.col("c").alias("n_sources"),
        "chi2_e6",
        F.floor(
            F.sqrt(
                (F.col("chi2_e6") / 1_000_000.0)
                / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))
            )
            * 1_000_000
        )
        .cast("long")
        .alias("cramers_v_e6"),
    )
