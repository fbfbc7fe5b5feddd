"""Round-10 LLM-pipeline depth: curation rules, sampling allocation,
item-item recommendations.

- Gopher-style quality-rule battery (Rae et al. 2021 §A1.1): the
  per-rule audit matrix (not just the combined gate of
  ``x4_quality_and_lang``) — the view a curation engineer reads to
  tune thresholds before committing a 100 TB filter pass. All rule
  comparisons are integer cross-multiplications (``2·words ≤ chars``
  instead of ``chars/words ≥ 2``), so the verdicts cannot wobble on
  float division and the DuckDB oracle hashes exactly.
- Stratified proportional allocation with largest-remainder (Hamilton)
  rounding: THE way to draw a fixed-size audit/eval sample whose
  strata mirror corpus composition. Allocation arithmetic is exact
  integers; within-stratum selection is the md5-rank order both
  engines replay.
- Item-item co-occurrence recommendations (classic collaborative
  filtering serving table): squared-cosine scores in e6 fixed point —
  ``cooc²·10⁶ // (n_a·n_b)`` avoids the sqrt while preserving the
  cosine ORDER, so ranks are exact.

Reference grounding: the reference's NL→SQL surface exposes the
orders/lineitem join graph (sample_metadata.py:68-74) but delegates
every computation to PostgreSQL; these are first-class engine
operators over the same graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from .relational import t
from .textops import STOPWORDS_EN

_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS_EN)

#: Fixed-size sample target for the stratified draw (eval-set scale).
SAMPLE_N = 100

#: Anchor parts for the item-item serving table (top by basket support).
RECS_ANCHORS = 50
RECS_PER_ITEM = 3


@register(
    "x4_gopher_quality_rules",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents
    ),
    agg AS (
        SELECT doc_id,
               CAST(COUNT(*) FILTER (WHERE w <> '') AS BIGINT) AS words,
               CAST(COALESCE(SUM(LENGTH(w)) FILTER (WHERE w <> ''), 0)
                    AS BIGINT) AS wchars,
               CAST(COUNT(*) FILTER (WHERE REGEXP_MATCHES(w, '^[A-Za-z]+$'))
                    AS BIGINT) AS alpha_words,
               CAST(COUNT(DISTINCT CASE WHEN LOWER(w) IN ({_STOP_SQL})
                                        THEN LOWER(w) END) AS BIGINT)
                   AS stop_hits
        FROM tok GROUP BY doc_id
    ),
    per_doc AS (
        SELECT d.source,
               COALESCE(a.words, 0) AS words,
               COALESCE(a.wchars, 0) AS wchars,
               COALESCE(a.alpha_words, 0) AS alpha_words,
               COALESCE(a.stop_hits, 0) AS stop_hits,
               LENGTH(d.text)
                 - LENGTH(REGEXP_REPLACE(d.text, '[0-9]', '', 'g'))
                   AS digit_chars,
               LENGTH(d.text) AS chars
        FROM documents d LEFT JOIN agg a USING (doc_id)
    ),
    verdicts AS (
        SELECT source,
               (words BETWEEN 5 AND 1000) AS r1,
               (2 * words <= wchars AND wchars <= 12 * words AND words > 0)
                   AS r2,
               (2 * alpha_words >= words AND words > 0) AS r3,
               (stop_hits >= 2) AS r4,
               (5 * digit_chars <= chars) AS r5
        FROM per_doc
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (WHERE r1) AS BIGINT) AS pass_word_count,
           CAST(COUNT(*) FILTER (WHERE r2) AS BIGINT) AS pass_mean_word_len,
           CAST(COUNT(*) FILTER (WHERE r3) AS BIGINT) AS pass_alpha_fraction,
           CAST(COUNT(*) FILTER (WHERE r4) AS BIGINT) AS pass_stopwords,
           CAST(COUNT(*) FILTER (WHERE r5) AS BIGINT) AS pass_digit_fraction,
           CAST(COUNT(*) FILTER (WHERE r1 AND r2 AND r3 AND r4 AND r5)
                AS BIGINT) AS keep_all
    FROM verdicts
    GROUP BY source ORDER BY source
    """,
    survey_ids=("X4", "F5", "A1", "J4"),
)
def x4_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality audit matrix per source: for each of five
    curation rules (word count 5–1000; mean word length 2–12; ≥50%
    alphabetic tokens; ≥2 distinct stopwords; ≤20% digit characters),
    how many docs pass — plus the all-rules keep count. The per-rule
    view is what tunes thresholds BEFORE an expensive corpus-wide
    filter commit (the combined gate is ``x4_quality_and_lang``).

    Scale: one explode → one map-combined per-doc aggregate → one
    per-source rollup; every rule is an integer cross-multiplication
    (``2·words ≤ wchars``, ``5·digit_chars ≤ chars``) so there is no
    float division anywhere and the oracle hashes bit-exact. Docs
    whose token list is empty survive via the LEFT JOIN back to the
    corpus (words=0 fails r1/r2/r3 by definition, not by absence)."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    stop = [w.lower() for w in STOPWORDS_EN]
    agg = tok.groupBy("doc_id").agg(
        F.count(F.when(F.col("w") != "", 1)).cast("long").alias("words"),
        F.coalesce(
            F.sum(F.when(F.col("w") != "", F.length("w"))), F.lit(0)
        )
        .cast("long")
        .alias("wchars"),
        F.count(F.when(F.col("w").rlike("^[A-Za-z]+$"), 1))
        .cast("long")
        .alias("alpha_words"),
        F.count_distinct(
            F.when(F.lower("w").isin(stop), F.lower("w"))
        )
        .cast("long")
        .alias("stop_hits"),
    )
    per_doc = (
        docs.join(agg, "doc_id", "left")
        .select(
            "source",
            F.coalesce("words", F.lit(0)).alias("words"),
            F.coalesce("wchars", F.lit(0)).alias("wchars"),
            F.coalesce("alpha_words", F.lit(0)).alias("alpha_words"),
            F.coalesce("stop_hits", F.lit(0)).alias("stop_hits"),
            (
                F.length("text")
                - F.length(F.regexp_replace("text", "[0-9]", ""))
            ).alias("digit_chars"),
            F.length("text").alias("chars"),
        )
    )
    v = per_doc.select(
        "source",
        F.col("words").between(5, 1000).alias("r1"),
        (
            (2 * F.col("words") <= F.col("wchars"))
            & (F.col("wchars") <= 12 * F.col("words"))
            & (F.col("words") > 0)
        ).alias("r2"),
        ((2 * F.col("alpha_words") >= F.col("words")) & (F.col("words") > 0))
        .alias("r3"),
        (F.col("stop_hits") >= 2).alias("r4"),
        (5 * F.col("digit_chars") <= F.col("chars")).alias("r5"),
    )
    return (
        v.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count(F.when(F.col("r1"), 1)).cast("long").alias("pass_word_count"),
            F.count(F.when(F.col("r2"), 1))
            .cast("long")
            .alias("pass_mean_word_len"),
            F.count(F.when(F.col("r3"), 1))
            .cast("long")
            .alias("pass_alpha_fraction"),
            F.count(F.when(F.col("r4"), 1)).cast("long").alias("pass_stopwords"),
            F.count(F.when(F.col("r5"), 1))
            .cast("long")
            .alias("pass_digit_fraction"),
            F.count(
                F.when(
                    F.col("r1") & F.col("r2") & F.col("r3") & F.col("r4")
                    & F.col("r5"),
                    1,
                )
            )
            .cast("long")
            .alias("keep_all"),
        )
        .orderBy("source")
    )


@register(
    "x4_stratified_proportional_sample",
    oracle=f"""
    WITH strata AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
        GROUP BY lang
    ),
    tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM strata),
    alloc AS (
        SELECT lang, n_docs,
               ({SAMPLE_N} * n_docs) // total AS base_quota,
               ({SAMPLE_N} * n_docs) % total AS remainder
        FROM strata CROSS JOIN tot
    ),
    ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (ORDER BY remainder DESC, lang) AS rem_rank,
               {SAMPLE_N} - SUM(base_quota) OVER () AS extras
        FROM alloc
    ),
    quotas AS (
        SELECT lang, n_docs,
               base_quota + CASE WHEN rem_rank <= extras THEN 1 ELSE 0 END
                   AS quota
        FROM ranked
    ),
    picked AS (
        SELECT d.lang, d.doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY d.lang
                   ORDER BY MD5(CAST(d.doc_id AS VARCHAR)), d.doc_id
               ) AS rnk,
               q.quota
        FROM documents d JOIN quotas q USING (lang)
    )
    SELECT p.lang,
           CAST(q.n_docs AS BIGINT) AS n_docs,
           CAST(q.quota AS BIGINT) AS quota,
           CAST(COUNT(*) AS BIGINT) AS n_selected,
           CAST(SUM(p.doc_id) AS BIGINT) AS sum_selected_ids,
           CAST(MIN(p.doc_id) AS BIGINT) AS min_selected_id
    FROM picked p JOIN quotas q USING (lang)
    WHERE p.rnk <= p.quota
    GROUP BY p.lang, q.n_docs, q.quota
    ORDER BY p.lang
    """,
    survey_ids=("X4", "W1", "A1", "J1"),
)
def x4_stratified_proportional_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fixed-size (SAMPLE_N=100) eval/audit sample whose language strata
    mirror corpus composition: Hamilton largest-remainder allocation
    (floor quotas, then +1 to the strata with the largest remainders
    until the target is hit — the apportionment rule that cannot
    overshoot), then within-stratum selection by md5(doc_id) rank —
    order-free, partition-free, replayable by the oracle. Output is
    the per-stratum audit row (quota vs selected, id checksum), not
    the sample itself, so the result stays |langs|-bounded.

    Scale: allocation operates on the |langs|-bounded strata relation
    (broadcast); selection is one keyed window over the corpus — rank
    within lang by a hash nothing upstream can bias. Exact integers
    throughout (``(N·n_i) // total`` and ``%`` — never a float share).
    """
    docs = t(spark, sf_dir, "documents")
    strata = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    tot = strata.agg(F.sum("n_docs").cast("long").alias("total"))
    alloc = strata.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.expr(f"({SAMPLE_N} * n_docs) div total").alias("base_quota"),
        ((F.lit(SAMPLE_N) * F.col("n_docs")) % F.col("total")).alias(
            "remainder"
        ),
    )
    w_rem = Window.orderBy(F.desc("remainder"), "lang")
    ranked = alloc.select(
        "lang",
        "n_docs",
        "base_quota",
        F.row_number().over(w_rem).alias("rem_rank"),
        (F.lit(SAMPLE_N) - F.sum("base_quota").over(Window.partitionBy()))
        .alias("extras"),
    )
    quotas = ranked.select(
        "lang",
        "n_docs",
        (
            F.col("base_quota")
            + F.when(F.col("rem_rank") <= F.col("extras"), 1).otherwise(0)
        ).alias("quota"),
    )
    w_pick = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    picked = (
        docs.select("lang", "doc_id")
        .join(F.broadcast(quotas), "lang")
        .select(
            "lang",
            "doc_id",
            "n_docs",
            "quota",
            F.row_number().over(w_pick).alias("rnk"),
        )
        .filter(F.col("rnk") <= F.col("quota"))
    )
    return (
        picked.groupBy("lang", "n_docs", "quota")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_selected"),
            F.sum("doc_id").cast("long").alias("sum_selected_ids"),
            F.min("doc_id").cast("long").alias("min_selected_id"),
        )
        .select(
            "lang",
            F.col("n_docs").cast("long"),
            F.col("quota").cast("long"),
            "n_selected",
            "sum_selected_ids",
            "min_selected_id",
        )
        .orderBy("lang")
    )


@register(
    "x4_item_item_recs",
    oracle=f"""
    WITH bi AS (
        SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
        FROM lineitem
    ),
    support AS (
        SELECT item, CAST(COUNT(*) AS BIGINT) AS n_baskets FROM bi
        GROUP BY item
    ),
    anchors AS (
        SELECT item, n_baskets FROM support
        ORDER BY n_baskets DESC, item LIMIT {RECS_ANCHORS}
    ),
    pairs AS (
        SELECT a.item AS item_a, b.item AS item_b,
               CAST(COUNT(*) AS BIGINT) AS cooc
        FROM bi a JOIN bi b
          ON a.basket = b.basket AND a.item <> b.item
        GROUP BY a.item, b.item
        HAVING COUNT(*) >= 2
    ),
    scored AS (
        SELECT an.item, an.n_baskets, p.item_b AS rec, p.cooc,
               (p.cooc * p.cooc * 1000000) // (an.n_baskets * sb.n_baskets)
                   AS score_e6
        FROM anchors an
        JOIN pairs p ON p.item_a = an.item
        JOIN support sb ON sb.item = p.item_b
    ),
    topk AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY item
                                  ORDER BY score_e6 DESC, cooc DESC, rec)
                   AS rnk
        FROM scored
    )
    SELECT item, n_baskets, rec, cooc, score_e6, CAST(rnk AS BIGINT) AS rnk
    FROM topk WHERE rnk <= {RECS_PER_ITEM}
    ORDER BY item, rnk
    """,
    survey_ids=("X4", "J3", "A1", "W4", "O4"),
)
def x4_item_item_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative-filtering serving table: for each of the
    top-RECS_ANCHORS (50) parts by basket support, the top-3
    co-purchased parts ranked by squared-cosine over baskets —
    ``cooc²·10⁶ // (n_a·n_b)``, the sqrt-free fixed-point monotone of
    cosine similarity, so ranks are exact and the oracle hashes.

    Scale: basket→item pairs are generated per basket (baskets are
    bounded — an order has a handful of parts, so the self-join blowup
    is per-key C(k,2), never corpus²); supports are map-combined; the
    anchor restriction (|anchors| = 50 rows, broadcast semi-join) is
    pushed BELOW the basket self-join — per-pair cooc is unchanged by
    it, so the pair shuffle only ever carries anchor pairs; cooc≥2
    HAVING prunes the tail; top-k per item is one keyed window over
    the already-pruned pair relation."""
    li = t(spark, sf_dir, "lineitem")
    bi = li.select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    ).distinct()
    support = bi.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("n_baskets")
    )
    anchors = support.orderBy(F.desc("n_baskets"), "item").limit(RECS_ANCHORS)
    # Anchor pushdown: cooc(item_a, item_b) is computed per pair, so
    # restricting item_a to the 50 anchors BEFORE the basket self-join
    # is semantics-preserving — and shrinks the join's left side from
    # the full corpus to the anchor rows, which is the difference
    # between a corpus-pair shuffle and an anchor-pair one at 100 TB.
    # One broadcast inner join carries n_baskets along (it is a
    # function of item_a, so adding it to the groupBy key is free) —
    # anchors is computed once, not once per use.
    a = bi.select(F.col("basket"), F.col("item").alias("item_a")).join(
        F.broadcast(
            anchors.select(F.col("item").alias("item_a"), "n_baskets")
        ),
        "item_a",
    )
    b = bi.select(F.col("basket"), F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "basket")
        .filter(F.col("item_a") != F.col("item_b"))
        .groupBy("item_a", "n_baskets", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("cooc"))
        .filter(F.col("cooc") >= 2)
    )
    scored = (
        pairs.join(
            support.select(
                F.col("item").alias("item_b"),
                F.col("n_baskets").alias("nb_b"),
            ),
            "item_b",
        )
        .select(
            F.col("item_a").alias("item"),
            "n_baskets",
            F.col("item_b").alias("rec"),
            "cooc",
            F.expr("(cooc * cooc * 1000000) div (n_baskets * nb_b)").alias(
                "score_e6"
            ),
        )
    )
    w_top = Window.partitionBy("item").orderBy(
        F.desc("score_e6"), F.desc("cooc"), "rec"
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w_top).cast("long"))
        .filter(F.col("rnk") <= RECS_PER_ITEM)
        .orderBy("item", "rnk")
    )
