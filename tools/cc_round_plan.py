"""Capture the EXECUTED plan of one connected-components round.

`dedup_clusters.connected_components` localCheckpoints every round, so
the registered queries' final plans never show the per-round joins —
this tool rebuilds ONE round with the exact expressions of the loop
body (same joins, same order) and prints the executed plan, with and
without the r17 SHUFFLE_HASH hint on the pointer-doubling side, so the
join-strategy claim is checkable against committed output.

Usage:
    python tools/cc_round_plan.py hint    > plans/r17/cc_round_after_executed.txt
    python tools/cc_round_plan.py nohint  > plans/r17/cc_round_before_executed.txt
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "hint"
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench
    from pyspark.sql import functions as F

    from etl_generator_demo_spark.operators.dedup import corpus_candidate_pairs
    from etl_generator_demo_spark.operators.relational import t
    from etl_generator_demo_spark.session import get_spark

    spark = get_spark("cc-round-plan")
    spark.sparkContext.setLogLevel("ERROR")
    bench._warm_indexes(spark, sf)

    docs = t(spark, sf, "documents")
    pairs = corpus_candidate_pairs(spark, sf)
    half = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    edges = half.union(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    labels = docs.select(F.col("doc_id").alias("id"), F.col("doc_id").alias("label"))

    # one round, mirroring connected_components' loop body
    nbr_min = (
        edges.join(labels, edges["dst"] == labels["id"])
        .groupBy("src")
        .agg(F.min("label").alias("nbr_min"))
    )
    l1 = labels.join(nbr_min, labels["id"] == nbr_min["src"], "left").select(
        "id", F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias("label")
    )
    lbl2 = l1.select(F.col("id").alias("l_id"), F.col("label").alias("l_label"))
    rhs = lbl2.hint("shuffle_hash") if mode == "hint" else lbl2
    l2 = l1.join(rhs, l1["label"] == lbl2["l_id"], "left").select(
        "id", F.least(F.col("label"), F.coalesce("l_label", "label")).alias("label")
    )
    l2.collect()
    plan = l2._jdf.queryExecution().executedPlan().toString()
    joins = re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", plan)
    print(f"mode={mode}  joins={joins}")
    print(plan)


if __name__ == "__main__":
    main()
