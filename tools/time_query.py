"""Time individual registered queries exactly the way bench.py does
(same session config, same warm indexes, min-of-N collect()) — for
optimization-round before/after iteration without a full bench pass.

Usage:
    python tools/time_query.py q1_pricing_summary x4_decontam_funnel
    SPARK_GRAFT_TQ_RUNS=5 python tools/time_query.py x2_dedup_clusters
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: time_query.py <query> [...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_TQ_RUNS", "3"))

    import bench
    from etl_generator_demo_spark.registry import load_all
    from etl_generator_demo_spark.session import get_spark

    spark = get_spark("time-query")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    # JVM warm-up on the smallest available fixture (r16 ADVICE: the
    # hard-coded sf0.001 path crashed on layouts without it); fall back
    # to sf_dir itself, and skip warm-up when nothing is readable.
    warm_dir = os.environ.get("SPARK_GRAFT_TQ_WARM_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    if os.path.isdir(warm_dir):
        registry["q1_pricing_summary"].fn(spark, warm_dir).collect()
    bench._warm_indexes(spark, sf_dir)

    for name in names:
        fn = registry[name].fn
        spark.sparkContext.setJobDescription(f"time_query: {name}")
        times = []
        rows = []
        for _ in range(runs):
            t0 = time.time()
            rows = fn(spark, sf_dir).collect()
            times.append(round(time.time() - t0, 3))
        print(
            f"{name}: min {min(times):.3f}s  runs {times}  ({len(rows)} rows)"
        )
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
