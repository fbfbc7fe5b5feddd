"""Dump `explain("formatted")` for headline queries to plans/<tag>/.

Usage:
    python tools/plan_dump.py before [query ...]   # -> plans/$ROUND/<q>_before.txt
    python tools/plan_dump.py after  [query ...]   # -> plans/$ROUND/<q>_after.txt

The round directory defaults to r17; override with SPARK_GRAFT_PLAN_ROUND.

With no query names, dumps every bench.py HEADLINE entry. The judge
reads these files to check plan claims (Exchange counts, join
strategies, PushedFilters) against the code, so the capture is the
plain `df.explain("formatted")` text, unedited. Queries that run
eager side work (txlog commits, localCheckpoint rounds) execute it
here exactly as the bench does; the captured plan is the final
DataFrame's."""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROUND = os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r17")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench
    from etl_generator_demo_spark.registry import load_all
    from etl_generator_demo_spark.session import get_spark

    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    if not names:
        names = [n for n in bench.HEADLINE if n in registry]

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        ROUND,
    )
    os.makedirs(out_dir, exist_ok=True)

    for name in names:
        spark.sparkContext.setJobDescription(f"plan_dump: {name}")
        try:
            df = registry[name].fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # capture the failure, don't abort the sweep
            text = f"ERROR building {name}: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        n_ex = text.count("Exchange")
        print(f"{name}: {len(text)} chars, ~{n_ex} Exchange mentions -> {path}",
              file=sys.stderr)
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
