"""Exact WCC over the high-quantity co-purchase graph (round 9).

Independent verification: a driver-side union-find over the same edge
list must produce the identical partition — proving the distributed
min-label + pointer-doubling fixpoint converged to the true WCC, not
merely to something the unrolled SQL oracle also computes.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from etl_generator_demo_spark.operators.graph_ext import (
    WCC_HIGH_QTY,
    g_wcc_size_histogram,
    wcc_components,
)
from etl_generator_demo_spark.operators.hierarchy import copurchase_edges
from etl_generator_demo_spark.operators.relational import t


def _union_find(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_wcc_matches_union_find(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= WCC_HIGH_QTY)
    edges = [(r.pa, r.pb) for r in copurchase_edges(li).collect()]
    expect = _union_find(edges)
    got = {
        r.part_id: r.component_id for r in wcc_components(spark, sf_dir).collect()
    }
    assert got == expect


def test_wcc_histogram_consistent_with_assignment(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= WCC_HIGH_QTY)
    edges = [(r.pa, r.pb) for r in copurchase_edges(li).collect()]
    comp = _union_find(edges)
    sizes = Counter(Counter(comp.values()).values())
    got = {
        r.component_size: r.n_components
        for r in g_wcc_size_histogram(spark, sf_dir).collect()
    }
    assert got == {int(k): int(v) for k, v in sizes.items()}
    # fixture sanity: the thresholded graph has real structure (a
    # giant component AND small ones), not one hairball
    assert len(got) >= 3 and max(got) > 10


def test_bfs_histogram_matches_python_bfs(spark, sf_dir):
    """Independent verification for g_bfs_hop_histogram: a driver-side
    deque BFS over the same edge list must produce the identical hop
    histogram, including the NULL (unreachable) bucket."""
    from collections import Counter, deque

    from etl_generator_demo_spark.operators.graph_ext import g_bfs_hop_histogram

    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= WCC_HIGH_QTY)
    edges = [(r.pa, r.pb) for r in copurchase_edges(li).collect()]
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    src = sorted(adj, key=lambda x: (-len(adj[x]), x))[0]
    dist = {src: 0}
    q = deque([src])
    while q:
        u = q.popleft()
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    hist = Counter(dist.values())
    unreachable = len(adj) - len(dist)
    got = {
        r.hops: r.n_parts for r in g_bfs_hop_histogram(spark, sf_dir).collect()
    }
    expect = {int(k): int(v) for k, v in hist.items()}
    if unreachable:
        expect[None] = unreachable
    assert got == expect
