"""Connected-components stress: non-trivial topologies vs a union-find
oracle (chains stress iteration depth: large-star/small-star must
converge in O(log n), not O(n))."""

from __future__ import annotations

import random

from ditto_spark.operators.clustering import connected_components


def _union_find(edges):
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress to the component min
    comp = {}
    for n in list(parent):
        r = find(n)
        comp[n] = min(comp.get(r, r), r)
    return {n: find(n) for n in parent}


def test_cc_long_chain_and_random_graph(spark):
    rng = random.Random(7)
    edges = []
    # 1500-node chain (worst case for naive propagation)
    edges += [(f"n{i:05d}", f"n{i+1:05d}") for i in range(1500)]
    # random sparse graph on a disjoint id space
    nodes = [f"r{i:05d}" for i in range(800)]
    edges += [tuple(sorted(rng.sample(nodes, 2))) for _ in range(600)]
    oracle = _union_find(edges)

    df = spark.createDataFrame(edges, "src string, dst string")
    # small-graph route (driver union-find)
    got = {r.doc_id: r.entity_id
           for r in connected_components(df, max_iter=30).collect()}
    assert got == oracle
    # distributed alternating-star route must agree exactly
    dist = {r.doc_id: r.entity_id
            for r in connected_components(
                df, max_iter=30, small_graph_threshold=None).collect()}
    assert dist == oracle

def test_cc_small_graph_routing_boundary(spark):
    """threshold below the edge count forces the distributed path;
    both routes produce identical labels, and types are preserved."""
    edges = [("b", "a"), ("d", "c"), ("c", "b"), ("f", "e")]
    df = spark.createDataFrame(edges, "src string, dst string")
    want = {"a": "a", "b": "a", "c": "a", "d": "a", "e": "e", "f": "e"}
    small = {r.doc_id: r.entity_id for r in connected_components(
        df, small_graph_threshold=100).collect()}
    dist = {r.doc_id: r.entity_id for r in connected_components(
        df, small_graph_threshold=2).collect()}  # 4 canon edges > 2
    assert small == want and dist == want
    # long-typed ids survive the driver route with their type
    ldf = spark.createDataFrame([(2, 1), (3, 2)], "src long, dst long")
    out = connected_components(ldf)
    assert dict(out.collect()) == {1: 1, 2: 1, 3: 1}
    assert dict(out.dtypes)["doc_id"] == "bigint"
