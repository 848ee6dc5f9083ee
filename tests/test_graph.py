"""Distributed PageRank (operators/graph) vs a numpy power-iteration
reference on the same formulation (uniform dangling redistribution)."""

import numpy as np
import pytest

from tradingview_data_pipeline_spark.operators.graph import pagerank


def _reference(n, edge_list, damping=0.85, iters=200):
    out_deg = np.zeros(n)
    for s, _ in edge_list:
        out_deg[s] += 1
    pr = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - damping) / n)
        dangling = pr[out_deg == 0].sum()
        nxt += damping * dangling / n
        for s, d in edge_list:
            nxt[d] += damping * pr[s] / out_deg[s]
        pr = nxt
    return pr


def _run(spark, edge_list):
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    return {r["node"]: r["rank"]
            for r in pagerank(edges, tol=1e-7, max_iter=120).collect()}


def test_matches_numpy_reference_with_dangling(spark):
    # 0->1->2, 2 dangles; 3<->1 cycle edge
    edge_list = [(0, 1), (1, 2), (3, 1), (1, 3)]
    got = _run(spark, edge_list)
    ref = _reference(4, edge_list)
    assert set(got) == {0, 1, 2, 3}
    for node, r in got.items():
        assert abs(r - ref[node]) < 1e-5, (node, r, ref[node])
    assert abs(sum(got.values()) - 1.0) < 1e-8


def test_star_graph_center_dominates(spark):
    edge_list = [(i, 0) for i in range(1, 8)]
    got = _run(spark, edge_list)
    assert got[0] == max(got.values())
    leaves = [got[i] for i in range(1, 8)]
    assert max(leaves) - min(leaves) < 1e-10     # symmetric leaves equal


def test_nonconvergence_raises(spark):
    edges = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        pagerank(edges, tol=0.0, max_iter=2)


def test_null_endpoints_dropped_and_mass_conserved(spark):
    edges = spark.createDataFrame(
        [(0, 1), (1, None), (None, 0)],
        "src long, dst long")
    got = {r["node"]: r["rank"]
           for r in pagerank(edges, tol=1e-7, max_iter=120).collect()}
    assert set(got) == {0, 1}                  # NULL never becomes a node
    assert abs(sum(got.values()) - 1.0) < 1e-8  # no mass leaks


def test_invalid_max_iter_rejected(spark):
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="max_iter"):
        pagerank(edges, max_iter=0)
