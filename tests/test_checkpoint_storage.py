"""Resumability (north rule) + graph storage roundtrip + skew utilities
+ HyperBall accuracy."""

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.oracle import neighbourhood_function_oracle, pagerank_oracle
from webgraph_big_spark import synth
from webgraph_big_spark.graph import Graph
from webgraph_big_spark.algorithms.pagerank import pagerank
from webgraph_big_spark.algorithms.hyperball import (
    hyperball,
    neighbourhood_function_exact,
)
from webgraph_big_spark.checkpoint import IterativeRunner
from webgraph_big_spark.skew import (
    hub_nodes,
    repartition_by_cumulative_degree,
    salted_sum,
    skew_metrics,
)


def _g(spark, edges, n):
    return Graph.from_pairs(spark, [(int(s), int(d)) for s, d in edges], num_nodes=n)


def test_store_load_roundtrip(spark, tmp_path):
    edges = synth.erdos_renyi(25, 0.2, seed=5)
    g = _g(spark, edges, 25)
    base = str(tmp_path / "graph")
    g.store(base, buckets=4)
    meta = json.load(open(os.path.join(base, "meta.json")))
    assert meta["nodes"] == 25 and meta["arcs"] == len({(int(a), int(b)) for a, b in edges})
    g2 = Graph.load(spark, base)
    assert g2.same_graph(g)
    assert g2.num_nodes() == 25


def test_successor_access_paths_agree(spark):
    """Cross-check random access vs CSR vs degree — the
    WebGraphTestCase.assertGraph consistency discipline."""
    edges = synth.erdos_renyi(20, 0.25, seed=9)
    g = _g(spark, edges, 20)
    adj = {r["src"]: list(r["dsts"]) for r in g.adjacency().collect()}
    for x in [0, 3, 7, 19]:
        succ = g.successors(x)
        assert succ == adj.get(x, [])
        assert g.out_degree(x) == len(succ)
        assert succ == sorted(set(succ))


def test_pagerank_resume_matches_uninterrupted(spark, tmp_path):
    edges = synth.erdos_renyi(30, 0.2, seed=13)
    g = _g(spark, edges, 30)
    # uninterrupted run: 12 fixed iterations
    full = {r["id"]: r["rank"] for r in pagerank(g, fixed_iterations=12).collect()}

    # interrupted run: 6 iterations checkpointed, then resume to 12.
    run_dir = str(tmp_path / "pr")
    pagerank(g, fixed_iterations=6, run_dir=run_dir, checkpoint_every=3)
    runner = IterativeRunner(spark, run_dir=run_dir)
    assert runner.latest_checkpoint() == 6
    resumed = {
        r["id"]: r["rank"]
        for r in pagerank(g, fixed_iterations=12, run_dir=run_dir, resume=True).collect()
    }
    assert all(abs(full[i] - resumed[i]) < 1e-12 for i in full)
    # runs.jsonl has the per-iteration lineage/metrics records
    lines = [json.loads(l) for l in open(os.path.join(run_dir, "runs.jsonl"))]
    assert {rec["iteration"] for rec in lines} >= set(range(1, 13)) - set(range(1, 7))


def test_checkpoint_manifest_partition_metrics(spark, tmp_path):
    run_dir = str(tmp_path / "cc")
    edges = synth.erdos_renyi(30, 0.2, seed=1)
    from webgraph_big_spark.algorithms.components import connected_components

    connected_components(_g(spark, edges, 30), run_dir=run_dir, checkpoint_every=2)
    manifests = []
    for d in sorted(os.listdir(run_dir)):
        p = os.path.join(run_dir, d, "manifest.json")
        if os.path.exists(p):
            manifests.append(json.load(open(p)))
    assert manifests, "no checkpoints written"
    for man in manifests:
        assert man["rows"] == 30
        assert sum(man["partition_sizes"]) == 30


def test_skew_hub_detection_and_salted_sum(spark):
    edges = synth.star(200, direction="in")  # every node → hub 0
    g = _g(spark, edges, 200)
    hubs = hub_nodes(g, direction="in")
    ids = [r["id"] for r in hubs.collect()]
    assert ids == [0]
    # salted two-phase sum == plain sum
    df = g.edges.select("dst", F.lit(1.0).alias("v"))
    got = {r["dst"]: r["v"] for r in salted_sum(df, "dst", "v", hubs.select("id")).collect()}
    assert got == {0: 199.0}


def test_cumulative_degree_repartition_balances_arcs(spark):
    # hub 0 has 500 out-arcs, 100 other nodes have ~5 each
    hub = synth.star(501, direction="out")
    rest = synth.erdos_renyi(100, 0.05, seed=2) + 1000
    import numpy as np2

    edges = np.concatenate([hub, rest])
    g = Graph.from_pairs(spark, [(int(a), int(b)) for a, b in edges])
    out = repartition_by_cumulative_degree(g, 8)
    sizes = [r["count"] for r in out.groupBy(F.spark_partition_id()).count().collect()]
    m = sum(sizes)
    assert m == len(edges)
    # no partition holds more than ~2x the fair share
    assert max(sizes) <= 2.2 * m / 8 + 64
    met = skew_metrics(g.edges, "src")
    assert met["max_cnt"] == 500 and met["skew_ratio"] > 10


def test_neighbourhood_function_exact_and_hll(spark):
    edges = synth.erdos_renyi(40, 0.08, seed=21)
    g = _g(spark, edges, 40)
    got = {r["t"]: r["nf"] for r in neighbourhood_function_exact(g, 3).collect()}
    want = neighbourhood_function_oracle(edges, 40, 3)
    assert [got[t] for t in range(4)] == want
    # HLL estimate within 3 sigma (rel std ~13% for 64 registers)
    est = {r["t"]: r["nf"] for r in hyperball(g, 3).collect()}
    for t in range(4):
        assert abs(est[t] - want[t]) / want[t] < 0.4, (t, est[t], want[t])
