"""cnr-2000 — the reference's own golden web graph, end to end.

The reference's slow tests validate on this exact fixture
(``slow/it/unimi/dsi/big/webgraph/cnr-2000.graph-txt.gz``; node/arc
ground truth in ``cnr-2000.properties:4-5``; component runs in
``slow/.../algo/ConnectedComponentsSlowTest.java:31-36``).  This module
keeps the per-test work bounded (the full convergence pipeline — WCC
both ways, SCC, HyperBall to fixpoint — is ``tools/cnr2000.py``, with
wall-times recorded in BENCH.md)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from webgraph_big_spark.graph import Graph

CNR_TXT = "/root/reference/slow/it/unimi/dsi/big/webgraph/cnr-2000.graph-txt.gz"
CNR_NODES = 325_557
CNR_ARCS = 3_216_152

pytestmark = pytest.mark.skipif(
    not os.path.exists(CNR_TXT), reason="cnr-2000 reference fixture not present"
)


@pytest.fixture(scope="module")
def cnr(spark):
    g0 = Graph.from_adjacency_text(spark, CNR_TXT)
    edges = g0.edges.repartition(16, "src").localCheckpoint(eager=True)
    return Graph(edges, dense=True)


def test_counts_match_properties(cnr):
    """n and m exactly equal the reference's .properties ground truth."""
    assert cnr.num_nodes() == CNR_NODES
    assert cnr.num_arcs() == CNR_ARCS


def test_successor_lists_shape(cnr):
    """Adjacency invariants on a real web graph: successor lists sorted,
    no duplicate arcs (the text fixture encodes a deduplicated BVGraph)."""
    dup = cnr.edges.groupBy("src", "dst").count().filter(F.col("count") > 1)
    assert dup.isEmpty()


def test_wcc_star_is_single_component(cnr):
    """cnr-2000 is weakly connected (one crawl from seeds): the
    large/small-star CC must find exactly one component covering all n."""
    from webgraph_big_spark.algorithms.components import (
        component_sizes,
        connected_components_star,
    )

    cc = connected_components_star(cnr).localCheckpoint(eager=True)
    sizes = component_sizes(cc).collect()
    assert len(sizes) == 1
    assert sizes[0]["size"] == CNR_NODES


def test_hyperball_prefix_on_real_graph(cnr):
    """Three HyperBall rounds (m=64): NF is monotone and NF(0) estimates
    n within HLL error (each singleton counter small-range corrects to
    ≈ 1.008, so the sum tracks n closely)."""
    from webgraph_big_spark.algorithms.hyperball import hyperball

    nf = {r["t"]: r["nf"] for r in hyperball(cnr, t_max=3, log2m=6).collect()}
    assert nf[0] == pytest.approx(CNR_NODES, rel=0.05)
    assert nf[0] <= nf[1] <= nf[2] <= nf[3]
    # round 1 ≈ n + m reachable pairs (dedup'd arcs): sanity band only,
    # HLL at m=64 carries ~13% rel std
    assert nf[1] == pytest.approx(CNR_NODES + CNR_ARCS, rel=0.25)


def test_true_nf_fixture_and_effective_diameter():
    """The parsed ground-truth NF (HyperBallSlowTest.java:35-44) has the
    documented shape, and the interpolated effective diameter matches
    the reference's NeighbourhoodFunction.effectiveDiameter definition
    on both the real curve and hand-checkable synthetics."""
    from tools.cnr2000 import effective_diameter, load_true_nf

    nf = load_true_nf()
    assert len(nf) == 85
    assert nf[0] == CNR_NODES
    assert nf[-1] == 37455851843.0
    assert all(b >= a for a, b in zip(nf, nf[1:]))  # exact NF is monotone
    d = effective_diameter(nf)
    assert 25.0 < d < 26.0  # 0.9·NF(∞) falls between t=25 and t=26

    # synthetic: NF = [1, 2, ..., 10]; target 0.9*10 = 9 → exactly t=8
    assert effective_diameter([float(i) for i in range(1, 11)]) == 8.0
    # alpha hit at t=0: diameter 0 by definition
    assert effective_diameter([10.0, 10.0]) == 0.0
    # midpoint interpolation: target 9.5 halfway between nf[1]=9, nf[2]=10
    assert effective_diameter([1.0, 9.0, 10.0], alpha=0.95) == pytest.approx(1.5)
