"""Text graph sources — ArcListASCIIGraph / ASCIIGraph /
ShiftedByOneArcListASCIIGraph analogues (SURVEY.md §2.1)."""

import numpy as np

from tests.oracle import pagerank_oracle
from webgraph_big_spark.graph import Graph


def _arcs(g):
    return {(r["src"], r["dst"]) for r in g.edges.collect()}


def test_arc_list_text(spark, tmp_path):
    p = tmp_path / "arcs.tsv"
    p.write_text("# comment line\n0\t1\n0\t2\n2\t1\n3\t0\n")
    g = Graph.from_arc_list_text(spark, str(p))
    assert _arcs(g) == {(0, 1), (0, 2), (2, 1), (3, 0)}
    assert g.num_nodes() == 4  # dense: max id + 1


def test_arc_list_shifted_by_one(spark, tmp_path):
    p = tmp_path / "arcs1.tsv"
    p.write_text("1\t2\n2\t3\n3\t1\n")
    g = Graph.from_arc_list_text(spark, str(p), shift=-1)
    assert _arcs(g) == {(0, 1), (1, 2), (2, 0)}


def test_adjacency_text(spark, tmp_path):
    # reference ASCIIGraph format: first line = node count, then one
    # successor line per node
    p = tmp_path / "adj.txt"
    p.write_text("4\n1 2\n\n3\n0\n")
    g = Graph.from_adjacency_text(spark, str(p))
    assert _arcs(g) == {(0, 1), (0, 2), (2, 3), (3, 0)}


def test_text_roundtrip_through_algorithms(spark, tmp_path):
    # a text-loaded graph behaves identically to from_pairs
    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]
    p = tmp_path / "g.tsv"
    p.write_text("".join(f"{a}\t{b}\n" for a, b in edges))
    g = Graph.from_arc_list_text(spark, str(p))
    from webgraph_big_spark.algorithms.pagerank import pagerank

    got = {r["id"]: r["rank"] for r in pagerank(g, fixed_iterations=10).collect()}
    want = pagerank_oracle(np.array(edges), 4, fixed_iterations=10)
    assert all(abs(got[i] - want[i]) < 1e-12 for i in range(4))
