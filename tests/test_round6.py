"""Round-6 optimization invariants: the packed-engine centralities are
BIT-identical to the column engine (whose float expressions the DuckDB
oracle mirrors), and the delegating public surface returns them."""

from __future__ import annotations

from webgraph_big_spark.graph import Graph
from webgraph_big_spark import synth
from webgraph_big_spark.algorithms.hyperball import (
    hyperball_centralities,
    _hyperball_centralities_column,
)


def _g(spark, edges, n):
    return Graph(
        spark.createDataFrame([(int(a), int(b)) for a, b in edges], "src long, dst long"),
        num_nodes=n,
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_packed_centralities_bit_identical(spark):
    edges = synth.erdos_renyi(60, 0.06, seed=3)
    g = _g(spark, edges, 60)
    col = _rows(_hyperball_centralities_column(g, t_max=4, discount=lambda t: 0.5**t))
    new = _rows(hyperball_centralities(g, t_max=4, discount=lambda t: 0.5**t))
    assert col == new  # exact float equality, no tolerance


def test_packed_centralities_bit_identical_fixpoint_m16(spark):
    edges = synth.erdos_renyi(40, 0.12, seed=9)
    g = _g(spark, edges, 40)
    assert _rows(_hyperball_centralities_column(g, t_max=None, log2m=4)) == _rows(
        hyperball_centralities(g, t_max=None, log2m=4)
    )


def test_packed_centralities_empty_graph(spark):
    g = _g(spark, [], 5)
    assert _rows(_hyperball_centralities_column(g, t_max=2)) == _rows(
        hyperball_centralities(g, t_max=2)
    )
