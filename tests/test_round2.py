"""Round-2 features: HyperBall production path (registers / systolic /
centralities), FW-BW SCC, labelled storage, layout keys, global_rank,
BFS parents, k-means IVF recall, PageRank co-partition parity."""

from __future__ import annotations

import hashlib
import json
import os
from functools import cmp_to_key

import numpy as np
import pytest
from pyspark.sql import functions as F

from webgraph_big_spark import synth
from webgraph_big_spark import transforms as tr
from webgraph_big_spark.functions import global_rank
from webgraph_big_spark.graph import Graph
from webgraph_big_spark.algorithms.bfs import bfs_distances
from webgraph_big_spark.algorithms.components import connected_components
from webgraph_big_spark.algorithms.hyperball import (
    P,
    W_BITS,
    hyperball,
    hyperball_centralities,
    hyperball_registers,
    neighbourhood_function_exact,
)
from webgraph_big_spark.algorithms.pagerank import pagerank
from webgraph_big_spark.algorithms.scc import (
    scc_buckets,
    strongly_connected_components_fwbw,
)
from webgraph_big_spark.datapipe import similarity as ds
from tests.oracle import harmonic_oracle, scc_oracle

from webgraph_big_spark.algorithms.centrality import reachable_counts


def _g(spark, edges, n=None, dense=True):
    return Graph.from_pairs(spark, [(int(s), int(d)) for s, d in edges], num_nodes=n)


# ---------------------------------------------------------------------------
# HyperBall
# ---------------------------------------------------------------------------


def _h48(s) -> int:
    return int(hashlib.md5(str(s).encode()).hexdigest()[:12], 16)


def _hll_regs_oracle(edges, nodes, t):
    regs = {}
    for x in nodes:
        r = [0] * P
        h = _h48(x)
        j = h & (P - 1)
        w = h >> 6
        r[j] = (W_BITS + 1) if w == 0 else (W_BITS - w.bit_length() + 1)
        regs[x] = r
    dedup = sorted(set(map(tuple, edges)))
    for _ in range(t):
        new = {x: list(r) for x, r in regs.items()}
        for s, d in dedup:
            for k in range(P):
                if regs[d][k] > new[s][k]:
                    new[s][k] = regs[d][k]
        regs = new
    return regs


def test_hyperball_registers_match_oracle(spark):
    edges = synth.erdos_renyi(30, 0.1, seed=7)
    g = _g(spark, edges, 30)
    got = {
        r["id"]: [int(v) for v in r["regs_csv"].split(",")]
        for r in hyperball_registers(g, 3).collect()
    }
    want = _hll_regs_oracle(edges, range(30), 3)
    assert got == want


def test_hyperball_hub_merge(spark):
    # a 2000-in-degree hub: the max-merge must match the oracle (the
    # map-side-combining aggregate shape means no group ever gathers
    # the full fan-in on one reducer)
    edges = [(0, i) for i in range(1, 2001)]  # counters flow dst→src
    g = _g(spark, edges, 2001)
    got = {
        r["id"]: [int(v) for v in r["regs_csv"].split(",")]
        for r in hyperball_registers(g, 1).collect()
    }
    want = _hll_regs_oracle(edges, range(2001), 1)
    assert got == want


def test_hyperball_systolic_converges_to_fixpoint(spark):
    # t_max far beyond the diameter: the systolic loop must stop early
    # and the registers must equal the true fixpoint (t = n oracle)
    edges = [(i, i + 1) for i in range(12)]
    g = _g(spark, edges, 13)
    got = {
        r["id"]: [int(v) for v in r["regs_csv"].split(",")]
        for r in hyperball_registers(g, 50).collect()
    }
    want = _hll_regs_oracle(edges, range(13), 13)
    assert got == want


def test_hyperball_nf_accuracy(spark):
    edges = synth.erdos_renyi(60, 0.06, seed=3)
    g = _g(spark, edges, 60)
    exact = {r["t"]: r["nf"] for r in neighbourhood_function_exact(g, 3).collect()}
    est = {r["t"]: r["nf"] for r in hyperball(g, 3).collect()}
    for t in range(4):
        assert abs(est[t] - exact[t]) / exact[t] < 0.4, (t, est[t], exact[t])


def test_hyperball_centralities_accuracy(spark):
    edges = synth.erdos_renyi(50, 0.08, seed=11)
    g = _g(spark, edges, 50)
    cents = {r["id"]: r for r in hyperball_centralities(g, t_max=None).collect()}
    # exact counterparts (bounded by a generous t)
    harm = harmonic_oracle(np.array(edges), 50, 16)
    # 'reachable' estimates the IN-ball (nodes reaching x) — the
    # centrality convention; exact counterpart = out-balls of gᵀ
    reach = {
        r["id"]: r["reachable"] for r in reachable_counts(tr.transpose(g), 16).collect()
    }
    assert set(cents) == set(range(50))
    h_err, r_err, n_h = 0.0, 0.0, 0
    for x in range(50):
        hx = harm.get(x, 0.0)
        if hx > 0:
            h_err += abs(cents[x]["harmonic"] - hx) / hx
            n_h += 1
        r_err += abs(cents[x]["reachable"] - reach[x]) / reach[x]
    # HLL with 64 registers: ~13% per-counter rel std; mean abs rel err
    # across nodes must stay within a few sigma
    assert h_err / max(n_h, 1) < 0.30
    assert r_err / 50 < 0.30
    # closeness/lin sanity: positive where the in-ball is nontrivial
    assert all(cents[x]["lin"] >= 1.0 - 1e-9 or cents[x]["reachable"] >= 1 for x in range(50))


def test_hyperball_discount_function(spark):
    # discount(t) = 1/t must reproduce the harmonic accumulator exactly
    edges = synth.erdos_renyi(30, 0.1, seed=13)
    g = _g(spark, edges, 30)
    rows = hyperball_centralities(g, t_max=4, discount=lambda t: 1.0 / t).collect()
    for r in rows:
        assert abs(r["discounted"] - r["harmonic"]) < 1e-9


# ---------------------------------------------------------------------------
# FW-BW SCC
# ---------------------------------------------------------------------------


def test_fwbw_matches_tarjan_random(spark):
    for seed in (1, 5):
        edges = synth.erdos_renyi(60, 0.05, seed=seed)
        g = _g(spark, edges, 60)
        got = {r["id"]: r["comp"] for r in strongly_connected_components_fwbw(g).collect()}
        want = scc_oracle(np.array(edges), 60)
        # compare partitions via min-id canonical labels
        assert set(got) == set(range(60))
        canon = {}
        for x in range(60):
            canon.setdefault(want[x], []).append(x)
        for comp_nodes in canon.values():
            m = min(comp_nodes)
            for x in comp_nodes:
                assert got[x] == m, (x, got[x], m)


def test_fwbw_giant_scc_star(spark):
    """The linear-state property: a 20k-node star-cycle (0→i, i→0) is ONE
    giant SCC with diameter 2 — FW-BW resolves it in two frontier rounds
    with O(n) state, where the closure variant would materialize O(n²) ≈
    4·10⁸ reachability pairs and cannot finish."""
    n = 20_000
    hub_out = [(0, i) for i in range(1, n)]
    hub_in = [(i, 0) for i in range(1, n)]
    # tendrils: short chains hanging off (peeled by trim, singleton SCCs)
    tendrils = [(n + i, n + i + 1) for i in range(5)] + [(5, n)]
    edges = hub_out + hub_in + tendrils
    g = _g(spark, edges, n + 6)
    got = {r["id"]: r["comp"] for r in strongly_connected_components_fwbw(g).collect()}
    assert all(got[x] == 0 for x in range(n))
    assert all(got[n + i] == n + i for i in range(6))


def test_scc_buckets(spark):
    # two 2-cycles A={0,1}, B={2,3}; A → B; 4 is dangling; B → nothing else
    edges = [(0, 1), (1, 0), (2, 3), (3, 2), (1, 2)]
    g = _g(spark, edges, 5)
    comps = strongly_connected_components_fwbw(g)
    buckets = sorted(r["comp"] for r in scc_buckets(g, comps).collect())
    # B (comp 2) is terminal non-dangling; A leaks into B; 4 is dangling
    assert buckets == [2]


# ---------------------------------------------------------------------------
# global_rank / renumbering
# ---------------------------------------------------------------------------


def test_global_rank_matches_window(spark):
    vals = [(int(x),) for x in np.random.default_rng(5).permutation(5000)]
    df = spark.createDataFrame(vals, "id long").repartition(7)
    got = {r["id"]: r["rank"] for r in global_rank(df, ["id"], out="rank").collect()}
    assert got == {x: x for x in range(5000)}


def test_global_rank_on_strings(spark):
    words = [("w%04d" % x,) for x in np.random.default_rng(6).permutation(500)]
    df = spark.createDataFrame(words, "symbol string").repartition(5)
    got = {r["symbol"]: r["rank"] for r in global_rank(df, ["symbol"], out="rank").collect()}
    for i in range(500):
        assert got["w%04d" % i] == i


# ---------------------------------------------------------------------------
# layout keys (gray / lex)
# ---------------------------------------------------------------------------


def _gray_cmp(a: list[int], b: list[int]) -> int:
    """Direct transcription of the reference comparator
    (Transform.java:1946-1975) as the test oracle."""
    parity = False
    ia, ib = iter(a), iter(b)
    while True:
        x = next(ia, -1)
        y = next(ib, -1)
        if x == -1 and y == -1:
            return 0
        if x == -1:
            return 1 if parity else -1
        if y == -1:
            return -1 if parity else 1
        if x != y:
            return 1 if (parity ^ (x < y)) else -1
        parity = not parity


def _lex_cmp(a: list[int], b: list[int]) -> int:
    """Direct transcription of the reference comparator
    (Transform.java:2017-2032): first difference descending
    (t = b - a; t < 0 ? -1 : 1), exhausted list first."""
    for x, y in zip(a, b):
        if x != y:
            return -1 if (y - x) < 0 else 1
    if len(a) == len(b):
        return 0
    return -1 if len(a) < len(b) else 1


def test_gray_and_lex_orderings(spark):
    edges = synth.erdos_renyi(40, 0.12, seed=17)
    g = _g(spark, edges, 40)
    adj = {x: [] for x in range(40)}
    for s, d in sorted(set(map(tuple, edges))):
        adj[int(s)].append(int(d))

    # lex: reference comparator order (first difference descending), ties by id
    lex_want = sorted(range(40), key=lambda x: (cmp_to_key(_lex_cmp)(adj[x]), x))
    lex_rows = tr.lex_key(g).collect()
    lex_got = [r["id"] for r in sorted(lex_rows, key=lambda r: (list(r["key"]), r["id"]))]
    assert lex_got == lex_want

    # gray: the spark KEY ordering must reproduce the reference comparator
    gray_want = sorted(
        range(40), key=lambda x: (cmp_to_key(_gray_cmp)(adj[x]), x)
    )
    gray_rows = {r["id"]: list(r["key"]) for r in tr.gray_key(g).collect()}
    gray_got = sorted(range(40), key=lambda x: (gray_rows[x], x))
    assert gray_got == gray_want

    # and the relabeled graph is the consistent permutation of the input
    relabeled, perm = tr.relabel_by_order(g, tr.gray_key(g))
    p = {r["id"]: r["to"] for r in perm.collect()}
    assert sorted(p.values()) == list(range(40))
    want_edges = {(p[s], p[d]) for s, d in set(map(tuple, edges))}
    got_edges = {(r["src"], r["dst"]) for r in relabeled.edges.collect()}
    assert got_edges == want_edges
    assert p == {x: i for i, x in enumerate(gray_want)}


# ---------------------------------------------------------------------------
# labelled storage + bit accounting
# ---------------------------------------------------------------------------


def test_store_load_labelled_roundtrip(spark, tmp_path):
    rng = np.random.default_rng(23)
    arcs = sorted({(int(a), int(b)) for a, b in synth.erdos_renyi(30, 0.15, seed=8)})
    rows = [(s, d, float(rng.integers(1, 9)), f"t{(s + d) % 3}") for s, d in arcs]
    edges = spark.createDataFrame(rows, "src long, dst long, w double, tag string")
    g = Graph(edges, num_nodes=30)
    base = str(tmp_path / "wg")
    meta = g.store(base, buckets=4)
    assert meta["label_cols"] == ["w", "tag"]
    # bit accounting: the BVGraph .properties stats analogue
    assert meta["bytes"] > 0 and meta["bits_per_link"] > 0 and meta["bits_per_node"] > 0
    assert meta["files"] and sum(meta["files"].values()) == meta["bytes"]
    disk = json.load(open(os.path.join(base, "meta.json")))
    assert disk["bits_per_link"] == meta["bits_per_link"]

    g2 = Graph.load(spark, base)
    got = sorted(map(tuple, g2.edges.select("src", "dst", "w", "tag").collect()))
    assert got == sorted(rows)
    assert g2.num_nodes() == 30


def test_store_load_hub_linear_decode(spark, tmp_path):
    # one hub with 3000 successors: the positional decode must stay linear
    edges = [(0, i) for i in range(1, 3001)] + [(5, 2), (7, 3)]
    g = _g(spark, edges, 3001)
    base = str(tmp_path / "hub")
    g.store(base, buckets=2)
    g2 = Graph.load(spark, base)
    assert g2.same_graph(g)
    assert g2.out_degree(0) == 3000


# ---------------------------------------------------------------------------
# BFS parents
# ---------------------------------------------------------------------------


def test_bfs_parents(spark):
    edges = synth.erdos_renyi(40, 0.08, seed=29)
    g = _g(spark, edges, 40)
    res = {r["id"]: r for r in bfs_distances(g, [0], parents=True).collect()}
    # undirected expansion (bfs symmetrizes by default)
    und = set()
    for s, d in set(map(tuple, edges)):
        und.add((int(s), int(d)))
        und.add((int(d), int(s)))
    # oracle: level-synchronous BFS with min-parent rule
    dist, parent = {0: 0}, {0: 0}
    frontier = [0]
    lvl = 0
    while frontier:
        lvl += 1
        nxt = {}
        for s, d in und:
            if s in set(frontier) and d not in dist:
                nxt[d] = min(nxt.get(d, s), s)
        for d, par in nxt.items():
            dist[d], parent[d] = lvl, par
        frontier = list(nxt)
    assert {x: r["dist"] for x, r in res.items()} == dist
    assert {x: r["parent"] for x, r in res.items()} == parent


# ---------------------------------------------------------------------------
# k-means IVF
# ---------------------------------------------------------------------------


def _blob_corpus(spark, n, dim, k, seed):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 5.0, size=(k, dim))
    vecs = centers[rng.integers(0, k, size=n)] + rng.normal(0, 0.4, size=(n, dim))
    rows = [(i, [float(v) for v in vecs[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), vecs


def test_ivf_recall_64d(spark):
    df, vecs = _blob_corpus(spark, 200, 64, 8, seed=31)
    queries = df.filter(F.col("vec_id") < 10)
    brute = ds.brute_force_topk(queries, df, k=5)
    ivf = ds.ivf_topk(queries, df, k=5, nprobe=2, k_cells=8, km_iters=3)
    b = {}
    for r in brute.collect():
        b.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    i = {}
    for r in ivf.collect():
        i.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(b[q] & i.get(q, set())) for q in b)
    recall = hits / sum(len(v) for v in b.values())
    assert recall >= 0.9, recall


def test_ivf_recall_512d_smoke(spark):
    df, _ = _blob_corpus(spark, 60, 512, 4, seed=37)
    queries = df.filter(F.col("vec_id") < 3)
    ivf = ds.ivf_topk(queries, df, k=3, nprobe=4, k_cells=4, km_iters=2)
    brute = ds.brute_force_topk(queries, df, k=3)
    assert sorted(map(tuple, ivf.collect())) == sorted(map(tuple, brute.collect()))


# ---------------------------------------------------------------------------
# PageRank co-partition parity + misc fixes
# ---------------------------------------------------------------------------


def test_pagerank_bucketed_equals_broadcast(spark):
    edges = synth.erdos_renyi(80, 0.06, seed=41)
    g = _g(spark, edges, 80)
    a = {r["id"]: r["rank"] for r in pagerank(g, fixed_iterations=8).collect()}
    b = {
        r["id"]: r["rank"]
        for r in pagerank(
            g, fixed_iterations=8, broadcast_threshold_bytes=1
        ).collect()
    }
    assert set(a) == set(b)
    for x in a:
        assert abs(a[x] - b[x]) < 1e-12


def test_wcc_dense_includes_gap_ids_without_declared_n(spark):
    # dense graph, num_nodes NOT declared: isolated id range still counted
    edges = spark.createDataFrame([(0, 1), (5, 6)], "src long, dst long")
    g = Graph(edges, dense=True)  # n derives to 7; ids 2,3,4 are isolated
    comps = {r["id"]: r["comp"] for r in connected_components(g).collect()}
    assert set(comps) == set(range(7))
    assert comps[2] == 2 and comps[3] == 3 and comps[4] == 4


def test_from_url_arcs_converter_analogue(spark):
    from webgraph_big_spark.extract import from_url_arcs

    urls = spark.createDataFrame(
        [("http://b.com/",), ("http://a.com/",), ("http://c.com/",)], "url string"
    )
    arcs = spark.createDataFrame(
        [
            ("http://a.com/", "http://b.com/"),
            ("http://b.com/", "http://c.com/"),
            ("http://a.com/", "http://zz.com/"),  # unresolvable → dropped
        ],
        "src_url string, dst_url string",
    )
    g, id_map = from_url_arcs(urls, arcs)
    m = {r["symbol"]: r["id"] for r in id_map.collect()}
    assert m == {"http://a.com/": 0, "http://b.com/": 1, "http://c.com/": 2}
    assert sorted(map(tuple, g.edges.collect())) == [(0, 1), (1, 2)]
    assert g.num_nodes() == 3


def test_top_private_domain(spark):
    from webgraph_big_spark.functions import top_private_domain

    hosts = spark.createDataFrame(
        [("news.bbc.co.uk",), ("www.example.com",), ("foo.github.io",),
         ("localhost",), ("co.uk",)],
        "host string",
    )
    got = {r["host"]: r["tpd"] for r in top_private_domain(hosts).collect()}
    assert got["news.bbc.co.uk"] == "bbc.co.uk"
    assert got["www.example.com"] == "example.com"
    assert got["foo.github.io"] == "foo.github.io"  # github.io is a suffix
    assert got["localhost"] == "localhost"  # no suffix → identity
    assert got["co.uk"] == "co.uk"  # bare suffix → identity


def test_gap_and_component_stats(spark):
    from webgraph_big_spark.algorithms.stats import component_size_stats, graph_stats

    # successor lists: 0→[1,5,6] gaps (4,1); 2→[3] no gap
    g = _g(spark, [(0, 1), (0, 5), (0, 6), (2, 3)], 7)
    s = graph_stats(g)
    assert s["successor_max_gap"] == 4
    assert abs(s["successor_avg_gap"] - 2.5) < 1e-12
    comps = connected_components(g)
    cs = component_size_stats(comps)
    assert cs["n_components"] == 3  # {0,1,5,6}, {2,3}, {4}
    assert cs["largest_component"] == 4


def test_union_labelled_default_is_deterministic_min(spark):
    e0 = spark.createDataFrame([(0, 1, 9.0)], "src long, dst long, w double")
    e1 = spark.createDataFrame([(0, 1, 3.0)], "src long, dst long, w double")
    u = tr.union_labelled(Graph(e0), Graph(e1))
    assert u.edges.collect()[0]["w"] == 3.0
