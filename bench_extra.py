"""Round-6 profiling harness (separate from the frozen bench.py).

Times individual bench queries in isolation with noop sinks where
appropriate, prints per-phase timings.  Usage:
    python bench_extra.py [query ...]
Queries: setup wcc_star lp4 bfs hb2 hbcent sccfwbw triangles storeload
"""
from __future__ import annotations

import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    only = set(sys.argv[1:])

    from pyspark.sql import functions as F
    import __spark_entry__ as entry
    from webgraph_big_spark.session import get_spark
    from webgraph_big_spark.algorithms.components import connected_components_star
    from webgraph_big_spark.algorithms.labelprop import label_propagation
    from webgraph_big_spark.algorithms.triangles import triangle_edges
    from webgraph_big_spark.algorithms.bfs import bfs_distances
    from webgraph_big_spark.algorithms.hyperball import hyperball, hyperball_centralities
    from webgraph_big_spark import transforms as tr

    spark = get_spark("wbs-bench-extra", cpus=cpus, shuffle_partitions=cpus)

    def timed(name, fn):
        if only and name not in only:
            return
        t0 = time.time()
        out = fn()
        print(f"{name}: {time.time()-t0:.2f}s", flush=True)
        return out

    t0 = time.time()
    g1 = entry.load_g1(spark, sf_dir)
    g1.edges = g1.edges.localCheckpoint(eager=True)
    m1 = g1.num_arcs()
    g2 = entry.load_g2(spark, sf_dir)
    g2.edges = g2.edges.localCheckpoint(eager=True)
    m2 = g2.num_arcs()
    print(f"setup(load+checkpoint+count): {time.time()-t0:.2f}s  m1={m1} m2={m2}", flush=True)

    timed("wcc_star_g2", lambda: connected_components_star(g2).count())
    timed("labelprop4_g2", lambda: label_propagation(g2, rounds=4).count())
    timed("triangles_g2", lambda: triangle_edges(g2).agg(F.sum("tri")).collect())
    timed("compose_g2_g2", lambda: tr.compose(g2, g2).edges.count())
    timed("simplify_g1", lambda: tr.simplify(g1).edges.count())

    if not only or "bfs" in only or "bfs_full_g1" in only:
        t0 = time.time()
        src = g1.touched_nodes().agg(F.min("id")).first()[0]
        t1 = time.time()
        bfs_distances(g1, [int(src)]).count()
        print(f"bfs_full_g1: src-probe {t1-t0:.2f}s bfs {time.time()-t1:.2f}s", flush=True)

    timed("hyperball_t2_g1", lambda: hyperball(g1, 2).count())
    timed("hyperball_cent_g1", lambda: hyperball_centralities(g1, t_max=3).count())

    if not only or "storeload" in only or "store_load_g1" in only:
        import tempfile
        from webgraph_big_spark.graph import Graph
        def _roundtrip():
            base = tempfile.mkdtemp(prefix="wbs_bench_store_")
            g1.store(base)
            return Graph.load(spark, base).edges.count()
        timed("store_load_g1", _roundtrip)

    if not only or "sccfwbw" in only or "scc_fwbw_g6" in only:
        from webgraph_big_spark.algorithms.scc import strongly_connected_components_fwbw
        from webgraph_big_spark.graph import Graph as _G
        rev = g1.edges.filter((F.col("src") + F.col("dst")) % 3 == 0).select(
            F.col("dst").alias("src"), F.col("src").alias("dst"))
        g6 = _G(g1.edges.union(rev).distinct().localCheckpoint(eager=True), dense=False)
        timed("scc_fwbw_g6", lambda: strongly_connected_components_fwbw(g6).count())


if __name__ == "__main__":
    main()
