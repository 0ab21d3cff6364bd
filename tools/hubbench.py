"""Hub-skew benchmark: measures (a) whether map-side partial aggregation
collapses mega-hub fan-IN (the salted_sum question) and (b) the
straggler effect of a mega-OUT-hub on the co-partitioned PageRank join,
with and without pagerank(salt_buckets=...).

Graph: `n` uniform nodes in a ring plus one hub (id 0) with `hub_deg`
out-arcs (b) or in-arcs (a).  Reports per-case wall times and max/median
task skew of the round's join+aggregate stage.

Usage: python tools/hubbench.py [n] [hub_deg]   → one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from webgraph_big_spark.session import get_spark
    from webgraph_big_spark.graph import Graph
    from webgraph_big_spark.algorithms.pagerank import pagerank

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    hub_deg = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark("hubbench", cpus=cpus, shuffle_partitions=cpus)
    # force the co-partitioned (non-broadcast) path: tiny threshold
    res: dict = {"n": n, "hub_deg": hub_deg, "cpus": cpus}

    rng = np.random.default_rng(7)
    ring = pd.DataFrame(
        {"src": np.arange(1, n, dtype=np.int64),
         "dst": (np.arange(1, n, dtype=np.int64) % (n - 1)) + 1}
    )
    hub_out = pd.DataFrame(
        {"src": np.zeros(hub_deg, dtype=np.int64),
         "dst": rng.integers(1, n, hub_deg).astype(np.int64)}
    )
    edges_pd = pd.concat([ring, hub_out], ignore_index=True)
    edges = spark.createDataFrame(edges_pd).localCheckpoint(eager=True)
    g = Graph(edges, num_nodes=n)

    def timed_pagerank(salt):
        t0 = time.time()
        out = pagerank(
            g,
            fixed_iterations=3,
            broadcast_threshold_bytes=1,  # force co-partition path
            salt_buckets=salt,
            run_dir=None,
        )
        cnt = out.count()
        sec = time.time() - t0
        assert cnt == n
        return round(sec, 2)

    # warm-up JVM/codegen once
    timed_pagerank(None)
    res["pagerank_unsalted_sec"] = timed_pagerank(None)
    res["pagerank_salted16_sec"] = timed_pagerank(16)

    # (a) fan-in: mega-hub as a GROUP key — partial aggregation evidence.
    # src=0 holds hub_deg rows of ONE key; compare the same sum over a
    # uniform key space.  If map-side partial aggregation collapses the
    # hub (≤ one partial row per map task), the two times differ by
    # ~nothing and salted_sum is NOT needed for algebraic aggregates.
    vals = edges.select(F.col("src").alias("key"), F.lit(1.0).alias("v"))
    t0 = time.time()
    vals.groupBy("key").agg(F.sum("v")).agg(F.count("*")).first()
    res["agg_hubkeys_sec"] = round(time.time() - t0, 2)
    uniform = edges.select(
        F.pmod(F.xxhash64("dst", "src"), F.lit(n)).alias("key"),
        F.lit(1.0).alias("v"),
    )
    t0 = time.time()
    uniform.groupBy("key").agg(F.sum("v")).agg(F.count("*")).first()
    res["agg_uniform_sec"] = round(time.time() - t0, 2)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
