"""Measure column-register vs packed-register HyperBall cost as m grows
(the BENCH.md 'HLL precision vs plan cost' evidence, round 4).

The column design's per-round plan is O(m) wide; the packed design's is
O(1) wide (registers are rows).  This driver times `t=2` register runs
on a tiny fixture — at this size the COLUMN path cost is dominated by
driver plan-build/parse (the quantity the log2m<=12 cap guards), while
the PACKED path's plan cost is flat in m and only its row count grows.

Usage: python tools/packed_effect.py [max_log2m_column] [max_log2m_packed]
→ one JSON line, partial results printed per case (host-window-safe).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from webgraph_big_spark.session import get_spark
    from webgraph_big_spark.graph import Graph
    from webgraph_big_spark.algorithms.hyperball import hyperball_registers
    from webgraph_big_spark.algorithms.hyperball_packed import (
        hyperball_registers_packed,
    )

    max_col = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    max_packed = int(sys.argv[2]) if len(sys.argv) > 2 else 14
    spark = get_spark("packed_effect", cpus=4, shuffle_partitions=2)
    pairs = [(i, (i * 7 + 3) % 100) for i in range(100)] + [
        (i, (i + 1) % 100) for i in range(100)
    ]
    g = Graph.from_pairs(spark, pairs, num_nodes=100)
    g.edges = g.edges.localCheckpoint(eager=True)
    # warm both code paths (JVM + codegen) outside the timings
    hyperball_registers(g, 1, log2m=4).count()
    hyperball_registers_packed(g, 1, log2m=4).count()

    out: dict[str, float] = {}

    def timed(label: str, fn) -> None:
        t0 = time.time()
        fn()
        out[label] = round(time.time() - t0, 1)
        print(f"[packed_effect] {label} {out[label]}s", file=sys.stderr, flush=True)

    for lm in (6, 8, 10, 12):
        if lm <= max_col:
            timed(
                f"column_m{1 << lm}_sec",
                lambda lm=lm: hyperball_registers(g, 2, log2m=lm).count(),
            )
        if lm <= max_packed:
            timed(
                f"packed_m{1 << lm}_sec",
                lambda lm=lm: hyperball_registers_packed(g, 2, log2m=lm).count(),
            )
    for lm in (13, 14):
        if lm <= max_packed:
            timed(
                f"packed_m{1 << lm}_sec",
                lambda lm=lm: hyperball_registers_packed(g, 2, log2m=lm).count(),
            )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
