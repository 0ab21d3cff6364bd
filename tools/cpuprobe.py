"""Raw-CPU parallelism probe — measures the sandbox's EFFECTIVE core
count, independent of Spark.

Spawns N worker *processes* (no GIL effects) each running a fixed
arithmetic loop, and reports aggregate throughput at N = 1, 8, 32.  On
honest hardware throughput scales ~linearly to the physical core count;
on a throttled/oversubscribed VM it plateaus at the usable-core cap.
Used to contextualize scalebench wall-clock scaling numbers: if the
probe itself cannot scale 8→32, no workload on this box can.

Usage: python tools/cpuprobe.py [--secs 6]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def _spin(secs: float, out):
    t_end = time.perf_counter() + secs
    x, iters = 1.0, 0
    while time.perf_counter() < t_end:
        for _ in range(10_000):
            x = x * 1.0000001 + 1.0
        iters += 10_000
    out.put(iters)


def throughput(n: int, secs: float) -> float:
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_spin, args=(secs, q)) for _ in range(n)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total / secs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=6.0)
    args = ap.parse_args()
    t1 = throughput(1, args.secs)
    t8 = throughput(8, args.secs)
    t32 = throughput(32, args.secs)
    print(
        json.dumps(
            {
                "metric": "raw CPU spin throughput (iters/sec), multiprocess",
                "t1": round(t1),
                "t8": round(t8),
                "t32": round(t32),
                "speedup_8_over_1": round(t8 / t1, 2),
                "speedup_32_over_8": round(t32 / t8, 2),
                "effective_cores_at_32": round(t32 / t1, 1),
                "scaling_efficiency_8_to_32": round((t32 / t8) / 4.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
