"""Quick sandbox-health probe: host-warm first-touch rate + granted cores.

The VM's dominant noise source is kernel-side page-fault cost (first
touch of never-backed guest pages has been measured anywhere from
5 MB/s to multi-GB/s depending on host pressure) plus a variable
effective-core grant.  Run this BEFORE any wall-clock benchmark; only
trust scaling numbers from windows where both figures are healthy
(first_touch ≥ 500 MB/s, cores ≥ 24).

Prints one JSON line: {"first_touch_mb_s": ..., "effective_cores_at_32": ...}
"""

import json
import multiprocessing as mp
import time


def _touch(_):
    import numpy as np

    t0 = time.time()
    a = np.ones(int(64e6 // 8))  # 64 MB — small so the probe itself
    del a                        # stays <60 s even at 5 MB/s fault rate
    return 64.0 / (time.time() - t0)


def _spin(secs):
    t0 = time.time()
    n = 0
    while time.time() - t0 < secs:
        n += sum(i * i for i in range(1000))
    return n


def main():
    with mp.Pool(4) as p:
        rates = p.map(_touch, range(4))  # 256 MB across 4 procs
    ft = sum(rates)  # aggregate MB/s
    secs = 2.0
    t1 = _spin(secs)
    with mp.Pool(32) as p:
        t32 = sum(p.starmap(_spin, [(secs,)] * 32))
    print(
        json.dumps(
            {
                "first_touch_mb_s": round(ft, 1),
                "effective_cores_at_32": round(t32 / t1, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
