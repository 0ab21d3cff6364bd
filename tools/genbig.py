"""Chunked deterministic power-law graph generator for the billion-arc
scaling evidence (BASELINE.md north rule; VERDICT-r4 stretch item).

``scalebench.gen_graph`` materializes the whole edge list in driver
memory — fine to ~150 M arcs, but a 10^9-arc generation would touch
~40 GB of fresh pages in one shot, which this sandbox's page-fault path
(first-touch as low as 20 MB/s under steal) turns into half an hour of
kernel time before a single row exists.  This generator:

- samples the SAME power-law marginal (seed 42, exponent 1/1.1) in
  fixed 125 M-draw chunks, so NumPy's arenas are faulted once and
  reused for every subsequent chunk.  Sampling is by MULTINOMIAL COUNTS
  (one draw of per-node counts, then ``repeat``), not per-draw
  inverse-CDF ``searchsorted``: random binary probes into the 80 MB CDF
  cost ~2.3 µs/draw in cache misses (measured — a 10^9-arc generation
  would burn ~2.5 h), while counts+repeat is O(n + k) sequential.  The
  src side is emitted in node order and the dst side is shuffled; since
  the two marginals are independent and the pairing is exchangeable,
  the joint arc distribution is identical;
- dedups arcs within a chunk (``np.unique`` on the packed key) and
  drops self-loops; cross-chunk duplicate arcs remain (a few percent at
  web-like skew) — they are deterministic parallel arcs, which
  PageRank's degree/contribution algebra handles without bias toward
  either leg of a scaling pair;
- writes one parquet part file per chunk with 16 M-row row groups into
  an ``edges.parquet/`` DIRECTORY, so the downstream scan parallelizes
  across both files and row groups (a single-file write would hand
  local[8] at most #row-groups splits — and a 16 GB single file is
  exactly the kind of unsplittable-ish artifact a 100 TB pipeline must
  never produce).

Usage: python tools/genbig.py --nodes 10000000 --edges 1000000000 \
           [--out DIR] [--chunk 125000000]
Prints one JSON line {nodes, arcs_requested, arcs_written, path}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    # glibc returns >128 KB allocations to the OS on free, so every
    # chunk would re-fault its ~7 GB of NumPy/Arrow temporaries — and
    # this host's page-fault path has been measured as low as
    # 20 MB/s under steal (≈6 min/chunk of pure kernel time).  Keeping
    # large blocks in the arena and never trimming makes chunk 2+ reuse
    # chunk 1's warm pages (measured ~2.6× faster per chunk).  malloc
    # reads these knobs only at process start, hence the re-exec.
    if os.environ.get("MALLOC_MMAP_THRESHOLD_") is None:
        env = dict(os.environ)
        env["MALLOC_MMAP_THRESHOLD_"] = str(16 << 30)
        env["MALLOC_TRIM_THRESHOLD_"] = str(16 << 30)
        os.execve(sys.executable, [sys.executable] + sys.argv, env)

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    def arg(name: str, default: int) -> int:
        return int(sys.argv[sys.argv.index(name) + 1]) if name in sys.argv else default

    n = arg("--nodes", 10_000_000)
    m = arg("--edges", 1_000_000_000)
    chunk = arg("--chunk", 125_000_000)
    work = (
        "/dev/shm/wbs_scalework"
        if os.path.isdir("/dev/shm")
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "_scalework")
    )
    out = sys.argv[sys.argv.index("--out") + 1] if "--out" in sys.argv else os.path.join(
        work, f"pl_n{n}_m{m}"
    )
    edir = os.path.join(out, "edges.parquet")
    shutil.rmtree(edir, ignore_errors=True)
    os.makedirs(edir, exist_ok=True)

    rng = np.random.default_rng(42)
    w = np.arange(1, n + 1, dtype=np.float64) ** (-1.0 / 1.1)
    w /= w.sum()
    ids = np.arange(n, dtype=np.int64)

    total = 0
    done = 0
    ci = 0
    while done < m:
        k = min(chunk, m - done)
        src = np.repeat(ids, rng.multinomial(k, w))
        dst = np.repeat(ids, rng.multinomial(k, w))
        rng.shuffle(dst)
        keep = src != dst
        key = np.unique(src[keep] * np.int64(n) + dst[keep])
        del src, dst, keep
        tbl = pa.table({"src": key // n, "dst": key % n})
        del key
        pq.write_table(
            tbl,
            os.path.join(edir, f"part-{ci:03d}.parquet"),
            row_group_size=16_000_000,
            compression="snappy",
        )
        total += tbl.num_rows
        del tbl
        done += k
        ci += 1
        print(f"# chunk {ci}: {done}/{m} drawn, {total} arcs", file=sys.stderr, flush=True)

    print(json.dumps({"nodes": n, "arcs_requested": m, "arcs_written": total, "path": out}))


if __name__ == "__main__":
    main()
