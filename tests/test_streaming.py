"""Structured Streaming: incremental degrees (foreachBatch merge state)
and watermark-windowed arc counts."""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd

from webgraph_big_spark import streaming as st


def _write_batch(src_dir: str, name: str, rows: list[tuple[int, int, str]]):
    os.makedirs(src_dir, exist_ok=True)
    df = pd.DataFrame(rows, columns=["src", "dst", "ts"])
    # µs precision: Spark's vectorized reader rejects pandas' ns INT64
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    df.to_parquet(os.path.join(src_dir, name), index=False)


def test_incremental_degrees_accumulate(spark, tmp_path):
    src = str(tmp_path / "arcs")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(src, "b0.parquet", [(0, 1, "2024-01-01 00:00:00"),
                                     (0, 2, "2024-01-01 00:01:00"),
                                     (1, 2, "2024-01-01 00:02:00")])
    q = st.incremental_degrees(
        st.stream_arc_files(spark, src), state, ckpt, available_now=True
    )
    q.awaitTermination(120)
    got = {r["id"]: (r["outdeg"], r["indeg"])
           for r in st.read_degree_state(spark, state).collect()}
    assert got == {0: (2, 0), 1: (1, 1), 2: (0, 2)}

    # second batch: counts must ACCUMULATE, not reset
    _write_batch(src, "b1.parquet", [(2, 0, "2024-01-01 00:03:00"),
                                     (0, 1, "2024-01-01 00:04:00")])
    q = st.incremental_degrees(
        st.stream_arc_files(spark, src), state, ckpt, available_now=True
    )
    q.awaitTermination(120)
    got = {r["id"]: (r["outdeg"], r["indeg"])
           for r in st.read_degree_state(spark, state).collect()}
    assert got == {0: (3, 1), 1: (1, 2), 2: (1, 2)}


def _bucket_files(state_dir: str, version: int, bucket: int) -> dict[str, bytes]:
    d = os.path.join(state_dir, f"v{version}", f"_bucket={bucket}")
    out = {}
    for f in sorted(os.listdir(d)):
        if f.endswith(".parquet"):
            with open(os.path.join(d, f), "rb") as fh:
                out[f] = fh.read()
    return out


def test_bucketed_state_partial_rewrite(spark, tmp_path):
    """A batch touching one bucket must rewrite ONLY that bucket: the
    other buckets' files stay in the old version directory, byte for
    byte, and the manifest still points at them."""
    import json

    src = str(tmp_path / "arcs3")
    state = str(tmp_path / "state3")
    ckpt = str(tmp_path / "ckpt3")

    # ids 0..3 → buckets 0..3 (n_buckets=4)
    _write_batch(src, "b0.parquet", [(0, 1, "2024-01-01 00:00:00"),
                                     (2, 3, "2024-01-01 00:01:00")])
    q = st.incremental_degrees(
        st.stream_arc_files(spark, src), state, ckpt,
        available_now=True, n_buckets=4,
    )
    q.awaitTermination(120)
    before = {b: _bucket_files(state, 0, b) for b in (0, 1, 2, 3)}

    # second batch touches ONLY ids 0 and 4 → bucket 0
    _write_batch(src, "b1.parquet", [(0, 4, "2024-01-01 00:02:00")])
    q = st.incremental_degrees(
        st.stream_arc_files(spark, src), state, ckpt, available_now=True,
    )
    q.awaitTermination(120)

    manifest = json.load(open(os.path.join(state, "_CURRENT")))
    assert manifest["buckets"]["0"] == 1  # bucket 0 rewritten in v1
    for b in ("1", "2", "3"):
        assert manifest["buckets"][b] == 0  # untouched buckets still in v0
    # untouched v0 bucket files are byte-identical (never rewritten)
    for b in (1, 2, 3):
        assert _bucket_files(state, 0, b) == before[b]
    assert not os.path.exists(os.path.join(state, "v1", "_bucket=1"))

    got = {r["id"]: (r["outdeg"], r["indeg"])
           for r in st.read_degree_state(spark, state).collect()}
    assert got == {0: (2, 0), 1: (0, 1), 2: (1, 0), 3: (0, 1), 4: (0, 1)}


def test_replayed_batch_is_noop(spark, tmp_path):
    """foreachBatch is at-least-once; the manifest's (checkpoint_id,
    last_batch_id) pair makes the merge idempotent — re-applying an
    already-applied batch_id FROM THE SAME checkpoint lineage (the
    crash-between-state-commit-and-checkpoint-commit shape) must not
    double-count."""
    state = str(tmp_path / "state4")
    ck = os.path.abspath(str(tmp_path / "ck_a"))
    batch = spark.createDataFrame([(0, 1), (0, 2)], "src long, dst long")
    st._merge_degree_batch(batch, 0, state, ck)
    st._merge_degree_batch(batch, 0, state, ck)  # replay, same lineage
    got = {r["id"]: (r["outdeg"], r["indeg"])
           for r in st.read_degree_state(spark, state).collect()}
    # without the guard this would double to {0:(4,0),1:(0,2),2:(0,2)}
    assert got == {0: (2, 0), 1: (0, 1), 2: (0, 1)}


def test_foreign_checkpoint_raises_and_rebind(spark, tmp_path):
    """Batch ids are only monotonic within one checkpoint lineage: a
    batch arriving from a DIFFERENT checkpoint must raise (silently
    no-oping it would lose data), and rebind_state_checkpoint() is the
    deliberate adoption path."""
    import pytest

    state = str(tmp_path / "state5")
    ck_a = os.path.abspath(str(tmp_path / "ck_a"))
    ck_b = os.path.abspath(str(tmp_path / "ck_b"))
    b0 = spark.createDataFrame([(0, 1)], "src long, dst long")
    st._merge_degree_batch(b0, 0, state, ck_a)
    b1 = spark.createDataFrame([(0, 2)], "src long, dst long")
    with pytest.raises(RuntimeError, match="rebind_state_checkpoint"):
        st._merge_degree_batch(b1, 0, state, ck_b)
    # state untouched by the refused batch
    got = {r["id"]: (r["outdeg"], r["indeg"])
           for r in st.read_degree_state(spark, state).collect()}
    assert got == {0: (1, 0), 1: (0, 1)}
    st.rebind_state_checkpoint(state, ck_b)
    st._merge_degree_batch(b1, 0, state, ck_b)  # now accepted
    got = {r["id"]: (r["outdeg"], r["indeg"])
           for r in st.read_degree_state(spark, state).collect()}
    assert got == {0: (2, 0), 1: (0, 1), 2: (0, 1)}


def test_version_gc_sweeps_superseded_dirs(spark, tmp_path):
    """Superseded version directories are swept only once BOTH retention
    guards lapse (older than the grace period AND more than
    keep_versions behind the current version) — a reader holding a lazy
    DataFrame pinned to the previous version's files is safe across the
    next few batches; storage stays bounded by live copies + the small
    retained tail."""
    state = str(tmp_path / "state6")
    ck = os.path.abspath(str(tmp_path / "ck"))
    # n_buckets=1: every batch rewrites the single bucket, so each new
    # version fully supersedes the previous directory
    for i, d in enumerate([1, 2, 3, 4]):
        b = spark.createDataFrame([(0, d)], "src long, dst long")
        st._merge_degree_batch(b, i, state, ck, n_buckets=1)
    # all four version dirs exist: v0..v2 superseded but inside the
    # grace period, v3 live
    for v in range(4):
        assert os.path.isdir(os.path.join(state, f"v{v}"))
    # age everything past the grace period and sweep with defaults:
    # keep_versions=2 retains v2, v3 (v3 live anyway) and sweeps v0, v1
    import time
    old = time.time() - 2 * st.GC_GRACE_SECONDS
    for v in range(4):
        os.utime(os.path.join(state, f"v{v}"), (old, old))
    manifest = st._read_manifest(state)
    st._gc_versions(state, manifest)
    assert not os.path.exists(os.path.join(state, "v0"))
    assert not os.path.exists(os.path.join(state, "v1"))
    assert os.path.isdir(os.path.join(state, "v2"))  # keep_versions tail
    assert os.path.isdir(os.path.join(state, "v3"))  # live
    got = {r["id"]: (r["outdeg"], r["indeg"])
           for r in st.read_degree_state(spark, state).collect()}
    assert got == {0: (4, 0), 1: (0, 1), 2: (0, 1), 3: (0, 1), 4: (0, 1)}


def test_windowed_counts_drop_late_data(spark, tmp_path):
    src = str(tmp_path / "arcs2")
    out = str(tmp_path / "win")
    ckpt = str(tmp_path / "ckpt2")

    # batch 0: events in windows 00:00 and 00:10, plus one far-future
    # event at 01:00 that advances the watermark to 00:40
    _write_batch(src, "b0.parquet", [
        (0, 1, "2024-01-01 00:01:00"),
        (0, 2, "2024-01-01 00:02:00"),
        (1, 2, "2024-01-01 00:11:00"),
        (9, 9, "2024-01-01 01:00:00"),
    ])
    q = st.windowed_arc_counts(
        st.stream_arc_files(spark, src), out, ckpt,
        window="10 minutes", watermark="20 minutes", available_now=True,
    )
    q.awaitTermination(120)

    # batch 1: one on-time event (01:05) and one LATE event (00:03 — far
    # behind the 00:40 watermark → must be dropped)
    _write_batch(src, "b1.parquet", [
        (5, 6, "2024-01-01 01:05:00"),
        (7, 8, "2024-01-01 00:03:00"),
    ])
    q = st.windowed_arc_counts(
        st.stream_arc_files(spark, src), out, ckpt,
        window="10 minutes", watermark="20 minutes", available_now=True,
    )
    q.awaitTermination(120)
    # batch 2: advance watermark far enough to close every window
    _write_batch(src, "b2.parquet", [(9, 9, "2024-01-01 03:00:00")])
    q = st.windowed_arc_counts(
        st.stream_arc_files(spark, src), out, ckpt,
        window="10 minutes", watermark="20 minutes", available_now=True,
    )
    q.awaitTermination(120)

    rows = spark.read.parquet(out).collect()
    counts = {
        r["window_start"].replace(tzinfo=None): r["arcs"] for r in rows
    }
    t = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    assert counts[t("2024-01-01 00:00:00")] == 2
    assert counts[t("2024-01-01 00:10:00")] == 1
    # window 01:00 closed by the b2 watermark advance, holding BOTH the
    # b0 event (01:00) and the on-time b1 event (01:05)
    assert counts[t("2024-01-01 01:00:00")] == 2
    # the late (00:03) b1 arc was dropped: window 00:00 stayed at 2 and
    # the total on-time mass is 5 (the 03:00 probe window never closes)
    assert sum(counts.values()) == 5


def test_legacy_manifest_adoption_guard(spark, tmp_path):
    """A pre-lineage manifest (no checkpoint_id) is auto-adopted only
    when EMPTY (last_batch_id == -1); one that already applied batches
    must fail loudly — silently keeping last_batch_id under a fresh
    checkpoint (whose batch ids restart at 0) would make the replay
    guard drop the first legitimate batches (round-5 ADVICE)."""
    import json
    import pytest

    state = str(tmp_path / "state7")
    ck = os.path.abspath(str(tmp_path / "ck"))
    b0 = spark.createDataFrame([(0, 1)], "src long, dst long")
    st._merge_degree_batch(b0, 0, state, ck)
    # strip the lineage field, simulating a legacy table WITH batches
    mpath = os.path.join(state, "_CURRENT")
    with open(mpath) as fh:
        m = json.load(fh)
    del m["checkpoint_id"]
    with open(mpath, "w") as fh:
        json.dump(m, fh)
    b1 = spark.createDataFrame([(0, 2)], "src long, dst long")
    with pytest.raises(RuntimeError, match="rebind_state_checkpoint"):
        st._merge_degree_batch(b1, 0, state, ck)
    # an EMPTY legacy manifest adopts silently
    state2 = str(tmp_path / "state8")
    os.makedirs(state2)
    with open(os.path.join(state2, "_CURRENT"), "w") as fh:
        json.dump({"version": -1, "last_batch_id": -1, "n_buckets": 2,
                   "buckets": {}}, fh)
    st._merge_degree_batch(b1, 0, state2, ck)
    got = {r["id"]: (r["outdeg"], r["indeg"])
           for r in st.read_degree_state(spark, state2).collect()}
    assert got == {0: (1, 0), 2: (0, 1)}


def test_version_gc_sweeps_crashed_writer_orphans(spark, tmp_path):
    """A version dir ABOVE the manifest version (writer crashed after
    writing v{N} but before the manifest flip) is reclaimed once the
    grace period lapses — previously such orphans leaked forever
    (round-5 ADVICE)."""
    import time

    state = str(tmp_path / "state9")
    ck = os.path.abspath(str(tmp_path / "ck"))
    b = spark.createDataFrame([(0, 1)], "src long, dst long")
    st._merge_degree_batch(b, 0, state, ck, n_buckets=1)  # commits v0
    orphan = os.path.join(state, "v7")  # crashed writer's uncommitted dir
    os.makedirs(orphan)
    manifest = st._read_manifest(state)
    # inside the grace window: protected
    st._gc_versions(state, manifest)
    assert os.path.isdir(orphan)
    old = time.time() - 2 * st.GC_GRACE_SECONDS
    os.utime(orphan, (old, old))
    st._gc_versions(state, manifest)
    assert not os.path.exists(orphan)
    assert os.path.isdir(os.path.join(state, "v0"))  # live, untouched
