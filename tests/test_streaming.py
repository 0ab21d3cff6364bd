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
    """foreachBatch is at-least-once; the manifest's last_batch_id makes
    the merge idempotent — replaying an applied batch (fresh checkpoint,
    same source) must not double-count."""
    src = str(tmp_path / "arcs4")
    state = str(tmp_path / "state4")

    _write_batch(src, "b0.parquet", [(0, 1, "2024-01-01 00:00:00"),
                                     (0, 2, "2024-01-01 00:01:00")])
    q = st.incremental_degrees(
        st.stream_arc_files(spark, src), state, str(tmp_path / "ck_a"),
        available_now=True,
    )
    q.awaitTermination(120)
    # replay the same batch as batch_id 0 again (crash-recovery shape)
    q = st.incremental_degrees(
        st.stream_arc_files(spark, src), state, str(tmp_path / "ck_b"),
        available_now=True,
    )
    q.awaitTermination(120)
    got = {r["id"]: (r["outdeg"], r["indeg"])
           for r in st.read_degree_state(spark, state).collect()}
    # without the batch_id no-op this would double to {0:(4,0),1:(0,2),2:(0,2)}
    assert got == {0: (2, 0), 1: (0, 1), 2: (0, 1)}


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
