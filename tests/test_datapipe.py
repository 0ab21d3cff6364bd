"""Datapipe operators vs pure-Python oracles on tiny synthetic corpora
(the SQL gates in __spark_entry__ cover the engine-vs-DuckDB comparison;
these tests pin the *semantics* with hand-checkable fixtures)."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from webgraph_big_spark.datapipe import dedup as dd
from webgraph_big_spark.datapipe import multimodal as dm
from webgraph_big_spark.datapipe import similarity as ds
from webgraph_big_spark.datapipe import text as dt

DOCS = [
    (0, "the cat sat on the mat", "en"),
    (1, "the cat sat on the mat", "en"),        # exact dup of 0
    (2, "the cat sat on the red mat", "en"),    # near dup of 0
    (3, "der hund und die katze ist da", "de"),
    (4, "completely different words entirely here now", "en"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t, lg, "srcA", len(t)) for i, t, lg in DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def test_exact_duplicates(spark, docs):
    rows = {r["text_md5"]: (r["n_copies"], r["keeper"]) for r in dd.exact_duplicates(docs).collect()}
    md0 = hashlib.md5(DOCS[0][1].encode()).hexdigest()
    assert rows[md0] == (2, 0)
    assert sum(c for c, _ in rows.values()) == 5


def test_shingles_match_python(spark, docs):
    got = {(r["doc_id"], r["sh"]) for r in dd.shingles(docs).collect()}
    want = set()
    for i, t, _ in DOCS:
        toks = t.lower().split(" ")
        for j in range(len(toks) - 2):
            want.add((i, _h(" ".join(toks[j : j + 3]))))
    assert got == want


def test_minhash_identical_docs_same_signature(spark, docs):
    sig = {r["doc_id"]: tuple(r[f"mh{j}"] for j in range(dd.NUM_HASHES)) for r in dd.minhash_signatures(docs).collect()}
    assert sig[0] == sig[1]
    # near-dup shares most minhashes; disjoint doc shares none guaranteed? just check not equal
    assert sig[0] != sig[4]


def test_lsh_finds_exact_and_near_dups(spark, docs):
    pairs = {(r["doc_a"], r["doc_b"]) for r in dd.lsh_candidate_pairs(docs).collect()}
    assert (0, 1) in pairs
    jac = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in dd.jaccard_pairs(docs, threshold=0.0, group_col="source").collect()}
    assert jac[(0, 1)] == 1.0
    # doc2 has shingles: 4 original + ... jaccard(0,2) = |∩|/|∪| computed by hand
    toks0 = DOCS[0][1].split(" ")
    toks2 = DOCS[2][1].split(" ")
    s0 = {" ".join(toks0[i : i + 3]) for i in range(len(toks0) - 2)}
    s2 = {" ".join(toks2[i : i + 3]) for i in range(len(toks2) - 2)}
    want = len(s0 & s2) / len(s0 | s2)
    assert abs(jac[(0, 2)] - round(want, 9)) < 1e-12


def test_simhash_properties(spark, docs):
    sh = {r["doc_id"]: r["simhash"] for r in dd.simhash(docs).collect()}
    assert sh[0] == sh[1]  # identical text → identical simhash
    assert 0 <= sh[0] < (1 << dd.SIMHASH_BITS)
    # near dup within small hamming distance
    ham = bin(sh[0] ^ sh[2]).count("1")
    assert ham <= 10


def test_text_stats_and_quality(spark, docs):
    stats = {r["doc_id"]: (r["n_tokens"], r["n_uniq_tokens"], r["n_chars"]) for r in dt.token_stats(docs).collect()}
    assert stats[0] == (6, 5, len(DOCS[0][1]))
    lang = {r["doc_id"]: r["lang_pred"] for r in dt.lang_id(docs).collect()}
    assert lang[0] == "en" and lang[3] == "de"
    q = {r["doc_id"]: r["quality"] for r in dt.quality_score(docs).collect()}
    n, stop, uniq = 6.0, 2.0, 5.0  # "the" x2 are the only en stopword hits
    want0 = round(0.3 * min(n / 100, 1.0) + 0.4 * stop / n + 0.3 * uniq / n, 9)
    assert q[0] == want0


def test_fingerprint_rolling_hash(spark, docs):
    fp = {r["doc_id"]: r["fp"] for r in dt.fingerprint(docs).collect()}
    acc = 0
    for tok in DOCS[0][1].split(" "):
        acc = (acc * dt.FP_BASE + _h(tok)) % dt.FP_MOD
    assert fp[0] == acc
    assert fp[0] == fp[1] and fp[0] != fp[2]  # order-sensitive content hash


def test_similarity_topk_vs_numpy(spark):
    rng = np.random.default_rng(17)
    vecs = rng.normal(size=(30, 8)).astype(np.float32)
    labels = (np.arange(30) % 3).astype(int)
    df = spark.createDataFrame(
        [(int(i), vecs[i].tolist(), int(labels[i])) for i in range(30)],
        "vec_id long, embedding array<float>, label int",
    )
    got = ds.brute_force_topk(df.filter(F.col("vec_id") < 3), df, k=4)
    got_m = {}
    for r in got.collect():
        got_m.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    v = vecs.astype(np.float64)
    sims = (v @ v.T) / (np.linalg.norm(v, axis=1)[:, None] * np.linalg.norm(v, axis=1)[None, :])
    for qid in range(3):
        order = [
            int(j)
            for j in sorted(
                (j for j in range(30) if j != qid),
                key=lambda j: (-round(sims[qid, j], 6), j),
            )[:4]
        ]
        assert [n for _, n in sorted(got_m[qid])] == order
    # IVF with all k-means cells probed == brute force
    ivf_all = ds.ivf_topk(
        df.filter(F.col("vec_id") < 3), df, k=4, nprobe=4, k_cells=4, km_iters=2
    )
    assert sorted(map(tuple, ivf_all.collect())) == sorted(map(tuple, got.collect()))


def test_multimodal_plumbing(spark, docs):
    media = dm.text_as_media(docs)
    rows = {r["media_id"]: r for r in media.collect()}
    assert bytes(rows[0]["media"]).decode() == DOCS[0][1]
    assert rows[0]["meta"]["n_bytes"] == len(DOCS[0][1])
    feats = {r["media_id"]: r["features"] for r in dm.extract_features(media).collect()}
    assert len(feats[0]) == dm.FEATURE_DIM
    assert feats[0] == feats[1]  # deterministic featurizer
    np.testing.assert_allclose(
        feats[0], dm._fake_features(DOCS[0][1].encode()).tolist(), rtol=1e-6
    )
    # frame sampling reassembles the payload
    frames = dm.frame_sample(media, n_frames=4).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["media_id"], {})[r["frame_idx"]] = bytes(r["frame"])
    joined = b"".join(by_doc[0][i] for i in range(4))
    assert joined == DOCS[0][1].encode()
    with pytest.raises(NotImplementedError):
        dm.decode_media(media)
