"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design notes for 100 TB:
- exact dedup is one hash-groupBy (map-side combine handles the heavy
  hitters); the digest (md5) is computed JVM-side at the scan.
- MinHash signatures are computed with built-in array expressions
  (shingle → hash → per-permutation min as grouped aggregates): one
  explode + one groupBy, shuffle keyed by doc — embarrassingly parallel.
- LSH banding turns near-dup search into equality self-joins on band
  keys (shuffle on band key; hot buckets are bounded by band width).
- SimHash is 32 aggregate expressions over exploded token hashes —
  no Python anywhere.

All hash constants are module-level so ``__spark_entry__`` builds the
byte-identical DuckDB oracle from them.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, functions as F

from webgraph_big_spark.datapipe.text import tokens
from webgraph_big_spark.functions import stable_long_hash

# MinHash permutation constants (a·h + b mod P), mirrored in oracle SQL.
MH_P = 1_000_000_007
MH_A = [131, 137, 139, 149, 151, 157, 163, 167]
MH_B = [17, 29, 41, 53, 67, 79, 97, 103]
NUM_HASHES = len(MH_A)
_LOG = logging.getLogger(__name__)
SHINGLE_K = 3
LSH_BAND_ROWS = 2  # 8 hashes → 4 bands of 2
SIMHASH_BITS = 32


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(text_md5, n_copies, keeper): one row per distinct content; keeper
    is the smallest doc id (the canonical representative)."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_md5"))
        .groupBy("text_md5")
        .agg(F.count("*").cast("long").alias("n_copies"), F.min(id_col).alias("keeper"))
    )


def shingles(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = SHINGLE_K,
    distinct: bool = True,
) -> DataFrame:
    """(doc_id, sh): distinct hashed k-token shingles per document.

    ``distinct=False`` skips the final (doc_id, sh)-dedup shuffle: the
    grams are already ``array_distinct`` per document, so duplicates can
    only arise from hash collisions WITHIN a document — consumers whose
    aggregation is idempotent under duplicates (MinHash's per-doc mins)
    pass False and save a full shuffle of the largest relation in the
    pipeline; set-semantics consumers (Jaccard intersection counts)
    keep the default."""
    t = tokens(F.col(text_col))
    # guard: Spark's sequence(1, 0) yields a DESCENDING [1, 0], not empty
    grams = F.when(F.size(t) >= k, F.transform(
        F.sequence(F.lit(1), F.size(t) - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(t, i, k)),
    )).otherwise(F.array().cast("array<string>"))
    out = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(grams)).alias("gram"),
    ).select(id_col, stable_long_hash(F.col("gram")).alias("sh"))
    return out.distinct() if distinct else out


def minhash_signatures(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, mh0..mh{H-1}): MinHash signature over k-token shingles."""
    sh = shingles(docs, text_col, id_col, distinct=False)  # min is dup-proof
    aggs = [
        F.min((F.col("sh") * MH_A[j] + MH_B[j]) % MH_P).alias(f"mh{j}")
        for j in range(NUM_HASHES)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefilter_exact: bool = False,
    max_bucket_width: int | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """(doc_a, doc_b): unordered candidate pairs sharing at least one LSH
    band (bands of ``LSH_BAND_ROWS`` consecutive minhashes).

    A band value shared by k documents yields k(k-1)/2 pairs out of its
    bucket — quadratic in the hot-bucket width.  Two guards bound that
    at pretraining scale (both OFF by default; the driver gate runs the
    exact path):

    - ``prefilter_exact``: collapse byte-identical documents to their
      ``exact_duplicates`` keeper BEFORE signatures.  k identical docs
      share every band bucket and alone produce k²/2 candidates that
      Jaccard-verify to 1.0 — information already delivered (linearly)
      by :func:`exact_duplicates`.  Candidates are then emitted between
      distinct-content representatives only.
    - ``max_bucket_width``: per band, buckets wider than this are
      dropped whole (their docs almost always co-occur in other, finer
      buckets; partial retention within a bucket would be arbitrary).
      NEVER silent: per band, (dropped_buckets, dropped_rows) goes to
      the module log and into ``stats`` (caller-supplied dict) as
      ``{"band{b}": {"dropped_buckets": n, "dropped_rows": m}}``.
    """
    if prefilter_exact:
        keepers = exact_duplicates(docs, text_col, id_col).select(
            F.col("keeper").alias(id_col)
        )
        docs = docs.join(keepers, id_col, "left_semi")
    sig = minhash_signatures(docs, text_col, id_col).localCheckpoint(eager=True)
    n_bands = NUM_HASHES // LSH_BAND_ROWS
    pairs = None
    for b in range(n_bands):
        cols = [f"mh{b * LSH_BAND_ROWS + r}" for r in range(LSH_BAND_ROWS)]
        band_sig = sig
        if max_bucket_width is not None:
            widths = sig.groupBy(*cols).agg(F.count("*").alias("_w"))
            hot = widths.filter(F.col("_w") > max_bucket_width).localCheckpoint(
                eager=True
            )
            n_hot, n_rows = hot.agg(
                F.count("*"), F.coalesce(F.sum("_w"), F.lit(0))
            ).first()
            if stats is not None:
                stats[f"band{b}"] = {
                    "dropped_buckets": int(n_hot),
                    "dropped_rows": int(n_rows),
                }
            if n_hot:
                _LOG.warning(
                    "lsh_candidate_pairs: band %d dropped %d bucket(s) "
                    "covering %d docs (width > %d)",
                    b, n_hot, n_rows, max_bucket_width,
                )
                band_sig = sig.join(hot.select(*cols), cols, "left_anti")
        a = band_sig.select(F.col(id_col).alias("doc_a"), *cols)
        bb = band_sig.select(F.col(id_col).alias("doc_b"), *cols)
        p = a.join(bb, cols).filter(F.col("doc_a") < F.col("doc_b")).select("doc_a", "doc_b")
        pairs = p if pairs is None else pairs.union(p)
    return pairs.distinct()


def jaccard_pairs(
    docs: DataFrame,
    candidates: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str | None = "source",
    threshold: float = 0.1,
    rnd: int = 9,
) -> DataFrame:
    """(doc_a, doc_b, jaccard): exact shingle-set Jaccard for candidate
    pairs (from LSH, or all same-``group_col`` pairs when None given) —
    the verification stage of near-dup detection."""
    sh = shingles(docs, text_col, id_col).localCheckpoint(eager=True)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    if candidates is None:
        ids = docs.select(F.col(id_col), F.col(group_col).alias("_g"))
        candidates = (
            ids.alias("x")
            .join(ids.alias("y"), "_g")
            .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
            .select(F.col(f"x.{id_col}").alias("doc_a"), F.col(f"y.{id_col}").alias("doc_b"))
        )
    # intersection size via join on (pair, shingle)
    a_sh = sh.select(F.col(id_col).alias("doc_a"), "sh")
    b_sh = sh.select(F.col(id_col).alias("doc_b"), "sh")
    inter = (
        candidates.join(a_sh, "doc_a").join(b_sh, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        candidates.join(inter, ["doc_a", "doc_b"], "left")
        .join(sizes.withColumnRenamed(id_col, "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed(id_col, "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.coalesce("inter", F.lit(0))
                / (F.col("sz_a") + F.col("sz_b") - F.coalesce("inter", F.lit(0))),
                rnd,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, simhash): 32-bit SimHash over token hashes — bit b of the
    result is the sign of Σ_tokens (±1 by bit b of H(token)).  Computed as
    32 conditional-sum aggregates over one exploded token relation."""
    t = tokens(F.col(text_col))
    toks = docs.select(F.col(id_col), F.explode(t).alias("tok")).select(
        id_col, stable_long_hash(F.col("tok")).alias("h")
    )
    aggs = [
        F.sum(
            F.when(F.shiftrightunsigned(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(SIMHASH_BITS)
    ]
    sums = toks.groupBy(id_col).agg(*aggs)
    expr = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0)).cast("long")
        expr = term if expr is None else expr + term
    return sums.select(id_col, expr.alias("simhash"))
