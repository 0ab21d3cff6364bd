"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — query set ⨯ corpus cross
  join with the dot product folded JVM-side (``F.zip_with`` +
  ``F.aggregate`` in float64, sequential fold = deterministic).  The
  correctness baseline; O(|Q|·N).
- ``ivf_topk``: IVF-style two-stage ANN — coarse-quantize the corpus
  into cells (here: the provided partition/label column, standing in
  for k-means cells), probe the ``nprobe`` nearest centroids per query,
  then exact-rank only inside probed cells.  At 100 TB this turns a full
  scan into a broadcast-join against centroids plus a cell-pruned scan
  (cells are parquet partitions → partition pruning does the skip).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rnd: int = 6,
) -> DataFrame:
    """(query_id, neighbor_id, cos_sim, rank): exact top-k by cosine.

    Ranking happens on the *rounded* similarity (ties then broken by
    neighbor id) so results are reproducible across engines and
    partitionings — float64 noise is ~1e-16, far below the rounding step.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    sims = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), rnd).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long"))
    )


def centroids(corpus: DataFrame, cell_col: str = "label", vec_col: str = "embedding") -> DataFrame:
    """(cell, centroid): element-wise mean per cell — the coarse quantizer
    codebook (stand-in for a k-means fit; deterministic)."""
    dim_df = corpus.select(F.size(vec_col).alias("d")).limit(1)
    dim = dim_df.first()["d"]
    agg = [
        F.avg(F.element_at(F.col(vec_col), i + 1).cast("double")).alias(f"c{i}")
        for i in range(dim)
    ]
    per_cell = corpus.groupBy(F.col(cell_col).alias("cell")).agg(*agg)
    return per_cell.select(
        "cell", F.array(*[F.col(f"c{i}") for i in range(dim)]).alias("centroid")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    cell_col: str = "label",
    vec_col: str = "embedding",
    rnd: int = 6,
) -> DataFrame:
    """Approximate top-k: rank only vectors in the ``nprobe`` cells whose
    centroids are closest (cosine) to the query."""
    cents = F.broadcast(centroids(corpus, cell_col, vec_col))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    scored_cells = q.crossJoin(cents).select(
        "query_id",
        "_qv",
        "cell",
        cosine(F.col("_qv"), F.col("centroid")).alias("_cs"),
    )
    wcell = Window.partitionBy("query_id").orderBy(F.desc("_cs"), F.asc("cell"))
    probed = (
        scored_cells.withColumn("_r", F.row_number().over(wcell))
        .filter(F.col("_r") <= nprobe)
        .select("query_id", "_qv", "cell")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(cell_col).alias("cell"),
        F.col(vec_col).alias("_cv"),
    )
    sims = (
        probed.join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), rnd).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long"))
    )
