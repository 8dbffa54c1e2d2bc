"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exactness baseline. All arithmetic is
  Catalyst ``zip_with``/``aggregate`` in DOUBLE — JVM-side, sequential
  fold, so DuckDB's sequential list functions reproduce it bitwise.
- IVF-style assignment: vectors → nearest of K centroid vectors; the
  scale path searches only the probed cells. (Centroid *training* is
  out of scope; any fixed centroid set works for the partition logic.)

Scale notes (10^9 vectors): broadcast the query/centroid side (small),
keep the corpus partitioned; top-k per query via per-partition top-k +
global top-k merge (same two-phase pattern as the politeness window).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


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


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self excluded).

    Ordering is total — (round(sim,6) DESC, vec_id ASC) — so results are
    parallelism-independent and oracle-comparable."""
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .withColumn("sim", F.round(cosine_col(F.col("q_vec"), F.col("c_vec")), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "vec_id", "sim")
    )


def embedding_near_dups(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tau: float = 0.45,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the 5th dedup modality):
    all pairs id1 < id2 with cosine ≥ tau. All-pairs is the verification
    form; at corpus scale candidates come from the IVF cells /
    random-hyperplane buckets and only candidates are scored."""
    a = corpus.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"))
    b = corpus.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"))
    return (
        a.crossJoin(b)
        .filter(F.col("id1") < F.col("id2"))
        .withColumn("sim", F.round(cosine_col(F.col("v1"), F.col("v2")), 6))
        .filter(F.col("sim") >= tau)
        .select("id1", "id2", "sim")
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its max-cosine centroid (IVF cell build)."""
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    cen = centroids.select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cv"))
    scored = c.crossJoin(F.broadcast(cen)).withColumn(
        "sim", F.round(cosine_col(F.col("v"), F.col("cv")), 6)
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "centroid_id")
    )
