"""Similarity search over embedding columns (``array<float>``).

Two paths, same answer shape (query_id, neighbor_id, score, rank):

* brute force — exact baseline. The query set is broadcast (it's the
  small side by construction), so the scan over N corpus vectors is
  embarrassingly parallel with NO shuffle of the corpus; per-row
  cosine is a higher-order-function expression (JVM, codegen).
* LSH (random hyperplanes) — the scale path: corpus is bucketed by a
  b-bit signature once (narrow), then only same-bucket candidates are
  scored. Multi-probe (flipping one bit) trades compute for recall.

At 100 TB the brute-force path is one full scan per query batch —
fine for ad-hoc top-k with a broadcastable query set; the LSH path
cuts the scored fraction to ~2^-b * (1+b) with multi-probe radius 1.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from toshokan_spark.operators.dedup import cosine_sim, dot_product, sq_norm
from toshokan_spark.operators.util import spread


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``broadcast(queries)`` keeps the corpus un-shuffled; the global
    top-k per query is a window over (query, score) — Catalyst turns
    the rank filter into a per-partition partial top-k before the
    exchange when AQE is on.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
        ).withColumn("qn2", sq_norm(F.col("qv")))
    )
    c = spread(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    ).withColumn("cn2", sq_norm(F.col("cv")))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "score",
            dot_product(F.col("qv"), F.col("cv"))
            / F.sqrt(F.col("qn2") * F.col("cn2")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("score", 6).alias("score"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# random-hyperplane LSH
# ---------------------------------------------------------------------------

def _plane_component(p: int, j: Column) -> Column:
    """Deterministic ±1 hyperplane component (seeded by plane index p
    and dimension j) — the classic sign-random-projection family
    (Charikar 2002), reproducible with no stored model."""
    return (F.xxhash64(F.lit(p), j).bitwiseAND(F.lit(1)) * 2 - 1).cast("double")


def hyperplane_signature(vec: Column, num_planes: int = 16) -> Column:
    """b-bit signature: bit p = sign(<v, r_p>) with r_p ∈ {±1}^d."""
    idx = F.sequence(F.lit(0), F.size(vec) - 1)

    def dot_with_plane(p: int):
        # closure, not a default arg — zip_with lambdas must be 2-param
        return F.aggregate(
            F.zip_with(
                vec, idx, lambda x, j: x.cast("double") * _plane_component(p, j)
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    bits = [
        F.when(dot_with_plane(p) > 0, F.lit(1)).otherwise(F.lit(0))
        for p in range(num_planes)
    ]
    out = F.lit(0).cast("long")
    for b in bits:
        out = out * 2 + b
    return out


def random_hyperplane_bucket(vec: Column, bits: int = 8) -> Column:
    """Coarse bucket id for blocking (e.g. embedding_dup_pairs)."""
    return hyperplane_signature(vec, bits)


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    num_planes: int = 8,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors whose hyperplane
    signature matches the query's bucket (or differs by one bit with
    multiprobe). Same output shape as knn_bruteforce; recall < 1 by
    construction — the point is scoring ~(1+b)/2^b of the corpus.
    """
    c = spread(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    ).select(
        "neighbor_id",
        "cv",
        hyperplane_signature(F.col("cv"), num_planes).alias("bucket"),
        sq_norm(F.col("cv")).alias("cn2"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        hyperplane_signature(F.col(vec_col), num_planes).alias("qbucket"),
        sq_norm(F.col(vec_col)).alias("qn2"),
    )
    if multiprobe:
        probes = F.array(
            F.col("qbucket"),
            *[
                F.col("qbucket").bitwiseXOR(F.lit(1 << i))
                for i in range(num_planes)
            ],
        )
        q = q.withColumn("bucket", F.explode(probes)).drop("qbucket")
    else:
        q = q.withColumnRenamed("qbucket", "bucket")
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "score",
            dot_product(F.col("qv"), F.col("cv"))
            / F.sqrt(F.col("qn2") * F.col("cn2")),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("score", 6).alias("score"), "rank")
    )
