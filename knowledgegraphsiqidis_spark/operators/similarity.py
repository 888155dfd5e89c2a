"""Embedding similarity search (reference F14/F15: FAISS IndexFlatL2 +
brute-force cosine fallback, vector_store.py:84-124) re-expressed for Spark.

  brute-force top-k ... broadcast the query set, cosine via zip_with/aggregate
                        (JVM-side array arithmetic), per-query top-k window
  LSH-bucketed ........ random-hyperplane signs (deterministic pseudo-random
                        planes from xxhash64) → bucket equi-join → exact
                        cosine within bucket — the scale path: the candidate
                        join replaces the O(N·Q) cross product

Embeddings are a plain ``array<float>`` column; there is no index artifact
to persist (the reference's FAISS file, vector_store.py:134-138, has no
Spark analogue — recompute or cache the bucketed table).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                q_id_col: str = "query_id", q_vec_col: str = "query_vec") -> DataFrame:
    """Exact brute-force cosine top-k per query (query set broadcast)."""
    base = embeddings.select(F.col(id_col).alias("vec_id"),
                             F.col(vec_col).cast("array<double>").alias("v"))
    qs = queries.select(F.col(q_id_col).alias("query_id"),
                        F.col(q_vec_col).cast("array<double>").alias("q"))
    sim = (base.crossJoin(F.broadcast(qs))
           .withColumn("cosine", _dot(F.col("v"), F.col("q"))
                       / (_norm(F.col("v")) * _norm(F.col("q"))))
           .filter(F.col("vec_id") != F.col("query_id")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (sim.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "vec_id", "rank",
                    F.round("cosine", 4).alias("cosine")))


def _hyperplane_signs(vec_col, dim: int, n_planes: int):
    """Sign bits against n_planes pseudo-random hyperplanes.

    Plane p's component d = xxhash64(p, d) scaled to [-1, 1] — deterministic,
    identical on every executor, no driver-side randomness.
    """
    bits = []
    for p in range(n_planes):
        comp = F.aggregate(
            F.zip_with(vec_col,
                       F.array(*[(F.xxhash64(F.lit(p), F.lit(d)) % 10007)
                                 .cast("double") / 10007.0 for d in range(dim)]),
                       lambda x, h: x * (h * 2 - 1)),
            F.lit(0.0), lambda acc, v: acc + v)
        bits.append(F.when(comp >= 0, F.lit(1)).otherwise(F.lit(0)))
    return F.concat_ws("", *[b.cast("string") for b in bits])


def lsh_cosine_pairs(embeddings: DataFrame, dim: int, n_planes: int = 8,
                     threshold: float = 0.8, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Near-neighbor pairs via random-hyperplane LSH buckets + exact verify."""
    base = embeddings.select(F.col(id_col).alias("id"),
                             F.col(vec_col).cast("array<double>").alias("v"))
    bucketed = base.withColumn("bucket", _hyperplane_signs(F.col("v"), dim, n_planes))
    a = bucketed.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"), "bucket")
    b = bucketed.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"), "bucket")
    return (a.join(b, "bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", _dot(F.col("v_a"), F.col("v_b"))
                        / (_norm(F.col("v_a")) * _norm(F.col("v_b"))))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", F.round("cosine", 4).alias("cosine")))
