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


def _plane_table(spark, dim: int, n_planes: int, bands: int, seed: int = 7):
    """Hyperplane normals as a tiny broadcastable DataFrame
    (plane, band, pvec) — deterministic (seeded numpy), generated once on the
    driver.  Replaces the earlier per-dimension-literal construction, whose
    dim × n_planes Catalyst expressions dominated compile time at 768 dims.
    """
    import numpy as np
    rng = np.random.RandomState(seed)
    rows = [(p, p % bands, rng.standard_normal(dim).tolist())
            for p in range(n_planes)]
    return spark.createDataFrame(
        rows, "plane int, band int, pvec array<double>")


def lsh_cosine_pairs(embeddings: DataFrame, dim: int, n_planes: int = 16,
                     bands: int = 4, threshold: float = 0.8,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Near-neighbor pairs via banded random-hyperplane LSH + exact verify.

    OR-amplification across ``bands`` bands of ``n_planes/bands`` planes:
    vectors colliding on ANY full band become candidates (single-band LSH has
    a recall cliff near the threshold), then candidates are verified with the
    exact cosine.  The sign computation is one broadcast join against the
    plane table + one zip_with dot product per (vector, plane) row — all
    JVM-side, plan size independent of the embedding dimension.
    """
    spark = embeddings.sparkSession
    base = (embeddings.select(F.col(id_col).alias("id"),
                              F.col(vec_col).cast("array<double>").alias("v"))
            .localCheckpoint())
    planes = _plane_table(spark, dim, n_planes, bands)
    signs = (base.crossJoin(F.broadcast(planes))
             .select("id", "band", "plane",
                     F.when(_dot(F.col("v"), F.col("pvec")) >= 0, F.lit(1))
                     .otherwise(F.lit(0)).alias("bit")))
    buckets = (signs.groupBy("id", "band")
               .agg(F.concat_ws("", F.transform(
                   F.array_sort(F.collect_list(F.struct("plane", "bit"))),
                   lambda s: s["bit"].cast("string"))).alias("bucket")))
    a = buckets.select(F.col("id").alias("id_a"), "band", "bucket")
    b = buckets.select(F.col("id").alias("id_b"), "band", "bucket")
    cand = (a.join(b, ["band", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").dropDuplicates(["id_a", "id_b"]))
    va = base.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    vb = base.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    return (cand.join(va, "id_a").join(vb, "id_b")
            .withColumn("cosine", _dot(F.col("v_a"), F.col("v_b"))
                        / (_norm(F.col("v_a")) * _norm(F.col("v_b"))))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", F.round("cosine", 4).alias("cosine")))
