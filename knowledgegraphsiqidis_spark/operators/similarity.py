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

from .dedup import _spread


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                q_id_col: str = "query_id", q_vec_col: str = "query_vec") -> DataFrame:
    """Exact brute-force cosine top-k per query (query set broadcast).

    Norms are hoisted out of the per-(vector, query) cosine: ``_norm(v)``
    is computed once per base row and ``_norm(q)`` once per query row
    BEFORE the cross join, instead of re-folding both 64-element arrays
    for every joined pair (HOF folds are interpreted per element — guide
    §4.1).  Bit-identical: the same fold expression produces the same
    double, and the division tree ``dot / (vn * qn)`` is unchanged.
    """
    base = _spread(embeddings).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"))
    base = base.withColumn("_vn", _norm(F.col("v")))
    qs = (queries.select(F.col(q_id_col).alias("query_id"),
                         F.col(q_vec_col).cast("array<double>").alias("q"))
          .withColumn("_qn", _norm(F.col("q"))))
    sim = (base.crossJoin(F.broadcast(qs))
           .withColumn("cosine", _dot(F.col("v"), F.col("q"))
                       / (F.col("_vn") * F.col("_qn")))
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


def _band_plane_table(spark, dim: int, n_planes: int, bands: int,
                      seed: int = 7):
    """``_plane_table`` pre-grouped per band: (band, pvecs) with the band's
    plane normals in ascending plane order — IDENTICAL vectors (same rng
    draw sequence), so buckets computed from it match the flat table's
    bit-for-bit.  Lets the sign computation emit one row per (vector,
    band) directly instead of per (vector, plane) + a groupBy."""
    import numpy as np
    rng = np.random.RandomState(seed)
    planes = [rng.standard_normal(dim).tolist() for _ in range(n_planes)]
    return spark.createDataFrame(
        [(b, [planes[p] for p in range(n_planes) if p % bands == b])
         for b in range(bands)],
        "band int, pvecs array<array<double>>")


def lsh_cosine_pairs(embeddings: DataFrame, dim: int, n_planes: int = 16,
                     bands: int = 4, threshold: float = 0.8,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     max_bucket: int | None = None) -> DataFrame:
    """Near-neighbor pairs via banded random-hyperplane LSH + exact verify.

    OR-amplification across ``bands`` bands of ``n_planes/bands`` planes:
    vectors colliding on ANY full band become candidates (single-band LSH has
    a recall cliff near the threshold), then candidates are verified with the
    exact cosine.  The sign computation is one broadcast join against the
    plane table + one zip_with dot product per (vector, plane) row — all
    JVM-side, plan size independent of the embedding dimension.

    ``max_bucket`` caps per-(band, bucket) occupancy at the earliest
    ``max_bucket`` ids (deterministic; the ER ``max_block`` analogue): a
    hot bucket is an exact/near-dup CLIQUE (identical vectors collide in
    every band) or boilerplate cluster, where the first K members already
    connect the component for dedup purposes, and pair output within a
    bucket is otherwise O(occupancy²) — the measured failure mode at 10×
    candidate volume (bench scale2: 4-bit buckets at 50k docs → 3.6M
    verified pairs, 18 min).  None = uncapped (exact pair set; the
    CORRECTNESS oracle replicates the uncapped banding).  At corpus scale
    also widen the bands: ``n_planes/bands`` bits per bucket should grow
    with log₂(N) so random collisions stay O(1) per vector.
    """
    spark = embeddings.sparkSession
    # ``vn`` rides the checkpoint: the exact-verify join otherwise re-folds
    # both vectors' norms per CANDIDATE PAIR (two interpreted 64-element
    # folds per pair — guide §4.1); computing it once per vector at
    # checkpoint build is bit-identical (same fold expression, same
    # double) and roughly halves the verify stage's per-pair arithmetic.
    base = (_spread(embeddings)
            .select(F.col(id_col).alias("id"),
                    F.col(vec_col).cast("array<double>").alias("v"))
            .withColumn("vn", _norm(F.col("v")))
            .localCheckpoint())
    # One row per (vector, band) with the bucket bit-string computed in a
    # single projection over the band's plane array — replaces the r6
    # (vector × plane) crossJoin + groupBy(id, band)/collect_list/sort,
    # which materialized and shuffled an N×n_planes intermediate.  Bucket
    # strings are identical: same plane vectors (same rng sequence), same
    # ascending-plane bit order, same >= 0 sign rule.
    bplanes = _band_plane_table(spark, dim, n_planes, bands)
    buckets = (base.crossJoin(F.broadcast(bplanes))
               .select("id", "band",
                       F.concat_ws("", F.transform(
                           "pvecs",
                           lambda p: F.when(_dot(F.col("v"), p) >= 0,
                                            F.lit("1")).otherwise(F.lit("0"))))
                       .alias("bucket")))
    if max_bucket is not None:
        w = Window.partitionBy("band", "bucket").orderBy("id")
        buckets = (buckets.withColumn("_rn", F.row_number().over(w))
                   .filter(F.col("_rn") <= max_bucket).drop("_rn"))
    a = buckets.select(F.col("id").alias("id_a"), "band", "bucket")
    b = buckets.select(F.col("id").alias("id_b"), "band", "bucket")
    cand = (a.join(b, ["band", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").dropDuplicates(["id_a", "id_b"]))
    va = base.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"),
                     F.col("vn").alias("vn_a"))
    vb = base.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"),
                     F.col("vn").alias("vn_b"))
    return (cand.join(va, "id_a").join(vb, "id_b")
            .withColumn("cosine", _dot(F.col("v_a"), F.col("v_b"))
                        / (F.col("vn_a") * F.col("vn_b")))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", F.round("cosine", 4).alias("cosine")))


def _kmeans_centroids(sample_vecs, n_centroids: int, iters: int, seed: int):
    """Deterministic Lloyd's k-means on a bounded driver-side sample
    (numpy; cosine geometry via L2-normalized vectors, so nearest-centroid
    by dot product == by cosine).  Returns (n_centroids, dim) float64."""
    import numpy as np
    x = np.asarray(sample_vecs, dtype=np.float64)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    x = x / np.where(norms == 0, 1.0, norms)
    rng = np.random.RandomState(seed)
    k = min(n_centroids, len(x))
    cents = x[rng.choice(len(x), size=k, replace=False)]
    for _ in range(iters):
        sims = x @ cents.T                        # (n, k) dot == cosine
        assign = sims.argmax(axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cents[c] = m / n
    return cents


def ivf_train(embeddings: DataFrame, n_centroids: int = 64,
              train_sample: int = 20_000, kmeans_iters: int = 5,
              seed: int = 7, id_col: str = "vec_id",
              vec_col: str = "embedding") -> list:
    """The IVF coarse quantizer's training step, exposed: deterministic
    k-means over the same bounded sample ``ivf_topk`` uses internally.
    Returns the centroid list (list of list[float]; empty when the input
    is empty) — persistable as a tiny table so assignment/probe/top-k can
    be independently re-derived (the DuckDB oracle does exactly that)."""
    base = embeddings.select(F.col(id_col).alias("vec_id"),
                             F.col(vec_col).cast("array<double>").alias("v"))
    sample = [r["v"] for r in
              base.orderBy("vec_id").limit(train_sample).collect()]
    if not sample:
        return []
    return _kmeans_centroids(sample, n_centroids, kmeans_iters, seed).tolist()


def ivf_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 64, n_probe: int = 4,
             train_sample: int = 20_000, kmeans_iters: int = 5,
             seed: int = 7, id_col: str = "vec_id",
             vec_col: str = "embedding", q_id_col: str = "query_id",
             q_vec_col: str = "query_vec",
             centroids: list | None = None) -> DataFrame:
    """IVF-partitioned ANN top-k — the coarse-quantizer scale path
    (FAISS IndexIVFFlat's shape; the reference persists an exhaustive
    IndexFlatL2, vector_store.py:84-124, which ``cosine_topk`` mirrors).

    Train: deterministic k-means on a seeded, bounded sample collected to
    the driver (the centroid table is tiny and broadcast — the one piece of
    ANN state worth centralizing; at 100 TB you'd train on the same bounded
    sample).  Assign: every vector computes all cell cosines against the
    LITERAL centroid array and keeps the argmax — one shuffle-free
    projection, JVM-side, no Python in the plan (r7: replaced the
    crossJoin + row_number window, whose N×n_centroids intermediate and
    full sort were the operator's scale-invariant overhead).  Search: each
    query probes its ``n_probe``
    nearest cells; exact cosine runs only inside probed cells, so the
    candidate join replaces the O(N·Q) cross product with O(N·Q·n_probe/
    n_centroids) expected work.  A vector lives in exactly one cell, so no
    cross-probe dedup is needed.  With ``n_probe >= n_centroids`` every
    cell is probed and the result equals ``cosine_topk`` exactly (the
    recall-1.0 identity the test pins).  Hot cells (skewed data) bound the
    worst case — raise ``n_centroids`` or pre-split oversized cells the
    same way resolve's blocking caps df-heavy keys.
    """
    base = _spread(embeddings).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"))
    if centroids is None:
        sample = [r["v"] for r in
                  base.orderBy("vec_id").limit(train_sample).collect()]
        centroids = (_kmeans_centroids(sample, n_centroids, kmeans_iters,
                                       seed).tolist() if sample else [])
    if not centroids:
        # no vectors → no cells to train; raising inside _kmeans_centroids
        # ((0,)-shaped norm / choice(0)) was the ADVICE r5 crash.  The
        # empty frame keeps the inputs' id types.
        return (queries.select(F.col(q_id_col).alias("query_id")).limit(0)
                .crossJoin(base.select("vec_id").limit(0))
                .select("query_id", "vec_id",
                        F.lit(0).cast("int").alias("rank"),
                        F.lit(0.0).alias("cosine")))
    # Centroids as a LITERAL array<array<double>> expression: assignment is
    # one shuffle-free projection computing all cell cosines per row and an
    # array argmax, replacing the r6 crossJoin(centroid table) + per-vector
    # row_number window (an N×n_centroids intermediate plus a full shuffle
    # and sort by vec_id, measured as most of the operator's scale-
    # invariant ~7 s overhead).  Float math is identical: the same _dot/
    # _norm fold expressions evaluate over literal arrays, and ties break
    # to the smallest cid exactly like the old (desc _cs, asc cid) window —
    # array_max on struct(cs, -cid) picks max cs then min cid.  This also
    # removes both eager localCheckpoints (the pinned-result leak ADVICE r6
    # flagged): the function is lazy again and pins nothing.
    # one true nested Literal, not CreateArray-of-CreateArrays — the latter
    # re-evaluates n_centroids×dim literal nodes per row (measured as a 10x
    # ivf regression before this fix)
    cents = F.lit([[float(x) for x in c] for c in centroids])
    # Centroid norms precomputed ON THE DRIVER with the exact fold sequence
    # the _norm expression evaluates (acc = 0.0; acc += x*x left-to-right;
    # sqrt) — Python floats are IEEE doubles, so the literal equals the
    # per-row fold's result bit-for-bit.  Row norms (_vn/_qn) are computed
    # once per row instead of once per (row, cell): the old _cell_sims
    # re-folded BOTH norms inside the per-cell lambda, tripling the
    # interpreted per-element work of assignment and probe selection
    # (guide §4.1; measured as most of the operator's cost at 10x volume).
    # The division tree dot/(vn*nc) is unchanged, so cosines are identical.

    import math

    def _py_norm(c):
        acc = 0.0
        for x in c:
            acc += float(x) * float(x)
        return math.sqrt(acc)

    cnorms = F.lit([_py_norm(c) for c in centroids])

    def _cell_sims(vcol, vn):
        return F.transform(cents, lambda c, i: _dot(vcol, c)
                           / (vn * F.element_at(cnorms, i + 1)))

    best = F.array_max(F.transform(
        _cell_sims(F.col("v"), F.col("_vn")),
        lambda s, i: F.struct(s.alias("cs"), (-i).alias("ncid"))))
    assigned = (base.withColumn("_vn", _norm(F.col("v")))
                .select("vec_id", "v", "_vn", (-best["ncid"]).alias("cid")))
    qs = (queries.select(F.col(q_id_col).alias("query_id"),
                         F.col(q_vec_col).cast("array<double>").alias("q"))
          .withColumn("_qn", _norm(F.col("q"))))
    probe_cells = F.slice(F.array_sort(F.transform(
        _cell_sims(F.col("q"), F.col("_qn")),
        lambda s, i: F.struct((-s).alias("ncs"), i.alias("cid")))),
        1, n_probe)
    probes = (qs.select("query_id", "q", "_qn",
                        F.explode(probe_cells).alias("pc"))
              .select("query_id", "q", "_qn", F.col("pc.cid").alias("cid")))
    sim = (assigned.join(F.broadcast(probes), "cid")
           .withColumn("cosine", _dot(F.col("v"), F.col("q"))
                       / (F.col("_vn") * F.col("_qn")))
           .filter(F.col("vec_id") != F.col("query_id")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("vec_id"))
    return (sim.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "vec_id", "rank",
                    F.round("cosine", 4).alias("cosine")))
