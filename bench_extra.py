"""Supplementary operator benchmarks (guide §1.4: noop-sink isolation).

NOT part of the driver contract — ``bench.py`` is the frozen measured
harness.  This file exists so optimization rounds can time individual
operators (a) without the count()-only column pruning of the suite loop,
and (b) at the 10x candidate volume, with per-step walls.  Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench_extra.py [op ...]

Prints one line per operator: name, wall seconds, rows.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from knowledgegraphsiqidis_spark.session import get_spark  # noqa: E402


def _mk10x(spark, sf_dir: str) -> str:
    """Replicate bench.py's 10x corpus construction (same seeds/shape)."""
    d10 = os.path.join("/tmp", "benchx_" + os.path.basename(sf_dir.rstrip("/")))
    if os.path.exists(os.path.join(d10, "documents.parquet", "_SUCCESS")):
        return d10
    reps10 = spark.range(10).select(F.col("id").cast("int").alias("_rep"))
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    txt = (F.when(F.col("_rep").isin(0, 5), F.col("text"))
           .when(F.col("_rep").isin(1, 6), F.concat_ws(" ", "text", "_rep")))
    for r, m in ((2, "eiouast"), (3, "iouaest"), (4, "ouaiets"),
                 (7, "uaieost"), (8, "aeuiots"), (9, "eoaiuts")):
        txt = txt.when(F.col("_rep") == r,
                       F.concat_ws(" ", F.translate("text", "aeioust", m),
                                   F.lit(str(r))))
    (docs.crossJoin(F.broadcast(reps10))
     .select((F.col("doc_id") + F.col("_rep") * 10_000_000).alias("doc_id"),
             txt.otherwise(F.col("text")).alias("text"),
             "lang", "source", "n_chars")
     .write.mode("overwrite").parquet(os.path.join(d10, "documents.parquet")))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    (emb.crossJoin(F.broadcast(reps10))
     .select((F.col("vec_id") + F.col("_rep") * 10_000_000).alias("vec_id"),
             F.transform("embedding",
                         lambda x, i: x + F.col("_rep").cast("float")
                         * F.sin(i.cast("double")).cast("float") * F.lit(0.01))
             .alias("embedding"), "label")
     .write.mode("overwrite").parquet(os.path.join(d10, "embeddings.parquet")))
    return d10


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    only = set(sys.argv[1:])
    spark = get_spark("kgspark-bench-extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    entrymod._ship_package(spark)

    # --- suite queries, noop-isolated (full column materialization) ---
    for name in ("ngram_jaccard", "ivf_topk", "ann_cosine_topk",
                 "minhash_lsh", "simhash_pairs", "embedding_near_dup",
                 "token_stats", "quality_score", "lang_id", "tpch_q1",
                 "multimodal_meta"):
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"extra:{name}")
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        print(f"{name}: {time.time() - t0:.2f}s", flush=True)

    # --- 10x-volume operator suite (bench.py scale2 shape, dump-free) ---
    if not only or "10x" in only:
        from knowledgegraphsiqidis_spark.operators import dedup, similarity
        d10 = _mk10x(spark, sf_dir)
        docs10 = spark.read.parquet(os.path.join(d10, "documents.parquet"))
        emb10 = spark.read.parquet(os.path.join(d10, "embeddings.parquet"))
        n = docs10.count()
        print(f"10x corpus: {n} docs", flush=True)
        for name, thunk in (
            ("10x_ngram_jaccard", lambda: dedup.ngram_jaccard_pairs(
                docs10, n=3, threshold=0.2, max_df=100)),
            ("10x_minhash_lsh", lambda: dedup.minhash_lsh_pairs(
                docs10, num_hashes=64, bands=16, threshold=0.5)),
            ("10x_simhash_pairs", lambda: dedup.simhash_near_pairs(
                docs10, max_hamming=3)),
            ("10x_ivf_topk", lambda: similarity.ivf_topk(
                emb10, emb10.filter(F.col("vec_id") < 3)
                .select(F.col("vec_id").alias("query_id"),
                        F.col("embedding").alias("query_vec")),
                k=5, n_centroids=16, n_probe=4)),
            ("10x_embedding_near_dup", lambda: dedup.embedding_near_dup(
                docs10, threshold=0.85, n_planes=64, bands=4, max_bucket=64)),
        ):
            spark.sparkContext.setJobDescription(f"extra:{name}")
            t0 = time.time()
            rows = thunk().count()
            print(f"{name}: {time.time() - t0:.2f}s  rows={rows}", flush=True)


if __name__ == "__main__":
    main()
