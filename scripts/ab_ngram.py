"""A/B harness for ngram_jaccard_pairs variants (fresh session per run).

Variants:
  cur      — the package's current implementation
  r7groups — global distinct + cache filtered sh + collect_list groups pairs
  selfjoin — array_distinct + cache filtered sh + posting self-join pairs
  distonly — array_distinct + cache filtered sh + collect_list groups pairs
  r6self   — global distinct + cache filtered sh + posting self-join pairs

Usage: python scripts/ab_ngram.py <sf_dir> <variant> [variant ...]
Prints: variant, wall seconds, pair count, xor checksum.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from knowledgegraphsiqidis_spark.session import get_spark  # noqa: E402
from knowledgegraphsiqidis_spark.operators.dedup import (  # noqa: E402
    ngram_jaccard_pairs)

_TOKEN_SPLIT = r"\s+"


def _shingles(docs, n=3, array_dist=True):
    toks = docs.select(F.col("doc_id").alias("id"),
                       F.split(F.lower(F.col("text")), _TOKEN_SPLIT).alias("t"))
    expr = F.transform(
        F.sequence(F.lit(0), F.size("t") - n),
        lambda i: F.concat_ws(" ", F.slice("t", i + 1, n)))
    if array_dist:
        return toks.filter(F.size("t") >= n).select(
            "id", F.explode(F.array_distinct(expr)).alias("shingle"))
    sh = toks.filter(F.size("t") >= n).select(
        "id", F.explode(expr).alias("shingle"))
    return sh.distinct()


def _finish(inter, sizes, threshold):
    sz_a = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (inter.join(sz_a, "id_a").join(sz_b, "id_b")
            .withColumn("jaccard", F.col("inter")
                        / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def _groups_pairs(sh):
    groups = (sh.groupBy("shingle")
              .agg(F.array_sort(F.collect_list("id")).alias("ids"))
              .filter(F.size("ids") >= 2))
    pairs = F.explode(F.flatten(F.transform(
        "ids", lambda x, i: F.transform(
            F.slice("ids", i + F.lit(2), F.size("ids")),
            lambda y: F.struct(x.alias("id_a"), y.alias("id_b"))))))
    return (groups.select(pairs.alias("p"))
            .select("p.id_a", "p.id_b")
            .groupBy("id_a", "id_b").agg(F.count("*").alias("inter")))


def _selfjoin_pairs(sh):
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    return (a.join(b, "shingle")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b").agg(F.count("*").alias("inter")))


def variant(docs, name, n=3, threshold=0.2, max_df=100):
    if name == "cur":
        return ngram_jaccard_pairs(docs, n=n, threshold=threshold,
                                   max_df=max_df)
    array_dist = name in ("selfjoin", "distonly")
    sh = _shingles(docs, n, array_dist=array_dist)
    hot = (sh.groupBy("shingle").agg(F.count("*").alias("df"))
           .filter(F.col("df") > max_df).select("shingle"))
    sh = sh.join(hot, "shingle", "left_anti").cache()
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    if name in ("selfjoin", "r6self"):
        inter = _selfjoin_pairs(sh)
    else:
        inter = _groups_pairs(sh)
    return _finish(inter, sizes, threshold)


def main():
    sf_dir = sys.argv[1]
    spark = get_spark("ab-ngram",
                      master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    for name in sys.argv[2:]:
        t0 = time.time()
        df = variant(docs, name)
        r = df.agg(F.count("*").alias("n"),
                   F.expr("bit_xor(xxhash64(id_a, id_b, round(jaccard, 4)))")
                   .alias("x")).collect()[0]
        print(f"{name}: {time.time()-t0:.2f}s  n={r['n']}  xor={r['x']}",
              flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
