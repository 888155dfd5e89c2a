"""Synthesize a larger sf dir by deterministic 10x replication of sf0.1.

For LOCAL optimization A/B only — the driver generates its own sf1.0; this
replica just reproduces the row-count scale (50k docs / 20k embeddings /
6M lineitem) so in-suite session effects can be measured on this host.
Unlike bench.py's dedup10x corpus, every replica here is DISTINCT (per-rep
character translation + rep suffix, no planted exact/near dups), matching
a real larger corpus' shape for the suite queries.

Usage: python scripts/synth_sf.py [/tmp/sf1.0synth]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from knowledgegraphsiqidis_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
BIG = 100_000_000

def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0synth"
    spark = get_spark("synth-sf", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    spark.sparkContext.setLogLevel("ERROR")
    reps = spark.range(10).select(F.col("id").cast("int").alias("_rep"))

    def rep10(name, keycols, shift=BIG):
        df = spark.read.parquet(os.path.join(SRC, f"{name}.parquet"))
        r = df.crossJoin(F.broadcast(reps))
        for k in keycols:
            r = r.withColumn(k, F.col(k) + F.col("_rep").cast("long") * shift)
        return r.drop("_rep")

    # star schema: shift every key family consistently so joins stay 1:1
    rep10("orders", ["o_orderkey", "o_custkey"]).write.mode("overwrite") \
        .parquet(os.path.join(out, "orders.parquet"))
    rep10("customer", ["c_custkey"]).write.mode("overwrite") \
        .parquet(os.path.join(out, "customer.parquet"))
    rep10("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"]) \
        .write.mode("overwrite").parquet(os.path.join(out, "lineitem.parquet"))
    rep10("part", ["p_partkey"]).write.mode("overwrite") \
        .parquet(os.path.join(out, "part.parquet"))
    rep10("supplier", ["s_suppkey"]).write.mode("overwrite") \
        .parquet(os.path.join(out, "supplier.parquet"))
    rep10("events", []).write.mode("overwrite") \
        .parquet(os.path.join(out, "events.parquet"))
    for name in ("region", "nation"):
        spark.read.parquet(os.path.join(SRC, f"{name}.parquet")) \
            .write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))

    # documents: replica r>0 of doc d = first token-half of doc d + second
    # token-half of doc (d + 137r) mod N + a distinct suffix.  Keeps the
    # REAL vocabulary so per-shingle document frequency scales ~10x like a
    # same-generator corpus would (the translate scheme produced disjoint
    # vocabularies per replica, understating df growth and pair volume).
    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    n_docs = docs.count()
    halves = docs.select(
        "doc_id", "lang", "source", "n_chars",
        F.split("text", r"\s+").alias("t")).select(
        "doc_id", "lang", "source", "n_chars",
        F.concat_ws(" ", F.expr(
            "slice(t, 1, cast(size(t)/2 as int))")).alias("h1"),
        F.concat_ws(" ", F.expr(
            "slice(t, cast(size(t)/2 as int) + 1, size(t))")).alias("h2"))
    h2 = halves.select(F.col("doc_id").alias("_d2"), F.col("h2").alias("_h2"))
    mix = (halves.crossJoin(F.broadcast(reps))
           .withColumn("_d2", (F.col("doc_id") + F.col("_rep") * 137)
                       % n_docs)
           .join(h2, "_d2"))
    txt = (F.when(F.col("_rep") == 0, F.concat_ws(" ", "h1", "h2"))
           .otherwise(F.concat_ws(" ", "h1", "_h2",
                                  F.col("_rep").cast("string"))))
    (mix.select((F.col("doc_id") + F.col("_rep").cast("long") * 10_000_000)
                .alias("doc_id"),
                txt.alias("text"), "lang", "source", "n_chars")
     .write.mode("overwrite").parquet(os.path.join(out, "documents.parquet")))

    emb = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    (emb.crossJoin(F.broadcast(reps))
     .select((F.col("vec_id") + F.col("_rep").cast("long") * 10_000_000)
             .alias("vec_id"),
             F.transform("embedding",
                         lambda x, i: x + F.col("_rep").cast("float")
                         * F.sin(i.cast("double")).cast("float") * F.lit(0.01))
             .alias("embedding"), "label")
     .write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet")))
    print("wrote", out)


if __name__ == "__main__":
    main()
