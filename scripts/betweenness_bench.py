"""Measure the multi-source batched betweenness against the round-3
per-source driver loop (VERDICT r3 item 2 acceptance: >=5x at
n_sources=100 on an sf0.01-sized graph, identical scores).

The loop implementation is inlined here verbatim as the measurement
baseline (it no longer exists in the package).

Usage: python scripts/betweenness_bench.py [n_nodes] [n_edges] [n_sources]
Prints one JSON line: {"loop_sec": ..., "batched_sec": ..., "speedup": ...,
"scores_equal": true}
"""
import json
import random
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from knowledgegraphsiqidis_spark.operators.analytics import (  # noqa: E402
    betweenness_sampled)


def _loop_betweenness(nodes, edges, n_sources=8, max_depth=6):
    """The round-3 sequential per-source implementation (baseline)."""
    spark = edges.sparkSession
    sym = (edges.select("src", "dst")
           .unionAll(edges.select(F.col("dst").alias("src"),
                                  F.col("src").alias("dst")))
           .distinct().localCheckpoint())
    sources = [r["id"] for r in
               nodes.select("id").orderBy("id").limit(n_sources).collect()]
    total = None
    for s in sources:
        frontier = spark.createDataFrame([(s, 1.0)],
                                         "id string, sigma double") \
            .localCheckpoint()
        levels = [frontier]
        visited = frontier.select("id").localCheckpoint()
        for _ in range(max_depth):
            nxt = (frontier.join(sym, frontier.id == sym.src)
                   .select(F.col("dst").alias("id"), "sigma")
                   .join(visited, "id", "left_anti")
                   .groupBy("id").agg(F.sum("sigma").alias("sigma"))
                   .localCheckpoint())
            if nxt.isEmpty():
                break
            levels.append(nxt)
            visited = visited.unionAll(nxt.select("id")).localCheckpoint()
            frontier = nxt
        delta = levels[-1].select("id", F.lit(0.0).alias("delta"))
        for d in range(len(levels) - 1, 0, -1):
            child = (levels[d].join(delta, "id")
                     .select("id", "sigma", "delta"))
            contrib = (child.join(sym, child.id == sym.src)
                       .select(F.col("dst").alias("pid"),
                               ((F.lit(1.0) + F.col("delta"))
                                / F.col("sigma")).alias("part"))
                       .join(levels[d - 1].select(F.col("id").alias("pid"),
                                                  F.col("sigma")
                                                  .alias("psig")), "pid")
                       .groupBy("pid").agg(F.sum("part").alias("ratio")))
            parent_delta = (levels[d - 1]
                            .join(contrib, levels[d - 1].id == contrib.pid,
                                  "left")
                            .select("id", "sigma",
                                    (F.col("sigma")
                                     * F.coalesce("ratio", F.lit(0.0)))
                                    .alias("delta")))
            acc = parent_delta.filter(F.col("id") != s).select("id", "delta")
            total = acc if total is None else total.unionAll(acc)
            delta = parent_delta.select("id", "delta").localCheckpoint()
        if total is not None:
            total = total.localCheckpoint()
    if total is None:
        return nodes.select("id", F.lit(0.0).alias("betweenness"))
    scores = total.groupBy("id").agg((F.sum("delta") / 2.0)
                                     .alias("betweenness"))
    return (nodes.select("id").join(scores, "id", "left")
            .fillna(0.0, subset=["betweenness"]))


def main():
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 15_000
    n_sources = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .appName("betweenness-bench").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    rng = random.Random(7)
    ids = [f"n{i:06d}" for i in range(n_nodes)]
    edges = [(rng.choice(ids), rng.choice(ids)) for _ in range(n_edges)]
    nodes_df = spark.createDataFrame([(i,) for i in ids], "id string") \
        .localCheckpoint()
    edges_df = spark.createDataFrame(edges, "src string, dst string") \
        .localCheckpoint()

    t0 = time.time()
    batched = {r["id"]: r["betweenness"] for r in betweenness_sampled(
        nodes_df, edges_df, n_sources=n_sources).collect()}
    t_batched = time.time() - t0

    t0 = time.time()
    loop = {r["id"]: r["betweenness"] for r in _loop_betweenness(
        nodes_df, edges_df, n_sources=n_sources).collect()}
    t_loop = time.time() - t0

    equal = (set(loop) == set(batched)
             and all(abs(loop[k] - batched[k]) < 1e-9 for k in loop))
    print(json.dumps({"n_nodes": n_nodes, "n_edges": n_edges,
                      "n_sources": n_sources,
                      "loop_sec": round(t_loop, 2),
                      "batched_sec": round(t_batched, 2),
                      "speedup": round(t_loop / max(t_batched, 1e-9), 1),
                      "scores_equal": equal}))


if __name__ == "__main__":
    main()
