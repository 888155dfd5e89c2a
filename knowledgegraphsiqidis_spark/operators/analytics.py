"""Graph analytics over the materialized nodes/edges tables.

DataFrame re-expressions of the reference's in-process Python analytics:

  degree / top-k ............ graph_exporter.py:69-86, 275-288 (A2/W1)
  in/out degree + diversity .. server.py:1126-1137 (A3)
  relation pattern histogram . server.py:1602-1618 (A5)
  bidirectional pairs ........ server.py:1620-1635 (J10)
  induced subgraph ........... graph_exporter.py:109-116 (J4)
  n-hop neighborhood ......... database.py:340-365 (G7)
  shortest path (BFS) ........ nl_query.py:947-991 (G8)
  PageRank ................... graph_inference.py:71-209 (G11) — the
      reference's O(V²)-per-iteration API variant (server.py:1032-1054) is
      deliberately NOT ported; this is the standard out-degree-normalized
      contribution join, O(E) per iteration
  connected clusters ......... server.py:1982-2022 (G13)
  graph stats ................ database.py:628-657 (A1)

Iterative algorithms are driver-loops over DataFrame joins with
localCheckpoint per iteration — no RDDs, no collect of graph data.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .components import connected_components


def _unpin(df: DataFrame | None) -> None:
    """Free a ``localCheckpoint()``'d DataFrame's pinned blocks.

    The checkpointed plan is a LogicalRDD; unpersisting its backing RDD
    discards the data AND its lineage (localCheckpoint truncates), so this
    must only run once every consumer of ``df`` has been materialized into
    another checkpoint.  No-op (exception swallowed) for non-checkpointed
    plans.
    """
    if df is None:
        return
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def _unpin_quiesced(spark, *dfs) -> None:
    """``_unpin`` each frame only after the scheduler has gone quiet.

    Under AQE an eager ``localCheckpoint()`` can leave DETACHED stage jobs
    running (superseded broadcast/stage materializations nothing awaits);
    unpinning while one still references a frame makes the orphan die with a
    logged CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND task failure, and on some hosts
    the failed job's reference kept the block pinned (the
    ``test_betweenness_releases_pinned_levels`` flake, VERDICT r6 #1).
    Waiting for ``getActiveJobsIds()`` to drain makes the release
    deterministic; the poll costs one status call when nothing is running.

    A single quiet sample is NOT enough: AQE submits some of its detached
    materializations from async threads (broadcast-exchange futures,
    superseded stage re-optimizations), so a job can be REGISTERED
    milliseconds after the drain check and then die on the freed block
    (the CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND noise reproduced 1-in-3 in the
    contract harness even after the drain barrier).  Require the scheduler
    to stay quiet across three consecutive 50 ms-spaced samples before
    releasing — a submission gap inside one sample window restarts the
    wait; the 5 s cap still bounds the barrier.
    """
    import time
    try:
        tracker = spark.sparkContext.statusTracker()
        deadline = time.time() + 5.0
        quiet = 0
        while quiet < 3 and time.time() < deadline:
            if tracker.getActiveJobsIds():
                quiet = 0
                time.sleep(0.02)
            else:
                quiet += 1
                if quiet < 3:
                    time.sleep(0.05)
    except Exception:
        pass
    for df in dfs:
        _unpin(df)


def degree(edges: DataFrame) -> DataFrame:
    """Connection count per entity (UNION ALL of endpoints, then count)."""
    ends = edges.select(F.col("src").alias("id")).unionAll(
        edges.select(F.col("dst").alias("id")))
    return ends.groupBy("id").agg(F.count("*").alias("connections"))


def top_connected(nodes: DataFrame, edges: DataFrame, k: int = 10) -> DataFrame:
    """Top-k nodes by connection count (TakeOrderedAndProject plan)."""
    return (nodes.join(degree(edges), "id", "left")
            .fillna(0, subset=["connections"])
            .orderBy(F.desc("connections"), F.asc("canonical_name"))
            .select("canonical_name", "type", "connections")
            .limit(k))


def degree_diversity(edges: DataFrame) -> DataFrame:
    """Out/in degree + relation-type diversity per node (A3)."""
    out_d = edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("out_degree"),
        F.countDistinct("relation_type").alias("out_rel_types"))
    in_d = edges.groupBy(F.col("dst").alias("id")).agg(
        F.count("*").alias("in_degree"),
        F.countDistinct("relation_type").alias("in_rel_types"))
    return (out_d.join(in_d, "id", "full")
            .fillna(0))


def relation_patterns(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """(src_type)-[rel]->(dst_type) histogram (A5)."""
    s = nodes.select(F.col("id").alias("src"), F.col("type").alias("src_type"))
    t = nodes.select(F.col("id").alias("dst"), F.col("type").alias("dst_type"))
    return (edges.join(F.broadcast(s), "src").join(F.broadcast(t), "dst")
            .groupBy("src_type", "relation_type", "dst_type")
            .agg(F.count("*").alias("n")))


def bidirectional_pairs(edges: DataFrame) -> DataFrame:
    """Unordered endpoint pairs connected by >1 edge (J10)."""
    return (edges
            .groupBy(F.least("src", "dst").alias("a"),
                     F.greatest("src", "dst").alias("b"))
            .agg(F.count("*").alias("n_edges"))
            .filter(F.col("n_edges") > 1))


def induced_subgraph(edges: DataFrame, selected_nodes: DataFrame) -> DataFrame:
    """Edges whose both endpoints are in the selected set (J4 semi-joins)."""
    sel = F.broadcast(selected_nodes.select(F.col("id")))
    return (edges
            .join(sel.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(sel.withColumnRenamed("id", "dst"), "dst", "left_semi"))


def n_hop_neighborhood(edges: DataFrame, start_ids: DataFrame, hops: int = 2,
                       undirected: bool = True,
                       relation_types: list | None = None) -> DataFrame:
    """Iterative frontier expansion (G7); returns (id, hop) with min hop.

    ``relation_types`` restricts the frontier to those edge labels (G10,
    nl_query.py:993-1041) — pushed into the edge scan before the first join.
    """
    if relation_types:
        edges = edges.filter(F.col("relation_type").isin(*relation_types))
    sym = edges.select("src", "dst")
    if undirected:
        sym = sym.unionAll(edges.select(F.col("dst").alias("src"),
                                        F.col("src").alias("dst")))
    visited = start_ids.select(F.col("id"), F.lit(0).alias("hop")).localCheckpoint()
    frontier = visited
    for h in range(1, hops + 1):
        nxt = (frontier.join(sym, frontier.id == sym.src)
               .select(F.col("dst").alias("id"))
               .distinct()
               .join(visited.select("id"), "id", "left_anti")
               .withColumn("hop", F.lit(h))
               .localCheckpoint())
        if nxt.isEmpty():
            break
        visited = visited.unionAll(nxt).localCheckpoint()
        frontier = nxt
    return visited


def shortest_path_length(edges: DataFrame, src_id: str, dst_id: str,
                         max_hops: int = 6) -> int | None:
    """Undirected BFS distance (G8); None if not reached within max_hops."""
    spark = edges.sparkSession
    start = spark.createDataFrame([(src_id,)], "id string")
    visited = n_hop_neighborhood(edges, start, hops=max_hops)
    row = visited.filter(F.col("id") == dst_id).select(F.min("hop")).collect()[0]
    return row[0]


def shortest_path(edges: DataFrame, src_id: str, dst_id: str,
                  max_hops: int = 6, undirected: bool = True,
                  relation_types: list | None = None) -> DataFrame:
    """Shortest path WITH node-path reconstruction (G8 full semantics,
    nl_query.py:947-991; API server.py:1226-1322).

    BFS carrying the path array: each level keeps, per reached node, the
    lexicographically-minimal path (deterministic across partitionings —
    every min-hop path visits nodes at exactly their BFS depth, so per-level
    visited pruning never discards a shortest path).  Returns 0 or 1 row:
    (src, dst, hops, path array<string>).
    """
    spark = edges.sparkSession
    if relation_types:
        edges = edges.filter(F.col("relation_type").isin(*relation_types))
    sym = edges.select("src", "dst")
    if undirected:
        sym = sym.unionAll(edges.select(F.col("dst").alias("src"),
                                        F.col("src").alias("dst")))
    sym = sym.distinct().localCheckpoint()
    empty = spark.createDataFrame(
        [], "src string, dst string, hops int, path array<string>")
    if src_id == dst_id:
        return spark.createDataFrame([(src_id, dst_id, 0, [src_id])],
                                     empty.schema)
    frontier = spark.createDataFrame(
        [(src_id, [src_id])], "id string, path array<string>").localCheckpoint()
    visited = frontier.select("id").localCheckpoint()
    for h in range(1, max_hops + 1):
        nxt = (frontier.join(sym, frontier.id == sym.src)
               .select(F.col("dst").alias("id"),
                       F.array_append("path", F.col("dst")).alias("path"))
               .join(visited, "id", "left_anti")
               .groupBy("id").agg(F.min("path").alias("path"))
               .localCheckpoint())
        hit = nxt.filter(F.col("id") == dst_id).select("path").collect()
        if hit:
            return spark.createDataFrame(
                [(src_id, dst_id, h, hit[0]["path"])], empty.schema)
        if nxt.isEmpty():
            break
        visited = visited.unionAll(nxt.select("id")).localCheckpoint()
        frontier = nxt
    return empty


def all_paths(edges: DataFrame, src_id: str, dst_id: str,
              max_hops: int = 4, undirected: bool = True) -> DataFrame:
    """ALL simple paths src→dst with ≤ max_hops edges (G9 — the reference's
    bounded DFS, nl_query.py:1043-1148) as iterative frontier joins with a
    visited-set predicate per path (array_contains).  Returns (path, hops).

    Cost is the number of simple walks ≤ max_hops from src — bound max_hops
    (the reference caps at 4) and pick non-hub endpoints at scale.
    """
    spark = edges.sparkSession
    sym = edges.select("src", "dst")
    if undirected:
        sym = sym.unionAll(edges.select(F.col("dst").alias("src"),
                                        F.col("src").alias("dst")))
    sym = sym.distinct().localCheckpoint()
    out_schema = "path array<string>, hops int"
    frontier = spark.createDataFrame([([src_id],)], "path array<string>") \
        .localCheckpoint()
    found = spark.createDataFrame([], out_schema)
    for h in range(1, max_hops + 1):
        stepped = (frontier
                   .join(sym, F.element_at("path", -1) == sym.src)
                   .filter(~F.array_contains("path", F.col("dst")))
                   .select(F.array_append("path", F.col("dst")).alias("path"))
                   .localCheckpoint())
        done = stepped.filter(F.element_at("path", -1) == dst_id) \
            .select("path", F.lit(h).alias("hops"))
        found = found.unionByName(done).localCheckpoint()
        frontier = stepped.filter(F.element_at("path", -1) != dst_id)
        if h < max_hops and frontier.isEmpty():
            break
    return found


def pagerank(nodes: DataFrame, edges: DataFrame, damping: float = 0.85,
             iterations: int = 15) -> DataFrame:
    """Standard power-iteration PageRank as DataFrame joins (G11).

    Dangling-node mass is redistributed uniformly each iteration so ranks
    sum to N, matching the usual formulation (the reference normalizes by
    count, graph_inference.py:147-160).
    """
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select(F.col("id"), F.lit(0.0).alias("rank"))
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    links = edges.select("src", "dst").join(out_deg, "src")
    ranks = nodes.select("id", F.lit(1.0).alias("rank")).localCheckpoint()
    for _ in range(iterations):
        contribs = (links.join(ranks, links.src == ranks.id)
                    .select(F.col("dst").alias("id"),
                            (F.col("rank") / F.col("out_deg")).alias("c"))
                    .groupBy("id").agg(F.sum("c").alias("contrib")))
        # Dangling mass as a broadcast 1-row aggregate INSIDE the rank-update
        # plan — the earlier per-iteration .collect() was a separate Spark
        # job (15 iterations = 15 extra scheduler round-trips).
        dangling = (ranks.join(out_deg, ranks.id == out_deg.src, "left_anti")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang")))
        base = (F.lit(1.0 - damping)
                + F.lit(damping) * F.col("_dang") / F.lit(float(n_nodes)))
        ranks = (ranks.select("id")
                 .join(contribs, "id", "left")
                 .crossJoin(F.broadcast(dangling))
                 .select("id",
                         (base + F.lit(damping)
                          * F.coalesce(F.col("contrib"), F.lit(0.0))).alias("rank"))
                 .localCheckpoint())
    return ranks


def betweenness_sampled(nodes: DataFrame, edges: DataFrame,
                        n_sources: int = 100, max_depth: int = 6) -> DataFrame:
    """Brandes betweenness centrality, source-sampled (G12; the reference
    bounds cost the same way, server.py:1057-1069, ≤100 sources — the
    default here matches that cap).

    MULTI-SOURCE batched BFS: the frontier carries a ``source`` column, so
    each BFS level is ONE distributed job across ALL sampled sources
    (grouped on (source, id)) — ~2×depth jobs total.  The round-3 version
    looped sources sequentially on the driver (~2×depth×n_sources scheduler
    round-trips), a core-count-independent latency term of exactly the
    class the ER/CC forest work eliminated; at n_sources=100 on the sf0.01
    graph the batched form is >10× faster wall-clock (measured, see
    COVERAGE.md §perf).  Per-source math is unchanged: forward BFS
    accumulating sigma (#shortest paths), then the standard backward
    dependency accumulation level-by-level.  Undirected, like the
    reference; source sampling = first ``n_sources`` ids (deterministic).
    """
    sym = (edges.select("src", "dst")
           .unionAll(edges.select(F.col("dst").alias("src"),
                                  F.col("src").alias("dst")))
           .distinct()
           .select(F.col("src").alias("u"), F.col("dst").alias("v"))
           .localCheckpoint())
    srcs = (nodes.select("id").orderBy("id").limit(n_sources)
            .select(F.col("id").alias("source")))
    # forward phase: levels[d] = (source, id, sigma)
    frontier = srcs.select("source", F.col("source").alias("id"),
                           F.lit(1.0).alias("sigma")).localCheckpoint()
    levels = [frontier]
    visited = frontier.select("source", "id").localCheckpoint()
    for _ in range(max_depth):
        nxt = (frontier.join(sym, frontier.id == sym.u)
               .select("source", F.col("v").alias("id"), "sigma")
               .groupBy("source", "id").agg(F.sum("sigma").alias("sigma"))
               .join(visited, ["source", "id"], "left_anti")
               .localCheckpoint())
        if nxt.isEmpty():
            _unpin(nxt)  # empty frontier: checkpointed but never consumed
            break
        levels.append(nxt)
        prev_visited = visited
        visited = (visited.unionAll(nxt.select("source", "id"))
                   .localCheckpoint())
        _unpin(prev_visited)  # folded into the new visited checkpoint
        frontier = nxt
    spark = nodes.sparkSession
    if len(levels) == 1:
        _unpin_quiesced(spark, sym, visited, levels[0])
        return nodes.select("id", F.lit(0.0).alias("betweenness"))
    # backward phase: delta accumulation from the deepest level upward,
    # still one job per level across all sources.  Each forward level frame
    # is unpersisted as soon as its backward step has been materialized
    # into the delta/total checkpoints, bounding pinned executor memory to
    # O(2 levels × reached-set) instead of O(depth × reached-set) — the
    # scale guard for deep graphs where source sampling alone no longer
    # bounds the forward frontier footprint.
    _unpin(visited)  # only needed while building the forward levels
    total = None
    delta = levels[-1].select("source", "id", F.lit(0.0).alias("delta"))
    for d in range(len(levels) - 1, 0, -1):
        child = (levels[d].join(delta, ["source", "id"])
                 .select("source", "id", "sigma", "delta"))
        # contribution to each parent p at level d-1:
        #   sigma_p / sigma_child * (1 + delta_child)
        contrib = (child.join(sym, child.id == sym.u)
                   .select("source", F.col("v").alias("id"),
                           ((F.lit(1.0) + F.col("delta")) / F.col("sigma"))
                           .alias("part"))
                   .groupBy("source", "id")
                   .agg(F.sum(F.col("part")).alias("ratio")))
        parent_delta = (levels[d - 1]
                        .join(contrib, ["source", "id"], "left")
                        .select("source", "id",
                                (F.col("sigma")
                                 * F.coalesce("ratio", F.lit(0.0)))
                                .alias("delta")))
        acc = parent_delta.filter(F.col("id") != F.col("source")) \
            .select("id", "delta")
        prev_total, prev_delta = total, delta
        total = acc if total is None else total.unionAll(acc)
        # pin per level: the unionAll lineage is only max_depth deep, but
        # delta feeds the next level's join — cut the recompute chain
        delta = parent_delta.localCheckpoint()
        total = total.localCheckpoint()
        # levels[d], the previous delta and the previous total are all
        # folded into the two fresh checkpoints above — release them, but
        # only once the scheduler has drained: AQE's detached stage jobs
        # from the checkpoint actions above may still reference these frames
        # (the CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND noise + pin-count flake the
        # r6 verdict flagged — _unpin_quiesced makes the release barrier
        # deterministic).
        _unpin_quiesced(spark, prev_total, prev_delta, levels[d])
        levels[d] = None
    _unpin_quiesced(spark, levels[0], delta, sym)
    scores = total.groupBy("id").agg((F.sum("delta") / 2.0).alias("betweenness"))
    return (nodes.select("id").join(scores, "id", "left")
            .fillna(0.0, subset=["betweenness"]))


def clusters(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Undirected connected clusters of the entity graph (G13) via the same
    large-star/small-star kernel used for ER canonicalization."""
    comp = connected_components(edges.select("src", "dst"))
    return (nodes.join(comp, nodes.id == comp.node, "left")
            .withColumn("cluster", F.coalesce("component", "id"))
            .select("id", "canonical_name", "type", "cluster"))


def graph_stats(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Entity counts by type + edge counts by relation (A1), long format."""
    by_type = nodes.groupBy(F.col("type").alias("key")).agg(
        F.count("*").alias("n")).withColumn("metric", F.lit("entities_by_type"))
    by_rel = edges.groupBy(F.col("relation_type").alias("key")).agg(
        F.count("*").alias("n")).withColumn("metric", F.lit("edges_by_relation"))
    return by_type.unionByName(by_rel).select("metric", "key", "n")


def timeline(extractions: DataFrame) -> DataFrame:
    """Date mentions parsed to real dates, classified, ordered (G19/F8/W3).

    Multi-format parse = coalesce over to_date patterns, the Spark shape of
    the reference's strptime cascade (nl_query.py:1450-1476).
    """
    d = extractions.filter(F.col("kind") == "date")
    cleaned = F.regexp_replace(
        F.regexp_replace("name", r"(\d+)(st|nd|rd|th)\s+day\s+of\s+", "$1 "),
        r",", "")
    parsed = F.coalesce(
        F.try_to_timestamp(cleaned, F.lit("MMMM d yyyy")),
        F.try_to_timestamp(cleaned, F.lit("M/d/yyyy")),
        F.try_to_timestamp(cleaned, F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(cleaned, F.lit("d MMMM yyyy")))
    return (d.select("conv_id", F.col("name").alias("date_text"),
                     F.col("date_type"), parsed.cast("date").alias("date"))
            .orderBy(F.col("date").asc_nulls_last()))
