"""Graph-analytics operators on a small constructed graph with hand-computed
ground truth (degree, top-k, patterns, n-hop, shortest path, PageRank,
clusters, bidirectional pairs, induced subgraph).
"""
import pytest
from pyspark.sql import functions as F

from knowledgegraphsiqidis_spark.operators import analytics


@pytest.fixture(scope="module")
def graph(spark):
    nodes = spark.createDataFrame(
        [("a", "Person", "Alice"), ("b", "Person", "Bob"),
         ("c", "Organization", "Corp"), ("d", "Organization", "Dorg"),
         ("e", "Person", "Eve"), ("f", "Person", "Frank")],
        "id string, type string, canonical_name string")
    edges = spark.createDataFrame(
        [("a", "b", "knows"), ("b", "a", "knows"), ("a", "c", "employed_by"),
         ("b", "c", "employed_by"), ("c", "d", "affiliated_with"),
         ("e", "f", "knows")],
        "src string, dst string, relation_type string")
    return nodes, edges


def test_degree_and_topk(spark, graph):
    nodes, edges = graph
    deg = {r["id"]: r["connections"] for r in analytics.degree(edges).collect()}
    assert deg == {"a": 3, "b": 3, "c": 3, "d": 1, "e": 1, "f": 1}
    top = analytics.top_connected(nodes, edges, k=3).collect()
    assert [r["canonical_name"] for r in top] == ["Alice", "Bob", "Corp"]


def test_degree_diversity(spark, graph):
    _, edges = graph
    dd = {r["id"]: r for r in analytics.degree_diversity(edges).collect()}
    assert dd["a"]["out_degree"] == 2 and dd["a"]["out_rel_types"] == 2
    assert dd["c"]["in_degree"] == 2 and dd["c"]["out_degree"] == 1


def test_relation_patterns(spark, graph):
    nodes, edges = graph
    pats = {(r["src_type"], r["relation_type"], r["dst_type"]): r["n"]
            for r in analytics.relation_patterns(nodes, edges).collect()}
    assert pats[("Person", "employed_by", "Organization")] == 2
    assert pats[("Person", "knows", "Person")] == 3


def test_bidirectional_pairs(spark, graph):
    _, edges = graph
    pairs = analytics.bidirectional_pairs(edges).collect()
    assert len(pairs) == 1
    assert (pairs[0]["a"], pairs[0]["b"], pairs[0]["n_edges"]) == ("a", "b", 2)


def test_induced_subgraph(spark, graph):
    _, edges = graph
    sel = edges.sparkSession.createDataFrame([("a",), ("b",), ("c",)], "id string")
    sub = analytics.induced_subgraph(edges, sel)
    assert sub.count() == 4  # a-b, b-a, a-c, b-c; c-d and e-f excluded


def test_n_hop_and_shortest_path(spark, graph):
    _, edges = graph
    start = spark.createDataFrame([("a",)], "id string")
    hops = {r["id"]: r["hop"]
            for r in analytics.n_hop_neighborhood(edges, start, hops=2).collect()}
    assert hops == {"a": 0, "b": 1, "c": 1, "d": 2}
    assert analytics.shortest_path_length(edges, "a", "d") == 2
    assert analytics.shortest_path_length(edges, "a", "f") is None


def test_pagerank_properties(spark, graph):
    nodes, edges = graph
    pr = {r["id"]: r["rank"]
          for r in analytics.pagerank(nodes, edges, iterations=12).collect()}
    assert pytest.approx(sum(pr.values()), rel=1e-3) == 6.0  # mass conserved
    assert all(v > 0 for v in pr.values())
    # d is the sink of the a/b→c→d chain: highest rank; c above the periphery
    assert pr["d"] == max(pr.values())
    assert pr["c"] > pr["e"] and pr["c"] > pr["f"]


def test_clusters(spark, graph):
    nodes, edges = graph
    cl = {r["id"]: r["cluster"] for r in analytics.clusters(nodes, edges).collect()}
    assert cl["a"] == cl["b"] == cl["c"] == cl["d"]
    assert cl["e"] == cl["f"] != cl["a"]


def test_graph_stats(spark, graph):
    nodes, edges = graph
    st = {(r["metric"], r["key"]): r["n"]
          for r in analytics.graph_stats(nodes, edges).collect()}
    assert st[("entities_by_type", "Person")] == 4
    assert st[("edges_by_relation", "knows")] == 3


def test_betweenness_sampled(spark):
    # path graph a-b-c-d-e: exact betweenness (undirected, all sources):
    # b: 3, c: 4, d: 3, endpoints 0
    nodes = spark.createDataFrame([(x,) for x in "abcde"], "id string")
    nodes = nodes.withColumn("type", F.lit("Person")) \
                 .withColumn("canonical_name", F.col("id"))
    edges = spark.createDataFrame(
        [("a", "b", "r"), ("b", "c", "r"), ("c", "d", "r"), ("d", "e", "r")],
        "src string, dst string, relation_type string")
    bc = {r["id"]: r["betweenness"]
          for r in analytics.betweenness_sampled(nodes, edges,
                                                 n_sources=5).collect()}
    assert bc["c"] == pytest.approx(4.0)
    assert bc["b"] == pytest.approx(3.0) and bc["d"] == pytest.approx(3.0)
    assert bc["a"] == 0.0 and bc["e"] == 0.0


def test_betweenness_diamond(spark):
    # diamond a->b,c->d: two shortest paths a-d; b and c each get 0.5
    nodes = spark.createDataFrame(
        [(x, "T", x) for x in "abcd"], "id string, type string, canonical_name string")
    edges = spark.createDataFrame(
        [("a", "b", "r"), ("a", "c", "r"), ("b", "d", "r"), ("c", "d", "r")],
        "src string, dst string, relation_type string")
    bc = {r["id"]: r["betweenness"]
          for r in analytics.betweenness_sampled(nodes, edges,
                                                 n_sources=4).collect()}
    # every node mediates exactly one of the two 2-hop pairs ((a,d) through
    # b/c; (b,c) through a/d), each with 2 shortest paths → 0.5 everywhere
    assert all(bc[x] == pytest.approx(0.5) for x in "abcd")


def test_betweenness_releases_pinned_levels(spark):
    """VERDICT r4 #6: the forward level frames must be unpersisted as their
    backward steps consume them — pinned-RDD growth per call is O(1) (the
    final `total` checkpoint), not O(depth)."""
    nodes = spark.createDataFrame([(x,) for x in "abcdefgh"], "id string") \
        .withColumn("type", F.lit("T")) \
        .withColumn("canonical_name", F.col("id"))
    chain = list("abcdefgh")
    edges = spark.createDataFrame(
        [(u, v, "r") for u, v in zip(chain, chain[1:])],
        "src string, dst string, relation_type string")
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    bc = analytics.betweenness_sampled(nodes, edges, n_sources=8,
                                       max_depth=8)
    got = {r["id"]: r["betweenness"] for r in bc.collect()}
    # exact path-graph values still hold (7-depth BFS exercised)
    assert got["d"] == pytest.approx(12.0) and got["a"] == 0.0
    after = jsc.getPersistentRDDs().size()
    # only the surviving `total` checkpoint (scores read it lazily) may
    # remain pinned; 7 levels of frontier/delta/visited must be gone
    assert after - before <= 1, (before, after)


def test_unpin_private_api_still_resolves(spark):
    """VERDICT r5 #7: analytics._unpin reaches into Dataset internals
    (``_jdf.queryExecution().analyzed().rdd()``), wrapped in try/except —
    a Spark upgrade that changes those internals would degrade it to a
    silent no-op (memory leak).  Pin the call path: on the running Spark
    version the analyzed plan of a localCheckpoint'd frame must be a
    LogicalRDD whose rdd() is the PERSISTED one, and _unpin must actually
    release its storage."""
    df = spark.range(100).localCheckpoint()
    j = df._jdf.queryExecution().analyzed()
    assert j.getClass().getSimpleName() == "LogicalRDD", \
        "localCheckpoint no longer yields a LogicalRDD — update _unpin"
    rdd = j.rdd()
    assert rdd.getStorageLevel().useMemory(), \
        "analyzed().rdd() is no longer the persisted RDD — update _unpin"
    analytics._unpin(df)
    assert not j.rdd().getStorageLevel().useMemory(), \
        "_unpin stopped releasing storage — Spark internals changed"
