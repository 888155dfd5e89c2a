"""Path reconstruction (G8), bounded all-paths (G9), relation-filtered
frontier (G10) — exact small-graph oracles computed by hand/networkx-free
enumeration.
"""
import pytest
from pyspark.sql import functions as F

from knowledgegraphsiqidis_spark.operators.analytics import (
    all_paths, n_hop_neighborhood, shortest_path)

EDGE_DDL = "src string, dst string, relation_type string"


@pytest.fixture(scope="module")
def g(spark):
    #   a—b—c—d      a—e—d      b—d       (undirected semantics)
    rows = [("a", "b", "knows"), ("b", "c", "knows"), ("c", "d", "knows"),
            ("a", "e", "works_with"), ("e", "d", "works_with"),
            ("b", "d", "knows")]
    return spark.createDataFrame(rows, EDGE_DDL).localCheckpoint()


def test_shortest_path_exact(spark, g):
    row = shortest_path(g, "a", "d", max_hops=6).collect()
    assert len(row) == 1
    r = row[0]
    assert (r["src"], r["dst"], r["hops"]) == ("a", "d", 2)
    # two shortest paths exist (a-b-d, a-e-d); lexicographic min is a-b-d
    assert r["path"] == ["a", "b", "d"]


def test_shortest_path_trivial_and_unreachable(spark, g):
    assert shortest_path(g, "a", "a").collect()[0]["path"] == ["a"]
    iso = g.unionByName(spark.createDataFrame([("x", "y", "knows")], EDGE_DDL))
    assert shortest_path(iso, "a", "x", max_hops=6).count() == 0


def test_shortest_path_relation_filter(spark, g):
    # restricted to 'knows' edges the a-e-d shortcut disappears
    r = shortest_path(g, "a", "d", max_hops=6,
                      relation_types=["knows"]).collect()[0]
    assert r["hops"] == 2 and r["path"] == ["a", "b", "d"]
    # restricted to 'works_with', the only route is a-e-d
    r2 = shortest_path(g, "a", "d", max_hops=6,
                       relation_types=["works_with"]).collect()[0]
    assert r2["hops"] == 2 and r2["path"] == ["a", "e", "d"]


def test_all_paths_exact(spark, g):
    got = {tuple(r["path"]) for r in all_paths(g, "a", "d", max_hops=3).collect()}
    assert got == {("a", "b", "d"), ("a", "e", "d"), ("a", "b", "c", "d")}
    # hop-bounded: at max_hops=2 the 3-hop path disappears
    got2 = {tuple(r["path"]) for r in all_paths(g, "a", "d", max_hops=2).collect()}
    assert got2 == {("a", "b", "d"), ("a", "e", "d")}


def test_all_paths_simple_only(spark):
    # triangle with a pendant: paths must not revisit nodes
    rows = [("a", "b", "r"), ("b", "c", "r"), ("c", "a", "r"), ("c", "d", "r")]
    g = spark.createDataFrame(rows, EDGE_DDL)
    got = {tuple(r["path"]) for r in all_paths(g, "a", "d", max_hops=4).collect()}
    assert got == {("a", "c", "d"), ("a", "b", "c", "d")}


def test_n_hop_relation_filter(spark, g):
    start = spark.createDataFrame([("a",)], "id string")
    ids = {r["id"] for r in n_hop_neighborhood(
        g, start, hops=1, relation_types=["works_with"]).collect()}
    assert ids == {"a", "e"}
