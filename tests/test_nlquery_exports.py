"""NL-query routing/dispatch (N1/N4/N5/N8) and export sinks (K2-K5)."""
import os

import pytest
from pyspark.sql import functions as F

from knowledgegraphsiqidis_spark.operators import nlquery
from knowledgegraphsiqidis_spark.sources import exports


@pytest.fixture(scope="module")
def graph(spark):
    nodes = spark.createDataFrame(
        [("1", "Organization", "ACME Corporation", "confirmed", "active"),
         ("2", "Organization", "Globex LLC", "confirmed", "active"),
         ("3", "Person", "John Smith", "confirmed", "active"),
         ("4", "Date", "January 15, 2020", "confirmed", "active"),
         ("5", "Reference", "Case Record", "confirmed", "active")],
        "id string, type string, canonical_name string, confidence string, "
        "status string")
    edges = spark.createDataFrame(
        [("e1", "1", "2", "opposes", "extracted", "conv-1"),
         ("e2", "1", "5", "party_to", "extracted", "conv-1"),
         ("e3", "3", "1", "employed_by", "extracted", "conv-2")],
        "id string, src string, dst string, relation_type string, "
        "confidence string, provenance_doc_id string")
    aliases = spark.createDataFrame([("1", "ACME", "extracted")],
                                    "entity_id string, alias_text string, "
                                    "source string")
    return nodes, edges, aliases


def test_interpret_routing(ref):
    """Router decisions must match the reference fallback interpreter."""
    import types
    eng = types.SimpleNamespace()
    import sys
    sys.path.insert(0, "/root/reference")
    from src.core.query.nl_query import NLQueryEngine
    queries = [
        "What is the relationship between ACME and Globex?",
        "Who are the parties in this dispute?",
        "List all obligations and deadlines",
        "How many entities are there?",
        'Find the path from "ACME" to "Globex"',
        "When did the contract start?",
        "What payments were made?",
        "Where is the property located?",
        "Show me the agreement documents",
        "Give me an overview of the case",
        "Which witnesses testified?",
    ]
    for q in queries:
        ours = nlquery.interpret_query(q)
        theirs = NLQueryEngine._fallback_interpretation(eng, q)
        assert ours["query_type"] == theirs["query_type"], q
        assert ours["entity_types_requested"] == theirs["entity_types_requested"], q
        assert ours["entities_mentioned"] == theirs["entities_mentioned"], q
        assert ours["filters"] == theirs["filters"], q


def test_execute_entity_search(spark, graph):
    nodes, edges, _ = graph
    out = nlquery.query("Which companies are involved?", nodes, edges)
    names = {r["canonical_name"] for r in out.collect()}
    assert names == {"ACME Corporation", "Globex LLC"}


def test_entity_search_fallback_and_single_action(spark, graph):
    """The zero-result mention fallback must (a) return the bare type search
    and (b) run as ONE Spark action — the in-plan any-match aggregate, not a
    separate count() probe (each action is a scheduler round-trip at an
    interactive surface)."""
    nodes, edges, _ = graph
    # mention matches nothing -> falls back to all Organizations
    interp = {"query_type": "entity_search", "entities_mentioned": ["Zzzz"],
              "entity_types_requested": ["Organization"], "filters": {}}
    sc = spark.sparkContext
    # AQE materializes each query stage as its own job, which would blur the
    # action count — turn it off for the assertion (plan shape, not perf)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # baseline: the same search with no mention filter (no fallback
        # machinery) — its job count is what one collect costs here
        # (CollectLimit may run incrementally, so measure, don't assume)
        sc.setJobGroup("nlq-base", "baseline")
        base_interp = dict(interp, entities_mentioned=[])
        nlquery.execute_query(base_interp, nodes, edges).collect()
        n_base = len(sc.statusTracker().getJobIdsForGroup("nlq-base"))
        sc.setJobGroup("nlq-single-action", "fallback probe")
        out = nlquery.execute_query(interp, nodes, edges).collect()
        jobs = sc.statusTracker().getJobIdsForGroup("nlq-single-action")
        sc.setJobGroup(None, None)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert {r["canonical_name"] for r in out} == \
        {"ACME Corporation", "Globex LLC"}
    # single action: the in-plan fallback adds at most the broadcast-build
    # job on top of the baseline collect — never a second action's worth
    # (the old probe-then-collect shape ran >= 2*n_base jobs)
    assert len(jobs) <= n_base + 1, (jobs, n_base)
    # mention matches -> narrowed result, same single-action plan
    interp["entities_mentioned"] = ["Acme"]
    got = {r["canonical_name"]
           for r in nlquery.execute_query(interp, nodes, edges).collect()}
    assert got == {"ACME Corporation"}


def test_execute_relationship(spark, graph):
    nodes, edges, _ = graph
    out = nlquery.query("What is the relationship between Acme and others?",
                        nodes, edges)
    rows = {(r["subj"], r["pred"], r["obj"]) for r in out.collect()}
    assert ("ACME Corporation", "opposes", "Globex LLC") in rows


def test_execute_aggregation(spark, graph):
    nodes, edges, _ = graph
    out = nlquery.query("How many entities are there?", nodes, edges)
    st = {(r["metric"], r["key"]): r["n"] for r in out.collect()}
    assert st[("entities_by_type", "Organization")] == 2


def test_entity_summary(spark, graph):
    nodes, edges, aliases = graph
    md = nlquery.entity_summary("1", nodes, edges, aliases)
    assert "ACME Corporation" in md and "opposes" in md and "ACME" in md
    assert "John Smith —employed_by→ ACME Corporation" in md


def test_exports(spark, graph, tmp_path):
    nodes, edges, _ = graph
    exports.export_csv(nodes, edges, str(tmp_path / "csv"))
    back = spark.read.option("header", True).csv(str(tmp_path / "csv/edges"))
    assert back.count() == 3
    assert "source_name" in back.columns

    exports.export_json(nodes, edges, str(tmp_path / "json"))
    assert spark.read.json(str(tmp_path / "json/nodes")).count() == 5

    sel, induced = exports.viz_subgraph(nodes, edges, top_n=3)
    assert sel.count() == 3
    assert induced.count() >= 1

    doc = exports.export_graphml(nodes, edges, str(tmp_path / "g.graphml"))
    assert doc.count("<node") == 5 and doc.count("<edge") == 3
    assert os.path.exists(tmp_path / "g.graphml")


def test_canned_templates(spark, graph):
    """N11: all 10 reference templates run and return DataFrames; spot-check
    routing of representative templates."""
    nodes, edges, aliases = graph
    assert len(nlquery.QUERY_TEMPLATES) == 10
    for key in nlquery.QUERY_TEMPLATES:
        df = nlquery.canned_query(key, nodes, edges)
        assert df.columns  # materializes a valid plan
    parties = nlquery.canned_query("parties", nodes, edges)
    assert {r["type"] for r in parties.collect()} <= {"Organization", "Person"}
    rel = nlquery.interpret_query(nlquery.QUERY_TEMPLATES["relationships"])
    assert rel["query_type"] == "relationship_query"
    # reference quirk replicated: the substring rule 'all' fires on
    # "allegations", so the claims template routes to aggregation
    agg = nlquery.interpret_query(nlquery.QUERY_TEMPLATES["claims"])
    assert agg["query_type"] == "aggregation"
    ob = nlquery.interpret_query(nlquery.QUERY_TEMPLATES["obligations"])
    assert ob["query_type"] == "fact_search"
