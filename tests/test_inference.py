"""Graph-level inference operators (G11 composite, G14-G18) on constructed
inputs with hand-checkable properties.
"""
import pytest
from pyspark.sql import functions as F

from knowledgegraphsiqidis_spark.operators import inference


@pytest.fixture(scope="module")
def graph(spark):
    nodes = spark.createDataFrame(
        [("a", "Person", "Alice Smith", "confirmed", 5),
         ("b", "Person", "Bob Smith", "extracted", 2),
         ("c", "Organization", "ACME Corporation", "confirmed", 9),
         ("d", "Document", "Case File", "confirmed", 1),
         ("e", "Reference", "Aircraft", "extracted", 1)],
        "id string, type string, canonical_name string, confidence string, "
        "n_mentions long")
    edges = spark.createDataFrame(
        [("a", "c", "employed_by", "confirmed"),
         ("b", "c", "employed_by", "extracted"),
         ("c", "d", "party_to", "confirmed"),
         ("a", "d", "party_to", "extracted")],
        "src string, dst string, relation_type string, confidence string")
    aliases = spark.createDataFrame(
        [("c", "ACME", "extracted"), ("a", "A. Smith", "extracted")],
        "entity_id string, alias_text string, source string")
    return nodes, edges, aliases


def test_entity_importance(spark, graph):
    nodes, edges, _ = graph
    imp = inference.entity_importance(nodes, edges, iterations=10).collect()
    scores = {r["id"]: r["importance"] for r in imp}
    # the hub org with max degree+mentions must dominate isolated reference
    assert scores["c"] > scores["e"]
    assert scores["d"] > scores["e"]  # d receives two party_to edges
    assert imp[0]["id"] in ("c", "d")


def test_bayesian_resolve(spark, graph):
    nodes, edges, aliases = graph
    res = inference.bayesian_resolve(nodes, aliases, edges, "ACME").collect()
    assert res[0]["canonical_name"] == "ACME Corporation"
    total = sum(r["probability"] for r in res)
    assert total == pytest.approx(1.0, abs=1e-4)
    smith = inference.bayesian_resolve(nodes, aliases, edges, "Smith").collect()
    names = [r["canonical_name"] for r in smith]
    assert "Alice Smith" in names and "Bob Smith" in names


def test_contradictions(spark):
    facts = spark.createDataFrame(
        [("f1", "the buyer did pay the full purchase price of $500,000 on time"),
         ("f2", "the buyer did not pay the full purchase price of $500,000"),
         ("f3", "weather conditions in march were generally mild and calm"),
         ("f4", "the seller duly delivered the gulfstream aircraft bearing "
                "serial number 5174 to the buyer at wilmington delaware in 2020"),
         ("f5", "the seller duly delivered the gulfstream aircraft bearing "
                "serial number 5174 to the buyer at wilmington delaware in 2021")],
        "fact_id string, text string")
    got = {(r["id_a"], r["id_b"]): r["reason"]
           for r in inference.contradictions(facts).collect()}
    assert ("f1", "f2") in got and "negation" in got[("f1", "f2")].lower()
    assert all("f3" not in pair for pair in got)
    assert ("f4", "f5") in got  # conflicting years with high overlap


def test_contradictions_hot_token_cap(spark):
    """A token planted across every fact must not blow up the candidate
    join: with max_df below the planted df the blocker drops it (and
    hot_tokens surfaces it); overlap then counts only sub-cap tokens."""
    rows = [(f"h{i}",
             f"boilerplate header common to all facts unique{i} tail{i}")
            for i in range(40)]
    rows += [("p1", "the deposit did clear on 2020 schedule alpha beta"),
             ("p2", "the deposit did not clear on 2020 schedule alpha beta")]
    facts = spark.createDataFrame(rows, "fact_id string, text string")
    # uncapped: the 40 planted facts share 6 hot tokens -> 780 blocked pairs
    uncapped = inference.contradictions(facts, max_df=None)
    # capped at 10: hot tokens dropped entirely; only the p1/p2 pair (7
    # shared sub-cap tokens) survives blocking
    capped = inference.contradictions(facts, max_df=10).collect()
    hot = {r["w"] for r in inference.hot_tokens(facts, max_df=10).collect()}
    assert {"boilerplate", "header", "common", "to", "all", "facts"} <= hot
    got = {(r["id_a"], r["id_b"]) for r in capped}
    assert got == {("p1", "p2")}
    # sub-quadratic evidence: capped candidate blocking visits far fewer
    # pairs than the uncapped hot-token cross product
    n_uncapped = uncapped.count()
    assert n_uncapped >= 1  # p1/p2 still found uncapped
    w = inference._fact_words(facts, "fact_id", "text")
    dfc = (w.groupBy("w").agg(F.count("*").alias("df")).filter(F.col("df") <= 10)
           .select("w"))
    capped_cand = (w.join(dfc, "w", "left_semi").alias("a")
                   .join(w.join(dfc, "w", "left_semi").alias("b"), "w")
                   .filter(F.col("a.id") < F.col("b.id")).count())
    uncapped_cand = (w.alias("a").join(w.alias("b"), "w")
                     .filter(F.col("a.id") < F.col("b.id")).count())
    assert capped_cand < uncapped_cand / 10


def test_fact_corroboration(spark):
    facts = spark.createDataFrame(
        [("f1", "payment was made in full", "obligation"),
         ("f2", "the contract was breached badly", "allegation")],
        "fact_id string, text string, fact_type string")
    sources = spark.createDataFrame(
        [("f1", "doc1"), ("f1", "doc2"), ("f1", "doc3"), ("f2", "doc1")],
        "fact_id string, source_doc string")
    out = {r["fact_id"]: r for r in
           inference.fact_corroboration(facts, sources).collect()}
    assert out["f1"]["source_count"] == 3
    assert out["f1"]["corroboration_score"] > out["f2"]["corroboration_score"]
    import math
    expected = (1 - math.exp(-0.5 * 3)) * 1.0 * 0.95
    assert out["f1"]["corroboration_score"] == pytest.approx(expected, abs=1e-4)


def test_transitive_and_common_neighbor(spark, graph):
    nodes, edges, _ = graph
    trans = {(r["source_id"], r["target_id"]): r
             for r in inference.transitive_inference(nodes, edges).collect()}
    # b -> c -> d, b not directly linked to d; target is a Document so the
    # path-pattern table does not fire (needs Organization) → default name
    assert ("b", "d") in trans
    assert trans[("b", "d")]["inferred_relation"] == \
        "inferred_employed_by_then_party_to"
    # a -> c -> d exists but a -> d is direct → excluded
    assert ("a", "d") not in trans

    cn = {(r["source_id"], r["target_id"]): r["inferred_relation"]
          for r in inference.common_neighbor_inference(nodes, edges).collect()}
    # a and b share employer c → related_via_organization
    assert cn[("a", "b")] == "related_via_organization"


def test_answer_confidence_monotone():
    low = inference.answer_confidence(0, 0, 0, 0.0)
    high = inference.answer_confidence(10, 10, 20, 1.0)
    assert 0.0 <= low < high <= 1.0
