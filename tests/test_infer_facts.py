"""Fact-derived edge rules vs the reference RelationshipInferrer on the same
inputs (pluggable semantic-extractor path)."""
import pytest
from pyspark.sql import functions as F

from knowledgegraphsiqidis_spark.operators.infer import FACTS_DDL, infer_facts_stage


def test_fact_rules_parity(spark, ref):
    # one conversation's extracted entities + facts
    extractions = spark.createDataFrame(
        [("c1", 0, "party", "ACME Corp", "Organization", None),
         ("c1", 1, "term", "Purchase Agreement", "Reference", None),
         ("c1", 2, "term", "Aircraft", "Reference", None)],
        "conv_id string, seq int, kind string, name string, "
        "entity_type string, role string")
    facts = spark.createDataFrame(
        [("c1", "payment", "ACME paid Globex $1m", ["ACME Corp", "Globex"]),
         ("c1", "breach", "breach of the purchase agreement", ["ACME Corp"]),
         ("c1", "obligation", "must deliver the aircraft", ["Globex"])],
        FACTS_DDL)

    ours = {(r["subj"], r["pred"], r["obj"])
            for r in infer_facts_stage(extractions, facts).collect()}

    # reference oracle on identical input
    entities = [
        ref.ExtractedEntity("ACME Corp", "Organization", {}, "ACME Corp", 1.0),
        ref.ExtractedEntity("Purchase Agreement", "Reference", {},
                            "Purchase Agreement", 1.0),
        ref.ExtractedEntity("Aircraft", "Reference", {}, "Aircraft", 1.0),
    ]
    rfacts = [
        ref.ExtractedFact("payment", "ACME paid Globex $1m",
                          ["ACME Corp", "Globex"], {}, 1.0),
        ref.ExtractedFact("breach", "breach of the purchase agreement",
                          ["ACME Corp"], {}, 1.0),
        ref.ExtractedFact("obligation", "must deliver the aircraft",
                          ["Globex"], {}, 1.0),
    ]
    theirs = {(r.source_name, r.relation_type, r.target_name)
              for r in ref.RelationshipInferrer.infer_relationships(
                  entities, [], rfacts)
              if r.relation_type in ("paid", "breached", "binds")}
    assert ours == theirs
    assert ("ACME Corp", "paid", "Globex") in ours
    assert ("ACME Corp", "breached", "Purchase Agreement") in ours
    # binds: every Document/Reference doc binds the obligated entity
    assert ("Purchase Agreement", "binds", "Globex") in ours
    assert ("Aircraft", "binds", "Globex") in ours


def test_role_property_rules_parity(spark, ref):
    """G4 rules 3/5 (attorney→represents, exec→employed_by) vs the reference
    RelationshipInferrer on identical entity/property inputs
    (semantic_extractor.py:636-664)."""
    from knowledgegraphsiqidis_spark.operators.infer import infer_stage

    extractions = spark.createDataFrame(
        [("c1", 0, "party", "ACME Corporation", "Organization", "claimant",
          None),
         ("c1", 1, "party", "Globex LLC", "Organization", "respondent", None),
         ("c1", 2, "party", "Jane Roe", "Person", "counsel",
          "ACME Corporation"),
         ("c1", 3, "party", "John Stark", "Person", "ceo", "Globex LLC"),
         # no hint -> reference's empty props.get guard -> nothing inferred
         ("c1", 4, "party", "Ada Blank", "Person", "attorney", None),
         # role outside both tables (witness) -> nothing
         ("c1", 5, "party", "Sam Witness", "Person", "witness", "ACME")],
        "conv_id string, seq int, kind string, name string, "
        "entity_type string, role string, hint string")
    ours = {(r["subj"], r["pred"], r["obj"])
            for r in infer_stage(extractions).collect()
            if r["pred"] in ("represents", "employed_by")}

    entities = [
        ref.ExtractedEntity("ACME Corporation", "Organization",
                            {"role": "claimant"}, "ACME Corporation", 1.0),
        ref.ExtractedEntity("Globex LLC", "Organization",
                            {"role": "respondent"}, "Globex LLC", 1.0),
        ref.ExtractedEntity("Jane Roe", "Person",
                            {"role": "counsel", "client": "ACME Corporation"},
                            "Jane Roe", 1.0),
        ref.ExtractedEntity("John Stark", "Person",
                            {"role": "ceo", "company": "Globex LLC"},
                            "John Stark", 1.0),
        ref.ExtractedEntity("Ada Blank", "Person", {"role": "attorney"},
                            "Ada Blank", 1.0),
        ref.ExtractedEntity("Sam Witness", "Person",
                            {"role": "witness", "client": "ACME"},
                            "Sam Witness", 1.0),
    ]
    theirs = {(r.source_name, r.relation_type, r.target_name)
              for r in ref.RelationshipInferrer.infer_relationships(
                  entities, [], [])
              if r.relation_type in ("represents", "employed_by")}
    assert ours == theirs
    assert ("Jane Roe", "represents", "ACME Corporation") in ours
    assert ("John Stark", "employed_by", "Globex LLC") in ours
    assert len(ours) == 2


def test_extract_entity_props_kernel():
    from knowledgegraphsiqidis_spark.functions import textops
    doc = ("Jane Roe, counsel for ACME Corporation, entered an appearance "
           "on the record.\n"
           "John Stark, CEO of Globex LLC, signed the master agreement.\n"
           "Jane Roe, counsel for ACME Corporation, appeared again.\n"
           "The parties met to discuss the schedule.")
    got = textops.extract_entity_props(doc)
    assert [(p["name"], p["role"], p["hint"]) for p in got] == [
        ("Jane Roe", "counsel", "ACME Corporation"),
        ("John Stark", "ceo", "Globex LLC")]
