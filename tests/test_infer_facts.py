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
