"""Rule-based relationship inference as pure DataFrame joins (no UDFs).

Behavior-parity with the reference ``RelationshipInferrer.infer_relationships``
(semantic_extractor.py:566-763) applied to the deterministic structural
entities, conversation-scoped exactly as the reference is document-scoped:

  rule 1  party roles → ``party_to`` case-ish Document/Reference entities
          (semantic_extractor.py:620-633), confidence 0.7
  rule 2  plaintiff/claimant × defendant/respondent → ``opposes``
          (semantic_extractor.py:666-681), confidence 0.9
  rule 4  org-name containment → ``affiliated_with`` shorter→longer
          (semantic_extractor.py:737-761), confidence 0.5

Rules for attorney/executive props and fact-derived edges
(semantic_extractor.py:636-664, 684-735) activate only when the pluggable
semantic extractor supplies role/client/company properties or facts; with the
deterministic structural extractor they are provably empty, so they are
represented by the same join templates operating on empty inputs.

Every rule is an equi-join on ``conv_id`` plus cheap predicates — Catalyst
plans these as co-partitioned shuffle joins sharing one exchange of the
extraction output, so the whole inference stage costs a single shuffle.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_PARTY_TO_ROLES = ("plaintiff", "defendant", "claimant", "respondent")
_PLAINTIFF_ROLES = ("plaintiff", "claimant")
_DEFENDANT_ROLES = ("defendant", "respondent")


def _caseish(name_col):
    """Reference predicate: 'case' in lower(name) or 'v.' in name or 'vs' in lower(name)."""
    return (F.lower(name_col).contains("case")
            | name_col.contains("v.")
            | F.lower(name_col).contains("vs"))


def infer_stage(extractions: DataFrame) -> DataFrame:
    """extractions → inferred raw triples (conv_id, subj, pred, obj, confidence, inferred)."""
    parties = (extractions.filter(F.col("kind") == "party")
               .select("conv_id", "name", "role", "entity_type"))
    docs = (extractions
            .filter(F.col("kind").isin("party", "term"))
            .filter(F.col("entity_type").isin("Document", "Reference"))
            .filter(_caseish(F.col("name")))
            .select("conv_id", F.col("name").alias("doc_name")))

    party_to = (parties
                .filter(F.col("role").isin(*_PARTY_TO_ROLES))
                .join(docs, "conv_id")
                .select("conv_id",
                        F.col("name").alias("subj"),
                        F.lit("party_to").alias("pred"),
                        F.col("doc_name").alias("obj"),
                        F.lit(0.7).alias("confidence")))

    p = parties.filter(F.col("role").isin(*_PLAINTIFF_ROLES)) \
               .select("conv_id", F.col("name").alias("subj"))
    d = parties.filter(F.col("role").isin(*_DEFENDANT_ROLES)) \
               .select("conv_id", F.col("name").alias("obj"))
    opposes = (p.join(d, "conv_id")
               .select("conv_id", "subj", F.lit("opposes").alias("pred"), "obj",
                       F.lit(0.9).alias("confidence")))

    orgs = (parties.filter(F.col("entity_type") == "Organization")
            .select("conv_id", F.col("name").alias("org")))
    o2 = orgs.select("conv_id", F.col("org").alias("other"))
    affiliated = (orgs.join(o2, "conv_id")
                  .filter(F.col("org") != F.col("other"))
                  .filter(F.lower(F.col("other")).contains(F.lower(F.col("org")))
                          | F.lower(F.col("org")).contains(F.lower(F.col("other"))))
                  .select("conv_id",
                          F.when(F.length("org") <= F.length("other"), F.col("org"))
                           .otherwise(F.col("other")).alias("subj"),
                          F.lit("affiliated_with").alias("pred"),
                          F.when(F.length("org") <= F.length("other"), F.col("other"))
                           .otherwise(F.col("org")).alias("obj"),
                          F.lit(0.5).alias("confidence")))

    # The reference dedupes on lowered (src, dst, relation) pairs per document
    # (semantic_extractor.py:604); equivalent here as a case-insensitive
    # dropDuplicates within conv_id.
    return (party_to.unionByName(opposes).unionByName(affiliated)
            .withColumn("_sl", F.lower("subj")).withColumn("_ol", F.lower("obj"))
            .dropDuplicates(["conv_id", "pred", "_sl", "_ol"])
            .drop("_sl", "_ol")
            .withColumn("inferred", F.lit(True)))
