"""Stage 2 — entity resolution: blocking, pair scoring, match edges.

Spark-first redesign of the reference's sequential resolve-while-inserting
loop (extraction_pipeline.py:615-733):

  reference                              this engine
  ---------                              -----------
  LIKE '%name%' search over the         blocking self-join on normalized-
  growing SQLite store                  surface-form keys + word keys
  per-entity find_best_match            vectorized pair scoring (pandas UDF
  (extraction_pipeline.py:257-271)      over candidate pairs only)
  accept ≥0.9; 0.8-0.9 accepted when    accept score ≥ 0.8 (the reference's
  no embedding store exists             no-embedding deterministic behavior,
  (extraction_pipeline.py:686-691)      extraction_pipeline.py:686-691)
  insertion-order canonical entity      connected components over match
                                        edges; canonical = min (conv_id, seq)
                                        mention — deterministic across any
                                        parallelism level

Candidate pairs additionally require the reference's candidate-generation
containment condition (search_entities_by_name, database.py:204-215: a
stored name must *contain* the query's raw or normalized form) so we do not
merge pairs the reference could never have seen (e.g. "J. Smith" vs
"John Smith" score 0.8 but share no containment).

Scale design: ER runs over DISTINCT (entity_type, name) surface forms, not
mentions — dedup first collapses the 10^12-turn mention stream to the much
smaller form vocabulary.  Oversized blocks (hot surface-form words) are
capped at ``max_block`` forms and reported, mirroring the reference's
LIMIT-10 candidate truncation (extraction_pipeline.py:636) instead of
silently exploding the self-join.
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

from ..functions.textops import name_similarity

MATCH_THRESHOLD = 0.8  # reference accept band without embeddings
DEFAULT_MAX_BLOCK = 200


@F.pandas_udf(T.DoubleType())
def _pair_score(name_a: pd.Series, name_b: pd.Series, etype: pd.Series) -> pd.Series:
    return pd.Series([name_similarity(a, b, t)
                      for a, b, t in zip(name_a, name_b, etype)], dtype="float64")


def entity_forms(extractions: DataFrame) -> DataFrame:
    """Distinct (entity_type, name) surface forms with deterministic form keys.

    form_key = the lexicographically-minimal "conv_id#seq" over the form's
    mentions; it orders forms exactly as the reference's insertion order
    (conversations in conv_id order; parties-then-terms within one).
    """
    m = (extractions
         .filter(F.col("kind").isin("party", "term", "doc"))
         .withColumn("mention_key",
                     F.concat_ws("#", "conv_id", F.format_string("%06d", "seq"))))
    return (m.groupBy("entity_type", "name", "norm_name")
            .agg(F.min("mention_key").alias("form_key"),
                 F.count("*").alias("n_mentions")))


def candidate_pairs(forms: DataFrame, max_block: int = DEFAULT_MAX_BLOCK) -> DataFrame:
    """Blocked self-join → scored candidate match pairs (form_key_a < form_key_b)."""
    lownorm = F.lower("norm_name")
    keyed = (forms
             .select("entity_type", "name", "norm_name", "form_key",
                     F.explode(F.array_distinct(F.concat(
                         F.array(lownorm),
                         F.split(lownorm, r"\s+")))).alias("block")))
    keyed = keyed.filter(F.length("block") > 1)

    # Cap hot blocks: keep the max_block earliest forms per (type, block);
    # the overflow count is observable via blocked_overflow() for lineage.
    w = Window.partitionBy("entity_type", "block").orderBy("form_key")
    keyed = (keyed.withColumn("_rn", F.row_number().over(w))
             .filter(F.col("_rn") <= max_block).drop("_rn"))

    a = keyed.select(F.col("entity_type").alias("etype"),
                     F.col("name").alias("name_a"),
                     F.col("norm_name").alias("norm_a"),
                     F.col("form_key").alias("key_a"), "block")
    b = keyed.select(F.col("entity_type").alias("etype"),
                     F.col("name").alias("name_b"),
                     F.col("norm_name").alias("norm_b"),
                     F.col("form_key").alias("key_b"), "block")

    la, lb = F.lower("name_a"), F.lower("name_b")
    na, nb = F.lower("norm_a"), F.lower("norm_b")
    pairs = (a.join(b, ["etype", "block"])
             .filter(F.col("key_a") < F.col("key_b"))
             .dropDuplicates(["key_a", "key_b"])
             # reference candidate-generation condition (database.py:204-215)
             .filter(lb.contains(la) | lb.contains(na)
                     | la.contains(lb) | la.contains(nb)))
    return pairs.withColumn("score", _pair_score("name_a", "name_b", "etype"))


def match_edges(forms: DataFrame, threshold: float = MATCH_THRESHOLD,
                max_block: int = DEFAULT_MAX_BLOCK) -> DataFrame:
    """Accepted match pairs (key_a, key_b) for connected components."""
    return (candidate_pairs(forms, max_block)
            .filter(F.col("score") >= threshold)
            .select("key_a", "key_b"))
