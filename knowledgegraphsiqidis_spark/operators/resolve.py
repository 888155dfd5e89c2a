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

Scale design: ER runs over DISTINCT (er_type, name) surface forms, not
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
    """Distinct (er_type, name) surface forms with deterministic form keys.

    form_key = the lexicographically-minimal "conv_id#seq" over the form's
    mentions; it orders forms exactly as the reference's insertion order
    (conversations in conv_id order; parties-then-terms within one).
    """
    m = (extractions
         .filter(F.col("kind").isin("party", "term", "doc"))
         .withColumn("mention_key",
                     F.concat_ws("#", "conv_id", F.format_string("%06d", "seq"))))
    return (m.groupBy("er_type", "name", "norm_name")
            .agg(F.min("mention_key").alias("form_key"),
                 F.count("*").alias("n_mentions")))


_STOP_BLOCKS = ("and", "the", "of", "for", "to", "in", "on", "by", "or")


def candidate_pairs(forms: DataFrame, max_block: int = DEFAULT_MAX_BLOCK) -> DataFrame:
    """Blocked self-join → scored candidate match pairs (form_key_a < form_key_b).

    Blocking is type-free — the reference's LIKE candidate search spans all
    entity types (database.py:204-215) and its scoring uses the *incoming*
    entity's validated type (extraction_pipeline.py:628-648), so a Person
    surface form can resolve into an Organization cluster.  Keys are the
    words of the raw and normalized lowered names (a containment candidate
    always shares a distinctive word; pure-stopword keys are dropped — any
    pair they alone would generate cannot pass the containment filter).
    """
    lowname, lownorm = F.lower("name"), F.lower("norm_name")
    keyed = (forms
             .select("name", "norm_name", "er_type", "form_key",
                     F.explode(F.array_distinct(F.concat(
                         F.array(lownorm),
                         F.split(lownorm, r"\s+"),
                         F.split(lowname, r"\s+")))).alias("block")))
    keyed = keyed.filter((F.length("block") > 1)
                         & ~F.col("block").isin(*_STOP_BLOCKS))

    # Cap hot blocks: keep the max_block earliest forms per block, mirroring
    # the reference's LIMIT-10 candidate truncation rather than letting a hot
    # surface form blow up the self-join.
    w = Window.partitionBy("block").orderBy("form_key")
    keyed = (keyed.withColumn("_rn", F.row_number().over(w))
             .filter(F.col("_rn") <= max_block).drop("_rn"))

    a = keyed.select(F.col("name").alias("name_a"),
                     F.col("form_key").alias("key_a"), "block")
    b = keyed.select(F.col("name").alias("name_b"),
                     F.col("norm_name").alias("norm_b"),
                     F.col("er_type").alias("etype_b"),
                     F.col("form_key").alias("key_b"), "block")

    la, lb = F.lower("name_a"), F.lower("name_b")
    nb = F.lower("norm_b")
    pairs = (a.join(b, ["block"])
             .filter(F.col("key_a") < F.col("key_b"))
             .drop("block")
             .dropDuplicates(["key_a", "key_b"])
             # Reference candidate generation is direction-sensitive
             # (database.py:204-215): the STORED (earlier, key_a) name must
             # contain the incoming (later, key_b) query — raw or normalized
             # (extraction_pipeline.py:636-643).
             .filter(la.contains(lb) | la.contains(nb)))
    return pairs.withColumn("score", _pair_score("name_a", "name_b", "etype_b"))


def blocked_overflow(forms: DataFrame,
                     max_block: int = DEFAULT_MAX_BLOCK) -> DataFrame:
    """Blocks larger than the cap, with how many forms were dropped from the
    candidate self-join — no silent truncation: callers append this to the
    lineage/metrics table so oversize hot surface forms are visible.
    """
    lowname, lownorm = F.lower("name"), F.lower("norm_name")
    keyed = (forms.select(F.explode(F.array_distinct(F.concat(
        F.array(lownorm), F.split(lownorm, r"\s+"), F.split(lowname, r"\s+")
    ))).alias("block"))
        .filter((F.length("block") > 1) & ~F.col("block").isin(*_STOP_BLOCKS)))
    return (keyed.groupBy("block").agg(F.count("*").alias("n_forms"))
            .filter(F.col("n_forms") > max_block)
            .withColumn("n_dropped", F.col("n_forms") - max_block))


def match_edges(forms: DataFrame, threshold: float = MATCH_THRESHOLD,
                max_block: int = DEFAULT_MAX_BLOCK,
                canonical_rounds: int = 3) -> DataFrame:
    """Accepted match pairs (key_a, key_b) for connected components.

    Two reference-resolver behaviors are replicated
    (find_best_match, extraction_pipeline.py:257-271, 615-733):

    1. **Argmax, not transitive closure** — each incoming entity merges with
       its single best-scoring candidate (strict ``>`` → first-stored wins
       ties).  Per later form (key_b) only the best edge is kept; the result
       is a functional forest collapsed by large-star/small-star.
    2. **Scores are against cluster CANONICAL names** — aliases only aid
       candidate discovery; ``find_best_match`` scores
       ``candidate.canonical_name``.  A form-level score can admit chain
       merges the reference rejects (e.g. "Aperture" scores 0.9 vs alias
       "Aperture LLC" but 0.79̅ vs that cluster's canonical
       "and Aperture Corporation").  Replicated by iterative refinement:
       build components from current edges, re-score every candidate pair
       against the earlier side's component canonical with the later form's
       validated type, re-argmax with the ≥ threshold cut, repeat until the
       edge set is stable (2-3 rounds in practice; round 0 = every form its
       own canonical, i.e. the plain pair scores).
    """
    pairs = candidate_pairs(forms, max_block).localCheckpoint()

    def best_edges(scored: DataFrame) -> DataFrame:
        w = Window.partitionBy("key_b").orderBy(F.desc("score"),
                                                F.asc("canon_key"))
        return (scored.filter(F.col("score") >= threshold)
                .withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") == 1)
                .select(F.col("canon_key").alias("key_a"), "key_b"))

    # round 0: canonical(a) = a itself
    edges = best_edges(pairs.withColumn("canon_key", F.col("key_a")))
    prev_sig = None
    for _ in range(canonical_rounds):
        edges = edges.localCheckpoint()
        sig = edges.agg(
            F.count("*"),
            F.coalesce(F.expr("bit_xor(xxhash64(key_a, key_b))"), F.lit(0))
        ).collect()[0]
        if (sig[0], sig[1]) == prev_sig:
            break
        prev_sig = (sig[0], sig[1])
        canon_of = _forest_roots(edges)  # (form_key, canon_key); exact —
        # the argmax edge set is a functional forest pointing later → earlier
        canon_names = forms.select(F.col("form_key").alias("canon_key"),
                                   F.col("name").alias("canon_name"))
        rescored = (pairs
                    .join(canon_of.withColumnRenamed("form_key", "key_a"),
                          "key_a", "left")
                    .withColumn("canon_key",
                                F.coalesce("canon_key", F.col("key_a")))
                    .join(canon_names, "canon_key")
                    # pairs whose earlier side is its own canonical keep the
                    # already-computed form score; only chain members re-score
                    .withColumn("score",
                                F.when(F.col("canon_key") == F.col("key_a"),
                                       F.col("score"))
                                .otherwise(_pair_score("canon_name", "name_b",
                                                       "etype_b"))))
        edges = best_edges(rescored)
    return edges.select("key_a", "key_b")


def _forest_roots(edges: DataFrame, max_doubling: int = 5) -> DataFrame:
    """(form_key → root form_key) for a functional forest where every edge
    points from a later key_b to an earlier key_a — path doubling, exact in
    ⌈log2 depth⌉ joins (the root is the tree's minimum key since every
    parent precedes its child).
    """
    m = edges.select(F.col("key_b").alias("form_key"),
                     F.col("key_a").alias("canon_key")).localCheckpoint()
    for _ in range(max_doubling):
        parent = m.select(F.col("form_key").alias("canon_key"),
                          F.col("canon_key").alias("grand"))
        m2 = (m.join(parent, "canon_key", "left")
              .select("form_key", F.coalesce("grand", "canon_key")
                      .alias("canon_key"))
              .localCheckpoint())
        changed = (m2.subtract(m)).limit(1).count()
        m = m2
        if changed == 0:
            break
    return m
