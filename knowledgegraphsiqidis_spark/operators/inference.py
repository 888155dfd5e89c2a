"""Graph-level inference operators (reference graph_inference.py) as
DataFrame programs — behavior-faithful re-expressions of:

  entity importance composite .... graph_inference.py:71-209 (G11)
      0.35·PageRank + 0.20·log1p(degree) + 0.15·log1p(relation diversity)
      + 0.20·mention share + 0.10·type weight; PageRank here is the
      reference's formulation (init 1/n, (1-d)/n + d·Σ rank/out_deg, no
      dangling redistribution, final score ×n)
  Bayesian entity resolution ..... graph_inference.py:213-336 (G14)
      evidence features → weighted log-linear → sigmoid → normalized
  fact corroboration ............. graph_inference.py:340-419 (G15)
      (1−e^(−0.5·sources)) · e^(−0.3·contradictions) · type prior
  contradiction detection ........ graph_inference.py:421-487 (G16)
      word-overlap-blocked fact pairs + negation-pair table + conflicting
      $amount/year/% sets
  transitive + common-neighbor ... graph_inference.py:491-627 (G17)
      2-hop self-joins with path-pattern relation typing and anti-join
      against direct edges

Everything is joins/aggregations/column expressions; the only Python is the
negation-pair constant table.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TYPE_WEIGHTS = {
    "Person": 1.5, "Organization": 1.5, "Fact": 1.2, "Date": 0.8,
    "Money": 1.0, "Location": 0.7, "Document": 0.5, "Reference": 0.3,
    "Clause": 0.6,
}

FACT_TYPE_PRIORS = {
    "finding": 0.9, "obligation": 0.95, "allegation": 0.6,
    "key_term": 0.85, "deadline": 0.9,
}

NEGATION_PAIRS = [
    ("did", "did not"), ("was", "was not"), ("is", "is not"),
    ("has", "has not"), ("failed", "succeeded"), ("correct", "incorrect"),
    ("true", "false"), ("confirmed", "denied"),
]

PATH_PATTERNS = {
    ("Person", "employed_by", "party_to", "Organization"): "indirectly_involved_with",
    ("Person", "affiliated_with", "party_to", "Document"): "may_be_mentioned_in",
    ("Organization", "party_to", "about", "Fact"): "subject_of_fact",
    ("Person", "authored", "about", "Fact"): "asserts",
}


def _map_lookup(col, table: dict, default: float):
    expr = None
    for k, v in table.items():
        expr = F.when(col == k, v) if expr is None else expr.when(col == k, v)
    return expr.otherwise(default)


def pagerank_reference(nodes: DataFrame, edges: DataFrame,
                       damping: float = 0.85, iterations: int = 20) -> DataFrame:
    """The reference's PageRank variant (graph_inference.py:147-160): no
    dangling-mass redistribution, scores finally multiplied by n."""
    n = nodes.count()
    if n == 0:
        return nodes.select("id", F.lit(0.0).alias("pagerank"))
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    links = edges.select("src", "dst").join(out_deg, "src")
    ranks = nodes.select("id", F.lit(1.0 / n).alias("rank")).localCheckpoint()
    for _ in range(iterations):
        contribs = (links.join(ranks, links.src == ranks.id)
                    .select(F.col("dst").alias("id"),
                            (F.col("rank") / F.col("out_deg")).alias("c"))
                    .groupBy("id").agg(F.sum("c").alias("contrib")))
        ranks = (ranks.select("id")
                 .join(contribs, "id", "left")
                 .select("id", (F.lit((1 - damping) / n) + F.lit(damping)
                                * F.coalesce("contrib", F.lit(0.0))).alias("rank"))
                 .localCheckpoint())
    return ranks.select("id", (F.col("rank") * n).alias("pagerank"))


def entity_importance(nodes: DataFrame, edges: DataFrame,
                      mention_counts: DataFrame | None = None,
                      damping: float = 0.85, iterations: int = 20) -> DataFrame:
    """Composite importance score (G11), one row per node, sorted desc."""
    pr = pagerank_reference(nodes, edges, damping, iterations)

    in_d = edges.groupBy(F.col("dst").alias("id")).agg(
        F.count("*").alias("in_degree"))
    out_d = edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("out_degree"))
    # relation-type diversity counts distinct types over BOTH directions
    # (graph_inference.py:122-138 adds both edge lists to one set)
    both = edges.select(F.col("src").alias("id"), "relation_type").unionAll(
        edges.select(F.col("dst").alias("id"), "relation_type"))
    div = both.groupBy("id").agg(
        F.countDistinct("relation_type").alias("rel_diversity"))

    if mention_counts is None:
        mention_counts = nodes.select(
            "id", F.coalesce(F.col("n_mentions"), F.lit(0)).alias("mention_count")
        ) if "n_mentions" in nodes.columns else nodes.select(
            "id", F.lit(0).alias("mention_count"))
    max_mentions = mention_counts.agg(
        F.greatest(F.max("mention_count"), F.lit(1))).collect()[0][0]

    joined = (nodes.select("id", "type", "canonical_name")
              .join(pr, "id", "left")
              .join(in_d, "id", "left").join(out_d, "id", "left")
              .join(div, "id", "left")
              .join(mention_counts, "id", "left")
              .fillna(0, subset=["pagerank", "in_degree", "out_degree",
                                 "rel_diversity", "mention_count"]))
    score = (
        0.35 * F.col("pagerank")
        + 0.20 * F.log1p(F.col("in_degree") + F.col("out_degree"))
        + 0.15 * F.log1p(F.col("rel_diversity"))
        + 0.20 * (F.col("mention_count") / F.lit(float(max_mentions)))
        + 0.10 * _map_lookup(F.col("type"), TYPE_WEIGHTS, 1.0))
    return (joined.withColumn("importance", score)
            .orderBy(F.desc("importance"), F.asc("canonical_name")))


def bayesian_resolve(nodes: DataFrame, aliases: DataFrame,
                     edges: DataFrame, query_name: str,
                     entity_type: str | None = None,
                     limit: int = 50) -> DataFrame:
    """P(entity | query) per candidate, normalized (G14)."""
    q = query_name.lower().strip()
    name_l = F.lower(F.trim("canonical_name"))
    cand = nodes.filter(name_l.contains(q))
    alias_hits = (aliases.withColumn("alias_l", F.lower(F.trim("alias_text")))
                  .filter(F.col("alias_l").contains(q) | F.lit(q).contains(F.col("alias_l")))
                  .groupBy(F.col("entity_id").alias("id"))
                  .agg(F.max(F.when(F.col("alias_l") == q, 1).otherwise(0))
                       .alias("alias_exact_hit")))
    # candidates = name-containment hits ∪ alias hits (database.py:204-215).
    # Type filter BEFORE the limit, and a deterministic ordering before it —
    # the reference's LIMIT follows stable insertion order (database.py:204-
    # 215); an unordered DataFrame .limit() would be nondeterministic across
    # partitionings, violating the engine's determinism guarantee.
    cand = (cand.unionByName(
        nodes.join(alias_hits.select("id"), "id", "left_semi"))
        .dropDuplicates(["id"]))
    if entity_type:
        cand = cand.filter(F.col("type") == entity_type)
    cand = cand.orderBy(F.asc("id")).limit(limit)

    qw = F.array(*[F.lit(w) for w in q.split()])
    name_words = F.split(name_l, r"\s+")
    exact = F.when(name_l == q, 1.0).otherwise(0.0)
    substring = F.when((exact == 0.0)
                       & (name_l.contains(q) | F.lit(q).contains(name_l)),
                       0.7).otherwise(0.0)
    overlap = F.when(
        (exact == 0.0) & (substring == 0.0),
        F.size(F.array_intersect(name_words, qw))
        / F.greatest(F.size(F.array_union(name_words, qw)), F.lit(1))
    ).otherwise(0.0)

    deg = edges.select(F.col("src").alias("id")).unionAll(
        edges.select(F.col("dst").alias("id"))).groupBy("id").agg(
        F.count("*").alias("deg"))
    cand = (cand.join(alias_hits, "id", "left").join(deg, "id", "left")
            .fillna(0, subset=["deg"]))
    alias_exact = F.when(F.coalesce("alias_exact_hit", F.lit(0)) == 1, 0.9) \
        .otherwise(0.0)
    mention_prior = (F.log1p(F.coalesce(F.col("n_mentions"), F.lit(0))) / 10
                     if "n_mentions" in cand.columns else F.lit(0.0))
    edge_prior = F.log1p(F.col("deg")) / 20
    conf_prior = _map_lookup(F.col("confidence"),
                             {"confirmed": 1.0, "extracted": 0.7,
                              "inferred": 0.4}, 0.5)
    log_score = (2.0 * exact + 1.2 * substring + 1.0 * overlap
                 + 1.5 * alias_exact + 0.4 * mention_prior
                 + 0.3 * edge_prior + 0.5 * conf_prior)
    raw_p = F.lit(1.0) / (F.lit(1.0) + F.exp(-log_score))
    scored = cand.withColumn("raw_p", raw_p)
    # Normalize with an unpartitioned window instead of a driver collect: the
    # candidate set is ≤ limit rows by construction, so the single-partition
    # window is bounded and the whole operator stays one Spark job.
    total = F.sum("raw_p").over(Window.partitionBy())
    return (scored.withColumn("probability", F.col("raw_p") / total)
            .select("id", "canonical_name", "type",
                    F.round("probability", 6).alias("probability"))
            .orderBy(F.desc("probability"), F.asc("id")))


TOKEN_DF_CAP = 100


def _fact_words(facts: DataFrame, id_col: str, text_col: str) -> DataFrame:
    f = facts.select(F.col(id_col).alias("id"),
                     F.lower(F.col(text_col)).alias("txt"))
    return f.select("id", "txt", F.explode(F.array_distinct(
        F.split("txt", r"\s+"))).alias("w"))


def hot_tokens(facts: DataFrame, max_df: int = TOKEN_DF_CAP,
               id_col: str = "fact_id", text_col: str = "text") -> DataFrame:
    """Tokens the contradiction blocker drops (document frequency > max_df),
    with their df — no silent caps: callers surface this next to the
    contradiction output (same contract as dedup.hot_shingles)."""
    return (_fact_words(facts, id_col, text_col)
            .groupBy("w").agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df))


def contradictions(facts: DataFrame, min_overlap: int = 5,
                   id_col: str = "fact_id", text_col: str = "text",
                   max_df: int | None = None) -> DataFrame:
    """Contradicting fact pairs (G16): word-overlap blocking + negation pairs
    + conflicting number sets, all column expressions.

    ``max_df=None`` (the default) is the reference's EXACT uncapped
    semantics.  At corpus scale callers should pass
    ``max_df=TOKEN_DF_CAP``: tokens with document frequency above ``max_df``
    are dropped from the inverted index BEFORE the self-join (the same df
    cap as dedup.ngram_jaccard_pairs) — a token shared by k facts ("the",
    "shall") generates k² candidate rows, and the reference's overlap>=5
    filter runs only AFTER the join, so the uncapped hot-token join is the
    quadratic term at scale.  Consequence of capping (documented
    divergence, opt-IN on this public API per the round-3 advice, and
    mirrored in the DuckDB oracle where the bench passes it): ``overlap``
    counts only sub-cap shared tokens, so a pair whose overlap relies on
    >max_df-frequency words is not blocked together.  Dropped tokens are
    surfaced by :func:`hot_tokens`.
    """
    words = _fact_words(facts, id_col, text_col)
    if max_df is not None:
        dfc = (words.groupBy("w").agg(F.count("*").alias("_df"))
               .filter(F.col("_df") <= max_df).select("w"))
        words = words.join(dfc, "w", "left_semi")
    a = words.select(F.col("id").alias("id_a"), F.col("txt").alias("txt_a"), "w")
    b = words.select(F.col("id").alias("id_b"), F.col("txt").alias("txt_b"), "w")
    pairs = (a.join(b, "w").filter(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "txt_a", "id_b", "txt_b")
             .agg(F.count("*").alias("overlap"))
             .filter(F.col("overlap") >= min_overlap))

    neg = F.lit(False)
    reason = F.lit(None).cast("string")
    for pos, negw in NEGATION_PAIRS:
        hit = ((F.col("txt_a").contains(pos) & F.col("txt_b").contains(negw))
               | (F.col("txt_a").contains(negw) & F.col("txt_b").contains(pos)))
        reason = F.when(neg, reason).when(
            hit, F.lit(f"Potential negation: '{pos}' vs '{negw}'")).otherwise(reason)
        neg = neg | hit

    num_re = r"\$[\d,]+|\d{4}|\d+%"
    nums_a = F.array_sort(F.array_distinct(F.regexp_extract_all("txt_a", F.lit(num_re), 0)))
    nums_b = F.array_sort(F.array_distinct(F.regexp_extract_all("txt_b", F.lit(num_re), 0)))
    num_conflict = ((F.col("overlap") > 10) & (F.size(nums_a) > 0)
                    & (F.size(nums_b) > 0) & (nums_a != nums_b))
    reason = F.when(neg, reason).when(
        num_conflict, F.lit("Conflicting values")).otherwise(reason)

    return (pairs.filter(neg | num_conflict)
            .select("id_a", "id_b", "overlap", reason.alias("reason")))


def fact_corroboration(facts: DataFrame, fact_sources: DataFrame,
                       id_col: str = "fact_id", text_col: str = "text",
                       type_col: str = "fact_type",
                       max_df: int | None = None) -> DataFrame:
    """Corroboration score per fact (G15).  ``fact_sources``:
    (fact_id, source_doc) rows from mentions/edge provenance.
    ``max_df`` is passed through to the contradiction blocker — None
    (default) = reference-exact uncapped; pass ``TOKEN_DF_CAP`` at corpus
    scale (contradictions docstring)."""
    src_counts = fact_sources.groupBy(id_col).agg(
        F.countDistinct("source_doc").alias("source_count"))
    contra = contradictions(facts, id_col=id_col, text_col=text_col,
                            max_df=max_df)
    contra_counts = (contra.select(F.col("id_a").alias(id_col))
                     .unionAll(contra.select(F.col("id_b").alias(id_col)))
                     .groupBy(id_col).agg(F.count("*").alias("contradiction_count")))
    out = (facts.join(src_counts, id_col, "left")
           .join(contra_counts, id_col, "left")
           .fillna(0, subset=["source_count", "contradiction_count"]))
    score = ((F.lit(1.0) - F.exp(-0.5 * F.col("source_count")))
             * F.exp(-0.3 * F.col("contradiction_count"))
             * _map_lookup(F.col(type_col), FACT_TYPE_PRIORS, 0.7))
    return (out.withColumn("corroboration_score", F.round(score, 6))
            .select(id_col, type_col, "source_count", "contradiction_count",
                    "corroboration_score")
            .orderBy(F.desc("corroboration_score"), F.asc(id_col)))


def transitive_inference(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """A→B→C ⇒ A inferred-relates C, for all nodes at once (G17 transitive).

    The reference runs per-entity with seen-pair dedup and a 20-row cap;
    here the whole graph is one 2-hop self-join with an anti-join against
    direct edges — identical pair semantics, global instead of per-call.
    """
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"),
                      F.col("relation_type").alias("rel1"),
                      F.col("confidence").alias("conf1"))
    e2 = edges.select(F.col("src").alias("b"), F.col("dst").alias("c"),
                      F.col("relation_type").alias("rel2"),
                      F.col("confidence").alias("conf2"))
    two_hop = (e1.join(e2, "b")
               .filter(F.col("a") != F.col("c")))
    direct = edges.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    # One inferred edge per (a, c); the witness path is chosen by the minimal
    # (rel1, rel2, b) key — dropDuplicates would keep an arbitrary row and
    # make the inferred relation label nondeterministic across partitionings.
    w = Window.partitionBy("a", "c").orderBy("rel1", "rel2", "b",
                                             "conf1", "conf2")
    two_hop = (two_hop.join(direct, ["a", "c"], "left_anti")
               .withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") == 1).drop("_rn"))

    t = nodes.select(F.col("id"), F.col("type"))
    two_hop = (two_hop
               .join(t.select(F.col("id").alias("a"),
                              F.col("type").alias("a_type")), "a")
               .join(t.select(F.col("id").alias("c"),
                              F.col("type").alias("c_type")), "c"))

    rel = None
    for (st, r1, r2, tt), out in PATH_PATTERNS.items():
        cond = ((F.col("a_type") == st) & (F.col("rel1") == r1)
                & (F.col("rel2") == r2) & (F.col("c_type") == tt))
        rel = F.when(cond, out) if rel is None else rel.when(cond, out)
    rel = rel.otherwise(F.concat(F.lit("inferred_"), F.col("rel1"),
                                 F.lit("_then_"), F.col("rel2")))

    conf1 = F.when(F.col("conf1") == "confirmed", 0.8).otherwise(0.5)
    conf2 = F.when(F.col("conf2") == "confirmed", 0.8).otherwise(0.5)
    return two_hop.select(
        F.col("a").alias("source_id"), F.col("c").alias("target_id"),
        rel.alias("inferred_relation"),
        F.round(0.5 * conf1 * conf2, 4).alias("confidence"))


def common_neighbor_inference(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """A→X ← B ⇒ A related_via_<X.type> B (G17 common-neighbor)."""
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("x"))
    e2 = edges.select(F.col("src").alias("b"), F.col("dst").alias("x"))
    pairs = (e1.join(e2, "x")
             .filter(F.col("a") < F.col("b")))
    direct = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    direct_sym = direct.unionAll(direct.select(F.col("b").alias("a"),
                                               F.col("a").alias("b")))
    pairs = pairs.join(direct_sym, ["a", "b"], "left_anti") \
        .dropDuplicates(["a", "b", "x"])
    xt = nodes.select(F.col("id").alias("x"), F.col("type").alias("x_type"))
    pairs = pairs.join(xt, "x")
    conf = F.when(F.col("x_type").isin("Organization", "Document"), 0.4) \
        .otherwise(0.3)
    return pairs.select(
        F.col("a").alias("source_id"), F.col("b").alias("target_id"),
        F.concat(F.lit("related_via_"), F.lower("x_type"))
        .alias("inferred_relation"),
        conf.alias("confidence"))


def answer_confidence(n_entities: int, n_facts: int, n_edges: int,
                      avg_corroboration: float = 0.7) -> float:
    """Weighted evidence aggregation (G18, graph_inference.py:631-700 shape):
    driver-side scalar — the inputs are already aggregates."""
    import math
    evidence = (0.4 * min(n_entities / 5.0, 1.0)
                + 0.3 * min(n_facts / 5.0, 1.0)
                + 0.2 * min(n_edges / 10.0, 1.0)
                + 0.1 * avg_corroboration)
    return round(1 / (1 + math.exp(-4 * (evidence - 0.5))), 4)
