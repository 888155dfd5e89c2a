"""Stage 4 — graph materialization: nodes/edges/aliases/mentions/triples.

Relabels every mention and raw triple through the canonical map produced by
ER + connected components, then shapes the reference's persisted model
(database.py:24-132) as columnar tables.  Canonical-name selection mirrors
the reference's insertion-order behavior: the representative form is the
one with the minimal (conv_id, seq) mention, i.e. what the reference would
have inserted first when processing conversations in order.

All joins here are equi-joins on form/component keys; the nodes side of the
edge-relabel join is small (distinct canonical entities) and is broadcast.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .components import connected_components
from .resolve import entity_forms, match_edges


def canonical_map(extractions: DataFrame,
                  threshold: float = 0.8,
                  max_block: int = 200) -> tuple[DataFrame, DataFrame]:
    """Returns (forms_with_component, nodes).

    forms_with_component: er_type, name, norm_name, form_key, component
    nodes: component (= entity id), type, canonical_name, confidence, status
    """
    forms = entity_forms(extractions).localCheckpoint()
    matches = match_edges(forms, threshold=threshold, max_block=max_block)
    comp = connected_components(matches)

    # Pin before fan-out: nodes/aliases/mentions/edge-relabel all derive from
    # forms_c — without the checkpoint each consumer would re-run the pair
    # scoring UDF and the whole CC iteration.
    forms_c = (forms.join(comp, forms.form_key == comp.node, "left")
               .withColumn("component", F.coalesce("component", "form_key"))
               .drop("node")
               .localCheckpoint())

    # Representative form = min form_key per component → canonical name/type.
    reps = (forms_c
            .groupBy("component")
            .agg(F.min_by("name", "form_key").alias("canonical_name"),
                 F.min_by("er_type", "form_key").alias("type"),
                 F.sum("n_mentions").alias("n_mentions")))
    nodes = (reps.select(
        F.col("component").alias("id"), "type", "canonical_name",
        F.lit("confirmed").alias("confidence"),
        F.lit("active").alias("status"), "n_mentions"))
    return forms_c, nodes


def mention_component_map(extractions: DataFrame, forms_c: DataFrame,
                          needed_names: DataFrame | None = None) -> DataFrame:
    """(conv_id, lower(name)) → component, for relabeling conv-scoped triples.

    When a party and a term share a name within one conversation the
    reference's ``entity_map`` keeps the later insertion
    (extraction_pipeline.py:621-731 dict overwrite) — replicated with
    max_by(seq).

    ``needed_names`` (a DataFrame with one ``name_l`` column, e.g. the
    distinct triple endpoint names) is broadcast as a semi-join pre-filter:
    triples reference only a few distinct names, so the groupBy over the full
    mention stream would otherwise shuffle mostly-unused rows.
    """
    m = (extractions.filter(F.col("kind").isin("party", "term", "doc"))
         .select("conv_id", "seq", "name", "er_type",
                 F.lower("name").alias("name_l")))
    if needed_names is not None:
        m = m.join(F.broadcast(needed_names.select("name_l").distinct()),
                   "name_l", "left_semi")
    m = m.join(forms_c.select("er_type", "name", "component"),
               ["er_type", "name"])
    return (m.groupBy("conv_id", "name_l")
            .agg(F.max_by("component", "seq").alias("component")))


def materialize_edges(raw_triples: DataFrame, mention_map: DataFrame) -> DataFrame:
    """Relabel (conv_id, subj, obj) through the per-conversation entity map."""
    t = (raw_triples
         .withColumn("subj_l", F.lower("subj"))
         .withColumn("obj_l", F.lower("obj")))
    s_map = mention_map.select(F.col("conv_id").alias("s_conv"),
                               F.col("name_l").alias("subj_l"),
                               F.col("component").alias("src"))
    o_map = mention_map.select(F.col("conv_id").alias("o_conv"),
                               F.col("name_l").alias("obj_l"),
                               F.col("component").alias("dst"))
    joined = (t.join(s_map, (t.conv_id == s_map.s_conv) & (t.subj_l == s_map.subj_l))
              .join(o_map, (t.conv_id == o_map.o_conv) & (t.obj_l == o_map.obj_l)))
    # Edge id hashes the RAW (deduped) triple key — (conv_id, pred, subj_l,
    # obj_l) is unique per row after infer's per-conv dedupe — so two distinct
    # raw triples that resolve to the same canonical endpoints keep distinct
    # ids, matching the reference's uuid-per-edge row-key shape (models.py).
    return (joined.select(
        F.sha2(F.concat_ws("|", t.conv_id, t.pred, t.subj_l, t.obj_l), 256).alias("id"),
        "src", "dst",
        F.col("pred").alias("relation_type"),
        F.map_from_arrays(F.array(F.lit("inferred")),
                          F.array(F.col("inferred").cast("string"))).alias("properties"),
        F.lit("extracted").alias("confidence"),
        F.col("conv_id").alias("provenance_doc_id")))


def triples_view(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """(subj, pred, obj) with canonical names — the parity artifact."""
    s = nodes.select(F.col("id").alias("src"), F.col("canonical_name").alias("subj"))
    o = nodes.select(F.col("id").alias("dst"), F.col("canonical_name").alias("obj"))
    return (edges.join(F.broadcast(s), "src").join(F.broadcast(o), "dst")
            .select("subj", F.col("relation_type").alias("pred"), "obj")
            .distinct())


def aliases_table(extractions: DataFrame, forms_c: DataFrame) -> DataFrame:
    """All distinct surface forms + extracted quoted aliases per entity."""
    surface = (forms_c.select(F.col("component").alias("entity_id"),
                              F.col("name").alias("alias_text"),
                              F.lit("extracted").alias("source")))
    quoted = (extractions.filter(F.col("kind") == "party")
              .select("er_type", "name", F.explode("aliases").alias("alias_text"))
              .join(forms_c.select("er_type", "name", "component"),
                    ["er_type", "name"])
              .select(F.col("component").alias("entity_id"), "alias_text",
                      F.lit("defined_term").alias("source")))
    canon = forms_c.groupBy("component").agg(F.min_by("name", "form_key").alias("c"))
    return (surface.unionByName(quoted).distinct()
            .join(canon, F.col("entity_id") == F.col("component"))
            .filter(F.lower("alias_text") != F.lower("c"))
            .select("entity_id", "alias_text", "source")
            .distinct())


def mentions_table(extractions: DataFrame, forms_c: DataFrame) -> DataFrame:
    return (extractions.filter(F.col("kind").isin("party", "term"))
            .join(forms_c.select("er_type", "name", "component"),
                  ["er_type", "name"])
            .select(F.col("component").alias("entity_id"), "conv_id", "turn_idx",
                    "span_start", "span_end",
                    F.col("name").alias("surface_text")))


def lineage_for(df: DataFrame, stage: str, conv_col: str = "conv_id") -> DataFrame:
    """Per-partition row counts + conv range + checksum (north_rule lineage)."""
    # MAP columns are excluded — Spark prohibits hashing maps (undefined
    # entry order); the remaining columns identify a row for lineage purposes.
    cols = [f.name for f in df.schema.fields
            if not f.dataType.typeName().startswith("map")]
    checksum = F.expr(f"bit_xor(xxhash64({', '.join(cols)}))").alias("checksum")
    return (df
            .groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.lit(stage).alias("stage"),
                 F.count("*").alias("rows_out"),
                 F.min(conv_col).alias("conv_id_min"),
                 F.max(conv_col).alias("conv_id_max"),
                 checksum)
            .select("stage", "partition_id", "rows_out",
                    "conv_id_min", "conv_id_max", "checksum"))
