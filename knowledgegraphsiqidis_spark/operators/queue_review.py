"""Resolution-queue review workflow: pop pending items, apply decisions.

The reference lets a human pop queued ambiguous mentions and link each to a
chosen entity:

  pop ..... ``Database.get_pending_resolutions`` (database.py:532-548):
            ``status='pending' ORDER BY created_at LIMIT n``.  Queue rows
            here are keyed by ``form_key = "conv_id#seq"`` — insertion
            order, i.e. exactly the reference's created_at order.
  apply ... ``Database.resolve_queue_item`` (database.py:550-573) via
            ``KnowledgeGraph.resolve_entity`` (knowledge_graph.py:210-212):
            insert a mentions-table row linking the queued surface text (at
            its recorded span) to the chosen entity, and set
            ``status='resolved'``.  The reference does NOT merge away the
            entity it auto-created at queue time
            (extraction_pipeline.py:684) — replicated exactly by default;
            ``merge=True`` additionally folds the queued form's own entity
            into the chosen one through ``mutate.merge_entities_bulk`` (the
            graph-native cleanup the reference leaves to a later manual
            merge).

A decision with a NULL ``entity_id`` is "keep as its own entity": the row
is marked resolved and no mention is linked (the auto-created entity from
queue time already carries the mention) — the reject half of the review
loop.

Bulk shape: decisions arrive as a DataFrame, the queue/mentions/graph
tables are rewritten through broadcast joins against it — one Spark job for
any number of reviewed items, never a per-item update loop.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .mutate import merge_entities_bulk

DECISIONS_DDL = "form_key string, entity_id string"


def pending_resolutions(queue: DataFrame, limit: int = 50) -> DataFrame:
    """Pending queue items, oldest first (reference pop order)."""
    return (queue.filter(F.col("status") == "pending")
            .orderBy("form_key").limit(limit))


def _accepted(decisions: DataFrame) -> DataFrame:
    return decisions.filter(F.col("entity_id").isNotNull())


def apply_resolutions(queue: DataFrame, decisions: DataFrame,
                      extractions: DataFrame | None = None,
                      nodes: DataFrame | None = None,
                      edges: DataFrame | None = None,
                      aliases: DataFrame | None = None,
                      mentions: DataFrame | None = None,
                      merge: bool = False) -> dict:
    """Apply reviewer decisions (form_key → entity_id | NULL) to the queue.

    Returns ``{"queue", "new_mentions", "nodes", "edges", "aliases",
    "mentions"}``; graph tables are None unless ``merge=True`` (and passed).
    ``extractions`` recovers each queued form's first-occurrence span for
    the mention row (the reference stored the span on the queue item;
    form_key = "conv_id#seq" points straight at that extraction row).  The
    reference's ``context_snippet`` is not persisted by the columnar
    extraction schema — the span + conversation id identify the context.
    """
    out = {"nodes": None, "edges": None, "aliases": None, "mentions": None}
    # one decision per form: duplicate form_key rows would fan out through
    # every join below (duplicated queue/mention/merge-map rows).  Collapse
    # deterministically — max entity_id wins, and max ignores NULLs, so a
    # link decision beats a keep-own duplicate for the same form.
    decisions = (decisions.groupBy("form_key")
                 .agg(F.max("entity_id").alias("entity_id")))
    # decision-row PRESENCE resolves the item (a NULL entity_id is the
    # keep-own decision), not entity presence
    marker = F.broadcast(decisions.select("form_key")
                         .withColumn("_seen", F.lit(True)))
    out["queue"] = (
        queue.join(marker, "form_key", "left")
        .withColumn("status",
                    F.when((F.col("status") == "pending") & F.col("_seen"),
                           F.lit("resolved")).otherwise(F.col("status")))
        .drop("_seen"))

    acc = _accepted(decisions)
    link = (queue.filter(F.col("status") == "pending")
            .join(F.broadcast(acc), "form_key")
            .withColumn("conv_id", F.substring_index("form_key", "#", 1))
            .withColumn("seq", F.substring_index("form_key", "#", -1)
                        .cast("int")))
    if extractions is not None:
        spans = extractions.select("conv_id", "seq", "turn_idx",
                                   "span_start", "span_end")
        link = link.join(spans, ["conv_id", "seq"], "left")
    else:
        link = (link.withColumn("turn_idx", F.lit(None).cast("int"))
                .withColumn("span_start", F.lit(None).cast("int"))
                .withColumn("span_end", F.lit(None).cast("int")))
    out["new_mentions"] = link.select(
        "entity_id", "conv_id", "turn_idx", "span_start", "span_end",
        "surface_text")

    if merge and nodes is not None and edges is not None:
        # the queued form stayed its own cluster root, so its entity id IS
        # its form_key (resolve.match_edges queue contract)
        merge_map = acc.select(F.col("form_key").alias("lose_id"),
                               F.col("entity_id").alias("keep_id"))
        merged = merge_entities_bulk(
            nodes, edges, aliases,
            None if mentions is None
            else mentions.unionByName(out["new_mentions"]),
            merge_map)
        out.update(merged)
    return out
