"""Graph mutation primitives: explicit entity merge + soft delete.

DataFrame re-expressions of the reference's row-level updates:

  merge_entities .... database.py:242-262 — repoint mentions, aliases and
                      edge endpoints from the merged entity to the kept one,
                      then tombstone the merged entity.  The reference keeps
                      everything else untouched (no self-loop removal, no
                      alias dedup) — replicated exactly.
  delete_entity ..... database.py:233-239 (P9) — soft delete: set
                      status='tombstone', leave all rows in place.

Shape: all four tables are rewritten through one broadcast join against the
merge map.  On an Iceberg catalog the same statements become row-level
``MERGE INTO`` / ``UPDATE`` (only touched rows rewritten); on parquet stage
tables the rewrite is a full-column scan — still fully distributed, no
driver-side row handling.  Bulk form first: merging one pair per Spark job
at 10^12-row scale would be the anti-pattern, so the scalar API delegates
to the DataFrame-map form.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MERGE_MAP_DDL = "lose_id string, keep_id string"


def _repoint(df: DataFrame, col: str, merge_map: DataFrame) -> DataFrame:
    m = F.broadcast(merge_map.withColumnRenamed("lose_id", col))
    return (df.join(m, col, "left")
            .withColumn(col, F.coalesce("keep_id", F.col(col)))
            .drop("keep_id"))


def merge_entities_bulk(nodes: DataFrame, edges: DataFrame,
                        aliases: DataFrame | None,
                        mentions: DataFrame | None,
                        merge_map: DataFrame) -> dict:
    """Apply a (lose_id → keep_id) map: repoint edges/aliases/mentions,
    tombstone losers.  Returns {"nodes", "edges", "aliases", "mentions"}.

    ``merge_map`` must be a functional map (one keep per lose); chains
    (a→b, b→c) are the caller's responsibility to pre-collapse (e.g. via
    components.connected_components on the merge pairs).
    """
    out = {"nodes": None, "edges": None, "aliases": None, "mentions": None}
    losers = merge_map.select(F.col("lose_id").alias("id"))
    out["nodes"] = (nodes.join(F.broadcast(losers.withColumn("_lose", F.lit(True))),
                               "id", "left")
                    .withColumn("status",
                                F.when(F.col("_lose"), F.lit("tombstone"))
                                .otherwise(F.col("status")))
                    .drop("_lose"))
    out["edges"] = _repoint(_repoint(edges, "src", merge_map), "dst", merge_map)
    if aliases is not None:
        out["aliases"] = _repoint(aliases, "entity_id", merge_map)
    if mentions is not None:
        out["mentions"] = _repoint(mentions, "entity_id", merge_map)
    return out


def merge_entities(nodes: DataFrame, edges: DataFrame,
                   aliases: DataFrame | None, mentions: DataFrame | None,
                   keep_id: str, lose_id: str) -> dict:
    """Single-pair convenience wrapper (the reference API shape,
    server.py:377-399)."""
    spark = nodes.sparkSession
    merge_map = spark.createDataFrame([(lose_id, keep_id)], MERGE_MAP_DDL)
    return merge_entities_bulk(nodes, edges, aliases, mentions, merge_map)


def delete_entities(nodes: DataFrame, entity_ids: list[str]) -> DataFrame:
    """Soft delete (tombstone) — database.py:233-239.  Rows stay; readers
    filter status='active' (P2/P3 semantics)."""
    return nodes.withColumn(
        "status", F.when(F.col("id").isin(entity_ids), F.lit("tombstone"))
        .otherwise(F.col("status")))


def active(nodes: DataFrame) -> DataFrame:
    """The P2/P3 read-side filter."""
    return nodes.filter(F.col("status") == "active")
