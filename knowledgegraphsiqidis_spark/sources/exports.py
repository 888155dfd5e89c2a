"""Graph export sinks (reference K2-K5).

  export_json ..... whole-graph JSON (K2, knowledge_graph.py:267-280)
  export_csv ...... entities.csv + edges-with-names.csv (K3, cli/export.py:41-80)
  export_graphml .. GraphML XML (K4, server.py:983-1019) — collect + template;
                    the reference builds this in-memory too, and GraphML is a
                    single-document format, so driver assembly is inherent
  viz_subgraph .... top-N-by-degree nodes + induced edges for D3 (K5,
                    graph_exporter.py:34-146) — stays distributed until the
                    final bounded collect
"""
from __future__ import annotations

from xml.sax.saxutils import escape

from pyspark.sql import DataFrame, functions as F

from ..operators.analytics import degree, induced_subgraph


def denormalized_edges(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Edge list with endpoint names (the K3 csv payload)."""
    s = nodes.select(F.col("id").alias("src"),
                     F.col("canonical_name").alias("source_name"))
    t = nodes.select(F.col("id").alias("dst"),
                     F.col("canonical_name").alias("target_name"))
    return (edges.join(F.broadcast(s), "src").join(F.broadcast(t), "dst")
            .select("source_name", "relation_type", "target_name",
                    "confidence", "provenance_doc_id"))


def export_json(nodes: DataFrame, edges: DataFrame, path: str) -> None:
    nodes.write.mode("overwrite").json(f"{path}/nodes")
    edges.write.mode("overwrite").json(f"{path}/edges")


def export_csv(nodes: DataFrame, edges: DataFrame, path: str) -> None:
    (nodes.select("id", "type", "canonical_name", "confidence", "status")
     .write.mode("overwrite").option("header", True).csv(f"{path}/entities"))
    (denormalized_edges(nodes, edges)
     .write.mode("overwrite").option("header", True).csv(f"{path}/edges"))


def viz_subgraph(nodes: DataFrame, edges: DataFrame, top_n: int = 500,
                 exclude_types: tuple = ("Fact",),
                 min_connections: int = 1) -> tuple[DataFrame, DataFrame]:
    """Top-connected nodes (excluding types) + induced edges (K5 semantics:
    graph_exporter.py:57-116)."""
    sel = (nodes.filter(~F.col("type").isin(*exclude_types))
           .join(degree(edges), "id", "left")
           .fillna(0, subset=["connections"])
           .filter(F.col("connections") >= min_connections)
           .orderBy(F.desc("connections"), F.asc("id"))
           .limit(top_n))
    return sel, induced_subgraph(edges, sel.select("id"))


def export_graphml(nodes: DataFrame, edges: DataFrame, path: str,
                   max_nodes: int = 10_000) -> str:
    """GraphML document (single-document format, driver-assembled like the
    reference's hand-built XML, server.py:983-1019).

    The node cap and the induced-edge semi-join run distributed; only the
    bounded subgraph is collected — never the full edge table.
    """
    sel = nodes.orderBy("id").limit(max_nodes).localCheckpoint()
    ns = sel.collect()
    es = induced_subgraph(edges, sel.select("id")).collect()
    parts = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
             '<key id="name" for="node" attr.name="name" attr.type="string"/>',
             '<key id="type" for="node" attr.name="type" attr.type="string"/>',
             '<key id="rel" for="edge" attr.name="relation" attr.type="string"/>',
             '<graph edgedefault="directed">']
    for r in ns:
        parts.append(f'<node id="{escape(r["id"])}">'
                     f'<data key="name">{escape(r["canonical_name"])}</data>'
                     f'<data key="type">{escape(r["type"])}</data></node>')
    for e in es:
        parts.append(f'<edge source="{escape(e["src"])}" target="{escape(e["dst"])}">'
                     f'<data key="rel">{escape(e["relation_type"])}</data></edge>')
    parts.append('</graph></graphml>')
    doc = "\n".join(parts)
    with open(path, "w") as f:
        f.write(doc)
    return doc
