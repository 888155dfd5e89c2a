"""knowledgegraphsiqidis_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of the
reference single-node system (dl1683/KnowledgeGraphsIqidis).

Pipeline: Iceberg/parquet transcripts (conv_id, turn_idx, role, text, tool, ts)
  → per-conversation structural triple extraction (vectorized pandas UDFs)
  → rule-based relationship inference (pure DataFrame joins)
  → entity resolution (normalized-surface-form blocking + pairwise scoring)
  → connected-components canonicalization (large-star/small-star joins)
  → graph materialization (nodes/edges/aliases/mentions + per-partition lineage).

Everything is expressed with the DataFrame API so Catalyst/Tungsten pick the
physical plan; Python appears only inside Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"
