"""Explicit StructTypes for every stage-boundary table.

Mirrors the reference's persisted model (database.py:24-132, models.py) with
Spark-native types: nested dicts become MapType(string,string) to stay
Arrow-friendly; spans become structs; timestamps are real timestamps.
"""
from pyspark.sql import types as T

TRANSCRIPTS = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("role", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("tool", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])

# Long-format output of the per-conversation structural extraction UDF.
# kind ∈ {party, term, date, doc}; seq is the within-conversation emission
# order (parties in pattern order, then terms, then dates, then doc row) and
# is the deterministic ER tie-break key.
EXTRACTIONS = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("kind", T.StringType()),
    T.StructField("name", T.StringType()),
    T.StructField("entity_type", T.StringType()),
    T.StructField("er_type", T.StringType()),
    T.StructField("norm_name", T.StringType()),
    T.StructField("role", T.StringType()),
    T.StructField("definition", T.StringType()),
    T.StructField("date_type", T.StringType()),
    T.StructField("aliases", T.ArrayType(T.StringType())),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("span_start", T.IntegerType()),
    T.StructField("span_end", T.IntegerType()),
    T.StructField("doc_type", T.StringType()),
    T.StructField("case_number", T.StringType()),
    T.StructField("court", T.StringType()),
    # kind == "fact" rows (deterministic fact extraction, F kinds):
    # fact_type ∈ {obligation, payment, ...}; definition carries the fact
    # sentence; related = the entity names _store_facts links `about` edges to
    T.StructField("fact_type", T.StringType()),
    T.StructField("related", T.ArrayType(T.StringType())),
    # kind == "party" rows with attorney/executive roles carry the client /
    # company name the G4 rules 3/5 target (semantic_extractor.py:636-664);
    # null for caption parties and every other kind
    T.StructField("hint", T.StringType()),
])

RAW_TRIPLES = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("subj", T.StringType()),
    T.StructField("pred", T.StringType()),
    T.StructField("obj", T.StringType()),
    T.StructField("confidence", T.DoubleType()),
    T.StructField("inferred", T.BooleanType()),
])

NODES = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("type", T.StringType()),
    T.StructField("canonical_name", T.StringType()),
    T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
    T.StructField("confidence", T.StringType()),
    T.StructField("status", T.StringType()),
])

EDGES = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("src", T.StringType()),
    T.StructField("dst", T.StringType()),
    T.StructField("relation_type", T.StringType()),
    T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
    T.StructField("confidence", T.StringType()),
    T.StructField("provenance_doc_id", T.StringType()),
])

ALIASES = T.StructType([
    T.StructField("entity_id", T.StringType()),
    T.StructField("alias_text", T.StringType()),
    T.StructField("source", T.StringType()),
])

MENTIONS = T.StructType([
    T.StructField("entity_id", T.StringType()),
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("span_start", T.IntegerType()),
    T.StructField("span_end", T.IntegerType()),
    T.StructField("surface_text", T.StringType()),
])

LINEAGE = T.StructType([
    T.StructField("stage", T.StringType()),
    T.StructField("partition_id", T.IntegerType()),
    T.StructField("rows_out", T.LongType()),
    T.StructField("conv_id_min", T.StringType()),
    T.StructField("conv_id_max", T.StringType()),
    T.StructField("checksum", T.LongType()),
])
