"""Structured Streaming ingest (optional extension — SURVEY.md §2.9).

The reference is purely batch (SURVEY.md §1.3); the streaming surface here
ingests newly-landed transcript files and runs the SAME batch stage
functions per micro-batch via ``foreachBatch`` — one code path for batch
and streaming, the recommended Spark pattern for stateful pipelines whose
logic is batch-shaped (extraction is per-conversation, so a conversation is
assumed complete within a micro-batch file; cross-batch ER incrementality
is handled by the pipeline's checkpoint tables).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.pipeline import KGPipeline
from ..schemas import TRANSCRIPTS


def stream_transcripts(spark: SparkSession, input_dir: str,
                       out_dir: str, checkpoint_dir: str,
                       trigger_once: bool = True):
    """readStream over a transcript parquet directory → pipeline per batch.

    Each micro-batch appends its extraction + triple outputs under
    ``out_dir/batch=<id>/``; stage lineage goes to the same layout.
    """
    stream = (spark.readStream
              .schema(TRANSCRIPTS)
              .option("maxFilesPerTrigger", 8)
              .parquet(input_dir))

    def process_batch(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        KGPipeline(batch_df.sparkSession,
                   out_dir=f"{out_dir}/batch={batch_id}").run(batch_df)

    writer = (stream.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
