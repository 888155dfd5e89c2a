"""Checkpoint/resume semantics (SURVEY.md §5 item 5) and the Structured
Streaming ingest path.
"""
import glob
import os

import pytest
from pyspark.sql import functions as F

from knowledgegraphsiqidis_spark.plans.pipeline import KGPipeline, run_pipeline
from knowledgegraphsiqidis_spark.sources.transcripts import (
    TRANSCRIPT_DDL, transcripts_pdf)


@pytest.fixture()
def tdf(spark):
    return spark.createDataFrame(transcripts_pdf(30, seed=5),
                                 schema=TRANSCRIPT_DDL)


def test_checkpoint_resume_no_recompute(spark, tdf, tmp_path, monkeypatch):
    out = str(tmp_path / "kg")
    r1 = run_pipeline(spark, tdf, out_dir=out)
    triples1 = {tuple(r) for r in r1.triples().collect()}
    assert os.path.exists(os.path.join(out, "extractions", "_SUCCESS"))
    lineage = spark.read.parquet(os.path.join(out, "lineage"))
    assert lineage.filter(F.col("stage") == "extractions").count() > 0

    # Resume: stage outputs exist → the extraction stage must not even be
    # BUILT again (the pipeline loads the checkpoint instead).
    from knowledgegraphsiqidis_spark.plans import pipeline as pl

    def boom(*a, **k):
        raise AssertionError("extraction stage rebuilt despite checkpoint")

    monkeypatch.setattr(pl.extract, "extract_stage", boom)
    r2 = run_pipeline(spark, tdf, out_dir=out)
    triples2 = {tuple(r) for r in r2.triples().collect()}
    assert triples1 == triples2 and triples1


def test_lineage_rows_cover_stages(spark, tdf, tmp_path):
    out = str(tmp_path / "kg2")
    run_pipeline(spark, tdf, out_dir=out)
    lineage = spark.read.parquet(os.path.join(out, "lineage"))
    stages = {r["stage"] for r in lineage.select("stage").distinct().collect()}
    assert {"extractions", "raw_triples", "mentions"} <= stages
    row = lineage.filter(F.col("stage") == "extractions") \
        .agg(F.sum("rows_out")).collect()[0][0]
    assert row == spark.read.parquet(os.path.join(out, "extractions")).count()


def test_incremental_two_batches_equal_single_run(spark, tmp_path):
    """The cross-batch incremental ER contract: a corpus split into two
    monotonic micro-batches produces the IDENTICAL triple set as the
    single-batch run (reference resolve-against-growing-store semantics,
    extraction_pipeline.py:615-733)."""
    from knowledgegraphsiqidis_spark.streaming.incremental import IncrementalKG
    pdf = transcripts_pdf(30, seed=5)
    full = spark.createDataFrame(pdf, schema=TRANSCRIPT_DDL)
    expected = {tuple(r) for r in run_pipeline(spark, full)
                .triples().collect()}
    assert expected

    cut = "conv-00000015"
    kg = IncrementalKG(spark, str(tmp_path / "ikg"))
    kg.process_batch(full.filter(F.col("conv_id") < cut))
    kg.process_batch(full.filter(F.col("conv_id") >= cut))
    got = {tuple(r) for r in kg.triples().collect()}
    assert got == expected

    # entities resolved ACROSS batches: some batch-2 edge endpoint must land
    # in a cluster whose canonical comes from batch 1 (no graph islands)
    nodes = kg.nodes()
    cross = (kg.edges()
             .join(nodes.select(F.col("id").alias("src"),
                                F.col("canonical_name").alias("cn")), "src")
             .filter(F.col("provenance_doc_id") >= cut)
             # entity cluster ids are form keys "conv-...#seq" (fact ids are
             # hashes); root conv before the cut = canonical from batch 1
             .filter(F.col("src").startswith("conv-")
                     & (F.substring_index(F.col("src"), "#", 1) < cut)))
    assert cross.count() > 0

    # non-monotonic arrival must raise, not silently corrupt
    with pytest.raises(Exception, match="non-monotonic"):
        kg.process_batch(full.filter(F.col("conv_id") < cut))


def test_streaming_ingest(spark, tmp_path):
    from knowledgegraphsiqidis_spark.streaming.incremental import IncrementalKG
    from knowledgegraphsiqidis_spark.streaming.ingest import stream_transcripts
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ck"))
    os.makedirs(in_dir)
    pdf = transcripts_pdf(12, seed=9)
    tdf = spark.createDataFrame(pdf, schema=TRANSCRIPT_DDL)
    # one file per conv-contiguous chunk, written in conv order (the
    # documented arrival contract: conversations complete per file,
    # files land in conv_id order)
    tdf.filter(F.col("conv_id") < "conv-00000006").coalesce(1) \
        .write.mode("append").parquet(in_dir)
    tdf.filter(F.col("conv_id") >= "conv-00000006").coalesce(1) \
        .write.mode("append").parquet(in_dir)

    q = stream_transcripts(spark, in_dir, out_dir, ckpt, trigger_once=True)
    q.awaitTermination(300)
    kg = IncrementalKG(spark, out_dir)
    n_edges = kg.edges().count()
    assert n_edges > 0
    assert glob.glob(os.path.join(out_dir, "edges", "batch=*"))

    # second trigger with no new files → nothing new lands in the graph
    q2 = stream_transcripts(spark, in_dir, out_dir, ckpt, trigger_once=True)
    q2.awaitTermination(300)
    assert kg.edges().count() == n_edges
