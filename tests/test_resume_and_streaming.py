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


def test_streaming_ingest(spark, tmp_path):
    from knowledgegraphsiqidis_spark.streaming.ingest import stream_transcripts
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ck"))
    os.makedirs(in_dir)
    pdf = transcripts_pdf(12, seed=9)
    spark.createDataFrame(pdf, schema=TRANSCRIPT_DDL) \
        .write.mode("overwrite").parquet(in_dir)

    q = stream_transcripts(spark, in_dir, out_dir, ckpt, trigger_once=True)
    q.awaitTermination(300)
    batch_dirs = glob.glob(os.path.join(out_dir, "batch=*"))
    assert batch_dirs
    edges = spark.read.parquet(os.path.join(batch_dirs[0], "edges"))
    assert edges.count() > 0

    # second trigger with no new files → no new batches with data
    q2 = stream_transcripts(spark, in_dir, out_dir, ckpt, trigger_once=True)
    q2.awaitTermination(300)
    assert len(glob.glob(os.path.join(out_dir, "batch=*"))) == len(batch_dirs)
