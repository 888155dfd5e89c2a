"""spark-submit entry point for the KG construction job.

    spark-submit --py-files knowledgegraphsiqidis_spark.zip \
        -m knowledgegraphsiqidis_spark.job \
        --input  s3://bucket/transcripts/   (or catalog.db.transcripts) \
        --output s3://bucket/kg/ \
        [--threshold 0.8] [--max-block 200] [--synth N]

Reads the transcript table (parquet directory or, with --table, an
Iceberg/catalog table name), runs extract→resolve→build with checkpointed
stage boundaries under --output, and prints stage row counts.  Resumable:
rerunning with the same --output skips finished stages.
"""
from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession

from .plans.pipeline import run_pipeline
from .session import get_spark
from .sources.transcripts import transcripts_df


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", help="transcript parquet path")
    p.add_argument("--table", help="catalog table name (Iceberg)")
    p.add_argument("--synth", type=int,
                   help="synthesize N conversations instead of reading input")
    p.add_argument("--output", required=True)
    p.add_argument("--threshold", type=float, default=0.8)
    p.add_argument("--max-block", type=int, default=200)
    p.add_argument("--no-side-tables", action="store_true")
    args = p.parse_args(argv)

    spark = SparkSession.getActiveSession() or get_spark("kgspark-job")
    if args.synth:
        transcripts = transcripts_df(spark, args.synth, seed=42)
    elif args.table:
        transcripts = spark.read.table(args.table)
    elif args.input:
        transcripts = spark.read.parquet(args.input)
    else:
        raise SystemExit("one of --input/--table/--synth is required")

    result = run_pipeline(spark, transcripts, out_dir=args.output,
                          threshold=args.threshold, max_block=args.max_block,
                          side_tables=not args.no_side_tables)
    counts = {name: df.count() for name, df in result.tables.items()}
    counts["triples"] = result.triples().count()
    print(json.dumps(counts))


if __name__ == "__main__":
    main()
