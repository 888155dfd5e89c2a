"""One scaling-measurement run: KG pipeline at local[$CPUS]; prints JSON.

Invoked by scripts/scaling_bench.py in a fresh process per parallelism level
(clean JVM, no warm caches shared between levels).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from knowledgegraphsiqidis_spark.session import get_spark  # noqa: E402
from knowledgegraphsiqidis_spark.sources.transcripts import transcripts_df  # noqa: E402
from knowledgegraphsiqidis_spark.plans.pipeline import run_pipeline  # noqa: E402


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    spark = get_spark(f"scaling-{cpus}", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    transcripts = transcripts_df(spark, n_conv, seed=42).localCheckpoint()
    n_turns = transcripts.count()

    t0 = time.time()
    result = run_pipeline(spark, transcripts, side_tables=False)
    triples = result.triples()
    row = triples.agg(
        F.count("*").alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(subj, pred, obj))"), F.lit(0)).alias("h")
    ).collect()[0]
    wall = time.time() - t0

    print(json.dumps({
        "cpus": cpus, "n_conversations": n_conv, "n_turns": int(n_turns),
        "wall_sec": round(wall, 2),
        "turns_per_sec": round(n_turns / wall, 1),
        "n_triples": int(row["n"]), "triples_checksum": int(row["h"]),
    }))


if __name__ == "__main__":
    main()
