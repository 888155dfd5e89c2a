"""Benchmark harness (driver contract).

Runs the headline workload at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Headline = the KG construction pipeline (extract→resolve→build) over a
synthetic transcript corpus scaled to the sf, plus representative relational
/ dedup / similarity operators over the driver tables.  Also reports
turns/sec for the KG pipeline (the BASELINE.json scale metric).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from knowledgegraphsiqidis_spark.session import get_spark  # noqa: E402
from knowledgegraphsiqidis_spark.sources.transcripts import transcripts_df  # noqa: E402
from knowledgegraphsiqidis_spark.plans.pipeline import run_pipeline  # noqa: E402

BENCH_QUERIES = [
    "tpch_q1", "tpch_q3ish", "j2_edge_denorm", "j3_degree_topk",
    "a5_pattern_histogram", "w2_best_match", "dedup_exact_groups",
    "ngram_jaccard", "ann_cosine_topk", "token_stats", "lang_id",
]


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_from_dir(sf_dir)
    n_conv = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS",
                                str(max(500, int(250_000 * sf)))))

    spark = get_spark("kgspark-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    # --- headline: KG construction pipeline ---
    # median-of-3 with side tables (the published configuration) plus one
    # side_tables=False run: the host's ±2-3x timing noise makes any single
    # number unreliable (BENCH_SCALING.md methodology).
    t0 = time.time()
    # localCheckpoint, not cache: cached RDD-backed plans re-run the generator
    # on some downstream branches (see memory: cache-lookup misses)
    transcripts = transcripts_df(spark, n_conv, seed=42).localCheckpoint()
    n_turns = transcripts.count()  # materialize input outside the timed span
    gen_sec = time.time() - t0
    n_reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    runs = []
    n_triples = n_nodes = 0
    for _ in range(n_reps):
        t1 = time.time()
        result = run_pipeline(spark, transcripts)
        n_triples = result.triples().count()
        n_nodes = result.tables["nodes"].count()
        runs.append(round(time.time() - t1, 3))
    kg_sec = sorted(runs)[len(runs) // 2]
    timings["kg_pipeline"] = kg_sec
    t1 = time.time()
    run_pipeline(spark, transcripts, side_tables=False).triples().count()
    no_side_sec = round(time.time() - t1, 3)

    # --- operator suite on driver tables ---
    qs = entrymod.queries()
    for name in BENCH_QUERIES:
        t = time.time()
        df = qs[name](spark, sf_dir)
        df.agg(F.count(F.lit(1))).collect()
        timings[name] = round(time.time() - t, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "kg_pipeline+operator_suite_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "kg": {
            "n_conversations": n_conv,
            "n_turns": int(n_turns),
            "n_nodes": int(n_nodes),
            "n_triples": int(n_triples),
            "turns_per_sec": round(n_turns / kg_sec, 1),
            "kg_runs_sec": runs,
            "kg_no_side_tables_sec": no_side_sec,
            "turns_per_sec_no_side": round(n_turns / no_side_sec, 1),
            "gen_sec": round(gen_sec, 3),
            "cpus": cpus,
        },
    }))


if __name__ == "__main__":
    main()
