"""E2E triple parity: Spark pipeline vs the sequential reference-semantics
oracle on the same synthetic transcript corpus (SURVEY.md §5 item 2;
BASELINE.json target triple P/R ≥ 0.95), plus determinism across parallelism.
"""
import pytest
from pyspark.sql import functions as F

from knowledgegraphsiqidis_spark.plans.pipeline import run_pipeline
from knowledgegraphsiqidis_spark.sources.transcripts import (
    iter_transcript_rows, transcripts_pdf, TRANSCRIPT_DDL)
from tests._sequential_oracle import run_oracle

N_CONV = 150
SEED = 11


def _conversations():
    convs = {}
    for conv_id, t, _r, text, _tool, _ts in iter_transcript_rows(N_CONV, seed=SEED):
        convs.setdefault(conv_id, []).append((t, text))
    return [(cid, [txt for _, txt in sorted(turns)])
            for cid, turns in sorted(convs.items())]


@pytest.fixture(scope="module")
def spark_triples(spark):
    pdf = transcripts_pdf(N_CONV, seed=SEED)
    tdf = spark.createDataFrame(pdf, schema=TRANSCRIPT_DDL)
    result = run_pipeline(spark, tdf)
    trips = {(r["subj"], r["pred"], r["obj"])
             for r in result.triples().collect()}
    return result, trips


@pytest.fixture(scope="module")
def oracle_triples(ref):
    triples, store = run_oracle(ref, _conversations())
    return triples, store


def test_triple_precision_recall(spark_triples, oracle_triples):
    _, ours = spark_triples
    expected, _ = oracle_triples
    assert expected, "oracle produced no triples — corpus generator is broken"
    tp = len(ours & expected)
    precision = tp / len(ours) if ours else 0.0
    recall = tp / len(expected)
    print(f"\ntriples: ours={len(ours)} oracle={len(expected)} tp={tp} "
          f"P={precision:.4f} R={recall:.4f}")
    if precision < 0.95 or recall < 0.95:
        only_ours = sorted(ours - expected)[:15]
        only_oracle = sorted(expected - ours)[:15]
        print("only ours:", *only_ours, sep="\n  ")
        print("only oracle:", *only_oracle, sep="\n  ")
    assert precision >= 0.95
    assert recall >= 0.95


def test_pipeline_deterministic_across_parallelism(spark):
    """Same input at different partition counts → identical triple set
    (precondition for the N vs 4N scaling comparison)."""
    pdf = transcripts_pdf(40, seed=3)
    t1 = spark.createDataFrame(pdf, schema=TRANSCRIPT_DDL).repartition(2)
    t2 = spark.createDataFrame(pdf, schema=TRANSCRIPT_DDL).repartition(16)
    r1 = {tuple(r) for r in run_pipeline(spark, t1).triples().collect()}
    r2 = {tuple(r) for r in run_pipeline(spark, t2).triples().collect()}
    assert r1 == r2 and r1


def test_tables_shape(spark_triples):
    result, _ = spark_triples
    nodes = result.tables["nodes"]
    edges = result.tables["edges"]
    assert nodes.filter(F.col("canonical_name").isNull()).count() == 0
    assert nodes.select("id").distinct().count() == nodes.count()
    # every edge endpoint resolves to a node
    ids = nodes.select(F.col("id").alias("src"))
    assert edges.join(ids, "src", "left_anti").count() == 0
    ids2 = nodes.select(F.col("id").alias("dst"))
    assert edges.join(ids2, "dst", "left_anti").count() == 0
