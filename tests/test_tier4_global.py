"""J9 tier-4 global name-lookup fallback (opt-in): a fact related name that
is NOT conversation-local must resolve through the cross-conversation store
search exactly as the reference's ``_find_entity_by_name`` database tier
(extraction_pipeline.py:864-874 → database.py:204-215 LIMIT 1), and must
stay unresolved (edge dropped) with the default pipeline.
"""
import pytest
from pyspark.sql import functions as F

from knowledgegraphsiqidis_spark.plans.pipeline import run_pipeline
from knowledgegraphsiqidis_spark.sources.transcripts import TRANSCRIPT_DDL
from tests._sequential_oracle import run_oracle

_CAPTION_0 = ("IN THE UNITED STATES DISTRICT COURT\n"
              "Case No. 11-22-3334444\n"
              "Zeta Holdings Corp., Claimant, and Omega Partners LLC, "
              "Respondent.")
_CAPTION_1 = ("IN THE UNITED STATES DISTRICT COURT\n"
              "Case No. 55-66-7778888\n"
              "ACME Corporation, Claimant, and Globex LLC, Respondent.")
# fact subject + recipient are conv-0 parties, NOT present in conv-1 —
# only the tier-4 global store search can resolve them in conv-1
_FACT_TURN = ("Zeta Holdings Corp shall deliver the executed documents to "
              "Omega Partners LLC no later than March 3, 2021.")


def _rows():
    import datetime as dt
    ts = dt.datetime(2024, 1, 1)
    return [("conv-0", 0, "user", _CAPTION_0, None, ts),
            ("conv-1", 0, "user", _CAPTION_1, None, ts),
            ("conv-1", 1, "assistant", _FACT_TURN, None, ts)]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(_rows(), schema=TRANSCRIPT_DDL)


def test_tier4_parity_with_reference(spark, ref, corpus):
    convs = [("conv-0", [_CAPTION_0]), ("conv-1", [_CAPTION_1, _FACT_TURN])]
    expected, _store = run_oracle(ref, convs)
    # the oracle resolves the non-local names through its store.search tier
    # (party extraction stores "Zeta Holdings Corp" — no trailing period —
    # and the respondent with the caption's "and " prefix)
    assert any(p == "about" and o == "Zeta Holdings Corp"
               for _s, p, o in expected), expected
    assert any(p == "about" and o == "and Omega Partners LLC"
               for _s, p, o in expected), expected

    got = {(r["subj"], r["pred"], r["obj"])
           for r in run_pipeline(spark, corpus, tier4_global=True)
           .triples().collect()}
    assert got == expected


def test_tier4_off_drops_nonlocal_edges(spark, corpus):
    got = run_pipeline(spark, corpus).triples()
    nonlocal_objs = got.filter(
        F.col("obj").isin("Zeta Holdings Corp", "and Omega Partners LLC")
        & (F.col("pred") == "about")).count()
    assert nonlocal_objs == 0
