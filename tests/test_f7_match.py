"""F7 disambiguation match scoring: exact parity vs the reference's
``NLQueryEngine._compute_entity_match_score`` (nl_query.py:298-349),
duck-typing its db/entity dependencies.  No Spark needed.
"""
import types

import pytest

from knowledgegraphsiqidis_spark.operators.nlquery import entity_match_score
from tests._reference_oracle import load_reference


def _ref_score(query_lower, canonical_name, aliases):
    load_reference()
    from src.core.query.nl_query import NLQueryEngine
    alias_objs = [types.SimpleNamespace(alias_text=a) for a in aliases]
    eng = types.SimpleNamespace(
        db=types.SimpleNamespace(get_aliases=lambda _id: alias_objs))
    entity = types.SimpleNamespace(canonical_name=canonical_name, id="e1")
    return NLQueryEngine._compute_entity_match_score(eng, query_lower, entity)


CASES = [
    # (query, canonical, aliases)
    ("acme corporation", "ACME Corporation", []),            # exact
    ("acme corp.", "ACME Corporation", []),                  # normalized 0.95
    ("CITIOM", "Channel IT Isle Of Man", []),                # acronym 0.9
    ("acme", "ACME Corporation Holdings", []),               # substring 0.7-weighted
    ("acme corporation holdings intl", "ACME Holdings", []),  # reverse substring
    ("smith john", "John Smith", []),                        # word overlap
    ("gulfstream", "Gulfstream Aerospace Corporation",
     ["Gulfstream", "the Claimant"]),                        # alias exact 0.85
    ("the claim", "Gulfstream Aerospace Corporation",
     ["the Claimant"]),                                      # alias containment 0.6
    ("zzz", "Unrelated Name", []),                           # no match
    ("big co.", "Big Company", []),                          # suffix variants
]


@pytest.mark.parametrize("q,name,aliases", CASES)
def test_f7_parity(q, name, aliases):
    ours = entity_match_score(q, name, aliases)
    theirs = _ref_score(q, name, aliases)
    assert ours == pytest.approx(theirs), (q, name, ours, theirs)
