"""Property-based parity: hypothesis-generated adversarial inputs through
our pure kernels AND the reference's (imported as oracle), asserting
identical outputs.  Complements the corpus-driven tests in
test_textops_parity.py — random inputs reach regex/normalization edge
cases (unicode, stray punctuation, nested suffixes, pathological
whitespace) no synthesized corpus covers.  Pure Python, no Spark.
"""
from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from knowledgegraphsiqidis_spark.functions import textops
from knowledgegraphsiqidis_spark.operators import nlquery

SETTINGS = dict(max_examples=150, deadline=None)

_SUFFIXES = [" Inc.", " LLC", " Ltd", " Corp.", " Corporation", " Group",
             " Co.", " Aerospace", ""]
_WORD = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"),
                           whitelist_characters=".,&'-/"),
    min_size=1, max_size=12)
_NAME = st.builds(
    lambda ws, suf: " ".join(ws) + suf,
    st.lists(_WORD, min_size=1, max_size=4), st.sampled_from(_SUFFIXES))
_TYPE = st.sampled_from(["Organization", "Person", "Reference", "Location",
                         "Date", "Money", None])
# free text mixing prose, trigger words, quotes, caption fragments
_TRIGGERS = ["relationship", "obligations", "path", "how many", "parties",
             "who", "companies", "allegations", "when", "payment", "where",
             "contract", "facts", "overview", "Claimant", "Respondent",
             "shall pay", "Case No. 1-23", '"ACME Corp"', "January 15, 2020",
             "01/15/2030", "2020-03-01", "the 3rd day of March, 2020"]
_TEXT = st.builds(
    lambda parts: " ".join(parts),
    st.lists(st.one_of(_WORD, st.sampled_from(_TRIGGERS)),
             min_size=0, max_size=25))


@pytest.fixture(scope="module")
def EN(ref):
    return ref.EntityNormalizer


@pytest.fixture(scope="module")
def SE(ref):
    return ref.StructuralExtractor()


@settings(**SETTINGS)
@given(_NAME)
def test_prop_normalize_org(ref, name):
    assert textops.normalize_org_name(name) == \
        ref.EntityNormalizer.normalize_org_name(name)


@settings(**SETTINGS)
@given(_NAME)
def test_prop_normalize_person(ref, name):
    assert textops.normalize_person_name(name) == \
        ref.EntityNormalizer.normalize_person_name(name)


@settings(**SETTINGS)
@given(_NAME, _TYPE)
def test_prop_normalize_dispatch(ref, name, etype):
    assert textops.normalize_name(name, etype) == \
        ref.EntityNormalizer.normalize_name(name, etype)


@settings(**SETTINGS)
@given(_NAME, st.sampled_from(["Person", "Organization", "Location",
                               "Reference"]))
def test_prop_validate_type(ref, name, claimed):
    assert textops.validate_entity_type(name, claimed) == \
        ref.EntityNormalizer.validate_entity_type(name, claimed)


@settings(**SETTINGS)
@given(_NAME, _NAME, st.sampled_from(["Organization", "Person", None]))
def test_prop_similarity(ref, a, b, etype):
    assert textops.name_similarity(a, b, etype) == \
        pytest.approx(ref.EntityNormalizer.compute_similarity(a, b, etype))


@settings(**SETTINGS)
@given(_TEXT)
def test_prop_date_extraction(SE, text):
    ours = textops.extract_dates(text)
    theirs = SE._extract_dates(text)
    assert [(d["date"], d["type"], d["span_start"], d["span_end"])
            for d in ours] == \
        [(d["date"], d["type"], d["span_start"], d["span_end"])
         for d in theirs]


@settings(**SETTINGS)
@given(_TEXT)
def test_prop_structural_scalars(SE, text):
    assert textops.extract_case_number(text) == SE._extract_case_number(text)
    assert textops.extract_court(text) == SE._extract_court(text)
    assert textops.detect_document_type(text) == SE._detect_document_type(text)


@settings(**SETTINGS)
@given(_TEXT)
def test_prop_defined_terms(SE, text):
    ours = [(t["term"], t["span_start"]) for t in
            textops.extract_defined_terms(text)]
    theirs = [(t.name, t.span_start) for t in SE._extract_defined_terms(text)]
    assert ours == theirs


@settings(**SETTINGS)
@given(_TEXT)
def test_prop_interpret_query(ref, text):
    import sys
    import types
    sys.path.insert(0, "/root/reference")
    from src.core.query.nl_query import NLQueryEngine
    theirs = NLQueryEngine._fallback_interpretation(
        types.SimpleNamespace(), text)
    ours = nlquery.interpret_query(text)
    assert ours["query_type"] == theirs["query_type"]
    assert ours["entity_types_requested"] == theirs["entity_types_requested"]
    assert ours["entities_mentioned"] == theirs["entities_mentioned"]
    assert ours["filters"] == theirs["filters"]


@settings(**SETTINGS)
@given(_NAME, _NAME, st.lists(_NAME, max_size=3))
def test_prop_f7_match_score(ref, query, name, aliases):
    import types
    sys_mod = __import__("sys")
    sys_mod.path.insert(0, "/root/reference")
    from src.core.query.nl_query import NLQueryEngine
    alias_objs = [types.SimpleNamespace(alias_text=a) for a in aliases]
    eng = types.SimpleNamespace(
        db=types.SimpleNamespace(get_aliases=lambda _id: alias_objs))
    entity = types.SimpleNamespace(canonical_name=name, id="e1")
    theirs = NLQueryEngine._compute_entity_match_score(
        eng, query.lower(), entity)
    ours = nlquery.entity_match_score(query.lower(), name, aliases)
    assert ours == pytest.approx(theirs), (query, name, aliases)
