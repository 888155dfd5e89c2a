"""Unit parity: our pure-pandas kernels vs the reference's deterministic
kernels (imported as the oracle) on a corpus of synthesized documents.

Covers SURVEY.md §2.7 F1-F7 and §5 test-plan item 1.
"""
import pytest

from knowledgegraphsiqidis_spark.functions import textops
from knowledgegraphsiqidis_spark.sources.transcripts import iter_transcript_rows

N_DOCS = 120


def _documents():
    """Concatenated per-conversation documents, same assembly the pipeline uses."""
    docs, cur, buf = [], None, []
    for conv_id, _t, _r, text, _tool, _ts in iter_transcript_rows(N_DOCS, seed=7):
        if conv_id != cur:
            if buf:
                docs.append("\n".join(buf))
            cur, buf = conv_id, []
        buf.append(text)
    if buf:
        docs.append("\n".join(buf))
    # plus the reference's own embedded fixture shapes (run_test.py:77-105)
    docs.append(
        "AMERICAN ARBITRATION ASSOCIATION\n"
        "Case No. 01-23-0001234\n"
        "CITIOM LLC, Claimant, and Gulfstream Aerospace Corporation, Respondent.\n"
        'The term "Aircraft" means the Gulfstream G550 aircraft, serial number 5174.\n'
        "This Statement of Claim is submitted for arbitration.\n"
        "The agreement was signed on January 15, 2020 and expires on 01/15/2030.\n"
        'Purchase closed on 2020-03-01, executed the 3rd day of March, 2020.\n'
    )
    return docs


DOCS = _documents()


@pytest.fixture(scope="module")
def ref_extractor(ref):
    return ref.StructuralExtractor()


def test_parties_parity(ref_extractor):
    for doc in DOCS:
        ours = textops.extract_parties(doc)
        theirs = ref_extractor._extract_parties(doc)
        assert len(ours) == len(theirs), doc[:200]
        for o, t in zip(ours, theirs):
            assert o["name"] == t.name
            assert o["role"] == t.role
            assert o["span_start"] == t.span_start
            assert o["span_end"] == t.span_end
            assert set(o["aliases"]) == set(t.aliases)


def test_defined_terms_parity(ref_extractor):
    for doc in DOCS:
        ours = textops.extract_defined_terms(doc)
        theirs = ref_extractor._extract_defined_terms(doc)
        assert [(o["term"], o["definition"], o["span_start"], o["span_end"])
                for o in ours] == \
               [(t.term, t.definition, t.span_start, t.span_end) for t in theirs]


def test_dates_parity(ref_extractor):
    for doc in DOCS:
        ours = textops.extract_dates(doc)
        theirs = ref_extractor._extract_dates(doc)
        assert [(o["date"], o["type"], o["span_start"]) for o in ours] == \
               [(t["date"], t["type"], t["span_start"]) for t in theirs]


def test_scalar_extractors_parity(ref_extractor):
    for doc in DOCS:
        assert textops.extract_case_number(doc) == ref_extractor._extract_case_number(doc)
        assert textops.extract_court(doc) == ref_extractor._extract_court(doc)
        assert textops.detect_document_type(doc) == ref_extractor._detect_document_type(doc)


_NAMES = [
    "ACME Corporation", "ACME Corp.", "ACME Inc.", "ACME", "ACE Corporation",
    "Gulfstream Aerospace Corporation", "Gulfstream Corp", "Gulfstream",
    "Intl Services Group", "Int'l Svcs Grp", "National Tech Holdings",
    "Mr. John Smith", "John Smith, Jr.", "J. Smith", "Dr. Jane Smith",
    "Hon. Maria Garcia", "Maria Garcia, III", "Wayne Enterprises Ltd.",
    "Nakatomi Trading Corp.", "Nakatomi Trading", "Vandelay Industries & Co.",
]


def test_normalize_parity(ref):
    EN = ref.EntityNormalizer
    for n in _NAMES:
        assert textops.normalize_org_name(n) == EN.normalize_org_name(n)
        assert textops.normalize_person_name(n) == EN.normalize_person_name(n)
        for t in ("Organization", "Person", "Reference", None):
            assert textops.normalize_name(n, t) == EN.normalize_name(n, t)


def test_validate_type_parity(ref):
    EN = ref.EntityNormalizer
    for n in _NAMES + ["GULFSTREAM AEROSPACE CORP", "ACME AEROSPACE INC"]:
        for claimed in ("Person", "Organization", "Location"):
            assert textops.validate_entity_type(n, claimed) == \
                EN.validate_entity_type(n, claimed)


def test_similarity_parity(ref):
    EN = ref.EntityNormalizer
    for a in _NAMES:
        for b in _NAMES:
            for t in ("Organization", "Person", None):
                assert textops.name_similarity(a, b, t) == \
                    pytest.approx(EN.compute_similarity(a, b, t)), (a, b, t)


def test_party_window_whitespace_padding(ref):
    """ADVICE regression: generous whitespace between a long org name and its
    role keyword must not push the match start outside the scan window."""
    long_name = "Intercontinental Amalgamated Consolidated Industries Group Inc."
    pads = [" ", "   ", "armarmarm  \t ", " " * 40]
    for pad in pads:
        cap = (f"SUPERIOR COURT\nCase No. 1-2-3\n"
               f"{long_name},{pad}Claimant, and Globex Corp., Respondent.\n"
               f"This Statement of Claim is submitted.")
        ours = [(p['name'], p['role']) for p in textops.extract_parties(cap)]
        theirs = [(p.name, p.role)
                  for p in ref.StructuralExtractor().extract(cap).parties]
        assert ours == theirs, (pad, ours, theirs)


def test_party_matches_non_overlapping(ref):
    """Windowed re-scanning must preserve plain finditer's non-overlap
    ordering on captions with adjacent role keywords."""
    cap = ("COURT\nCase No. 9-9-9\n"
           "Acme Corp., Claimant, and Zeta Claimant Services LLC, Respondent.\n"
           "Statement of Claim follows.")
    ours = [(p['name'], p['role']) for p in textops.extract_parties(cap)]
    theirs = [(p.name, p.role)
              for p in ref.StructuralExtractor().extract(cap).parties]
    assert ours == theirs
