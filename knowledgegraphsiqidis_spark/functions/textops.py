"""Deterministic text-extraction and name-normalization kernels.

These are *behavior-parity* re-implementations of the reference system's
deterministic extraction surface, written as pure functions over plain
strings / pandas batches so that

  * Spark can call them from Arrow-batched ``applyInPandas`` UDFs, and
  * pytest can compare them 1:1 against the reference kernels
    (``/root/reference/src/core/extraction/structural_extractor.py`` and
    ``/root/reference/src/core/extraction/extraction_pipeline.py``)
    imported directly as the oracle.

Parity targets (reference file:line):
  - party captions / contract roles .... structural_extractor.py:53-77, 165-230
  - defined terms ...................... structural_extractor.py:80-89, 132-163
  - dates + context classification ..... structural_extractor.py:92-101, 275-318
  - case numbers ....................... structural_extractor.py:104-109, 320-330
  - court / tribunal ................... structural_extractor.py:332-350
  - document-type detection ............ structural_extractor.py:248-273
  - org/person name normalization ...... extraction_pipeline.py:69-152
  - entity-type validation ............. extraction_pipeline.py:154-196
  - pairwise name similarity ........... extraction_pipeline.py:208-255

The regex pattern strings and threshold constants ARE the spec — they must
match the reference bit-for-bit or triple P/R drops.  All surrounding code
(vectorization, data-driven tables, span bookkeeping) is original.
"""
from __future__ import annotations

import re
from difflib import SequenceMatcher
from functools import lru_cache
from typing import Any, Dict, List, Optional, Tuple

# --------------------------------------------------------------------------
# Pattern tables (spec constants; see module docstring for provenance)
# --------------------------------------------------------------------------

_ORG_NAME = r'([A-Z][A-Za-z&\s\.]{2,58}(?:Inc\.|Corp\.|LLC|LLP|Ltd\.|Corporation|Company)?)'

_LITIGATION_ROLES = ("Plaintiff", "Defendant", "Claimant", "Respondent",
                     "Petitioner", "Appellant", "Appellee")
_CONTRACT_ROLES = ("Buyer", "Seller", "Lessor", "Lessee", "Licensor", "Licensee",
                   "Borrower", "Lender", "Company", "Customer", "Vendor",
                   "Contractor", "Client")

# (compiled_pattern, role) in the reference's declaration order: litigation
# captions first, then contract defined-role forms.  Each pattern can only
# match where the literal role word occurs, so extract_parties prefilters on
# the lowered role string before paying the (backtracking-heavy) regex —
# a pure optimization with identical output.
PARTY_PATTERNS: List[Tuple[re.Pattern, str]] = (
    [(re.compile(rf'{_ORG_NAME}\s*,\s*{r}\b', re.IGNORECASE), r.lower())
     for r in _LITIGATION_ROLES]
    + [(re.compile(rf'{_ORG_NAME}\s*\(\s*(?:the\s+)?["\']{r}["\']\s*\)', re.IGNORECASE),
        r.lower())
       for r in _CONTRACT_ROLES]
)

DEFINED_TERM_PATTERNS: List[re.Pattern] = [
    re.compile(p, re.IGNORECASE) for p in (
        r'["\']([A-Z][A-Za-z\s]+)["\']?\s+(?:means?|shall mean|refers? to|is defined as)\s+([^.;]+[.;])',
        r'\((?:the\s+)?["\']([A-Z][A-Za-z\s]+)["\']\)',
        r'hereinafter\s+(?:referred to as\s+)?["\']([A-Z][A-Za-z\s]+)["\']',
        r'collectively,?\s+(?:the\s+)?["\']([A-Z][A-Za-z\s]+)["\']',
    )
]

_MONTHS = (r'(?:January|February|March|April|May|June|July|August|September|'
           r'October|November|December)')
DATE_PATTERNS: List[re.Pattern] = [
    re.compile(p) for p in (
        rf'({_MONTHS}\s+\d{{1,2}},?\s+\d{{4}})',
        r'(\d{1,2}/\d{1,2}/\d{2,4})',
        r'(\d{4}-\d{2}-\d{2})',
        rf'(\d{{1,2}}(?:st|nd|rd|th)\s+day\s+of\s+{_MONTHS},?\s+\d{{4}})',
    )
]

CASE_NUMBER_PATTERNS: List[re.Pattern] = [
    re.compile(p, re.IGNORECASE) for p in (
        r'(?:Case|Cause|Docket|Matter)\s*(?:No\.?|Number|#)\s*[:.]?\s*([A-Z0-9\-:]+)',
        r'(\d{1,2}[:-]cv[:-]\d+)',
        r'(\d{1,2}[:-]cr[:-]\d+)',
        r'([A-Z]{2,3}\s*\d{4}[:-]\d+)',
    )
]

COURT_PATTERNS: List[re.Pattern] = [
    re.compile(p) for p in (
        r'(?:IN THE\s+)?([A-Z][A-Za-z\s]+(?:COURT|TRIBUNAL|ARBITRATION|PANEL)[A-Za-z\s]*)',
        r'(?:BEFORE THE\s+)?([A-Z][A-Za-z\s]+(?:COURT|TRIBUNAL|ARBITRATION|PANEL)[A-Za-z\s]*)',
        r'(?:AMERICAN ARBITRATION ASSOCIATION)',
        r'(?:JAMS)',
        r'(?:ICC ARBITRATION)',
    )
]

PARTY_SECTION_PATTERNS: List[re.Pattern] = [
    re.compile(p, re.IGNORECASE) for p in (
        r'PARTIES\s*\n([\s\S]{0,2000}?)(?=\n[A-Z]{3,}|\n\d+\.\s)',
        r'THE PARTIES\s*\n([\s\S]{0,2000}?)(?=\n[A-Z]{3,}|\n\d+\.\s)',
        r'(?:BETWEEN|By and Between)[:\s]*([\s\S]{0,1500}?)(?=\n[A-Z]{3,}|\nWHEREAS)',
    )
]

# Ordered: first matching indicator wins.
DOC_TYPE_INDICATORS: List[Tuple[str, Tuple[str, ...]]] = [
    ('complaint', ('complaint', 'plaintiff hereby alleges', 'plaintiff brings this action')),
    ('answer', ('answer to complaint', 'defendant answers', 'defendant hereby answers')),
    ('motion', ('motion to', 'moves this court', 'motion for')),
    ('brief', ('brief in support', 'memorandum of law', 'legal memorandum',
               'pre-hearing brief', 'prehearing brief')),
    ('contract', ('agreement', 'contract', 'hereby agree', 'terms and conditions')),
    ('deposition', ('deposition of', 'deposition transcript', 'q.', 'a.')),
    ('affidavit', ('affidavit', 'being duly sworn', 'swear under penalty')),
    ('witness_statement', ('witness statement', 'statement of')),
    ('expert_report', ('expert report', 'expert opinion', 'expert witness')),
    ('discovery', ('request for production', 'interrogatories', 'request for admission')),
    ('order', ('order of the court', 'it is hereby ordered', 'so ordered')),
    ('statement_of_claim', ('statement of claim', 'claimant states')),
    ('settlement', ('settlement agreement', 'settlement', 'compromise')),
]

DATE_CONTEXT_CLASSES: List[Tuple[str, Tuple[str, ...]]] = [
    ('effective_date', ('effective', 'commence', 'begin', 'start')),
    ('expiration_date', ('expire', 'termination', 'end')),
    ('execution_date', ('sign', 'execute', 'dated')),
    ('deadline', ('due', 'deadline', 'by')),
    ('filing_date', ('file', 'filed')),
]

_TERM_STOPLIST = frozenset(('the', 'this', 'that', 'such', 'said', 'any', 'all'))
_PARTY_SKIP = frozenset(('the', 'this', 'that', 'party', 'parties', 'pursuant',
                         'statement', 'claim', 'amended', 'demand', 'arbitration',
                         'resolution', 'rules', 'procedures', 'against'))
_SENTENCE_WORDS = frozenset(('is', 'are', 'was', 'were', 'has', 'have', 'hereby',
                             'submits', 'brings'))

_WS = re.compile(r'\s+')


# --------------------------------------------------------------------------
# Structural extraction
# --------------------------------------------------------------------------

def find_party_section(text: str) -> str:
    """Caption/party section of the document, '' if none."""
    for pat in PARTY_SECTION_PATTERNS:
        m = pat.search(text)
        if m:
            return m.group(1)
    return ""


# A party pattern can only match ending at/near a literal role keyword; the
# organization-name prefix is bounded (≤59-char name + ≤12-char suffix) and
# the name→keyword separators (\s*,\s* / whitespace before a quoted role)
# are practically bounded by the window slack, so scanning a 140-char
# lookback window around each keyword occurrence is equivalent to scanning
# the whole region — but skips the quadratic backtracking over the
# 3000-char caption for every pattern.  Window sizing: 59 + 12 name chars
# + ~60 chars of separator allowance (a caption with MORE than that much
# whitespace between name and role keyword is out of scope by construction).
# Matches are deduplicated by span, ordered by position, and overlapping
# later matches are dropped — plain ``finditer`` never yields overlapping
# matches, and windowed re-scanning otherwise could.
_PARTY_LOOKBACK = 140


@lru_cache(maxsize=65536)
def _alias_pattern(name: str) -> re.Pattern:
    """Compiled quoted-alias search for one party name.  The dynamic
    pattern used to be compiled through ``re.search`` per match; distinct
    party names recur across conversations, so the stdlib's 512-entry regex
    cache thrashed and recompilation was ~16% of the extraction kernel
    (profiled).  Pure memoization — identical matches."""
    return re.compile(rf'{re.escape(name)}.*?["\']([A-Za-z]+)["\']',
                      re.IGNORECASE)


# Every character of a party match (name class, the \s*,\s* separator, the
# quoted-role separator) is from this union; anything else — digits, ':',
# ';' — cannot appear inside a match, so the leftmost possible match start
# in a window is the start of the contiguous union-char run ending at the
# role keyword.  Scanning the regex from there instead of the full lookback
# window skips the quadratic retry over text that cannot participate.
_PARTY_RUN_CHARS = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ&., \t\n(\"'")


def _party_matches(pat: re.Pattern, role: str, region: str, region_lower: str):
    spans = set()
    matches = []
    start = 0
    run_chars = _PARTY_RUN_CHARS
    while True:
        k = region_lower.find(role, start)
        if k < 0:
            break
        w0 = max(0, k - _PARTY_LOOKBACK)
        w1 = min(len(region), k + len(role) + 24)
        rs = k
        while rs > w0 and region[rs - 1] in run_chars:
            rs -= 1
        for m in pat.finditer(region, rs, w1):
            if m.span() not in spans:
                spans.add(m.span())
                matches.append(m)
        start = k + 1
    # finditer non-overlap semantics: scan left-to-right, drop any match
    # starting inside the previously accepted one
    out = []
    last_end = -1
    for m in sorted(matches, key=lambda m: (m.start(), m.end())):
        if m.start() >= last_end:
            out.append(m)
            last_end = m.end()
    return out


def extract_parties(text: str) -> List[Dict[str, Any]]:
    """Party names + roles from caption-ish text.

    Returns dicts ``{name, role, aliases, span_start, span_end}`` matching
    the reference ``Party`` dataclass field-for-field (aliases compared as
    sets — the reference materializes them through ``list(set(...))``).
    """
    region = find_party_section(text) or text[:3000]
    region_lower = region.lower()
    out: List[Dict[str, Any]] = []
    seen: set = set()

    for pat, role in PARTY_PATTERNS:
        if role not in region_lower:
            continue
        for m in _party_matches(pat, role, region, region_lower):
            name = _WS.sub(' ', m.group(1).strip()).strip(' ,.')
            low = name.lower()
            if len(name) < 3 or len(name) > 80 or low in seen:
                continue
            words = name.split()
            if len(words) > 8 or low in _PARTY_SKIP:
                continue
            if any(w.lower() in _SENTENCE_WORDS for w in words):
                continue
            seen.add(low)

            aliases = [name]
            am = _alias_pattern(name).search(region)
            aliases.append(am.group(1) if am else role.capitalize())

            out.append({
                'name': name,
                'role': role,
                'aliases': sorted(set(aliases)),
                'span_start': m.start(),
                'span_end': m.end(),
            })
    return out


def extract_defined_terms(text: str) -> List[Dict[str, Any]]:
    """Defined terms: ``{term, definition, aliases, span_start, span_end}``."""
    out: List[Dict[str, Any]] = []
    seen: set = set()
    for pat in DEFINED_TERM_PATTERNS:
        for m in pat.finditer(text):
            term = m.group(1).strip()
            low = term.lower()
            if low in seen or len(term) < 2 or len(term) > 50 or low in _TERM_STOPLIST:
                continue
            seen.add(low)
            definition = m.group(2).strip() if len(m.groups()) > 1 and m.group(2) else ""
            out.append({
                'term': term,
                'definition': definition[:500],
                'aliases': [term],
                'span_start': m.start(),
                'span_end': m.end(),
            })
    return out


def classify_date_context(context: str) -> str:
    low = context.lower()
    for label, words in DATE_CONTEXT_CLASSES:
        if any(w in low for w in words):
            return label
    return 'date'


def extract_dates(text: str, limit: int = 20) -> List[Dict[str, Any]]:
    """Dates with ±50-char context classification; first 20 distinct strings."""
    out: List[Dict[str, Any]] = []
    seen: set = set()
    for pat in DATE_PATTERNS:
        for m in pat.finditer(text):
            s = m.group(1)
            if s in seen:
                continue
            seen.add(s)
            ctx = text[max(0, m.start() - 50):min(len(text), m.end() + 50)]
            out.append({
                'date': s,
                'type': classify_date_context(ctx),
                'span_start': m.start(),
                'span_end': m.end(),
                'context': ctx,
            })
    return out[:limit]


def extract_case_number(text: str) -> str:
    head = text[:1000]
    for pat in CASE_NUMBER_PATTERNS:
        m = pat.search(head)
        if m:
            return m.group(1).strip()
    return ""


def extract_court(text: str) -> str:
    head = text[:1500]
    for pat in COURT_PATTERNS:
        m = pat.search(head)
        if m:
            return (m.group(0) if m.lastindex is None else m.group(1)).strip()
    return ""


def detect_document_type(text: str) -> str:
    head = text[:2000].lower()
    for doc_type, indicators in DOC_TYPE_INDICATORS:
        if any(ind in head for ind in indicators):
            return doc_type
    return 'unknown'


def extract_structural(text: str) -> Dict[str, Any]:
    """Full structural extraction over one document string."""
    return {
        'parties': extract_parties(text),
        'defined_terms': extract_defined_terms(text),
        'key_dates': extract_dates(text),
        'case_number': extract_case_number(text),
        'court': extract_court(text),
        'document_type': detect_document_type(text),
    }


# --------------------------------------------------------------------------
# Deterministic fact extraction (stand-in for the reference's LLM fact
# stream, semantic_extractor.py:106 fact types; interface-compatible with
# ExtractedFact: fact_type, text, related_entities).  The reference's facts
# come from the LLM; this is the deterministic subset the pluggable
# extractor contract allows — obligation ("X shall ...") and payment
# ("X paid $N to Y") sentence patterns.
# --------------------------------------------------------------------------

# Subjects/recipients must be runs of Capitalized tokens — proper-name-shaped
# strings the entity map can resolve; "The closing shall occur ..." is a
# sentence, not a fact subject.
_CAPTOKEN = r"[A-Z][\w&.,'\-]*"
_CAPNAME = rf"{_CAPTOKEN}(?:[ ]+{_CAPTOKEN})*"
FACT_OBLIGATION_RE = re.compile(
    rf'({_CAPNAME})\s+shall\s+([^.\n]*)')
FACT_OBLIG_RECIPIENT_RE = re.compile(
    rf'\bto\s+({_CAPNAME})(?=\s+(?:no later|by|on|within)\b|[,.;\n]|$)')
FACT_PAYMENT_RE = re.compile(
    rf'({_CAPNAME})\s+paid\s+(\$[\d,]+(?:\.\d+)?)\s+to\s+({_CAPNAME})'
    rf'(?=\s+(?:under|for|on|pursuant)\b|[,.;\n]|$)')


# Deterministic entity-role-property extraction — the pluggable stand-in for
# the LLM's per-entity properties that the reference's attorney/executive
# inference rules read (semantic_extractor.py:636-664: role ∈
# attorney/counsel/lawyer + props client/for/representing → represents 0.6;
# role ∈ ceo/president/director/officer + props company/organization/of →
# employed_by 0.8).  Sentence shapes: "NAME, counsel for CLIENT, ..." and
# "NAME, CEO of ORG, ...".
ATTORNEY_ROLES = ("attorney", "counsel", "lawyer")
EXEC_ROLES = ("ceo", "president", "director", "officer")
# role words match case-insensitively via scoped (?i:...) groups; the NAME
# pattern stays case-sensitive (IGNORECASE on the whole regex would let
# lowercase prose words match _CAPNAME)
ENTITY_PROP_RE = re.compile(
    rf'({_CAPNAME})\s*,\s+((?i:attorney|counsel|lawyer))\s+for\s+'
    rf'([^,\n]+?)\s*,'
    rf'|({_CAPNAME})\s*,\s+((?i:CEO|President|Director|Officer))\s+of\s+'
    rf'([^,\n]+?)\s*,')


def extract_entity_props(text: str) -> List[Dict[str, Any]]:
    """Person entities with role properties, in document order.

    Returns dicts ``{name, role, hint, span_start, span_end}``: ``role`` is
    lowercased (the reference lowercases before its table lookup,
    semantic_extractor.py:615); ``hint`` is the client (attorney roles) or
    company (executive roles) name the inference rules target.  First
    occurrence per (name, role) wins, like the extractor's other seen-sets.
    """
    out: List[Dict[str, Any]] = []
    seen = set()
    # Role keywords are literal alternatives in the pattern — when none
    # occurs in the text the finditer scan cannot match; skip it (pure
    # prefilter, identical output).
    low = text.lower()
    if not any(r in low for r in ATTORNEY_ROLES + EXEC_ROLES):
        return out
    for m in ENTITY_PROP_RE.finditer(text):
        if m.group(1):
            name, role, hint = m.group(1), m.group(2), m.group(3)
        else:
            name, role, hint = m.group(4), m.group(5), m.group(6)
        name = _WS.sub(' ', name.strip()).strip(' ,.')
        hint = _WS.sub(' ', hint.strip()).strip(' ,')
        role = role.lower()
        key = (name.lower(), role)
        if not name or not hint or key in seen:
            continue
        seen.add(key)
        out.append({'name': name, 'role': role, 'hint': hint,
                    'span_start': m.start(), 'span_end': m.end()})
    return out


def extract_facts(text: str) -> List[Dict[str, Any]]:
    """Deterministic facts in document order: obligation + payment patterns.

    Returns dicts ``{fact_type, text, related, span_start}``; ``related``
    holds the subject (and recipient when the sentence names one) — the
    strings the reference's fact rules and ``_store_facts`` resolve through
    the entity map (extraction_pipeline.py:800-874).
    """
    out: List[Dict[str, Any]] = []
    # literal-keyword prefilters ("paid" / "shall" are required literals in
    # the patterns) — skip the regex scans that cannot match
    has_paid = "paid" in text
    has_shall = "shall" in text
    if not (has_paid or has_shall):
        return out
    if not has_paid:
        pay_iter = ()
    else:
        pay_iter = FACT_PAYMENT_RE.finditer(text)
    for m in pay_iter:
        subj = _WS.sub(' ', m.group(1).strip()).strip(' ,.')
        obj = _WS.sub(' ', m.group(3).strip()).strip(' ,.')
        sentence = _WS.sub(' ', m.group(0).strip())
        out.append({'fact_type': 'payment', 'text': sentence,
                    'related': [subj, obj], 'span_start': m.start()})
    for m in (FACT_OBLIGATION_RE.finditer(text) if has_shall else ()):
        subj = _WS.sub(' ', m.group(1).strip()).strip(' ,.')
        if not subj or len(subj) > 80:
            continue
        sentence = _WS.sub(' ', m.group(0).strip())
        related = [subj]
        rm = FACT_OBLIG_RECIPIENT_RE.search(m.group(2))
        if rm:
            rec = _WS.sub(' ', rm.group(1).strip()).strip(' ,.')
            if rec and rec.lower() != subj.lower():
                related.append(rec)
        out.append({'fact_type': 'obligation', 'text': sentence,
                    'related': related, 'span_start': m.start()})
    return sorted(out, key=lambda f: f['span_start'])


# --------------------------------------------------------------------------
# Name normalization / typing / similarity (ER kernels)
# --------------------------------------------------------------------------

ORG_SUFFIXES: Tuple[str, ...] = (
    ', Inc.', ', Inc', ' Inc.', ' Inc', ' LLC', ' L.L.C.', ' LLP', ' L.L.P.',
    ', Ltd.', ', Ltd', ' Ltd.', ' Ltd', ' Corp.', ' Corp', ' Corporation',
    ' Co.', ' Co', ' Company', ' & Co.', ' & Co', ' PLC', ' plc',
    ' Limited', ' Incorporated', ' Associates', ' & Associates',
    ' Partners', ' & Partners', ' Group', ' Holdings', ' International',
)

PERSON_PREFIXES: Tuple[str, ...] = (
    'Mr. ', 'Mrs. ', 'Ms. ', 'Miss ', 'Dr. ', 'Prof. ', 'Professor ',
    'Hon. ', 'Honorable ', 'Judge ', 'Justice ', 'Sen. ', 'Senator ',
    'Rep. ', 'Representative ', 'Atty. ', 'Attorney ', 'Esq.',
)

PERSON_SUFFIXES: Tuple[str, ...] = (
    ', Jr.', ', Jr', ' Jr.', ' Jr', ', Sr.', ', Sr', ' Sr.', ' Sr',
    ', III', ' III', ', II', ' II', ', IV', ' IV', ', Esq.', ', Esq',
    ' Esq.', ' Esq',
)

ABBREVIATIONS: Dict[str, str] = {
    'intl': 'international', "int'l": 'international',
    'natl': 'national', "nat'l": 'national',
    'corp': 'corporation', 'assoc': 'associates', 'mgmt': 'management',
    'svcs': 'services', 'svc': 'service', 'tech': 'technology',
    'sys': 'systems', 'grp': 'group', 'hldgs': 'holdings',
    'mfg': 'manufacturing', 'dist': 'distribution', 'dev': 'development',
}

ORG_TYPE_INDICATORS: Tuple[str, ...] = (
    'corporation', 'corp.', 'corp', 'incorporated', 'inc.', 'inc',
    'limited', 'ltd.', 'ltd', 'llc', 'l.l.c.', 'llp', 'l.l.p.',
    'company', 'co.', 'holdings', 'group', 'partners', 'associates',
    'enterprises', 'industries', 'international', 'solutions',
    'services', 'systems', 'technologies', 'aerospace', 'aviation',
    'foundation', 'institute', 'association', 'plc', 'gmbh', 'ag',
)


def normalize_org_name(name: str) -> str:
    n = name.strip()
    for suffix in ORG_SUFFIXES:
        if n.endswith(suffix):
            n = n[:-len(suffix)].strip()
        elif n.lower().endswith(suffix.lower()):
            n = n[:-len(suffix)].strip()
    words = []
    for w in n.split():
        words.append(ABBREVIATIONS.get(w.lower().rstrip('.,'), w))
    return ' '.join(words).strip()


def normalize_person_name(name: str) -> str:
    n = name.strip()
    for prefix in PERSON_PREFIXES:
        if n.startswith(prefix):
            n = n[len(prefix):].strip()
        elif n.lower().startswith(prefix.lower()):
            n = n[len(prefix):].strip()
    for suffix in PERSON_SUFFIXES:
        if n.endswith(suffix):
            n = n[:-len(suffix)].strip()
    return n.strip()


# The three name-level kernels below are pure functions of a vocabulary
# that repeats massively across conversations (the same org/person surface
# forms recur); memoizing them is result-identical and removes the repeated
# suffix-table scans.  Bounded caches so an adversarial unbounded vocabulary
# cannot grow driver/worker memory.
@lru_cache(maxsize=65536)
def normalize_name(name: str, entity_type: Optional[str] = None) -> str:
    if entity_type == 'Organization':
        return normalize_org_name(name)
    if entity_type == 'Person':
        return normalize_person_name(name)
    return name.strip()


@lru_cache(maxsize=65536)
def validate_entity_type(name: str, claimed_type: str) -> str:
    """Correct obviously-mistyped Person/Organization labels from name cues."""
    low = name.lower()
    for ind in ORG_TYPE_INDICATORS:
        if ind in low:
            return 'Organization' if claimed_type == 'Person' else claimed_type
    for prefix in PERSON_PREFIXES:
        if low.startswith(prefix.lower()):
            return 'Person' if claimed_type == 'Organization' else claimed_type
    if name.isupper() and len(name) > 3:
        words = name.split()
        if len(words) > 1 and any(i in low for i in ('aerospace', 'corp', 'inc', 'ltd')):
            if claimed_type == 'Person':
                return 'Organization'
    return claimed_type


@lru_cache(maxsize=1 << 20)
def name_similarity(name1: str, name2: str, entity_type: Optional[str] = None) -> float:
    """Pairwise entity-name similarity in [0, 1].

    Tiers: exact-after-normalize (1.0) > containment (0.7 + 0.3·len ratio) >
    org word-Jaccard (0.6 + 0.4·J when J > 0.5) > person lastname+first/initial
    (0.95 / 0.8) > difflib SequenceMatcher ratio.
    """
    n1 = normalize_name(name1, entity_type).lower()
    n2 = normalize_name(name2, entity_type).lower()
    if n1 == n2:
        return 1.0
    if n1 in n2 or n2 in n1:
        shorter, longer = min(len(n1), len(n2)), max(len(n1), len(n2))
        return 0.7 + (0.3 * shorter / longer)
    if entity_type == 'Organization':
        w1, w2 = set(n1.split()), set(n2.split())
        if w1 and w2:
            overlap = len(w1 & w2)
            if overlap > 0:
                jaccard = overlap / len(w1 | w2)
                if jaccard > 0.5:
                    return 0.6 + (0.4 * jaccard)
    if entity_type == 'Person':
        p1, p2 = n1.split(), n2.split()
        if len(p1) >= 2 and len(p2) >= 2 and p1[-1] == p2[-1]:
            if p1[0] == p2[0]:
                return 0.95
            if p1[0][0] == p2[0][0]:
                return 0.8
    return SequenceMatcher(None, n1, n2).ratio()


@lru_cache(maxsize=65536)
def classify_party_type(name: str) -> str:
    """Org vs Person for structural parties (reference stores Organization iff
    the raw name carries a corporate marker — extraction_pipeline.py:548)."""
    return ('Organization'
            if any(c in name for c in ('Inc', 'Corp', 'LLC', 'Ltd', 'LLP'))
            else 'Person')
