"""Deterministic synthetic transcript corpus (FIXTURES.md §1/§4).

Schema (BASELINE.json input_hint):
    conv_id: string, turn_idx: int32, role: string, text: string,
    tool: string, ts: timestamp

The text turns embed exactly the pattern families the reference's
deterministic extractors recognize (party captions, defined terms, dates,
case numbers, courts, document-type keywords, ER alias clusters, inference
triggers, one hot surface form for skew), so the pytest parity suite can
compare (subj, pred, obj) triples against the reference kernels run on the
same concatenated per-conversation documents.

Pure function of (n_conversations, seed): no wall-clock, no external data.
"""
from __future__ import annotations

import datetime as _dt
from typing import Iterator, List, Tuple

import numpy as np
import pandas as pd

_BASE_TS = _dt.datetime(2024, 1, 1, 0, 0, 0)

_ORG_STEMS = [
    "ACME", "Globex", "Initech", "Umbrella", "Stark Industries", "Wayne Enterprises",
    "Cyberdyne Systems", "Tyrell", "Wonka Industries", "Soylent", "Hooli",
    "Pied Piper", "Vandelay Industries", "Oscorp", "Massive Dynamic", "Aperture",
    "Black Mesa", "Weyland", "Nakatomi Trading", "Gringotts Holdings",
]
_ORG_SUFFIX_VARIANTS = ["Corporation", "Corp.", "Inc.", "LLC", "Ltd.", ""]
_HOT_ORG = "Gulfstream"  # skew witness: hottest node in the reference run artifact

_FIRST = ["John", "Jane", "Robert", "Maria", "Wei", "Aisha", "Carlos", "Elena",
          "David", "Sarah", "Ahmed", "Priya", "Thomas", "Linda", "Igor", "Yuki"]
_LAST = ["Smith", "Johnson", "Garcia", "Chen", "Patel", "Mueller", "Rossi",
         "Kowalski", "Tanaka", "Okafor", "Dubois", "Ivanov", "Park", "Silva"]

_MONTH_NAMES = ["January", "February", "March", "April", "May", "June", "July",
                "August", "September", "October", "November", "December"]

_COURTS = [
    "IN THE SUPERIOR COURT OF THE STATE OF DELAWARE",
    "IN THE UNITED STATES DISTRICT COURT",
    "AMERICAN ARBITRATION ASSOCIATION",
    "BEFORE THE INTERNATIONAL ARBITRATION TRIBUNAL",
]

_DOC_TYPE_OPENERS = [
    "This Statement of Claim is submitted for arbitration.",
    "Plaintiff hereby alleges the following causes of action.",
    # NOTE: must not contain "between" — the reference's party-section regex
    # (structural_extractor.py PARTY_SECTION_PATTERNS, IGNORECASE) would
    # match "between the parties." as the caption region and blind the party
    # extractor for the whole conversation.
    "This Agreement sets out the terms and conditions for the parties.",
    "Deposition of the witness, taken before a certified reporter.",
    "This Settlement Agreement resolves all disputes among the parties.",
    "Motion to compel production of documents.",
]

_TOOLS = ["search", "docread", "cite"]

_FILLER = [
    "The parties met to discuss the schedule for document production.",
    "Counsel reviewed the record and summarized the open issues.",
    "The tribunal requested additional briefing on jurisdiction.",
    "Discovery remains ongoing with respect to the technical documents.",
    "The engineering report was circulated to all counsel of record.",
    "No further action items were recorded for this session.",
]


def _org_name(rng: np.random.RandomState) -> str:
    stem = _ORG_STEMS[rng.randint(len(_ORG_STEMS))]
    suffix = _ORG_SUFFIX_VARIANTS[rng.randint(len(_ORG_SUFFIX_VARIANTS))]
    return f"{stem} {suffix}".strip()


def _person_name(rng: np.random.RandomState) -> str:
    return f"{_FIRST[rng.randint(len(_FIRST))]} {_LAST[rng.randint(len(_LAST))]}"


def _date_str(rng: np.random.RandomState) -> str:
    month = _MONTH_NAMES[rng.randint(12)]
    day = int(rng.randint(1, 28))
    year = int(rng.randint(2018, 2026))
    style = rng.randint(4)
    if style == 0:
        return f"{month} {day}, {year}"
    if style == 1:
        return f"{rng.randint(1, 13)}/{day}/{year}"
    if style == 2:
        return f"{year}-{rng.randint(1, 13):02d}-{day:02d}"
    suf = {1: "st", 2: "nd", 3: "rd"}.get(day % 10 if day not in (11, 12, 13) else 0, "th")
    return f"{day}{suf} day of {month}, {year}"


def _conversation_turns(conv_i: int, n_turns: int, rng: np.random.RandomState) -> List[str]:
    """Turn texts for one conversation; turn 0 carries the caption block."""
    hot = rng.random_sample() < 0.30
    claimant = f"{_HOT_ORG} Aerospace Corporation" if hot else _org_name(rng)
    respondent = _org_name(rng)
    while respondent.split()[0] == claimant.split()[0]:
        respondent = _org_name(rng)
    court = _COURTS[rng.randint(len(_COURTS))]
    case_no = f"Case No. {rng.randint(10, 99)}-{rng.randint(10, 99)}-{rng.randint(1000000, 9999999)}"
    opener = _DOC_TYPE_OPENERS[rng.randint(len(_DOC_TYPE_OPENERS))]

    turns = [
        f"{court}\n{case_no}\n{claimant}, Claimant, and {respondent}, Respondent.\n{opener}"
    ]

    for t in range(1, n_turns):
        kind = rng.randint(12)
        if kind == 0:
            term = ["Aircraft", "Agreement", "Closing Date", "Purchase Price",
                    "Deliverables", "Effective Period"][rng.randint(6)]
            turns.append(
                f'The term "{term}" means the {_org_name(rng)} asset described in '
                f"Schedule {rng.randint(1, 9)}."
            )
        elif kind == 1:
            turns.append(
                f"The closing shall occur on {_date_str(rng)}, with payment due "
                f"by {_date_str(rng)}."
            )
        elif kind == 2:
            short = claimant.split()[0]
            turns.append(
                f"{short} is affiliated with {claimant} per the corporate disclosure. "
                f"The agreement was signed on {_date_str(rng)}."
            )
        elif kind == 3:
            buyer = _org_name(rng)
            turns.append(
                f'{buyer} (the "Buyer") agreed to purchase the assets from '
                f'{respondent} (the "Seller").'
            )
        elif kind == 4:
            person = _person_name(rng)
            variant = rng.randint(3)
            pname = (f"Mr. {person}" if variant == 0
                     else f"{person}, Jr." if variant == 1 else person)
            turns.append(
                f'{pname} (the "Client") retained counsel in this matter. '
                f"hereinafter referred to as \"{person.split()[-1]}\""
            )
        elif kind == 5:
            turns.append(
                f'The documents (the "Record") were produced on {_date_str(rng)}. '
                f"collectively, the \"Parties\""
            )
        elif kind == 6:
            # obligation fact sentence (deterministic fact extraction +
            # binds-rule trigger; related entities are conv parties)
            turns.append(
                f"{claimant} shall deliver the executed documents to "
                f"{respondent} no later than {_date_str(rng)}."
            )
        elif kind == 7:
            # payment fact sentence (paid-rule trigger)
            amount = int(rng.randint(10, 999)) * 1000
            turns.append(
                f"{claimant} paid ${amount:,} to {respondent} under the "
                f"master agreement."
            )
        elif kind == 8:
            # attorney role-property sentence (G4 rule 3 trigger:
            # textops.extract_entity_props → represents)
            person = _person_name(rng)
            turns.append(
                f"{person}, counsel for {claimant}, entered an appearance "
                f"on the record."
            )
        elif kind == 9:
            # executive role-property sentence (G4 rule 5 trigger:
            # employed_by)
            person = _person_name(rng)
            turns.append(
                f"{person}, CEO of {respondent}, signed the master agreement."
            )
        else:
            turns.append(_FILLER[rng.randint(len(_FILLER))])
    return turns


def iter_transcript_rows(n_conversations: int, seed: int = 42,
                         **kw) -> Iterator[Tuple]:
    """Yield (conv_id, turn_idx, role, text, tool, ts) tuples deterministically."""
    for i in range(n_conversations):
        yield from _rows_for_index(i, seed, kw)


def transcripts_pdf(n_conversations: int, seed: int = 42, **kw) -> pd.DataFrame:
    rows = list(iter_transcript_rows(n_conversations, seed, **kw))
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])


TRANSCRIPT_DDL = ("conv_id string, turn_idx int, role string, text string, "
                  "tool string, ts timestamp")


def transcripts_df(spark, n_conversations: int, seed: int = 42,
                   n_partitions: int | None = None, **kw):
    """Synth transcripts as a Spark DataFrame.

    Generation is distributed: conversation indexes are parallelized and each
    partition synthesizes its own rows (no driver-side materialization), so
    the same code scales to the bench corpus.
    """
    sc = spark.sparkContext
    n_partitions = n_partitions or max(sc.defaultParallelism, 8)

    # One RDD element per conversation index; each partition synthesizes its
    # own rows, so nothing is materialized on the driver.
    def gen_rows(i: int):
        yield from _rows_for_index(i, seed, kw)

    rdd = sc.parallelize(range(n_conversations), n_partitions).flatMap(gen_rows)
    return spark.createDataFrame(rdd, schema=TRANSCRIPT_DDL)


def _rows_for_index(i: int, seed: int, kw) -> Iterator[Tuple]:
    rng = np.random.RandomState(seed * 1_000_003 + i)
    median_turns = kw.get("median_turns", 12)
    skew_fraction = kw.get("skew_fraction", 0.01)
    skew_multiplier = kw.get("skew_multiplier", 50)
    n_turns = int(rng.randint(max(4, median_turns - 4), median_turns + 5))
    if rng.random_sample() < skew_fraction:
        n_turns *= skew_multiplier
    conv_id = f"conv-{i:08d}"
    texts = _conversation_turns(i, n_turns, rng)
    conv_offset = _dt.timedelta(hours=int(i % 10_000))
    for t, text in enumerate(texts):
        role = ("user", "assistant", "tool")[t % 3]
        tool = _TOOLS[t % 3] if role == "tool" else None
        ts = _BASE_TS + conv_offset + _dt.timedelta(seconds=30 * t)
        yield (conv_id, int(t), role, text, tool, ts)
