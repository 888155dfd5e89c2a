"""General text chunker (F11 — reference chunker.py:34-214).

Not used on the transcript path (turn = unit there, SURVEY §2.7 F11), but
required the day a non-transcript document source appears.  The kernel is a
pure function (behavior-parity with the reference ``Chunker`` is pytest-
verified by importing the reference as the oracle); the Spark surface is a
``mapInPandas`` over whole documents emitting one row per chunk — the
UDTF-shaped explode of the north star's extraction interface.

Semantics mirrored exactly (chunker.py):
  - whitespace normalization + ``[Page N]`` marker removal (:106-112)
  - sentence split on ``[.!?]+\\s+`` with a legal-abbreviation guard that
    re-joins false boundaries (:114-155)
  - greedy accumulation to ``chunk_size`` with a sentence-aligned
    ``overlap`` tail carried into the next chunk (:34-104)
"""
from __future__ import annotations

import re
from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame, types as T

CHUNK_SIZE = 20_000   # reference config.py:21
CHUNK_OVERLAP = 1_000  # reference config.py:22

_ABBREV = (r'(?:Inc|Corp|Ltd|LLC|LLP|No|nos|vs|v|Mr|Mrs|Ms|Dr|Prof|Jr|Sr|etc'
           r'|e\.g|i\.e|cf|al|et|para|paras|sec|secs|art|arts|ch|chs|vol'
           r'|vols|p|pp|fig|figs|ex|exs|cert|App|Supp|F\.2d|F\.3d|S\.Ct'
           r'|U\.S|Cal|N\.Y|Tex|Ill)')
_ABBREV_END = re.compile(_ABBREV + r'[.!?]+$', re.IGNORECASE)
_BOUNDARY = re.compile(r'([.!?]+)\s+')
_PUNCT = re.compile(r'^[.!?]+$')
_WS = re.compile(r'\s+')
_PAGE = re.compile(r'\[Page \d+\]\s*')


def normalize_text(text: str) -> str:
    return _WS.sub(' ', _PAGE.sub('\n\n', text)).strip()


def split_sentences(text: str) -> List[str]:
    """Sentence segmentation with the abbreviation guard (min length 10)."""
    parts = _BOUNDARY.split(text)
    sentences, current, i = [], "", 0
    while i < len(parts):
        part = parts[i]
        if i + 1 < len(parts) and _PUNCT.match(parts[i + 1]):
            current += part + parts[i + 1]
            i += 2
            if not _ABBREV_END.search(current):
                sentences.append(current.strip())
                current = ""
        else:
            current += part
            i += 1
    if current.strip():
        sentences.append(current.strip())
    return [s for s in sentences if len(s) > 10]


def chunk_text(text: str, chunk_size: int = CHUNK_SIZE,
               overlap: int = CHUNK_OVERLAP) -> List[dict]:
    """Sentence-aligned overlapping chunks with char offsets."""
    if not text or not text.strip():
        return []
    text = normalize_text(text)
    sentences = split_sentences(text)

    chunks: List[dict] = []
    cur: List[str] = []
    cur_len = 0
    chunk_start = 0
    pos = 0
    for sent in sentences:
        slen = len(sent)
        if cur_len + slen > chunk_size and cur:
            body = " ".join(cur)
            chunks.append({"text": body, "start_char": chunk_start,
                           "end_char": chunk_start + len(body)})
            tail: List[str] = []
            tail_len = 0
            for s in reversed(cur):
                if tail_len + len(s) <= overlap:
                    tail.insert(0, s)
                    tail_len += len(s) + 1
                else:
                    break
            cur, cur_len = tail, sum(len(s) + 1 for s in tail)
            chunk_start = pos - tail_len if tail_len > 0 else pos
        cur.append(sent)
        cur_len += slen + 1
        pos += slen + 1
    if cur:
        body = " ".join(cur)
        chunks.append({"text": body, "start_char": chunk_start,
                       "end_char": chunk_start + len(body)})
    total = len(chunks)
    for idx, c in enumerate(chunks):
        c["chunk_index"] = idx
        c["total_chunks"] = total
    return chunks


CHUNKS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("chunk_index", T.IntegerType()),
    T.StructField("total_chunks", T.IntegerType()),
    T.StructField("start_char", T.IntegerType()),
    T.StructField("end_char", T.IntegerType()),
    T.StructField("text", T.StringType()),
])


def chunk_documents(docs: DataFrame, chunk_size: int = CHUNK_SIZE,
                    overlap: int = CHUNK_OVERLAP, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """One row per chunk, Arrow-batched (no per-row Python in the plan)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, txt in zip(pdf[id_col].astype(str), pdf[text_col]):
                for c in chunk_text(txt or "", chunk_size, overlap):
                    rows.append((did, c["chunk_index"], c["total_chunks"],
                                 c["start_char"], c["end_char"], c["text"]))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              CHUNKS_SCHEMA.fields])

    return (docs.select(id_col, text_col)
            .mapInPandas(run, schema=CHUNKS_SCHEMA))
