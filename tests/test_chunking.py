"""F11 general chunker: exact parity vs the reference Chunker on synthetic
legal prose, plus the Spark mapInPandas surface."""
import pytest

from knowledgegraphsiqidis_spark.functions.chunking import (
    chunk_documents, chunk_text, split_sentences)
from tests._reference_oracle import load_reference


def _ref_chunker(chunk_size, overlap):
    load_reference()
    from src.core.parsing.chunker import Chunker
    return Chunker(chunk_size=chunk_size, overlap=overlap)


CORPUS = [
    ("Short doc. " * 3),
    ("The agreement was signed by ACME Inc. on January 5, 2020. "
     "Payment is due no later than March 1, 2021! Is that correct? "
     "Mr. Smith, Jr. reviewed clause No. 4 with Dr. Jones. " * 40),
    ("[Page 1] WHEREAS the parties agree as follows. " * 30
     + "[Page 2] NOW THEREFORE the following terms apply to the contract. "
     * 30),
    "",
    "   ",
    ("A sentence that runs well past the chunk size limit because it never "
     "terminates " * 50 + "."),
]


@pytest.mark.parametrize("size,overlap", [(500, 100), (300, 50), (20000, 1000)])
def test_chunk_parity_vs_reference(size, overlap):
    ref = _ref_chunker(size, overlap)
    for doc in CORPUS:
        ours = chunk_text(doc, size, overlap)
        theirs = ref.chunk_text(doc)
        assert len(ours) == len(theirs), doc[:40]
        for o, t in zip(ours, theirs):
            assert o["text"] == t.text
            assert o["start_char"] == t.start_char
            assert o["end_char"] == t.end_char
            assert o["chunk_index"] == t.chunk_index
            assert o["total_chunks"] == t.total_chunks


def test_sentence_split_abbreviation_guard():
    """No sentence boundary after an abbreviation: 'Inc.' / 'fig.' keep
    their continuation in the same sentence.  (Reference quirk replicated:
    the re.split consumes the separator whitespace, so re-joined
    abbreviation boundaries lose the space — 'Inc.signed'.)"""
    s = split_sentences(
        "ACME Inc. signed the deal. The price was high. See fig. 3 for more.")
    assert not any(x.endswith(("Inc.", "fig.")) for x in s)
    assert any("Inc.signed" in x for x in s)
    assert any("fig.3 for more" in x for x in s)


def test_chunk_documents_spark(spark):
    docs = spark.createDataFrame(
        [(i, CORPUS[1]) for i in range(4)], "doc_id long, text string")
    out = chunk_documents(docs, chunk_size=500, overlap=100)
    rows = out.collect()
    assert len(rows) == 4 * len(chunk_text(CORPUS[1], 500, 100))
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for did, rs in per_doc.items():
        assert {r["total_chunks"] for r in rs} == {len(rs)}
        assert sorted(r["chunk_index"] for r in rs) == list(range(len(rs)))
