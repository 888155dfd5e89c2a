"""Text-analysis operators for training-data pipelines — all built-in
column expressions (JVM-side, whole-stage codegen), no UDFs.

  token_stats ....... whitespace token count + char stats
  quality_score ..... length / punctuation / stopword-ratio heuristic
  language_id ....... stopword-hit n-gram heuristic over a small profile set
  fingerprint ....... polynomial rolling hash of the normalized text
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "de", "que", "y", "es", "en", "un", "por"],
}


def token_stats(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    toks = F.split(F.col(text_col), r"\s+")
    return docs.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.length(text_col).alias("n_chars"),
        (F.length(text_col) / F.size(toks)).alias("avg_token_len"))


def quality_score(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality in [0,1]: length band + alpha ratio + stopword hits."""
    n_chars = F.length(text_col)
    alpha = F.length(F.regexp_replace(text_col, r"[^A-Za-z ]", ""))
    alpha_ratio = alpha / F.greatest(n_chars, F.lit(1))
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    sw = F.array([F.lit(w) for w in _STOPWORDS["en"]])
    stop_hits = F.size(F.array_intersect(toks, sw))
    length_ok = F.when((n_chars >= 50) & (n_chars <= 100_000), 1.0).otherwise(0.3)
    return docs.select(
        F.col(id_col),
        F.round(
            0.4 * length_ok + 0.4 * alpha_ratio
            + 0.2 * F.least(stop_hits / F.lit(5.0), F.lit(1.0)), 4
        ).alias("quality"))


def language_id(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Predicted language = profile with most distinct stopword hits.

    Ties broken by profile order (en, de, fr, es); no hits → 'und'.
    """
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    scores = [
        F.size(F.array_intersect(toks, F.array([F.lit(w) for w in words])))
        .alias(f"s_{lang}")
        for lang, words in _STOPWORDS.items()
    ]
    scored = docs.select(F.col(id_col), F.col(text_col), *scores)
    langs = list(_STOPWORDS)
    best = F.greatest(*[F.col(f"s_{l}") for l in langs])
    pred = F.when(best <= 0, "und")
    for l in langs:
        pred = pred.when(F.col(f"s_{l}") == best, l)
    return scored.select(F.col(id_col), pred.alias("pred_lang"))


def fingerprint(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Order-sensitive 64-bit document fingerprint: xxhash of the
    whitespace-normalized lowered text (stable across engines that share
    the normalization, unlike a Python rolling hash)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return docs.select(F.col(id_col), F.xxhash64(norm).alias("fingerprint"))
