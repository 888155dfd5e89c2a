"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio decode libraries are not available in this environment, so the
decode kernels are deterministic STUBS (clearly marked) — but the Spark-side
plumbing is real and tested: schema, Arrow batch shape, ``mapInPandas``
iteration, partition-preserving metadata extraction.  Swapping
``_decode_stub`` for a real PIL/librosa call changes nothing structurally.
"""
from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("kind", T.StringType()),         # image | audio | video
    T.StructField("payload", T.BinaryType()),      # opaque encoded bytes
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("content_hash", T.StringType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def _decode_stub(payload: bytes, kind: str) -> list[float]:
    """STUB decoder — deterministic 8-dim feature from the payload digest.

    Real deployments replace this with PIL/torchvision (image), torchaudio
    (audio) or frame sampling (video); the function contract (bytes → fixed
    width float vector) and everything around it stays identical.
    """
    digest = hashlib.sha256(payload if payload is not None else b"").digest()
    return [b / 255.0 for b in digest[:8]]


def extract_features(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """binary payload → feature vectors via mapInPandas (Arrow batches)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                "content_hash": [
                    hashlib.sha256(p if p is not None else b"").hexdigest()
                    for p in pdf["payload"]],
                "feature": feats,
            })

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def synth_media(spark, docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media table from a text table (payload = utf-8
    bytes), used to exercise the plumbing without real codecs."""
    kind = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                        (F.col(id_col) % 3 + 1).cast("int"))
    return docs.select(
        F.concat(F.lit("m-"), F.col(id_col).cast("string")).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.create_map(F.lit("origin"), F.lit("synth")).alias("meta"))
