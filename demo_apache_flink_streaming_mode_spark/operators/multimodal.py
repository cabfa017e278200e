"""Multimodal columns: opaque binary media + typed metadata.

Design (SURVEY.md §2.10 / driver mandate): media travel as
``binary`` columns with a typed manifest (media_type, n_bytes, chunking)
— at 100 TB the binary column holds *pointers* (path/offset/len) for
large blobs and inlines small ones; either way the Spark-side plumbing
(schema, partitioning, Arrow batch shape through mapInPandas) is the
same and is what this module implements and tests.

The actual codec work (image decode, audio resample, frame sampling)
needs libraries not present in this container, so the decode kernel is
STUBBED: ``decode_features(..., codec="fake")`` produces deterministic
pseudo-features from the bytes; ``codec="real"`` raises
NotImplementedError at the first batch. Everything around the kernel —
binary ingest, chunk manifest, Arrow batching, output schema — is real.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Literal

import pandas as pd

from pyspark.sql import DataFrame, functions as F

CHUNK_BYTES = 64 * 1024

FEATURE_SCHEMA = "doc_id bigint, media_type string, n_bytes bigint, feature array<double>"


def to_media(docs: DataFrame, text_col: str = "text",
             media_type: str = "application/octet-stream") -> DataFrame:
    """Ingest: wrap a payload as an opaque binary column + typed metadata.

    (Testdata has no real image/audio files, so document text stands in
    as the payload bytes; with real data this is ``format("binaryFile")``
    or a pointer manifest read.)
    """
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("media"),
        F.lit(media_type).alias("media_type"),
    )


def media_manifest(media: DataFrame) -> DataFrame:
    """Chunk manifest: byte size + number of fixed-size chunks per blob."""
    n_bytes = F.octet_length("media")
    return media.select(
        "doc_id", "media_type",
        n_bytes.alias("n_bytes"),
        F.ceil(n_bytes / F.lit(CHUNK_BYTES)).cast("long").alias("n_chunks"),
    )


def decode_features(media: DataFrame, codec: Literal["fake", "real"] = "fake",
                    dim: int = 8) -> DataFrame:
    """Feature extraction over binary media via Arrow-batched mapInPandas.

    The per-batch kernel sees a pandas DataFrame with raw ``bytes`` —
    exactly the shape a real decoder (PIL/libsndfile/ffmpeg) needs. The
    "fake" codec derives a deterministic feature vector from byte
    statistics so tests can assert the full pipeline shape end-to-end.
    """
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec == "real":
                raise NotImplementedError(
                    "real media decode requires image/audio libraries not "
                    "bundled in this environment; use codec='fake' for the "
                    "pipeline-shape path")
            feats = [
                [float(len(b)), float(b[0] if b else 0), float(b[-1] if b else 0),
                 float(sum(b[:64]) % 997)] + [float((len(b) >> s) & 0xFF)
                                              for s in range(dim - 4)]
                for b in pdf["media"]
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [len(b) for b in pdf["media"]],
                "feature": feats,
            })

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)
