"""Multimodal (image/audio/video) columns: binary payloads + typed metadata.

Design (per the build brief): media rides as an opaque ``binary`` column with
a typed metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages. The actual codec step is STUBBED —
no image/audio libraries ship in this container — behind
``decode_with_real_codec`` (raises ``NotImplementedError``) with a
deterministic fake (``_fake_decode``) carrying the same schema, batch shape,
and partitioning, so the Spark-side plumbing is real and tested end to end.

Reference analog: the reference treats every payload as an opaque JSON blob
streamed through staging files (/root/reference/multiversxetl/tasks_runner.py:
61-72); here the opaque payload is binary and the transform boundary is Arrow
(BASELINE.json:input_hint — vectorized, no per-row Python).

Scale notes: payload bytes never shuffle for metadata-only queries (column
pruning drops the binary column at the scan); feature extraction is
embarrassingly parallel over input partitions — ``mapInPandas`` preserves
partitioning, no exchange. Frame sampling explodes rows ~frames/doc, so it
repartitions afterwards only if a downstream stage groups by frame key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: metadata struct carried alongside every media payload.
MEDIA_META = StructType(
    [
        StructField("media_type", StringType()),  # image | audio | video
        StructField("n_bytes", LongType()),
        StructField("codec", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_sum", LongType()),
        StructField("first_byte", IntegerType()),
        StructField("last_byte", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
        StructField("frame_len", LongType()),
    ]
)

_MEDIA_TYPES = ("image", "audio", "video")
_CODECS = {"image": "fake-png", "audio": "fake-pcm", "video": "fake-h264"}


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Derive a deterministic binary payload per document (unhex of chained
    md5 of the text — pure column expressions, reproducible in any engine)
    plus the typed metadata struct. Stand-in for reading real media blobs
    from object storage."""
    payload = F.concat(
        F.unhex(F.md5("text")),
        F.unhex(F.md5(F.concat(F.lit("b1|"), "text"))),
        F.unhex(F.md5(F.concat(F.lit("b2|"), "text"))),
        F.unhex(F.md5(F.concat(F.lit("b3|"), "text"))),
    )
    # doc_id % 3 (not xxhash64) so any engine can reproduce the assignment
    mt = F.element_at(
        F.array(*[F.lit(t) for t in _MEDIA_TYPES]),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    codec = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in _CODECS.items() for x in kv]
        ),
        mt,
    )
    return documents.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            mt.alias("media_type"),
            F.length(payload).cast("long").alias("n_bytes"),
            codec.alias("codec"),
        ).alias("meta"),
    )


def decode_with_real_codec(payload: bytes, media_type: str) -> dict:
    """The real decode step (PIL / libav / soundfile) — NOT available in this
    container. Clearly-marked stub; swap in the real implementation on a
    cluster image that ships the codec libraries."""
    raise NotImplementedError(
        "media codecs (PIL/av/soundfile) are not installed in this environment; "
        "extract_features uses the deterministic fake decode instead"
    )


def _fake_decode(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake decode with the exact output schema of the real
    path: vectorized byte statistics over the payload column."""
    payloads = pdf["payload"]
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].astype("int64"),
            "media_type": pdf["media_type"],
            "n_bytes": payloads.map(len).astype("int64"),
            "byte_sum": payloads.map(lambda b: sum(b)).astype("int64"),
            "first_byte": payloads.map(lambda b: b[0] if b else 0).astype("int32"),
            "last_byte": payloads.map(lambda b: b[-1] if b else 0).astype("int32"),
        }
    )


def extract_features(media: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, meta).

    ``mapInPandas`` streams Arrow batches through a pandas transform —
    partition-preserving (no shuffle), bounded memory per batch
    (spark.sql.execution.arrow.maxRecordsPerBatch).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real_codec:
                decode_with_real_codec(b"", "")  # raises: codecs unavailable
            yield _fake_decode(pdf)

    flat = media.select("doc_id", "payload", F.col("meta.media_type").alias("media_type"))
    return flat.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, frame_size: int = 32) -> DataFrame:
    """Frame-sample 'video' payloads: slice the payload into fixed-size byte
    windows (the real path would seek keyframes). Arrow-batched; one output
    row per frame."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_len": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for idx, off in enumerate(range(0, len(payload), frame_size)):
                    chunk = payload[off : off + frame_size]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(idx)
                    rows["frame_bytes"].append(chunk)
                    rows["frame_len"].append(len(chunk))
            yield pd.DataFrame(rows)

    videos = media.where(F.col("meta.media_type") == "video").select("doc_id", "payload")
    return videos.mapInPandas(run, FRAME_SCHEMA)
