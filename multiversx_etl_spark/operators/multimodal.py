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


def _payload_buffer(payloads: pd.Series):
    """One contiguous (data, offsets) view over a batch of byte payloads via
    Arrow's native binary layout — the vectorization substrate for every
    fake-codec kernel (no per-row Python anywhere)."""
    import numpy as np
    import pyarrow as pa

    arr = pa.array(payloads.to_numpy(dtype=object), type=pa.large_binary())
    assert arr.null_count == 0
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data_buf = arr.buffers()[2]
    buf = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None
        else np.zeros(0, dtype=np.uint8)
    )
    return buf, offs


def _fake_decode(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake decode with the exact output schema of the real
    path: byte statistics computed over the batch's contiguous Arrow buffer
    with numpy — prefix-sum for per-row byte sums, offset gathers for
    first/last bytes. Zero per-row Python."""
    import numpy as np

    buf, offs = _payload_buffer(pdf["payload"])
    lens = np.diff(offs)
    csum = np.concatenate([[0], np.cumsum(buf, dtype=np.int64)])
    byte_sum = csum[offs[1:]] - csum[offs[:-1]]
    nonempty = lens > 0
    first = np.zeros(len(lens), dtype=np.int32)
    last = np.zeros(len(lens), dtype=np.int32)
    if buf.size:
        first[nonempty] = buf[offs[:-1][nonempty]]
        last[nonempty] = buf[offs[1:][nonempty] - 1]
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].astype("int64"),
            "media_type": pdf["media_type"],
            "n_bytes": lens.astype("int64"),
            "byte_sum": byte_sum,
            "first_byte": first,
            "last_byte": last,
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
        import numpy as np
        import pyarrow as pa

        for pdf in batches:
            buf, offs = _payload_buffer(pdf["payload"])
            lens = np.diff(offs)
            n_frames = -(-lens // frame_size)  # ceil-div; empty payload -> 0
            total = int(n_frames.sum())
            if total == 0:
                yield pd.DataFrame(
                    {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_len": []}
                )
                continue
            doc_id = np.repeat(pdf["doc_id"].to_numpy(), n_frames)
            # frame_idx = global position minus each row's first-frame position
            frame_base = np.concatenate([[0], np.cumsum(n_frames)[:-1]])
            frame_idx = np.arange(total, dtype=np.int64) - np.repeat(frame_base, n_frames)
            # frames tile each payload contiguously and payloads are
            # contiguous in buf, so every frame boundary is a cut point in
            # buf: build the output binary column zero-copy from (cuts, buf)
            starts = np.repeat(offs[:-1], n_frames) + frame_idx * frame_size
            cuts = np.append(starts, offs[-1]).astype(np.int64)
            frames = pa.LargeBinaryArray.from_buffers(
                pa.large_binary(), total, [None, pa.py_buffer(cuts), pa.py_buffer(buf)]
            )
            yield pd.DataFrame(
                {
                    "doc_id": doc_id,
                    "frame_idx": frame_idx.astype("int32"),
                    "frame_bytes": frames.to_pandas(),
                    "frame_len": np.diff(cuts),
                }
            )

    videos = media.where(F.col("meta.media_type") == "video").select("doc_id", "payload")
    return videos.mapInPandas(run, FRAME_SCHEMA)
