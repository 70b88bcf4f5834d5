"""Multimodal (image/audio/video) columns: binary payloads + typed metadata.

Design (per the build brief): media rides as an opaque ``binary`` column with
a typed metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages. Codecs that need external libraries
(JPEG/H.264/MP3 — none ship in this container) are STUBBED behind
``decode_with_real_codec`` (raises ``NotImplementedError``) with a
deterministic fake (``_fake_decode``) carrying the same schema, batch shape,
and partitioning, so the Spark-side plumbing is real and tested end to end.
Container-decodable formats are decoded FOR REAL: ``decode_media`` parses
canonical PCM WAV and 24-bit BMP payloads with numpy alone, and
non-interlaced 8-bit RGB(A) PNG with stdlib zlib + numpy (IHDR/IDAT chunk
walk, all five scanline filters reversed), so the real-codec path is
exercised end to end for three formats and the stub boundary covers only
genuinely library-dependent codecs (JPEG/H.264/MP3).

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
    DoubleType,
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
    """The library-dependent decode step (PIL / libav / soundfile) — NOT
    available in this container. Clearly-marked stub; swap in the real
    implementation on a cluster image that ships the codec libraries.
    Formats decodable without libraries (canonical WAV, 24-bit BMP,
    non-interlaced 8-bit RGB(A) PNG via stdlib zlib) are NOT stubbed — see
    ``decode_media``; the boundary covers only JPEG/H.264/MP3-class codecs."""
    raise NotImplementedError(
        "compressed-media codecs (PIL/av/soundfile) are not installed in this "
        "environment; extract_features uses the deterministic fake decode "
        "instead, and decode_media handles WAV/BMP/PNG natively"
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


# ---------------------------------------------------------------------------
# Real decode for container-decodable formats (canonical PCM WAV, 24-bit BMP)
# ---------------------------------------------------------------------------

#: output schema of ``decode_media``. Audio rows fill sample_* fields and the
#: image fields are NULL; image rows vice versa. ``value_mean`` is the mean
#: int16 sample (WAV) or the mean pixel byte over the BGR bytes with row
#: padding EXCLUDED (BMP).
MEDIA_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("codec", StringType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("bits_per_sample", IntegerType()),
        StructField("n_samples", LongType()),  # PCM frames (WAV) / pixels (BMP)
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("value_mean", DoubleType()),
    ]
)

_WAV_HEADER_LEN = 44  # canonical RIFF/WAVE: 12-byte RIFF + 24-byte fmt + 8-byte data


def _decode_wav_payload(buf) -> dict:
    """Parse one canonical PCM WAV blob (numpy view, zero copies of the PCM).

    Codec kernels are inherently per-payload — a real soundfile/libav call
    would be too; the Arrow batch boundary (``decode_media``) is what keeps
    the Python<->JVM transfer vectorized.
    """
    import numpy as np

    if len(buf) < _WAV_HEADER_LEN:
        raise ValueError(f"WAV payload truncated: {len(buf)} bytes")
    hdr = buf[:_WAV_HEADER_LEN]
    if not (
        bytes(hdr[0:4]) == b"RIFF"
        and bytes(hdr[8:12]) == b"WAVE"
        and bytes(hdr[12:16]) == b"fmt "
        and bytes(hdr[36:40]) == b"data"
    ):
        raise ValueError("not a canonical RIFF/WAVE payload")
    u16 = lambda o: int(hdr[o]) | int(hdr[o + 1]) << 8
    u32 = lambda o: u16(o) | u16(o + 2) << 16
    if u16(20) != 1:  # wFormatTag: PCM
        raise ValueError(f"unsupported WAV format tag {u16(20)} (PCM only)")
    channels, sample_rate, bits = u16(22), u32(24), u16(34)
    if bits != 16:
        raise ValueError(f"unsupported bits_per_sample {bits} (16 only)")
    if channels == 0:
        raise ValueError("malformed WAV: nChannels is 0")
    if sample_rate > 2**31 - 1:  # schema field is int32; refuse, don't wrap
        raise ValueError(f"malformed WAV: sample_rate {sample_rate} out of range")
    data_len = min(u32(40), len(buf) - _WAV_HEADER_LEN)
    pcm_bytes = np.asarray(buf[_WAV_HEADER_LEN : _WAV_HEADER_LEN + data_len])
    # int16 LE without alignment assumptions: lo + (hi as signed) * 256
    lo = pcm_bytes[0::2].astype(np.int64)
    hi = pcm_bytes[1::2].astype(np.int8).astype(np.int64)
    n = min(len(lo), len(hi))
    samples = lo[:n] + (hi[:n] << 8)
    frames = n // channels
    return {
        "codec": "pcm_wav",
        "channels": channels,
        "sample_rate": sample_rate,
        "bits_per_sample": bits,
        "n_samples": frames,
        "width": None,
        "height": None,
        "value_mean": float(samples.mean()) if n else 0.0,
    }


_BMP_HEADER_LEN = 54  # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)


def _bmp_pixels(buf):
    """Parse one 24-bit uncompressed BMP blob into (width, height, pixel rows)
    where pixel rows is a (height, 3*width) uint8 array normalized to
    bottom-up row order (top-down/negative-height inputs are flipped) with
    the stride padding dropped."""
    import numpy as np

    if len(buf) < _BMP_HEADER_LEN:
        raise ValueError(f"BMP payload truncated: {len(buf)} bytes")
    hdr = np.asarray(buf[:_BMP_HEADER_LEN])
    if bytes(hdr[0:2]) != b"BM":
        raise ValueError("not a BMP payload (missing BM magic)")
    u = lambda o, n: int.from_bytes(bytes(hdr[o : o + n]), "little")
    s = lambda o, n: int.from_bytes(bytes(hdr[o : o + n]), "little", signed=True)
    data_offset = u(10, 4)
    width, height_raw = s(18, 4), s(22, 4)  # negative height = top-down rows
    bpp, compression = u(28, 2), u(30, 4)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    if data_offset < _BMP_HEADER_LEN:
        raise ValueError(f"malformed BMP: pixel offset {data_offset} inside header")
    height = abs(height_raw)
    stride = (3 * width + 3) // 4 * 4  # rows pad to 4-byte boundaries
    need = data_offset + stride * height
    if width < 0 or len(buf) < need:
        raise ValueError(f"BMP pixel array truncated: {len(buf)} < {need}")
    rows = np.asarray(buf[data_offset : data_offset + stride * height])
    pixels = rows.reshape(height, stride)[:, : 3 * width]
    if height_raw < 0:  # normalize top-down storage to bottom-up order
        pixels = pixels[::-1]
    return width, height, pixels


def _decode_bmp_payload(buf) -> dict:
    """Parse one 24-bit uncompressed BMP blob (numpy view over the pixels)."""
    width, height, pixels = _bmp_pixels(buf)
    return {
        "codec": "bmp24",
        "channels": 3,
        "sample_rate": None,
        "bits_per_sample": 24,
        "n_samples": width * height,
        "width": width,
        "height": height,
        "value_mean": float(pixels.mean()) if pixels.size else 0.0,
    }


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_pixels(buf):
    """Parse one non-interlaced 8-bit RGB(A) PNG blob into (width, height,
    channels, pixels) where pixels is a (height, width*channels) uint8 array
    — stdlib ``zlib`` inflate + the five per-scanline filters reversed with
    numpy (rows sequential as the spec requires; Sub is a per-lane cumsum,
    Up a vectorized add, Average/Paeth a per-pixel step vectorized over the
    channel lanes). No external codec library anywhere."""
    import zlib

    import numpy as np

    raw = bytes(buf)
    if len(raw) < len(_PNG_SIG) + 25 or raw[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload (missing signature)")
    pos = len(_PNG_SIG)
    width = height = None
    channels = 0
    idat = bytearray()
    while pos + 8 <= len(raw):
        clen = int.from_bytes(raw[pos : pos + 4], "big")
        ctype = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + clen]
        if len(data) < clen:
            raise ValueError("PNG chunk truncated")
        if ctype == b"IHDR":
            if clen != 13:
                raise ValueError(f"malformed IHDR length {clen}")
            width = int.from_bytes(data[0:4], "big")
            height = int.from_bytes(data[4:8], "big")
            bit_depth, color_type = data[8], data[9]
            compression, flt, interlace = data[10], data[11], data[12]
            if bit_depth != 8 or color_type not in (2, 6):
                raise ValueError(
                    f"unsupported PNG (bit_depth={bit_depth}, "
                    f"color_type={color_type}): 8-bit RGB(A) only"
                )
            if compression or flt or interlace:
                raise ValueError(
                    "unsupported PNG (non-zero compression/filter/interlace "
                    "method): non-interlaced baseline only"
                )
            channels = 3 if color_type == 2 else 4
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # len + type + data + crc
    if width is None:
        raise ValueError("PNG missing IHDR")
    if not idat:
        raise ValueError("PNG missing IDAT")
    stream = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    rowlen = width * channels
    if len(stream) < height * (rowlen + 1):
        raise ValueError(
            f"PNG scanline data truncated: {len(stream)} < {height * (rowlen + 1)}"
        )
    scan = stream[: height * (rowlen + 1)].reshape(height, rowlen + 1)
    out = np.zeros((height, rowlen), dtype=np.uint8)
    prev = np.zeros(rowlen, dtype=np.uint8)
    for r in range(height):
        ftype = int(scan[r, 0])
        row = scan[r, 1:].copy()
        if ftype == 0:  # None
            rec = row
        elif ftype == 1:  # Sub: per-lane cumulative sum mod 256
            rec = (
                np.cumsum(row.reshape(-1, channels), axis=0, dtype=np.uint64)
                .astype(np.uint8)
                .reshape(-1)
            )
        elif ftype == 2:  # Up
            rec = row + prev
        elif ftype in (3, 4):  # Average / Paeth: sequential per pixel
            rec = np.zeros(rowlen, dtype=np.uint8)
            a = np.zeros(channels, dtype=np.int64)  # left recon
            c = np.zeros(channels, dtype=np.int64)  # upper-left recon
            for x in range(width):
                sl = slice(x * channels, (x + 1) * channels)
                b = prev[sl].astype(np.int64)
                if ftype == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                    )
                rec[sl] = (row[sl].astype(np.int64) + pred) % 256
                a = rec[sl].astype(np.int64)
                c = b
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[r] = rec
        prev = rec
    return width, height, channels, out


def _decode_png_payload(buf) -> dict:
    """Parse one non-interlaced 8-bit RGB(A) PNG blob (zlib + numpy)."""
    width, height, channels, pixels = _png_pixels(buf)
    return {
        "codec": "png_rgb8" if channels == 3 else "png_rgba8",
        "channels": channels,
        "sample_rate": None,
        "bits_per_sample": 8 * channels,
        "n_samples": width * height,
        "width": width,
        "height": height,
        "value_mean": float(pixels.mean()) if pixels.size else 0.0,
    }


_NATIVE_DECODERS = {
    "pcm_wav": _decode_wav_payload,
    "bmp24": _decode_bmp_payload,
    "png_rgb8": _decode_png_payload,
    "png_rgba8": _decode_png_payload,
}


def decode_media(media: DataFrame) -> DataFrame:
    """REAL decode of container-decodable payloads over (doc_id, payload,
    meta): canonical PCM WAV and 24-bit BMP are parsed with numpy (header
    fields + value statistics); any other declared codec raises the honest
    ``NotImplementedError`` boundary. Arrow-batched ``mapInPandas``,
    partition-preserving (no exchange); payload bytes never leave the task.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            buf, offs = _payload_buffer(pdf["payload"])
            out: list[dict] = []
            for i, codec in enumerate(pdf["codec"]):
                dec = _NATIVE_DECODERS.get(codec)
                if dec is None:
                    raise NotImplementedError(
                        f"codec {codec!r} needs external libraries — see "
                        "decode_with_real_codec"
                    )
                row = dec(buf[offs[i] : offs[i + 1]])
                row["doc_id"] = int(pdf["doc_id"].iloc[i])
                out.append(row)
            yield pd.DataFrame(out, columns=[f.name for f in MEDIA_DECODE_SCHEMA])

    flat = media.select("doc_id", "payload", F.col("meta.codec").alias("codec"))
    return flat.mapInPandas(run, MEDIA_DECODE_SCHEMA)


#: (doc_id, payload) shape the synthesizers and resize emit before the meta
#: struct is re-attached.
_PAYLOAD_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
)


def _with_meta(raw: DataFrame, media_type: str, codec: str) -> DataFrame:
    """Re-attach the typed metadata struct to a (doc_id, payload) frame."""
    return raw.select(
        "doc_id",
        "payload",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.length("payload").cast("long").alias("n_bytes"),
            F.lit(codec).alias("codec"),
        ).alias("meta"),
    )


def synthesize_wav(
    documents: DataFrame, sample_rate: int = 8000, n_frames: int = 64
) -> DataFrame:
    """Deterministic canonical mono PCM-16 WAV per document: samples are the
    chained-md5 bytes of the text reinterpreted as int16 LE (reproducible in
    any engine). Test/bench scaffolding — stands in for reading real audio
    blobs from object storage; the operator under test is ``decode_media``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _wav_bytes(_chained_md5(t, 2 * n_frames), sample_rate)
                for t in pdf["text"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    raw = documents.select("doc_id", "text").mapInPandas(run, _PAYLOAD_SCHEMA)
    return _with_meta(raw, "audio", "pcm_wav")


def synthesize_bmp(documents: DataFrame, width: int = 5, height: int = 4) -> DataFrame:
    """Deterministic 24-bit BMP per document: pixel bytes are the chained-md5
    bytes of the text, rows padded to the 4-byte BMP stride. Same scaffolding
    role as ``synthesize_wav``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _bmp_bytes(_chained_md5(t, 3 * width * height), width, height)
                for t in pdf["text"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    raw = documents.select("doc_id", "text").mapInPandas(run, _PAYLOAD_SCHEMA)
    return _with_meta(raw, "image", "bmp24")


def _png_bytes(pixels: bytes, width: int, height: int, channels: int = 3) -> bytes:
    """Non-interlaced 8-bit RGB(A) PNG wrapping ``pixels`` (len ==
    channels*width*height, top-down rows): filter-0 scanlines, one zlib
    IDAT — a spec-legal baseline PNG any reader accepts."""
    import struct
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    color_type = 2 if channels == 3 else 6
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    rowlen = width * channels
    scanlines = b"".join(
        b"\x00" + pixels[r * rowlen : (r + 1) * rowlen] for r in range(height)
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )


def synthesize_png(
    documents: DataFrame, width: int = 5, height: int = 4, channels: int = 3
) -> DataFrame:
    """Deterministic 8-bit RGB(A) PNG per document: pixel bytes are the
    chained-md5 bytes of the text (same chaining rule as the WAV/BMP
    synthesizers). Same scaffolding role: the operator under test is
    ``decode_media``'s real PNG path."""
    if channels not in (3, 4):
        raise ValueError("PNG synthesizer supports RGB (3) or RGBA (4) only")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _png_bytes(
                    _chained_md5(t, channels * width * height),
                    width, height, channels,
                )
                for t in pdf["text"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    raw = documents.select("doc_id", "text").mapInPandas(run, _PAYLOAD_SCHEMA)
    return _with_meta(
        raw, "image", "png_rgb8" if channels == 3 else "png_rgba8"
    )


def _chained_md5(text: str | None, n_bytes: int) -> bytes:
    """First ``n_bytes`` of md5(text) ++ md5('b1|'+text) ++ md5('b2|'+text) …
    — the same chaining rule ``synthesize_media`` uses, extended as needed.
    NULL text synthesizes as empty text (the generators must not die on a
    null document)."""
    import hashlib

    text = text or ""
    out = hashlib.md5(text.encode()).digest()
    i = 1
    while len(out) < n_bytes:
        out += hashlib.md5((f"b{i}|" + text).encode()).digest()
        i += 1
    return out[:n_bytes]


def _wav_bytes(pcm: bytes, sample_rate: int) -> bytes:
    """Canonical 44-byte-header mono PCM-16 WAV wrapping ``pcm``."""
    import struct

    if len(pcm) % 2:
        pcm = pcm[:-1]
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )


def _bmp_bytes(pixels: bytes, width: int, height: int) -> bytes:
    """24-bit uncompressed BMP wrapping ``pixels`` (len == 3*width*height),
    bottom-up rows padded to the 4-byte stride."""
    import struct

    stride = (3 * width + 3) // 4 * 4
    pad = b"\x00" * (stride - 3 * width)
    body = b"".join(
        pixels[r * 3 * width : (r + 1) * 3 * width] + pad for r in range(height)
    )
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 0, 0, 0, 0)
    )
    return header + body


def resize_bmp(media: DataFrame, width: int, height: int) -> DataFrame:
    """Nearest-neighbor resize of 24-bit BMP payloads to (width, height) —
    a REAL resize over really-decoded pixels (numpy gather on the decoded
    row/column grid, re-encoded as BMP). Output carries the same
    (doc_id, payload, meta) shape as the synthesizers, so resized media
    feeds straight back into ``decode_media``/``extract_features``.
    Arrow-batched ``mapInPandas``, partition-preserving."""
    if width <= 0 or height <= 0:
        raise ValueError("resize dimensions must be positive")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            buf, offs = _payload_buffer(pdf["payload"])
            out = []
            for i, codec in enumerate(pdf["codec"]):
                if codec != "bmp24":
                    raise NotImplementedError(
                        f"resize of codec {codec!r} needs external libraries"
                    )
                w0, h0, px = _bmp_pixels(buf[offs[i] : offs[i + 1]])
                if not (w0 and h0):
                    raise ValueError("cannot resize an empty BMP")
                # nearest-neighbor index grids (pixel-center convention)
                rows = ((np.arange(height) + 0.5) * h0 / height).astype(np.int64)
                cols = ((np.arange(width) + 0.5) * w0 / width).astype(np.int64)
                rgb = px.reshape(h0, w0, 3)[rows][:, cols]
                out.append(_bmp_bytes(rgb.tobytes(), width, height))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": out})

    flat = media.select("doc_id", "payload", F.col("meta.codec").alias("codec"))
    return _with_meta(flat.mapInPandas(run, _PAYLOAD_SCHEMA), "image", "bmp24")
