"""Unit tests: normalization transformers (golden rows, mirroring
/root/reference/multiversxetl/transformers_test.py) and the multimodal
binary-column operators (features vs an independent Python fold)."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
import pytest

from multiversx_etl_spark.operators.multimodal import (
    decode_with_real_codec,
    extract_features,
    sample_frames,
    synthesize_media,
)
from multiversx_etl_spark.operators.normalize import (
    canonicalize_content,
    drop_nested_struct_field,
    drop_volatile_columns,
    get_normalizer,
    scrub_null_array_elements,
)


def test_drop_volatile_columns(spark):
    df = spark.createDataFrame(
        [(1, "x", "y", "z")], ["id", "api_balance", "nft_meta", "keep"]
    )
    out = drop_volatile_columns(df)
    assert out.columns == ["id", "keep"]


def test_scrub_null_array_elements(spark):
    df = spark.createDataFrame([(1, ["a", None, "b"])], ["id", "topics"])
    out = scrub_null_array_elements(df, ["topics"]).collect()[0]
    assert out["topics"] == ["a", "", "b"]


def test_drop_nested_struct_field(spark):
    df = spark.createDataFrame(
        [(1, [{"keep": "k", "reserved": "r"}])],
        "id int, shards array<struct<keep:string, reserved:string>>",
    )
    out = drop_nested_struct_field(df, "shards", "reserved")
    assert out.schema["shards"].dataType.elementType.fieldNames() == ["keep"]
    assert out.collect()[0]["shards"][0]["keep"] == "k"


def test_canonicalize_content(spark):
    df = spark.createDataFrame([("a \r\nb\t\rc  ",)], ["content"])
    out = df.select(canonicalize_content(F.col("content")).alias("c")).collect()[0]
    assert out["c"] == "a\nb\nc"


def test_registry_default_identity(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    assert get_normalizer("unknown_table")(df) is df


def _docs(spark):
    return spark.createDataFrame(
        [(0, "hello world"), (1, "spark"), (2, "streaming merge join")],
        ["doc_id", "text"],
    )


def _expected_payload(text: str) -> bytes:
    out = hashlib.md5(text.encode()).digest()
    for salt in ("b1|", "b2|", "b3|"):
        out += hashlib.md5((salt + text).encode()).digest()
    return out


def test_multimodal_features_match_python_fold(spark):
    media = synthesize_media(_docs(spark))
    rows = {r["doc_id"]: r for r in extract_features(media).collect()}
    texts = {0: "hello world", 1: "spark", 2: "streaming merge join"}
    types = {0: "image", 1: "audio", 2: "video"}
    for doc_id, text in texts.items():
        payload = _expected_payload(text)
        r = rows[doc_id]
        assert r["media_type"] == types[doc_id]
        assert r["n_bytes"] == len(payload) == 64
        assert r["byte_sum"] == sum(payload)
        assert r["first_byte"] == payload[0]
        assert r["last_byte"] == payload[-1]


def test_frame_sampling(spark):
    media = synthesize_media(_docs(spark))
    frames = sample_frames(media, frame_size=24).collect()
    # only doc 2 is 'video'; 64 bytes / 24 => frames of 24, 24, 16
    assert {f["doc_id"] for f in frames} == {2}
    by_idx = sorted(frames, key=lambda f: f["frame_idx"])
    assert [f["frame_len"] for f in by_idx] == [24, 24, 16]
    assert b"".join(bytes(f["frame_bytes"]) for f in by_idx) == _expected_payload(
        "streaming merge join"
    )


def test_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_with_real_codec(b"", "image")


# ---------------------------------------------------------------------------
# dedup operators (A14 / B7)
# ---------------------------------------------------------------------------


def _dup_log(spark):
    rows = [
        (0, 5, "r1", "a", "v5"),
        (1, 3, "r1", "a", "v3"),
        (2, 9, "r1", "b", "v9"),
        (3, 9, "r1", "b", "v9"),  # exact duplicate delivery (same seq)
        (4, 1, "r2", "a", "v1"),
    ]
    return spark.createDataFrame(rows, ["offset", "seq", "repo", "path", "content"])


def test_dedup_latest_agg(spark):
    from multiversx_etl_spark.operators.dedup import dedup_latest

    out = {
        (r["repo"], r["path"]): (r["seq"], r["content"])
        for r in dedup_latest(_dup_log(spark), ["repo", "path"]).collect()
    }
    assert out == {("r1", "a"): (5, "v5"), ("r1", "b"): (9, "v9"), ("r2", "a"): (1, "v1")}


def test_dedup_window_salted_matches_agg(spark):
    from multiversx_etl_spark.operators.dedup import dedup_latest, dedup_latest_window

    df = _dup_log(spark)
    base = {(r["repo"], r["path"], r["seq"]) for r in dedup_latest(df, ["repo", "path"]).collect()}
    for salt in (None, 4):
        win = {
            (r["repo"], r["path"], r["seq"])
            for r in dedup_latest_window(df, ["repo", "path"], salt_buckets=salt).collect()
        }
        assert win == base


def test_top_k_per_group(spark):
    from multiversx_etl_spark.operators.dedup import top_k_per_group

    out = top_k_per_group(_dup_log(spark), ["repo"], "seq", k=2).collect()
    got = {(r["repo"], r["seq"], r["rank"]) for r in out}
    assert (("r1", 9, 1) in got or ("r1", 9, 2) in got)
    assert len([r for r in out if r["repo"] == "r1"]) == 2
    assert len([r for r in out if r["repo"] == "r2"]) == 1


def test_combine_partitions_latest(spark):
    from multiversx_etl_spark.operators.dedup import (
        combine_partitions_latest,
        dedup_latest,
    )

    df = _dup_log(spark).repartition(3)
    combined = combine_partitions_latest(df, ["repo", "path"])
    # partition-local only: may keep >1 row per key overall, but never loses
    # the global winner, and a follow-up global dedup gives the exact answer
    assert combined.count() <= df.count()
    a = {
        (r["repo"], r["path"], r["seq"])
        for r in dedup_latest(combined, ["repo", "path"]).collect()
    }
    b = {
        (r["repo"], r["path"], r["seq"])
        for r in dedup_latest(df, ["repo", "path"]).collect()
    }
    assert a == b


def test_canonicalize_expr_matches_arrow_udf(spark):
    """The JVM hot-path canonicalization must stay byte-equal to the Arrow
    pandas UDF template on line-ending and trailing-whitespace edge cases."""
    import pyspark.sql.functions as F

    from multiversx_etl_spark.operators.normalize import (
        canonicalize_content,
        canonicalize_content_expr,
    )

    cases = [
        "a \r\nb\t\r", "x\r\ry  ", "notrail", "", "tab\t\nend\t", "only\r",
        "a  \nb\t \nc   ", " lead\n", "\t", "mix \r\n\t\r z ", "end\n", "\n\n",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "content string")
    rows = df.select(
        canonicalize_content("content").alias("udf"),
        canonicalize_content_expr(F.col("content")).alias("expr"),
    ).collect()
    for r in rows:
        assert r["udf"] == r["expr"], (repr(r["udf"]), repr(r["expr"]))
