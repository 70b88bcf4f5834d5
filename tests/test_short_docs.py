"""Adversarial document shapes (empty, 1-2 tokens, exact duplicates): every
text/near-dup query must agree with its DuckDB oracle — the shipped fixtures
contain no sub-3-word docs, so this covers what they can't (found in review:
element_at past the token count is an ANSI error in Spark 4)."""

from __future__ import annotations

import duckdb
import pytest

from multiversx_etl_spark import queries as Q

NAMES = [
    "q_minhash_signatures",
    "q_minhash_lsh_pairs",
    "q_dedup_clusters",
    "q_simhash",
    "q_ngram_jaccard_pairs",
    "q_doc_fingerprint",
    "q_token_counts",
    "q_bpe_token_counts",
    "q_lang_id",
    "q_quality_scores",
    "q_doc_exact_dedup",
]


@pytest.fixture(scope="module")
def short_docs_dir(spark, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("shortdocs"))
    docs = spark.createDataFrame(
        [
            (0, "hello world", "en", "s", 11),
            (1, "one", "en", "s", 3),
            (2, "a b c d e f", "en", "s", 11),
            (3, "hello world", "en", "s", 11),   # exact dup of doc 0
            (4, "", "en", "s", 0),
            (5, "a b c d e f", "en", "s", 11),   # exact dup of doc 2
            (6, "the the the", "en", "s", 11),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(f"{wd}/documents.parquet")
    return wd


@pytest.fixture(scope="module")
def short_ddb(short_docs_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{short_docs_dir}/documents.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", NAMES)
def test_short_docs_match_oracle(spark, short_docs_dir, short_ddb, name):
    sdf = Q.QUERIES[name](spark, short_docs_dir).toPandas()
    odf = short_ddb.execute(Q.ORACLE_SQL[name]).df()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    a = sdf[cols].astype(str).sort_values(by=cols).reset_index(drop=True)
    b = odf[cols].astype(str).sort_values(by=cols).reset_index(drop=True)
    assert a.equals(b), f"{name}: spark={len(sdf)} duck={len(odf)}"
