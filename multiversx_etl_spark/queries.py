"""The published query surface: Spark DataFrame implementations + ANSI-SQL oracles.

Covers the reference's relational operator surface (SURVEY.md §2.B — the
shapes in /root/reference/queries/*.sql and maintenance/views.md), the CDC
dedup/LWW shapes the engine is built on (§2.A), and the training-data
operators (exact/near dedup, similarity search, text analysis) over the
driver-provided tables (TESTDATA.md).

Every query returns ONLY hash-stable column types (strings, dates, integers):
floating-point measures are floored to fixed-point BIGINT micro-units
(``floor(x * 10^k)``) *element-wise before any aggregation*, so sums are
order-independent integer arithmetic and Spark/DuckDB results compare exactly
— the same stance the reference takes keeping big-integer amounts as STRING
and casting at query time (/root/reference/queries/transactions.sql:5).

Each entry pairs the DataFrame program (what the engine runs — Catalyst
plans broadcast joins, partial aggregations, pushed-down filters) with the
equivalent SQL run by DuckDB as an independent oracle.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def _register(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _micro(col, scale: int = 1_000_000):
    """Element-wise exact fixed-point: floor(x * scale) as BIGINT."""
    return F.floor(col * F.lit(scale)).cast("long")


# ---------------------------------------------------------------------------
# Reference query surface (SURVEY.md §2.B) over `events`
# ---------------------------------------------------------------------------


@_register(
    "q_recent_events",
    """
    SELECT event_id AS id, user_id AS uid, event_type AS etype,
           CAST(floor(value * 1000000) AS BIGINT) AS val_micro
    FROM events ORDER BY ts DESC, event_id DESC LIMIT 1000
    """,
)
def q_recent_events(spark, sf_dir):
    """B1 projection/alias + B9 ORDER BY/LIMIT (queries/blocks.sql:3-11 shape).
    Spark plans TakeOrderedAndProject — no full sort at scale."""
    return (
        load(spark, sf_dir, "events")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(1000)
        .select(
            F.col("event_id").alias("id"),
            F.col("user_id").alias("uid"),
            F.col("event_type").alias("etype"),
            _micro(F.col("value")).alias("val_micro"),
        )
    )


@_register(
    "q_daily_event_counts",
    """
    SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
    FROM events GROUP BY 1
    """,
)
def q_daily_event_counts(spark, sf_dir):
    """B4+B10 (queries/transactions.sql:15-21 'tx per day' shape)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n_events"))
    )


@_register(
    "q_daily_value_sum",
    """
    SELECT CAST(ts AS DATE) AS day,
           sum(CAST(floor(value * 1000000) AS BIGINT)) AS sum_val_micro
    FROM events WHERE event_type = 'purchase' GROUP BY 1
    """,
)
def q_daily_value_sum(spark, sf_dir):
    """B2+B3+B12 (queries/transactions.sql:3-11 'daily volume' shape)."""
    return (
        load(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(_micro(F.col("value"))).alias("sum_val_micro"))
    )


@_register(
    "q_daily_active_users",
    """
    SELECT CAST(ts AS DATE) AS day, count(DISTINCT user_id) AS active_users
    FROM events GROUP BY 1
    """,
)
def q_daily_active_users(spark, sf_dir):
    """B5 exact COUNT(DISTINCT) (queries/interactions.sql:3-10)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@_register(
    "q_type_day_having",
    """
    SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
    FROM events GROUP BY 1, 2
    HAVING count(*) >= 15 AND CAST(ts AS DATE) >= DATE '2024-01-24'
    """,
)
def q_type_day_having(spark, sf_dir):
    """B6 multi-key GROUP BY + HAVING + date arithmetic
    (queries/interactions.sql:20-36 shape, with a fixed anchor date)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count("*").alias("n"))
        .where((F.col("n") >= 15) & (F.col("day") >= F.lit("2024-01-24").cast("date")))
    )


@_register(
    "q_cte_top_value_days",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             sum(CAST(floor(value * 1000000) AS BIGINT)) AS vol_micro
      FROM events GROUP BY 1
    )
    SELECT day, vol_micro FROM daily ORDER BY vol_micro DESC, day LIMIT 5
    """,
)
def q_cte_top_value_days(spark, sf_dir):
    """B8 CTE + B9 top-k (queries/interactions.sql:44-56 shape)."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(_micro(F.col("value"))).alias("vol_micro"))
    )
    return daily.orderBy(F.col("vol_micro").desc(), "day").limit(5)


@_register(
    "q_top3_per_day",
    """
    SELECT * FROM (
      SELECT CAST(ts AS DATE) AS day, event_id,
             CAST(floor(value * 1000000) AS BIGINT) AS val_micro,
             row_number() OVER (PARTITION BY CAST(ts AS DATE)
                                ORDER BY value DESC, event_id) AS rank
      FROM events
    ) WHERE rank <= 3
    """,
)
def q_top3_per_day(spark, sf_dir):
    """B7 ranking window top-k per group (queries/interactions.sql:57-63,
    transactions.sql:25-35) — the same shape as the CDC dedup operator."""
    w = Window.partitionBy(F.to_date("ts")).orderBy(F.col("value").desc(), "event_id")
    return (
        load(spark, sf_dir, "events")
        .select(
            F.to_date("ts").alias("day"),
            "event_id",
            _micro(F.col("value")).alias("val_micro"),
            F.row_number().over(w).alias("rank"),
        )
        .where(F.col("rank") <= 3)
    )


@_register(
    "q_props_json_k_sum",
    """
    SELECT event_type, sum(CAST(props->>'$.k' AS BIGINT)) AS sum_k
    FROM events GROUP BY 1
    """,
)
def q_props_json_k_sum(spark, sf_dir):
    """JSON path extraction over the props payload column."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"))
    )


# ---------------------------------------------------------------------------
# CDC shapes (SURVEY.md §2.A) expressed over `events` as a pseudo change log
# ---------------------------------------------------------------------------


@_register(
    "q_cdc_latest_state",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_etype,
           CAST(floor(value * 1000000) AS BIGINT) AS last_val_micro
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_cdc_latest_state(spark, sf_dir):
    """A14: per-key max-sequence dedup — the engine's core operator, here as
    a pure query (latest event per user). Implemented with the partial-agg
    struct-max (no sort, map-side combine), NOT a window."""
    ev = load(spark, sf_dir, "events")
    winner = F.max(
        F.struct(F.col("ts"), F.col("event_id"), F.col("event_type"), F.col("value"))
    ).alias("w")
    return (
        ev.groupBy("user_id")
        .agg(winner)
        .select(
            "user_id",
            F.col("w.event_id").alias("last_event_id"),
            F.col("w.event_type").alias("last_etype"),
            _micro(F.col("w.value")).alias("last_val_micro"),
        )
    )


@_register(
    "q_cdc_lww_live_users",
    """
    SELECT user_id, event_id AS last_event_id
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1 AND event_type <> 'error'
    """,
)
def q_cdc_lww_live_users(spark, sf_dir):
    """Last-writer-wins fold with deletes ('error' = tombstone): the final
    live-key set after replay — the oracle shape of operators/merge.py."""
    ev = load(spark, sf_dir, "events")
    winner = F.max(F.struct("ts", "event_id", "event_type")).alias("w")
    return (
        ev.groupBy("user_id")
        .agg(winner)
        .where(F.col("w.event_type") != "error")
        .select("user_id", F.col("w.event_id").alias("last_event_id"))
    )


@_register(
    "q_interval_counts",
    """
    SELECT count(*) AS n FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
    """,
)
def q_interval_counts(spark, sf_dir):
    """A2/A18 count reconciliation over a half-open interval
    (/root/reference/multiversxetl/bq_client.py:123-145)."""
    ev = load(spark, sf_dir, "events")
    return ev.where(
        (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-20 00:00:00").cast("timestamp"))
    ).agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# Relational coverage over the TPC-H-ish star schema (joins, aggregates)
# ---------------------------------------------------------------------------


@_register(
    "q_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
           sum(CAST(floor(l_quantity * 1000000) AS BIGINT)) AS sum_qty_micro,
           sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS sum_price_cents,
           sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS sum_disc_price_cents
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '2024-06-01 00:00:00'
    GROUP BY 1, 2
    """,
)
def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan + filter pushdown + hash aggregate."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2024-06-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(_micro(F.col("l_quantity"))).alias("sum_qty_micro"),
            F.sum(_micro(F.col("l_extendedprice"), 100)).alias("sum_price_cents"),
            F.sum(
                _micro(F.col("l_extendedprice") * (1 - F.col("l_discount")), 100)
            ).alias("sum_disc_price_cents"),
        )
    )


@_register(
    "q_revenue_by_nation",
    """
    SELECT n.n_name AS nation,
           sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS revenue_cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
    """,
)
def q_revenue_by_nation(spark, sf_dir):
    """Multi-join rollup: fact-fact shuffle join + broadcast dims. customer
    and nation are broadcast explicitly (small sides never shuffle)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(_micro(F.col("l_extendedprice") * (1 - F.col("l_discount")), 100)).alias(
                "revenue_cents"
            )
        )
    )


@_register(
    "q_top_customers",
    """
    SELECT c.c_custkey, c.c_name,
           sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS total_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2 ORDER BY total_cents DESC, c_custkey LIMIT 10
    """,
)
def q_top_customers(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(_micro(F.col("o_totalprice"), 100)).alias("total_cents"))
        .orderBy(F.col("total_cents").desc(), "c_custkey")
        .limit(10)
    )


@_register(
    "q_late_ship_priority",
    """
    SELECT o.o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY 1
    """,
)
def q_late_ship_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS → left-semi join."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    sel = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return sel.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


@_register(
    "q_brand_supplier_stats",
    """
    SELECT p.p_brand, count(DISTINCT l.l_suppkey) AS n_suppliers, count(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1
    """,
)
def q_brand_supplier_stats(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count("*").alias("n_lines"),
        )
    )


@_register(
    "q_region_order_rollup",
    """
    SELECT r.r_name AS region, CAST(o.o_orderdate AS DATE) AS day, count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
)
def q_region_order_rollup(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.to_date("o_orderdate").alias("day"))
        .agg(F.count("*").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# Training-data operators over `documents` / `embeddings`
# ---------------------------------------------------------------------------


@_register(
    "q_doc_exact_dedup",
    """
    SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id, count(*) AS copies
    FROM documents GROUP BY 1
    """,
)
def q_doc_exact_dedup(spark, sf_dir):
    """Exact dedup by content hash (hash-groupBy; keeper = min doc_id)."""
    return (
        load(spark, sf_dir, "documents")
        .groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("copies"))
    )


@_register(
    "q_token_counts",
    """
    SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
           length(text) AS n_chars_actual
    FROM documents WHERE length(trim(text)) > 0
    """,
)
def q_token_counts(spark, sf_dir):
    """Whitespace token counting (text-analysis surface)."""
    d = load(spark, sf_dir, "documents").where(F.length(F.trim("text")) > 0)
    return d.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


@_register(
    "q_quality_scores",
    """
    SELECT doc_id,
           length(text) AS n_chars_actual,
           length(text) - length(replace(text, ' ', '')) AS n_spaces,
           (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ' '))) // 4 AS n_the,
           CASE WHEN length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ' ')) > 0
                THEN 'en' ELSE 'unk' END AS lang_guess
    FROM documents
    """,
)
def q_quality_scores(spark, sf_dir):
    """Quality scoring + stopword-based language heuristic, all integer
    arithmetic (counts, not ratios, for exact cross-engine equality)."""
    d = load(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    # exact-string replace (not regexp) to match the oracle's replace() scan
    removed = F.length(padded) - F.length(F.replace(padded, F.lit(" the "), F.lit(" ")))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_actual"),
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))).alias("n_spaces"),
        F.floor(removed / 4).cast("long").alias("n_the"),
        F.when(removed > 0, F.lit("en")).otherwise(F.lit("unk")).alias("lang_guess"),
    )


@_register(
    "q_lang_source_stats",
    """
    SELECT lang, source, count(*) AS n_docs, sum(n_chars) AS sum_chars
    FROM documents GROUP BY 1, 2
    """,
)
def q_lang_source_stats(spark, sf_dir):
    return (
        load(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("sum_chars"))
    )


@_register(
    "q_doc_fingerprint",
    """
    SELECT doc_id,
           list_min(list_transform(range(1, greatest(2, length(text) - 15), 8),
                    i -> md5(substring(text, CAST(i AS INT), 16)))) AS fingerprint
    FROM documents
    """,
)
def q_doc_fingerprint(spark, sf_dir):
    """Document fingerprinting: min-hash over a rolling window of 16-char
    shingles at stride 8 (winnowing-style; md5 as the portable hash)."""
    d = load(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(1), F.greatest(F.lit(1), F.length("text") - F.lit(15)), F.lit(8)
    )
    ex = d.select("doc_id", F.explode(starts).alias("i"), "text")
    return ex.select(
        "doc_id", F.md5(F.col("text").substr(F.col("i").cast("int"), F.lit(16))).alias("h")
    ).groupBy("doc_id").agg(F.min("h").alias("fingerprint"))


@_register(
    "q_minhash_signatures",
    """
    WITH words AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ),
    shingles AS (
      SELECT doc_id,
             list_transform(range(1, greatest(2, len(w) - 1), 1),
                            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS shs
      FROM words
    )
    SELECT doc_id,
           list_min(list_transform(shs, s -> md5('s1|' || s))) AS minhash_1,
           list_min(list_transform(shs, s -> md5('s2|' || s))) AS minhash_2,
           list_min(list_transform(shs, s -> md5('s3|' || s))) AS minhash_3
    FROM shingles
    """,
)
def q_minhash_signatures(spark, sf_dir):
    """MinHash near-dup signatures: word 3-gram shingles → 3 salted md5
    min-hashes (portable across engines; on a cluster you'd use xxhash64).
    Band-join on any equal signature column finds near-dup candidates."""
    d = load(spark, sf_dir, "documents")
    words = d.select("doc_id", F.split(F.trim("text"), r"\s+").alias("w"))
    idx = F.sequence(F.lit(0), F.greatest(F.lit(0), F.size("w") - F.lit(3)), F.lit(1))
    sh = words.select(
        "doc_id",
        F.explode(idx).alias("i"),
        "w",
    ).select(
        "doc_id",
        F.concat_ws(
            " ",
            F.element_at("w", F.col("i") + 1),
            F.element_at("w", F.col("i") + 2),
            F.element_at("w", F.col("i") + 3),
        ).alias("sh"),
    )
    return sh.groupBy("doc_id").agg(
        F.min(F.md5(F.concat(F.lit("s1|"), F.col("sh")))).alias("minhash_1"),
        F.min(F.md5(F.concat(F.lit("s2|"), F.col("sh")))).alias("minhash_2"),
        F.min(F.md5(F.concat(F.lit("s3|"), F.col("sh")))).alias("minhash_3"),
    )


@_register(
    "q_embedding_dims",
    """
    SELECT label, count(*) AS n_vecs, min(len(embedding)) AS min_dim,
           max(len(embedding)) AS max_dim
    FROM embeddings GROUP BY 1
    """,
)
def q_embedding_dims(spark, sf_dir):
    """B11 array-length over the embedding column."""
    return (
        load(spark, sf_dir, "embeddings")
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.min(F.size("embedding")).alias("min_dim"),
            F.max(F.size("embedding")).alias("max_dim"),
        )
    )


@_register(
    "q_embedding_sq_norms",
    """
    SELECT vec_id,
           list_sum(list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 100000000) AS BIGINT)))::BIGINT AS sq_norm_e8
    FROM embeddings
    """,
)
def q_embedding_sq_norms(spark, sf_dir):
    """Squared L2 norm in exact fixed-point (element-wise floor before the
    integer sum → order-independent, cross-engine exact)."""
    e = load(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * x.cast("double") * F.lit(1e8)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return e.select("vec_id", sq.alias("sq_norm_e8"))


@_register(
    "q_mips_topk",
    """
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, e.label,
           list_sum(list_transform(range(1, len(e.embedding) + 1, 1),
             i -> CAST(floor(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE) * 100000000) AS BIGINT)))::BIGINT AS dot_e8
    FROM embeddings e, q
    WHERE e.vec_id <> 0
    ORDER BY dot_e8 DESC, vec_id LIMIT 10
    """,
)
def q_mips_topk(spark, sf_dir):
    """Brute-force maximum-inner-product top-k against a query vector
    (similarity-search baseline): broadcast the query row, zip_with dot
    product in exact fixed-point, TakeOrderedAndProject for the top-k."""
    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    dot = F.aggregate(
        F.zip_with(
            "embedding",
            "qe",
            lambda a, b: F.floor(a.cast("double") * b.cast("double") * F.lit(1e8)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", dot.alias("dot_e8"))
        .orderBy(F.col("dot_e8").desc(), "vec_id")
        .limit(10)
    )
