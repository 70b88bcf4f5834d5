"""Physical-plan assertions: the optimizations we rely on at 100 TB must be
visible in `.explain` — pushed-down filters at the scan, broadcast joins for
small dims, TakeOrderedAndProject for top-k (no full sort), partial (map-
side) aggregation for the CDC fold, column pruning, and NO row-at-a-time
Python UDF anywhere in the surface."""

from __future__ import annotations

import contextlib
import io

import pytest

from multiversx_etl_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"

EXPECT = {
    "q_pricing_summary": ["PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate", "HashAggregate"],
    "q_daily_value_sum": ["PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]"],
    "q_revenue_by_nation": ["BroadcastHashJoin"],
    "q_top_customers": ["BroadcastHashJoin"],
    "q_late_ship_priority": ["LeftSemi"],
    "q_recent_events": ["TakeOrderedAndProject"],
    "q_cte_top_value_days": ["TakeOrderedAndProject", "partial"],
    "q_cdc_latest_state": ["partial"],
    "q_token_counts": ["ReadSchema: struct<doc_id:bigint,text:string>"],
    "q_mips_topk": ["TakeOrderedAndProject"],
    # vocabulary top-k: partial (map-side) agg + per-partition heaps, no
    # full sort of the vocabulary
    "q_vocab_top_tokens": ["TakeOrderedAndProject", "partial"],
    # length quantiles: text column pruned at the scan (the window sorts a
    # 3-column projection, never the document bodies)
    "q_source_length_quantiles": [
        "ReadSchema: struct<doc_id:bigint,source:string,n_chars:bigint>"
    ],
    # packing: text never reaches the shuffle — the cumsum window moves a
    # narrow token-count projection only
    "q_pack_assignments": ["Window"],
    # PMI: vocabulary-sized partial aggs + per-partition top-k heaps, no
    # full sort of the bigram table
    "q_bigram_pmi": ["TakeOrderedAndProject", "partial"],
}


def test_doc_chunks_no_exchange(spark):
    """Chunking is pure per-row expansion: one codegen pipeline off the
    scan, zero exchanges (at 100 TB the op inherits the scan partitioning)."""
    text = plan_text(Q.QUERIES["q_doc_chunks"](spark, SF_DIR))
    assert "Exchange" not in text.replace("BroadcastExchange", "")


def test_training_shards_distributed_rank(spark):
    """The global permutation must NOT funnel through a single-partition
    window: ranks are per-range-partition + broadcast offsets. A plain
    ORDER BY row_number would show a Window over an Exchange SinglePartition.
    Asserted on the pre-checkpoint rank plan (the checkpoint that pins the
    range boundaries truncates lineage from the final plan) AND on the
    final assembled plan."""
    text = plan_text(Q._shards_ranked_plan(spark, SF_DIR))
    assert "SinglePartition" not in text
    assert "rangepartitioning" in text.lower()
    assert "SinglePartition" not in plan_text(Q.QUERIES["q_training_shards"](spark, SF_DIR))


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
        df.explain("extended")
    return buf.getvalue()


@pytest.mark.parametrize("name", sorted(EXPECT))
def test_expected_physical_plan(spark, name):
    text = plan_text(Q.QUERIES[name](spark, SF_DIR)).lower()
    for pat in EXPECT[name]:
        assert pat.lower() in text, f"{name}: expected {pat!r} in plan"


def test_ivf_ann_no_all_pairs_plan(spark):
    """VERDICT r02 fix #1: IVF assignment is an Arrow kernel over BROADCAST
    centroids (no n×K row blowup) and the in-cell candidate search is an
    equi-join — never an all-pairs BNLJ/Cartesian anywhere in the plan."""
    text = plan_text(Q.QUERIES["q_ivf_ann"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in text
    assert "CartesianProduct" not in text
    assert "MapInPandas" in text  # the vectorized assignment kernel


def test_ivf_ann_candidates_bounded(spark):
    """VERDICT r02 fix #1 'done' criterion: cells grow with the data
    (K = ⌈√n⌉) and candidate pairs are bounded by CAP·n, not n²/K."""
    import math

    parts = Q._ivf_parts(spark, SF_DIR)
    n = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    per_cell_max = (
        parts["idx"].groupBy("cell_b").count().agg({"count": "max"}).first()[0]
    )
    assert per_cell_max <= Q._IVF_CAP
    assert parts["candidates"].count() <= Q._IVF_CAP * n
    k_used = parts["members"].select("cell").distinct().count()
    assert 1 < k_used <= math.ceil(math.sqrt(n))


def test_cosine_near_dup_no_all_pairs(spark):
    """VERDICT r01 defect #2: near-dup must candidate-generate through LSH
    band equi-joins, never an all-pairs BroadcastNestedLoopJoin."""
    text = plan_text(Q.QUERIES["q_embedding_cosine_near_dup"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in text
    assert "CartesianProduct" not in text


def test_cosine_near_dup_recall_vs_exact(spark):
    """Banded candidates are a subset of the exact all-pairs result, and
    high-cosine pairs (the actual near-dups) are recalled: theory says
    ~0.99 at cos 0.9 with 4 bands x 8 bits."""
    banded = {
        (r.id_a, r.id_b): r.dot_e8
        for r in Q.QUERIES["q_embedding_cosine_near_dup"](spark, SF_DIR).collect()
    }
    exact = {
        (r.id_a, r.id_b): r.dot_e8 for r in Q.cosine_all_pairs(spark, SF_DIR).collect()
    }
    assert set(banded) <= set(exact)
    assert all(banded[k] == exact[k] for k in banded)
    # cos >= 0.9 <=> dot^2*100 >= 81*na*nb; dot_e8 ~ cos*1e8 for unit vectors
    high = {k for k, d in exact.items() if d >= 90_000_000}
    if high:
        recalled = len(high & set(banded)) / len(high)
        assert recalled >= 0.9, f"high-cos recall {recalled:.2f} < 0.9"


def test_repetition_quality_shuffle_free(spark):
    """q_repetition_quality computes every metric with per-row array HOFs:
    the plan must be scan -> filter -> project with ZERO exchanges — the
    embarrassingly-parallel shape that streams at scan speed at 100 TB."""
    text = plan_text(Q.QUERIES["q_repetition_quality"](spark, SF_DIR))
    assert "Exchange" not in text
    assert "BatchEvalPython" not in text


def test_contamination_broadcasts_benchmark(spark):
    """q_benchmark_contamination joins the n-TB training side against the
    small benchmark shingle index via BROADCAST hash joins only — a
    sort-merge join would shuffle the whole training corpus on shingle."""
    text = plan_text(Q.QUERIES["q_benchmark_contamination"](spark, SF_DIR))
    assert "BroadcastHashJoin" in text
    assert "SortMergeJoin" not in text
    # shingle dedup happens in the overlap aggregate (count DISTINCT) after
    # the bench join, never as a corpus-wide distinct: the only Exchange of
    # exploded training shingles is the bounded post-join aggregate
    assert "count(distinct s" in text.lower() or "count(s" in text.lower()


@pytest.mark.parametrize("name", sorted(Q.QUERIES))
def test_no_row_at_a_time_python(spark, name):
    """input_hint: vectorized pandas/Arrow UDFs only — a BatchEvalPython
    node (per-row Python UDF) anywhere is a regression."""
    text = plan_text(Q.QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in text, f"{name} uses a row-at-a-time Python UDF"


def test_bpe_pair_counts_map_side_partial(spark):
    """BPE training's per-round pair-count aggregate must be map-side
    partial (|pairs|-sized shuffle, never word-table-sized), and the merge
    application is pure HOF column work — no Python anywhere in the loop."""
    import pyspark.sql.functions as F

    from multiversx_etl_spark.operators.bpe import pair_counts
    from multiversx_etl_spark.queries import load

    docs = load(spark, SF_DIR, "documents")
    wf = (
        docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w").agg(F.count("*").alias("n"))
        .select(F.split("w", "").alias("sym"), "n")
    )
    text = plan_text(pair_counts(wf))
    assert "partial" in text.lower()
    assert "BatchEvalPython" not in text
