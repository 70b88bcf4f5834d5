"""Property-based CDC correctness: arbitrary event sequences (duplicates,
out-of-order seqs, deletes, resurrections, multi-epoch splits) replayed
through the MERGE core must always equal a trivial in-memory last-writer-wins
fold. Complements the seeded generator tests with adversarial shapes the
generator never produces (e.g. a delete followed by a lower-seq update in a
LATER batch — the tombstone-guard case)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from multiversx_etl_spark.operators.merge import merge_batch
from multiversx_etl_spark.streaming.ingest import ensure_table

KEYS = [("r0", "a"), ("r0", "b"), ("r1", "a")]

event_st = st.tuples(
    st.integers(min_value=0, max_value=2),          # key index
    st.sampled_from(["insert", "update", "delete"]),
)
# a scenario: up to 12 logical events; seqs are the list positions, but the
# DELIVERY order is a permutation and ~some events are delivered twice
scenario_st = st.tuples(
    st.lists(event_st, min_size=1, max_size=12),
    st.randoms(use_true_random=False),
)


def python_lww(events):
    """The oracle: fold by seq; delete wins at its seq; lower-seq later
    arrivals never resurrect."""
    state = {}
    for seq, (ki, op) in sorted(events):
        state.setdefault(ki, (-1, None))
        if seq > state[ki][0]:
            state[ki] = (seq, None if op == "delete" else f"content-{ki}-{seq}")
    return {
        KEYS[ki]: content for ki, (seq, content) in state.items() if content is not None
    }


def spark_rows(events, order, n_batches):
    """Deliver the events in `order`, duplicated per `order` construction,
    split into n_batches contiguous chunks of the delivery order."""
    rows = []
    for off, (seq, (ki, op)) in enumerate(order):
        repo, path = KEYS[ki]
        rows.append(
            (
                off,
                seq,
                op,
                repo,
                path,
                f"c{seq}",
                "python",
                None if op == "delete" else f"content-{ki}-{seq}",
            )
        )
    size = -(-len(rows) // n_batches)
    return [rows[i : i + size] for i in range(0, len(rows), size)]


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(scenario_st, st.integers(min_value=1, max_value=3))
def test_lww_fold_matches_python_oracle(spark, tmp_path_factory, scenario, n_batches):
    events_raw, rng = scenario
    events = list(enumerate(events_raw))  # (seq, (key, op))
    # delivery order: shuffled, with a random prefix re-delivered at the end
    order = list(events)
    rng.shuffle(order)
    dup_count = rng.randint(0, min(3, len(order)))
    order = order + order[:dup_count]

    table = ensure_table(
        spark, str(tmp_path_factory.mktemp("prop") / "t"), num_buckets=4
    )
    schema = (
        "offset long, seq long, op string, repo string, path string, "
        "commit string, lang string, content string"
    )
    for epoch, chunk in enumerate(spark_rows(events, order, n_batches)):
        df = spark.createDataFrame(chunk, schema)
        merge_batch(table, df, "prop", epoch, collect_per_bucket_stats=False)

    got = {
        (r["repo"], r["path"]): r["content"] for r in table.read().collect()
    }
    want = python_lww(events)
    assert got == want


def test_concurrent_commit_conflict(spark, tmp_path):
    """Optimistic concurrency: a commit expecting a stale parent version
    must fail instead of silently clobbering a concurrent writer."""
    from multiversx_etl_spark.lake.table import LakeTable
    from multiversx_etl_spark.schemas import REPOS

    table = LakeTable.create(
        spark, str(tmp_path / "t"), REPOS, key_columns=["repo", "path"], num_buckets=4
    )
    v0 = table.current_version()
    table.commit([], set(), "writer-a", expected_parent=v0)
    with pytest.raises(RuntimeError, match="concurrent commit"):
        table.commit([], set(), "writer-b", expected_parent=v0)


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(scenario_st, st.integers(min_value=2, max_value=4), st.integers(min_value=0, max_value=2))
def test_compaction_invariance(spark, tmp_path_factory, scenario, n_batches, compact_at):
    """Reads are invariant under compaction strategy: for any delivery
    sequence, (no compact) == (incremental compact mid-replay) == (full
    compact at the end), including tombstone guarding across the compact."""
    events_raw, rng = scenario
    events = list(enumerate(events_raw))
    order = list(events)
    rng.shuffle(order)

    base = tmp_path_factory.mktemp("cprop")
    tables = {}
    for variant in ("plain", "incr", "full"):
        t = ensure_table(spark, str(base / variant), num_buckets=4)
        schema = (
            "offset long, seq long, op string, repo string, path string, "
            "commit string, lang string, content string"
        )
        chunks = spark_rows(events, order, n_batches)
        for epoch, chunk in enumerate(chunks):
            df = spark.createDataFrame(chunk, schema)
            merge_batch(t, df, "prop", epoch, collect_per_bucket_stats=False)
            if variant == "incr" and epoch == min(compact_at, len(chunks) - 1):
                t.compact()
        if variant == "full":
            t.compact(full=True)
        tables[variant] = {
            (r["repo"], r["path"]): r["content"] for r in t.read().collect()
        }
    want = python_lww(events)
    assert tables["plain"] == want
    assert tables["incr"] == want
    assert tables["full"] == want


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(scenario_st, st.integers(min_value=1, max_value=3), st.booleans())
def test_replication_chain_matches_direct_state(
    spark, tmp_path_factory, scenario, n_batches, replicate_each_epoch
):
    """For any event sequence, a replica fed ONLY by the change feed equals
    the upstream table — whether it replicates after every epoch or once at
    the end — and both equal the Python LWW oracle."""
    from multiversx_etl_spark.streaming.replicate import replicate_changes

    events_raw, rng = scenario
    events = list(enumerate(events_raw))
    order = list(events)
    rng.shuffle(order)

    base = tmp_path_factory.mktemp("repl")
    src = ensure_table(spark, str(base / "src"), num_buckets=4)
    dst = ensure_table(spark, str(base / "dst"), num_buckets=4)
    schema = (
        "offset long, seq long, op string, repo string, path string, "
        "commit string, lang string, content string"
    )
    for epoch, chunk in enumerate(spark_rows(events, order, n_batches)):
        merge_batch(src, spark.createDataFrame(chunk, schema), "prop", epoch,
                    collect_per_bucket_stats=False)
        if replicate_each_epoch:
            replicate_changes(src, dst)
    replicate_changes(src, dst)  # idempotent catch-up either way

    def live(t):
        return {(r["repo"], r["path"]): r["content"] for r in t.read().collect()}

    want = python_lww(events)
    assert live(src) == want
    assert live(dst) == want


patch_event_st = st.tuples(
    st.integers(min_value=0, max_value=2),                     # key index
    st.sampled_from(["insert", "update", "delete", "patch"]),
    st.integers(min_value=0, max_value=2),                     # patch mask
)
patch_scenario_st = st.tuples(
    st.lists(patch_event_st, min_size=1, max_size=12),
    st.randoms(use_true_random=False),
)

_PATCH_COLS = {0: ("lang",), 1: ("content",), 2: ("lang", "content")}


def python_column_lww(events):
    """Reference per-column LWW: full images set every column at their seq
    (delete = None), patches set only their masked columns; liveness from
    the full-image winner; keys with no full image are absent."""
    full: dict[int, tuple[int, str]] = {}
    colw: dict[tuple[int, str], tuple[int, str | None]] = {}
    for seq, (ki, op, mask) in sorted(events):
        if op != "patch":
            if ki not in full or seq > full[ki][0]:
                full[ki] = (seq, op)
            for col in ("lang", "content"):
                val = None if op == "delete" else f"{col}-{ki}-{seq}"
                k = (ki, col)
                if k not in colw or seq > colw[k][0]:
                    colw[k] = (seq, val)
        else:
            for col in _PATCH_COLS[mask]:
                val = f"p{col}-{ki}-{seq}"
                k = (ki, col)
                if k not in colw or seq > colw[k][0]:
                    colw[k] = (seq, val)
    return {
        KEYS[ki]: (colw[(ki, "lang")][1], colw[(ki, "content")][1])
        for ki, (s, op) in full.items()
        if op != "delete"
    }


def _patch_rows(order):
    rows = []
    for off, (seq, (ki, op, mask)) in enumerate(order):
        repo, path = KEYS[ki]
        if op == "patch":
            cols = _PATCH_COLS[mask]
            lang = f"plang-{ki}-{seq}" if "lang" in cols else None
            content = f"pcontent-{ki}-{seq}" if "content" in cols else None
            commit = None
        else:
            lang = None if op == "delete" else f"lang-{ki}-{seq}"
            content = None if op == "delete" else f"content-{ki}-{seq}"
            commit = f"c{seq}"
        rows.append((off, seq, op, repo, path, commit, lang, content))
    return rows


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(patch_scenario_st, st.integers(min_value=1, max_value=3))
def test_patch_column_lww_matches_python_oracle(
    spark, tmp_path_factory, scenario, n_batches
):
    """Adversarial partial-image interleavings (patches before their base,
    across epoch splits, duplicated deliveries, deletes between patches)
    must always fold to the reference per-column LWW — with no compaction,
    with a FINALIZING compaction after EVERY epoch (the hard case: events
    later in the shuffled order can carry seqs below an already-finalized
    patch's — _colseq keeps the fold exact anyway), and with a single
    finalizing compact after all events."""
    events_raw, rng = scenario
    events = list(enumerate(events_raw))
    order = list(events)
    rng.shuffle(order)
    dup_count = rng.randint(0, min(3, len(order)))
    order = order + order[:dup_count]
    rows = _patch_rows(order)
    size = -(-len(rows) // n_batches)
    chunks = [rows[i : i + size] for i in range(0, len(rows), size)]

    want = python_column_lww(events)
    base = tmp_path_factory.mktemp("pprop")
    schema = (
        "offset long, seq long, op string, repo string, path string, "
        "commit string, lang string, content string"
    )
    for variant in ("plain", "finalize_mid", "finalize_end"):
        t = ensure_table(spark, str(base / variant), num_buckets=4)
        for epoch, chunk in enumerate(chunks):
            df = spark.createDataFrame(chunk, schema)
            merge_batch(t, df, "prop", epoch, collect_per_bucket_stats=False)
            if variant == "finalize_mid":
                t.compact()
        if variant == "finalize_end":
            t.compact()
        got = {
            (r["repo"], r["path"]): (r["lang"], r["content"])
            for r in t.read().collect()
        }
        assert got == want, f"{variant}: {got} != {want}"
