"""The reference's shipped user queries (queries/*.sql) and maintained views
(maintenance/views.md) over replayed catalog tables, each checked against a
DuckDB oracle running the literal SQL on the same state parquet."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from multiversx_etl_spark import user_queries as uq


@pytest.fixture(scope="module")
def state(spark, tmp_path_factory):
    """Replay synthetic operations + blocks logs through the real CDC path,
    then freeze each table's state as plain parquet so Spark and DuckDB
    query byte-identical input."""
    from multiversx_etl_spark.operators.normalize import REGISTRY
    from multiversx_etl_spark.schemas import TABLES
    from multiversx_etl_spark.sources.changelog import (
        generate_catalog_log,
        write_log_parquet,
    )
    from multiversx_etl_spark.streaming.ingest import ensure_table, replay

    root = tmp_path_factory.mktemp("user_queries")
    out = {}
    tables = {}
    for name, num_events, num_keys in (("operations", 3000, 80), ("blocks", 300, 40)):
        log_path = str(root / f"log_{name}")
        # ts_step=3600: ~3k events span ~126 days, so the daily queries get
        # real groups and the 7-day HAVING window has edges to cut
        write_log_parquet(
            generate_catalog_log(
                spark, num_events, name, num_keys=num_keys, ts_step=3600
            ),
            log_path,
            files=2,
        )
        _, target_schema, key = TABLES[name]
        table = ensure_table(
            spark, str(root / f"t_{name}"), num_buckets=4,
            schema=target_schema, key_columns=key,
        )
        replay(
            spark.read.parquet(log_path), table, interval_size=num_events // 2,
            normalizer=REGISTRY[name],
        )
        out[name] = str(root / f"state_{name}")
        tables[name] = str(root / f"t_{name}")
        table.read().write.parquet(out[name])
    ops = spark.read.parquet(out["operations"])
    anchor = ops.select(F.max(F.to_date("timestamp")).cast("string")).first()[0]
    return {"paths": out, "tables": tables, "anchor": anchor}


def _spark_df(spark, state, name):
    return spark.read.parquet(state["paths"][name])


def _oracle(state, sql):
    con = duckdb.connect()
    try:
        for name, path in state["paths"].items():
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}/*.parquet')"
            )
        cur = con.execute(sql)
        return cur.fetchall()
    finally:
        con.close()


def _rows(df):
    return [tuple(r) for r in df.collect()]


def _canon(rows):
    # sort on stringified values: Decimal/int/date/datetime all stringify
    # stably, and both engines return the same logical values
    return sorted([tuple(str(v) for v in r) for r in rows])


def _assert_match(df, state, sql, min_rows=2):
    got, want = _rows(df), _oracle(state, sql)
    assert len(got) >= min_rows
    assert _canon(got) == _canon(want)


def test_recent_blocks(spark, state):
    df = uq.recent_blocks(_spark_df(spark, state, "blocks"))
    _assert_match(df, state, """
        SELECT nonce, timestamp, shardId AS shard,
               len(miniBlocksHashes) AS num_miniblocks, txCount AS num_txs
        FROM blocks ORDER BY timestamp DESC LIMIT 1000
    """)
    # the reference's intent: most recent first
    ts = [r[1] for r in _rows(df)]
    assert ts == sorted(ts, reverse=True)


def test_daily_rewards(spark, state):
    df = uq.daily_rewards(_spark_df(spark, state, "operations"))
    _assert_match(df, state, """
        SELECT CAST(timestamp AS DATE) AS day,
               SUM(CAST(value AS DECIMAL(38,0))) AS rewards
        FROM operations WHERE type = 'normal' AND operation = 'reward'
        GROUP BY day ORDER BY day DESC
    """)


def test_daily_transactions(spark, state):
    df = uq.daily_transactions(_spark_df(spark, state, "operations"))
    _assert_match(df, state, """
        SELECT CAST(timestamp AS DATE) AS day, COUNT(*) AS transactions
        FROM operations WHERE type = 'normal'
        GROUP BY day ORDER BY day DESC
    """)


def test_largest_daily_transfers(spark, state):
    df = uq.largest_daily_transfers(_spark_df(spark, state, "operations"))
    _assert_match(df, state, """
        SELECT day, hash, sender, receiver, value FROM (
          SELECT CAST(timestamp AS DATE) AS day, _id AS hash, sender,
                 receiver, value,
                 ROW_NUMBER() OVER (
                   PARTITION BY CAST(timestamp AS DATE)
                   ORDER BY CAST(value AS DECIMAL(38,0)) DESC, _id
                 ) AS row_num
          FROM operations WHERE type = 'normal' AND status = 'success'
        ) WHERE row_num = 1 ORDER BY day DESC LIMIT 100
    """)
    rows = _rows(df)
    # one winner per day (state timestamps cluster in the latest days: the
    # table holds last images, whose seqs — hence timestamps — are late)
    assert len(rows) <= 100
    assert len({r[0] for r in rows}) == len(rows)


def test_daily_active_users(spark, state):
    df = uq.daily_active_users(_spark_df(spark, state, "operations"))
    _assert_match(df, state, """
        SELECT CAST(timestamp AS DATE) AS day,
               COUNT(DISTINCT sender) AS num_users
        FROM operations WHERE type = 'normal'
        GROUP BY day ORDER BY day DESC LIMIT 1000
    """)


def test_contract_interactions(spark, state):
    anchor = state["anchor"]
    df = uq.contract_interactions(
        _spark_df(spark, state, "operations"), anchor_date=anchor
    )
    _assert_match(df, state, f"""
        SELECT CAST(timestamp AS DATE) AS day, receiver AS contract,
               COUNT(*) AS num_interactions
        FROM operations WHERE isScCall
        GROUP BY day, contract
        HAVING day >= DATE '{anchor}' - 7
        ORDER BY day DESC, num_interactions DESC
    """)
    # the 7-day window must have actually cut rows
    assert df.count() < _spark_df(spark, state, "operations").where(
        F.col("isScCall")
    ).select(F.to_date("timestamp"), "receiver").distinct().count()


def test_contract_unique_users(spark, state):
    anchor = state["anchor"]
    df = uq.contract_unique_users(
        _spark_df(spark, state, "operations"), anchor_date=anchor
    )
    _assert_match(df, state, f"""
        SELECT CAST(timestamp AS DATE) AS day, receiver AS contract,
               COUNT(DISTINCT sender) AS num_users
        FROM operations WHERE type = 'normal' AND isScCall
        GROUP BY day, contract
        HAVING day >= DATE '{anchor}' - 7
        ORDER BY day DESC, num_users DESC
    """)


def test_top_contract_native_volume(spark, state):
    df = uq.top_contract_native_volume(_spark_df(spark, state, "operations"))
    _assert_match(df, state, """
        WITH contract_volumes_per_day AS (
          SELECT CAST(timestamp AS DATE) AS day, receiver AS contract,
                 SUM(CAST(value AS DECIMAL(38,0))) AS native_volume
          FROM operations
          WHERE type = 'normal' AND isScCall AND status = 'success'
          GROUP BY day, contract
        )
        SELECT day, contract, native_volume, row_num AS top FROM (
          SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY day ORDER BY native_volume DESC, contract
                 ) AS row_num
          FROM contract_volumes_per_day
        ) WHERE row_num <= 3 ORDER BY day DESC, top ASC
    """)
    assert df.groupBy("day").count().where(F.col("count") > 3).count() == 0


def test_views_registered_for_sql_users(spark, state):
    """maintenance/views.md: SQL users query view_transactions /
    view_scresults by name; the views partition operations exactly."""
    ops = _spark_df(spark, state, "operations")
    uq.create_views(spark, ops)
    n_tx = spark.sql("SELECT COUNT(*) FROM view_transactions").first()[0]
    n_sc = spark.sql("SELECT COUNT(*) FROM view_scresults").first()[0]
    assert n_tx == ops.where(F.col("type") == "normal").count() > 0
    assert n_sc == ops.where(F.col("type") == "unsigned").count() > 0
    other = ops.where(~F.col("type").isin("normal", "unsigned")).count()
    assert n_tx + n_sc + other == ops.count()


def test_dashboard_views_incremental(spark, tmp_path):
    """The reference's daily dashboards, maintained incrementally from the
    operations CDC feed: after two replay epochs + two refreshes each view
    equals the corresponding published query run on the final state."""
    from multiversx_etl_spark.operators.normalize import REGISTRY
    from multiversx_etl_spark.schemas import TABLES
    from multiversx_etl_spark.sources.changelog import (
        generate_catalog_log,
        read_offset_range,
        write_log_parquet,
    )
    from multiversx_etl_spark.streaming.ingest import ensure_table, replay
    from multiversx_etl_spark.streaming.materialize import (
        create_agg_view,
        refresh_agg_view,
    )

    log_path = str(tmp_path / "log")
    write_log_parquet(
        generate_catalog_log(spark, 800, "operations", num_keys=40, ts_step=3600),
        log_path, files=2,
    )
    _, target_schema, key = TABLES["operations"]
    table = ensure_table(
        spark, str(tmp_path / "t"), num_buckets=4,
        schema=target_schema, key_columns=key,
    )
    log = spark.read.parquet(log_path)
    replay(read_offset_range(log, 0, 404), table, interval_size=404,
           normalizer=REGISTRY["operations"])

    specs = uq.dashboard_specs()
    views = {
        n: create_agg_view(table, str(tmp_path / f"v_{n}"), s, num_buckets=4)
        for n, s in specs.items()
    }
    for n, s in specs.items():
        assert refresh_agg_view(table, views[n], s) is not None

    # second epoch: updates/deletes land, the views refresh incrementally
    replay(log, table, interval_size=404, normalizer=REGISTRY["operations"])
    for n, s in specs.items():
        assert refresh_agg_view(table, views[n], s) is not None

    st = table.read()
    got_tx = {
        (str(r["day"]), r["transactions"])
        for r in views["daily_transactions"].read().collect()
    }
    want_tx = {
        (str(r["day"]), r["transactions"])
        for r in uq.daily_transactions(st).collect()
    }
    assert got_tx == want_tx and want_tx

    got_rw = {
        (str(r["day"]), str(r["rewards"]))
        for r in views["daily_rewards"].read().collect()
    }
    want_rw = {
        (str(r["day"]), str(r["rewards"]))
        for r in uq.daily_rewards(st).collect()
    }
    assert got_rw == want_rw and want_rw

    # the view keeps all days; the published query's 7-day window is a
    # query-time filter — an early anchor keeps every day
    got_ci = {
        (str(r["day"]), r["contract"], r["num_interactions"])
        for r in views["contract_interactions"].read().collect()
    }
    want_ci = {
        (str(r["day"]), r["contract"], r["num_interactions"])
        for r in uq.contract_interactions(st, anchor_date="1970-01-08").collect()
    }
    assert got_ci == want_ci and want_ci


def test_daily_active_users_cascade(spark, tmp_path):
    """COUNT(DISTINCT) via two cascaded maintained views: after each
    upstream epoch + level-1-then-level-2 refresh, level 2 equals the
    published daily_active_users query on the current state."""
    from multiversx_etl_spark.operators.normalize import REGISTRY
    from multiversx_etl_spark.schemas import TABLES
    from multiversx_etl_spark.sources.changelog import (
        generate_catalog_log,
        read_offset_range,
        write_log_parquet,
    )
    from multiversx_etl_spark.streaming.ingest import ensure_table, replay
    from multiversx_etl_spark.streaming.materialize import (
        create_agg_view,
        refresh_agg_view,
    )

    log_path = str(tmp_path / "log")
    write_log_parquet(
        generate_catalog_log(spark, 600, "operations", num_keys=30, ts_step=3600),
        log_path, files=2,
    )
    _, target_schema, key = TABLES["operations"]
    table = ensure_table(
        spark, str(tmp_path / "t"), num_buckets=4,
        schema=target_schema, key_columns=key,
    )
    log = spark.read.parquet(log_path)
    spec1, spec2 = uq.daily_active_users_cascade()
    v1 = create_agg_view(table, str(tmp_path / "v1"), spec1, num_buckets=4)
    v2 = create_agg_view(v1, str(tmp_path / "v2"), spec2, num_buckets=4)

    def check():
        got = {
            (str(r["day"]), r["num_users"]) for r in v2.read().collect()
        }
        want = {
            (str(r["day"]), r["num_users"])
            for r in uq.daily_active_users(table.read()).collect()
        }
        assert got == want and want

    for hi in (303, None):  # two upstream epochs
        part = log if hi is None else read_offset_range(log, 0, hi)
        replay(part, table, interval_size=303, normalizer=REGISTRY["operations"])
        refresh_agg_view(table, v1, spec1)   # level 1 first,
        refresh_agg_view(v1, v2, spec2)      # then its consumer
        check()


def test_dashboards_cli(spark, tmp_path):
    """The one-command ops surface: a fresh consumer process creates and
    refreshes every reference dashboard (cascade included, in dependency
    order); a second run reports everything up to date."""
    import json
    import os
    import subprocess
    import sys

    from multiversx_etl_spark.lake.table import LakeTable
    from multiversx_etl_spark.operators.normalize import REGISTRY
    from multiversx_etl_spark.schemas import TABLES
    from multiversx_etl_spark.sources.changelog import (
        generate_catalog_log,
        write_log_parquet,
    )
    from multiversx_etl_spark.streaming.ingest import ensure_table, replay

    log_path = str(tmp_path / "log")
    write_log_parquet(
        generate_catalog_log(spark, 400, "operations", num_keys=25, ts_step=3600),
        log_path, files=2,
    )
    _, target_schema, key = TABLES["operations"]
    table = ensure_table(
        spark, str(tmp_path / "t"), num_buckets=4,
        schema=target_schema, key_columns=key,
    )
    replay(spark.read.parquet(log_path), table, interval_size=400,
           normalizer=REGISTRY["operations"])

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run_cli():
        r = subprocess.run(
            [sys.executable, "-m", "multiversx_etl_spark", "--master",
             "local[2]", "dashboards", str(tmp_path / "t"),
             str(tmp_path / "views"), "--buckets", "4"],
            capture_output=True, text=True, timeout=300,
            env={**os.environ, "PYTHONPATH": repo}, cwd=repo,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    out = run_cli()
    assert set(out) == {
        "daily_transactions", "daily_rewards", "contract_interactions",
        "daily_active_senders", "daily_active_users",
    }
    assert all(not v["up_to_date"] and v["view_rows"] > 0 for v in out.values())

    view = LakeTable(spark, str(tmp_path / "views" / "daily_transactions"))
    got = {(str(r["day"]), r["transactions"]) for r in view.read().collect()}
    want = {
        (str(r["day"]), r["transactions"])
        for r in uq.daily_transactions(table.read()).collect()
    }
    assert got == want and want

    again = run_cli()
    assert all(v["up_to_date"] for v in again.values())

    # a populated view maintained under a DIFFERENT stream id must be
    # refused, not silently double-counted
    from multiversx_etl_spark.streaming.materialize import (
        create_agg_view,
        reseed_agg_view,
    )

    foreign_root = str(tmp_path / "views2" / "daily_transactions")
    spec = uq.dashboard_specs()["daily_transactions"]
    fv = create_agg_view(table, foreign_root, spec, num_buckets=4)
    reseed_agg_view(table, fv, spec, stream_id="matview")
    clash = subprocess.run(
        [sys.executable, "-m", "multiversx_etl_spark", "--master",
         "local[2]", "dashboards", str(tmp_path / "t"),
         str(tmp_path / "views2"), "--buckets", "4"],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "PYTHONPATH": repo}, cwd=repo,
    )
    assert clash.returncode != 0
    assert "double-count" in clash.stderr


def test_user_query_cli(spark, state):
    """A fresh consumer process runs a shipped query against the lake table
    by name — the BQ-console analog for reference users."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    run = subprocess.run(
        [sys.executable, "-m", "multiversx_etl_spark", "--master", "local[2]",
         "user-query", "daily_transactions",
         "--table", state["tables"]["operations"], "--limit-out", "500"],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "PYTHONPATH": repo}, cwd=repo,
    )
    assert run.returncode == 0, run.stderr[-3000:]
    rows = [json.loads(line) for line in run.stdout.strip().splitlines()]
    want = {
        str(r["day"]): r["transactions"]
        for r in uq.daily_transactions(
            _spark_df(spark, state, "operations")
        ).collect()
    }
    assert {r["day"]: r["transactions"] for r in rows} == want and want

    # list + unknown-name paths (no JVM paid for either)
    ls = subprocess.run(
        [sys.executable, "-m", "multiversx_etl_spark", "user-query", "list"],
        capture_output=True, text=True, timeout=60,
        env={**os.environ, "PYTHONPATH": repo}, cwd=repo,
    )
    assert ls.returncode == 0
    assert set(json.loads(ls.stdout)) == set(uq.CANNED_QUERIES)
    bad = subprocess.run(
        [sys.executable, "-m", "multiversx_etl_spark", "user-query", "nope",
         "--table", "/tmp/x"],
        capture_output=True, text=True, timeout=60,
        env={**os.environ, "PYTHONPATH": repo}, cwd=repo,
    )
    assert bad.returncode == 2 and "unknown user query" in bad.stderr
    # an anchor on a query that cannot honor it: loud pre-JVM error,
    # never a silently ignored flag
    noanchor = subprocess.run(
        [sys.executable, "-m", "multiversx_etl_spark", "user-query",
         "daily_rewards", "--table", "/tmp/x", "--anchor-date", "2026-01-01"],
        capture_output=True, text=True, timeout=60,
        env={**os.environ, "PYTHONPATH": repo}, cwd=repo,
    )
    assert noanchor.returncode == 2
    assert "does not take --anchor-date" in noanchor.stderr


def test_plans_scale(spark, state):
    """100 TB shape assertions: the view filter reaches the parquet scan
    (PushedFilters) and recent_blocks never global-sorts
    (TakeOrderedAndProject)."""
    ops = _spark_df(spark, state, "operations")
    plan = uq.view_transactions(ops)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "type" in plan
    blk = uq.recent_blocks(_spark_df(spark, state, "blocks"))
    bplan = blk._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in bplan
    assert "Sort" not in bplan.replace("TakeOrderedAndProject", "")
    for name, (tbl, fn) in uq.CANNED_QUERIES.items():
        df = fn(_spark_df(spark, state, tbl))
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in p, name  # everything stays JVM-side
