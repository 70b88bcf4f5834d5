"""The north rule's deployment path, exercised for real: ``spark-submit
--py-files mxetl.zip`` against a multi-executor master.

The other tests import the package from the repo checkout; a cluster never
does — every executor unpacks the ``--py-files`` zip onto its PYTHONPATH
(reference analog: the Dockerfile ships the package into the worker image,
/root/reference/Dockerfile). This test proves that path end-to-end:

1. ``python -m multiversx_etl_spark package`` builds the zip (CLI surface);
2. a driver script that knows nothing of the checkout (PYTHONPATH stripped,
   cwd outside the repo) is submitted with the real ``spark-submit`` binary
   on ``local-cluster[2,2,1024]`` — two separate executor JVMs, real
   inter-executor shuffle serialization and closure/py-files shipping;
3. the job generates a change log, replays it through the MERGE engine, and
   verifies the final state against the log-fold oracle (content sha256
   equality, BASELINE.json per-row invariant) — all with code imported
   exclusively from the zip.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_JOB = '''
import json, sys
from pyspark.sql import SparkSession

# master/py-files come from spark-submit — the job itself is cluster-agnostic
spark = (
    SparkSession.builder.appName("mxetl-submit-smoke")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# these imports resolve from the --py-files zip, not a checkout
from multiversx_etl_spark.lake.table import LakeTable
from multiversx_etl_spark.oracle import expected_state
from multiversx_etl_spark.schemas import REPOS
from multiversx_etl_spark.sources.changelog import (
    generate_change_log,
    write_log_parquet,
)
from multiversx_etl_spark.streaming.ingest import replay

workdir = sys.argv[1]
log = generate_change_log(spark, 20_000, num_repos=50, paths_per_repo=40)
write_log_parquet(log, workdir + "/log", files=8)
log = spark.read.parquet(workdir + "/log")

table = LakeTable.create(
    spark, workdir + "/t", REPOS, key_columns=["repo", "path"], num_buckets=8
)
summary = replay(log, table, interval_size=7_000)

import pyspark.sql.functions as F

def fingerprint(df):
    cols = ["repo", "path", "commit", "lang", F.sha2("content", 256)]
    row = df.select(
        F.count("*").alias("n"),
        F.sum(F.crc32(F.concat_ws("\\x00", *cols))).alias("crc"),
    ).collect()[0]
    return row["n"], row["crc"]

got = fingerprint(table.read())
want = fingerprint(expected_state(log))
print("RESULT " + json.dumps({
    "epochs": summary.epochs_run,
    "rows": got[0],
    "sha_match": got == want,
    "master": spark.sparkContext.master,
    "executors": spark.sparkContext.getConf().get("spark.master"),
}))
spark.stop()
'''


def _spark_submit_bin() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def test_spark_submit_py_files_local_cluster(tmp_path):
    # 1. build the deployment zip through the CLI (no Spark session needed)
    zip_path = str(tmp_path / "mxetl.zip")
    out = subprocess.run(
        [sys.executable, "-m", "multiversx_etl_spark", "package", zip_path],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    built = json.loads(out.stdout.strip().splitlines()[-1])
    assert built["entries"] > 10

    # 2. submit the job from OUTSIDE the checkout with PYTHONPATH stripped:
    #    the only way `import multiversx_etl_spark` can succeed is the zip
    job = tmp_path / "job.py"
    job.write_text(_JOB)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    run = subprocess.run(
        [
            _spark_submit_bin(),
            "--master",
            "local-cluster[2,2,1024]",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            zip_path,
            str(job),
            str(tmp_path),
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),
        env=env,
    )
    assert run.returncode == 0, run.stderr[-4000:]
    result_lines = [l for l in run.stdout.splitlines() if l.startswith("RESULT ")]
    assert result_lines, (run.stdout[-2000:], run.stderr[-2000:])
    result = json.loads(result_lines[-1].removeprefix("RESULT "))

    # 3. the engine ran on a multi-executor master and matched the oracle
    assert result["master"] == "local-cluster[2,2,1024]"
    assert result["epochs"] == 3  # ceil(20200 / 7000)
    assert result["rows"] > 0
    assert result["sha_match"] is True
