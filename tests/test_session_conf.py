"""Session conf knobs (no JVM — the knobs are resolved at module import)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = (
    "import sys; sys.path.insert(0, %r); "
    "from multiversx_etl_spark.session import DEFAULT_CONF as C; "
    "import json; print(json.dumps(C))" % REPO
)


def _conf_with_env(_remove: tuple[str, ...] = (), **env: str) -> dict:
    child = {k: v for k, v in os.environ.items() if k not in _remove}
    child.update(env)
    out = subprocess.run(
        [sys.executable, "-c", _PROBE],
        capture_output=True,
        text=True,
        check=True,
        env=child,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_zstd_level_knob_sets_both_codec_levels():
    conf = _conf_with_env(SPARK_GRAFT_ZSTD_LEVEL="12")
    assert conf["spark.hadoop.parquet.compression.codec.zstd.level"] == "12"
    assert conf["spark.io.compression.zstd.level"] == "12"


def test_zstd_level_knob_absent_by_default():
    conf = _conf_with_env(_remove=("SPARK_GRAFT_ZSTD_LEVEL",))
    assert "spark.hadoop.parquet.compression.codec.zstd.level" not in conf
    assert "spark.io.compression.zstd.level" not in conf
    # the codec itself stays zstd regardless of the effort knob
    assert conf["spark.sql.parquet.compression.codec"] == "zstd"
