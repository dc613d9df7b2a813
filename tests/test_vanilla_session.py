"""The driver builds its OWN SparkSession (no engine defaults).

Round-1 regression: 14 driver queries died because ns-timestamp parquet
reading depended on ``spark.sql.legacy.parquet.nanosAsLong`` being set
at session build. ``read_table`` must now be self-sufficient under a
bare ``SparkSession.builder.getOrCreate()`` — verified here in a
subprocess so none of the test-suite session's confs leak in.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMOKE", "/root/testdata/sf0.001")

_SCRIPT = r"""
import sys
sys.path.insert(0, "%(repo)s")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
# Deliberately NO engine confs: this mirrors the driver's session.
from neuroimaging_data_pipeline_spark.sources.tables import read_table

ev = read_table(spark, "%(sf)s", "events")
assert dict(ev.dtypes)["ts"] == "timestamp", dict(ev.dtypes)
n = ev.count()
assert n > 0, n

# entry() itself reads events and must also survive a vanilla session.
import __spark_entry__ as m

rows = m.entry(spark).collect()
assert len(rows) >= 0
print("VANILLA_OK", n, len(rows))
spark.stop()
"""


def test_read_table_and_entry_under_vanilla_session():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _SCRIPT % {"repo": repo, "sf": SF_DIR}
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
        env={**os.environ, "PYTHONPATH": repo},
    )
    assert "VANILLA_OK" in proc.stdout, (
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-4000:]}"
    )


def test_pyarrow_fallback_rewrite(spark):
    """The fallback path itself must produce an identical-value read."""
    from neuroimaging_data_pipeline_spark.sources.tables import (
        _pyarrow_rewrite,
        read_table,
    )

    path = f"{SF_DIR}/events.parquet"
    if not os.path.exists(path):
        pytest.skip("driver testdata absent")
    rewritten = _pyarrow_rewrite(path)
    direct = read_table(spark, SF_DIR, "events")
    fb = spark.read.parquet(rewritten)
    assert dict(fb.dtypes)["ts"].startswith("timestamp")
    assert fb.count() == direct.count()
    a = {r.event_id: r.ts for r in direct.select("event_id", "ts").collect()}
    b = {r.event_id: r.ts for r in fb.select("event_id", "ts").collect()}
    assert a == b
