"""Streaming E1 flagship (VERDICT r12 #5): events arriving as
micro-batches -> incremental design/response state via foreachBatch
-> per-regressor betas, with FINAL-STATE PARITY against the batch
flagship pinned exactly (the monoid-merge argument in
operators/flagship.py made testable)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.operators.flagship import (
    flagship_betas,
    flagship_events,
    flagship_state,
)
from neuroimaging_data_pipeline_spark.sources.tables import read_table
from neuroimaging_data_pipeline_spark.sources.versioned import (
    table_versions,
)
from neuroimaging_data_pipeline_spark.streaming.events import (
    stream_parquet_dir,
)
from neuroimaging_data_pipeline_spark.streaming.flagship import (
    flagship_stream,
    flagship_stream_betas,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from neuroimaging_data_pipeline_spark.session import get_spark

    s = get_spark(app_name="test-streaming-flagship")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values(["regressor", "run"]).reset_index(drop=True)


def test_stream_flagship_matches_batch(spark, tmp_path):
    ev = read_table(spark, SF_DIR, "events")
    anchor = ev.agg(F.min(F.unix_timestamp("ts"))).first()[0]

    # batch twin: the entry() pipeline via the same shared stages
    batch_state = flagship_state(spark, flagship_events(ev, anchor))
    want = _sorted(flagship_betas(batch_state).toPandas())

    # landing dir: the SAME events split across 3 parquet files; with
    # maxFilesPerTrigger=1 the file source delivers 3 micro-batches.
    landing = tmp_path / "landing"
    ev.withColumn(
        "_split", F.col("event_id") % 3
    ).repartition(3, "_split").drop("_split").write.parquet(str(landing))

    state_root = str(tmp_path / "flagship_state")
    stream = stream_parquet_dir(
        spark, str(landing), max_files_per_trigger=1
    ).coalesce(1)
    q = (
        stream.writeStream.foreachBatch(
            flagship_stream(stream, anchor, state_root)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = _sorted(flagship_stream_betas(spark, state_root).toPandas())
    pd.testing.assert_frame_equal(got, want)  # exact, not approx

    # the state itself is bit-identical to the batch design+response
    from neuroimaging_data_pipeline_spark.sources.versioned import (
        read_version,
    )

    final_state = read_version(spark, state_root).toPandas()
    bs = batch_state.toPandas()
    key = ["subject", "run", "t"]
    pd.testing.assert_frame_equal(
        final_state.sort_values(key).reset_index(drop=True)[bs.columns],
        bs.sort_values(key).reset_index(drop=True),
    )

    # genuinely incremental: one committed state version per micro-batch
    assert len(table_versions(state_root)) == 3  # one per micro-batch


def test_stream_flagship_replay_is_exactly_once(spark, tmp_path):
    """A replayed micro-batch (at-least-once delivery) must not
    double-fold: append_txn keyed by batch_id drops the duplicate."""
    ev = read_table(spark, SF_DIR, "events").limit(500)
    anchor = ev.agg(F.min(F.unix_timestamp("ts"))).first()[0]
    state_root = str(tmp_path / "state_replay")
    fold = flagship_stream(None, anchor, state_root)

    fold(ev, 0)
    once = flagship_stream_betas(spark, state_root).toPandas()
    fold(ev, 0)  # replay of the SAME batch id
    twice = flagship_stream_betas(spark, state_root).toPandas()
    pd.testing.assert_frame_equal(_sorted(twice), _sorted(once))
    assert len(table_versions(state_root)) == 1
