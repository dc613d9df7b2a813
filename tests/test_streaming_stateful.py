"""transformWithState streaming spike detector: state carries across
micro-batches; spikes judged against prior history only."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def _run(spark, sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table(name)


@pytest.fixture()
def event_stream_dir(tmp_path, spark):
    rng = np.random.default_rng(11)
    rows = []
    eid = 0
    for u in (1, 2):
        for t in range(50):
            v = float(rng.normal(10.0, 1.0))
            if u == 1 and t == 40:
                v = 60.0  # unmistakable spike, late in the stream
            rows.append({"user_id": u, "event_id": eid, "value": v})
            eid += 1
    pdf = pd.DataFrame(rows)
    d = tmp_path / "events"
    # two files -> two micro-batches with maxFilesPerTrigger=1
    spark.createDataFrame(pdf[pdf.event_id < 50]).coalesce(1).write.parquet(
        str(d), mode="append"
    )
    spark.createDataFrame(pdf[pdf.event_id >= 50]).coalesce(1).write.parquet(
        str(d), mode="append"
    )
    return str(d)


def test_judge_and_update_kernel_exact():
    """Drive the shared per-batch kernel directly (no Spark, no
    protobuf): this is the math BOTH the transformWithState and the
    applyInPandasWithState paths execute, so the TWS branch's kernel
    is covered even where its protobuf dependency is absent.

    Pins: (a) warm-up rows emit z=None/spike=0; (b) after min_history,
    z equals the z-score against PRIOR history only (never including
    the row itself); (c) Welford state equals numpy moments exactly;
    (d) state carries across batch boundaries; (e) within-batch order
    is by id regardless of input row order."""
    from neuroimaging_data_pipeline_spark.streaming.stateful import (
        _judge_and_update,
    )

    rng = np.random.default_rng(3)
    vals = rng.normal(5.0, 2.0, 12)
    vals[9] = 80.0  # outlier, judged against 9 prior values

    # batch 1 (shuffled input order), then batch 2 continuing the state
    b1 = pd.DataFrame(
        {"event_id": [3, 1, 2, 0, 4, 5], "value": vals[[3, 1, 2, 0, 4, 5]]}
    )
    b2 = pd.DataFrame({"event_id": range(6, 12), "value": vals[6:]})

    out1, n, mean, m2 = _judge_and_update(
        b1, "event_id", "value", 7, "user_id", 0, 0.0, 0.0,
        cutoff=3.0, min_history=5,
    )
    assert [r[1] for r in out1] == [0, 1, 2, 3, 4, 5]  # (e)
    # (a): first 5 rows are warm-up; row id=5 is the first judged
    assert all(r[3] is None and r[4] == 0 for r in out1[:5])
    z5 = (vals[5] - np.mean(vals[:5])) / np.std(vals[:5], ddof=1)
    np.testing.assert_allclose(out1[5][3], z5, rtol=1e-12)  # (b)
    # (c): Welford state after batch 1 == numpy moments of vals[:6]
    assert n == 6
    np.testing.assert_allclose(mean, np.mean(vals[:6]), rtol=1e-12)
    np.testing.assert_allclose(
        m2, np.sum((vals[:6] - np.mean(vals[:6])) ** 2), rtol=1e-10
    )

    out2, n, mean, m2 = _judge_and_update(
        b2, "event_id", "value", 7, "user_id", n, mean, m2,
        cutoff=3.0, min_history=5,
    )
    # (d): row 9 judged against vals[:9] (prior history spans batches)
    z9 = (vals[9] - np.mean(vals[:9])) / np.std(vals[:9], ddof=1)
    np.testing.assert_allclose(out2[3][3], z9, rtol=1e-12)
    assert out2[3][4] == 1  # the outlier is flagged
    assert [r[4] for r in out2] == [0, 0, 0, 1, 0, 0]  # only the outlier
    assert n == 12
    np.testing.assert_allclose(mean, np.mean(vals), rtol=1e-12)


def test_streaming_spikes_flag_only_the_outlier(spark, event_stream_dir):
    """Runs the transformWithState path when its protobuf dependency is
    present, else the applyInPandasWithState path — same semantics."""
    from neuroimaging_data_pipeline_spark.streaming.stateful import (
        streaming_spike_flags,
        tws_available,
    )

    if tws_available():
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    try:
        stream = (
            spark.readStream.schema("user_id long, event_id long, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(event_stream_dir)
        )
        out = _run(
            spark, streaming_spike_flags(stream, min_history=10), "t_spikes"
        ).toPandas()
    finally:
        if tws_available():
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    assert len(out) == 100
    flagged = out[out.is_spike == 1]
    assert list(flagged["event_id"]) == [40]
    # early rows (no history yet) have null z, later rows have values
    by_user = out[out.user_id == 2].sort_values("event_id")
    assert by_user["z"].head(10).isna().all()
    assert by_user["z"].tail(10).notna().all()
