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
