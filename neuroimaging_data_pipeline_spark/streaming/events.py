"""Structured Streaming surface (SURVEY.md §2.9, milestone M6).

The reference's closest analog is micro-batch arrival of new subjects
into a landing dir (convert2BIDS.sh:8,19). Engine mapping:

- file-source ingest: ``stream_parquet_dir`` watches a landing
  directory (new subject parquet = new micro-batch);
- event-time processing on the ``events`` stream: tumbling windows +
  watermark for late data, session windows for the block-design shape;
- ``foreach_batch_pipeline`` runs an arbitrary batch pipeline (e.g.
  M1-M4 design-matrix -> OLS) per micro-batch — the cohort runner.

Scale: watermark + windowed aggs keep state bounded; the shuffle per
micro-batch is the same keyed agg as the batch twin (the driver's
correctness check runs the batch twins — st_tumbling_window /
st_session_window in queries/neuro.py — over identical semantics).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter

from neuroimaging_data_pipeline_spark.functions.stats import dec_sum
from neuroimaging_data_pipeline_spark.sources.tables import (
    _ensure_read_confs,
    _parquet_ts_unit,
    pin_timestamp,
)


EVENTS_STREAM_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def _events_schema_for(path: str, ts_col: str) -> str:
    """Build the readStream schema from the landing dir's ACTUAL footer
    type for ``ts_col`` — never assume a unit (the r3 defect: assuming
    TIMESTAMP(NANOS)-as-long and dividing by 1000 landed every
    microsecond-precision event in 1970).

    - NANOS footer: Spark can't map it to TimestampType, so declare
      ``long`` (raw ns) and let ``pin_timestamp`` convert with the
      probed unit.
    - MICROS/MILLIS, isAdjustedToUTC=false: declare ``timestamp_ntz``
      (what Spark itself infers) and cast to timestamp downstream.
    - isAdjustedToUTC=true: declare ``timestamp`` directly.
    - Empty dir / probe failure: default to ``timestamp_ntz`` — the
      modern pyarrow/pandas writer default.

    One driver-side footer read per stream START, not per micro-batch.
    """
    probed = _parquet_ts_unit(path, ts_col)
    if probed is None:
        ts_type = "timestamp_ntz"
    else:
        unit, adjusted = probed
        if unit == "int96":
            # legacy INT96 (Spark's own writer default): readable
            # ONLY as TimestampType — declaring long fails the scan
            ts_type = "timestamp"
        elif unit == "ns":
            ts_type = "long"
        elif adjusted:
            ts_type = "timestamp"
        else:
            ts_type = "timestamp_ntz"
    # Rewrite the ts_col entry wherever it sits in the schema — a
    # bare str.replace keyed on "ts timestamp_ntz" would silently
    # no-op for any other ts_col, discarding the footer probe and
    # returning a schema without the requested column.
    fields = [f.strip() for f in EVENTS_STREAM_SCHEMA.split(",")]
    names = [f.split()[0] for f in fields]
    if ts_col not in names:
        raise ValueError(
            f"ts_col {ts_col!r} is not a column of the events stream "
            f"schema ({', '.join(names)})"
        )
    fields[names.index(ts_col)] = f"{ts_col} {ts_type}"
    return ", ".join(fields)


def stream_parquet_dir(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    ts_col: str | None = "ts",
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """File-source stream over a landing directory of parquet files.

    ``ts_col`` mirrors sources.tables.read_table: the event-time column
    is pinned to TimestampType regardless of how the writer encoded it
    (NANOS-as-long, MICROS ntz, or UTC-adjusted), so event-time ops
    always see the same schema the batch twins see.
    """
    _ensure_read_confs(spark)  # UTC session tz: ntz cast == instant
    if schema is None:
        schema = (
            _events_schema_for(path, ts_col) if ts_col else EVENTS_STREAM_SCHEMA
        )
    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    if ts_col and ts_col in df.columns:
        df = pin_timestamp(df, ts_col, source_path=path)
    return df


def tumbling_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    keys: list[str] | None = None,
) -> DataFrame:
    """Event-time tumbling aggregation with late-data watermark —
    streaming twin of queries.neuro.st_tumbling_window."""
    keys = keys if keys is not None else ["event_type"]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            # exact decimal sum — bit-identical to the batch twin
            # regardless of micro-batch partial-agg order (w7b lesson)
            (F.round(dec_sum("value"), 6) + F.lit(0.0)).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            *keys,
            "n",
            "sum_value",
        )
    )


def session_counts(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key: str = "user_id",
) -> DataFrame:
    """Built-in session_window sessionization (the MID block design is
    session-window-shaped — SURVEY.md §2.9)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), key)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact decimal sum — bit-identical to the batch twin
            # regardless of micro-batch partial-agg order (w7b lesson)
            (F.round(dec_sum("value"), 6) + F.lit(0.0)).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            key,
            "n_events",
            "sum_value",
        )
    )


def stateful_user_stats(
    stream: DataFrame,
    key: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``:
    per-key cumulative (count, sum, max) carried across micro-batches.

    This is the engine's skeleton for data-driven QA flagging over a
    stream (the reference imports ``find_spikes`` but never calls it —
    ``ssm_loop.py:20`` — so the engine keeps the stateful surface
    minimal: cumulative moments per key, from which a spike rule like
    ``value > mean + k*std`` is a stateless post-filter). State is one
    fixed-width tuple per key — bounded, shuffle-partitioned by key,
    so 1e9 keys spread across executors with no per-event state
    growth.

    Emits one row per (key, micro-batch): cumulative n/sum/max plus
    this batch's row count.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key_tuple, pdf_iter, state: GroupState):
        if state.exists:
            n, s, mx = state.get
        else:
            n, s, mx = 0, 0.0, float("-inf")
        batch_n = 0
        for pdf in pdf_iter:
            v = pdf[value_col]
            batch_n += len(pdf)
            n += len(pdf)
            s += float(v.sum())
            if len(pdf):
                mx = max(mx, float(v.max()))
        state.update((n, s, mx))
        yield pd.DataFrame(
            {
                key: [key_tuple[0]],
                "n_total": [n],
                "sum_total": [round(s, 6)],
                "max_value": [mx],
                "n_batch": [batch_n],
            }
        )

    return stream.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=(
            f"{key} long, n_total long, sum_total double, "
            "max_value double, n_batch long"
        ),
        stateStructType="n long, s double, mx double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def foreach_batch_pipeline(
    stream: DataFrame,
    process: Callable[[DataFrame, int], None],
) -> DataStreamWriter:
    """Per-micro-batch cohort runner: each arriving batch of subjects
    is pushed through an arbitrary batch pipeline (the E2 fan-out
    replacement — xargs -P 4 becomes micro-batch scheduling)."""
    return stream.writeStream.foreachBatch(process).outputMode("append")
