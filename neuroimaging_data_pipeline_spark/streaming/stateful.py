"""Arbitrary stateful streaming spike detection (SURVEY.md §2.9).

The stream-shaped twin of ``operators/spikes.py``: per-key running
moments (Welford) carried across micro-batches; each arriving value is
z-scored against the state BEFORE it updates the state, so a spike is
judged only against history, never against itself.

Two interchangeable implementations of the same semantics:

- ``transformWithStateInPandas`` (Spark 4 StatefulProcessor API —
  typed state handles, timers, multi-state). Its Python worker needs
  ``google.protobuf``; environments without it (this container) fall
  back automatically.
- ``applyInPandasWithState`` (the stable GroupState API) — no extra
  dependencies.

Scale: state = three doubles per key, shuffle-partitioned by key;
the transformWithState path wants the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass``) so state spills to
local disk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

SPIKE_OUTPUT_SCHEMA = (
    "user_id long, event_id long, value double, z double, is_spike int"
)


def tws_available() -> bool:
    """transformWithState's Python worker imports protobuf at runtime."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _judge_and_update(pdf, id_col, value_col, key_val, key, n, mean, m2,
                      cutoff, min_history):
    """Shared per-batch kernel: z vs prior history, then Welford update.
    Returns (rows, n, mean, m2)."""
    import math

    out = []
    pdf = pdf.sort_values(id_col)  # deterministic within-batch order
    for vid, v in zip(pdf[id_col], pdf[value_col]):
        v = float(v)
        if n >= min_history and m2 > 0:
            sd = math.sqrt(m2 / (n - 1))
            z = (v - mean) / sd
            spike = int(abs(z) > cutoff)
        else:
            z, spike = None, 0
        n += 1
        d = v - mean
        mean += d / n
        m2 += d * (v - mean)
        out.append((key_val, int(vid), v, z, spike))
    return out, n, mean, m2


def streaming_spike_flags(
    stream: DataFrame,
    key: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
    cutoff: float = 3.0,
    min_history: int = 5,
    api: str = "auto",
) -> DataFrame:
    """Flag per-key value spikes against running history.

    Emits (key, id, value, z, is_spike) per input row; ``z`` is null
    until ``min_history`` prior values exist for the key. ``api`` is
    ``"tws"``, ``"applyInPandas"``, or ``"auto"`` (tws when available).
    """
    if api == "auto":
        api = "tws" if tws_available() else "applyInPandas"
    if api == "tws":
        return _spike_flags_tws(
            stream, key, value_col, id_col, cutoff, min_history
        )
    return _spike_flags_gs(
        stream, key, value_col, id_col, cutoff, min_history
    )


def _spike_flags_gs(stream, key, value_col, id_col, cutoff, min_history):
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key_tuple, pdf_iter, state: GroupState):
        if state.exists:
            n, mean, m2 = state.get
        else:
            n, mean, m2 = 0, 0.0, 0.0
        rows = []
        for pdf in pdf_iter:
            out, n, mean, m2 = _judge_and_update(
                pdf, id_col, value_col, key_tuple[0], key, n, mean, m2,
                cutoff, min_history,
            )
            rows.extend(out)
        state.update((n, mean, m2))
        yield pd.DataFrame(
            rows, columns=[key, id_col, value_col, "z", "is_spike"]
        )

    return stream.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=SPIKE_OUTPUT_SCHEMA,
        stateStructType="n long, mean double, m2 double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _spike_flags_tws(stream, key, value_col, id_col, cutoff, min_history):
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SpikeProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._moments = handle.getValueState(
                "moments", "n long, mean double, m2 double"
            )

        def handleInputRows(self, key_tuple, rows, timerValues):
            if self._moments.exists():
                n, mean, m2 = self._moments.get()
            else:
                n, mean, m2 = 0, 0.0, 0.0
            collected = []
            for pdf in rows:
                out, n, mean, m2 = _judge_and_update(
                    pdf, id_col, value_col, key_tuple[0], key, n, mean, m2,
                    cutoff, min_history,
                )
                collected.extend(out)
            self._moments.update((n, mean, m2))
            yield pd.DataFrame(
                collected, columns=[key, id_col, value_col, "z", "is_spike"]
            )

        def close(self) -> None:
            pass

    return stream.groupBy(key).transformWithStateInPandas(
        statefulProcessor=SpikeProcessor(),
        outputStructType=SPIKE_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="None",
    )
