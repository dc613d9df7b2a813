"""Arrow IPC shard source (sources/arrow_ipc.py): multi-batch
framing, schema verification, truncation behavior."""

from __future__ import annotations

import pyarrow as pa
import pytest

from neuroimaging_data_pipeline_spark.sources.arrow_ipc import (
    _SCHEMA,
    read_ipc_stream,
    write_ipc_stream,
)


def _table(n: int) -> pa.Table:
    return pa.Table.from_arrays(
        [
            pa.array(range(n), pa.int64()),
            pa.array(["en"] * n, pa.string()),
            pa.array([5] * n, pa.int64()),
            pa.array([f"text {i}" for i in range(n)], pa.string()),
        ],
        schema=_SCHEMA,
    )


def test_roundtrip_and_batch_count():
    t = _table(40)  # 16 + 16 + 8
    buf = write_ipc_stream(t)
    back, n_batches = read_ipc_stream(buf)
    assert back.equals(t)
    assert n_batches == 3


def test_schema_is_verified():
    wrong = pa.Table.from_arrays(
        [pa.array([1], pa.int64())], names=["only_col"]
    )
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, wrong.schema) as w:
        w.write_table(wrong)
    with pytest.raises(ValueError, match="unexpected IPC schema"):
        read_ipc_stream(sink.getvalue().to_pybytes())


def test_truncated_stream_raises():
    buf = write_ipc_stream(_table(40))
    with pytest.raises(Exception):
        read_ipc_stream(buf[: len(buf) // 2])
