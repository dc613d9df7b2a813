"""Arrow IPC stream-format shards (Feather v2's wire format) — the
zero-copy interchange format of the Arrow ecosystem, read and written
with the pyarrow that Spark itself ships for its Arrow exchange (a
sanctioned dependency here, unlike the absent spark-avro jar — the
from-scratch sibling is sources/avro_ocf.py).

Pipeline value: ML feature stores and dataloaders hand shards around
as Arrow IPC streams; this source packs documents into multi-batch
IPC streams (one keyed shuffle) and reads them back inside Arrow
``mapInPandas`` workers — the bytes never leave the Arrow memory
model, so the decode path is genuinely zero-copy per batch.

Integrity: the reader re-verifies each stream's schema against the
expected one and counts batches; a truncated stream raises inside
pyarrow and the count cross-check catches silently short shards.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyarrow as pa
import pyarrow.ipc as pa_ipc
from pyspark.sql import DataFrame

_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("lang", pa.string()),
        ("n_chars", pa.int64()),
        ("text", pa.string()),
    ]
)

_ROWS_PER_BATCH = 16


def write_ipc_stream(table: pa.Table) -> bytes:
    sink = pa.BufferOutputStream()
    with pa_ipc.new_stream(sink, table.schema) as writer:
        for batch in table.to_batches(max_chunksize=_ROWS_PER_BATCH):
            writer.write_batch(batch)
    return sink.getvalue().to_pybytes()


def read_ipc_stream(buf: bytes) -> tuple[pa.Table, int]:
    """Returns (table, n_batches); schema is verified against the
    document shard schema."""
    with pa_ipc.open_stream(pa.BufferReader(buf)) as reader:
        if not reader.schema.equals(_SCHEMA):
            raise ValueError(
                f"unexpected IPC schema: {reader.schema!r}"
            )
        batches = list(reader)
    return pa.Table.from_batches(batches, schema=_SCHEMA), len(batches)


# --- Spark surface ---------------------------------------------------------------


def synthesize_ipc_shards(
    docs: DataFrame,
    id_col: str = "doc_id",
    docs_per_shard: int = 64,
) -> DataFrame:
    out_schema = "shard_id long, content binary"

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        shard_id = int(pdf["_shard"].iloc[0])
        table = pa.Table.from_arrays(
            [
                pa.array(pdf[id_col].astype("int64")),
                pa.array(pdf["lang"], pa.string()),
                pa.array(pdf["n_chars"].astype("int64")),
                pa.array(pdf["text"], pa.string()),
            ],
            schema=_SCHEMA,
        )
        return pd.DataFrame(
            {"shard_id": [shard_id], "content": [write_ipc_stream(table)]}
        )

    from pyspark.sql import functions as F

    keyed = docs.select(
        id_col, "lang", "n_chars", "text",
        (F.col(id_col) / docs_per_shard).cast("long").alias("_shard"),
    )
    return keyed.groupBy("_shard").applyInPandas(build, out_schema)


def ipc_documents(
    shards: DataFrame,
    content_col: str = "content",
) -> DataFrame:
    """Decode IPC shards to document rows, carrying the shard's batch
    count on every row so the multi-batch framing is oracle-visible
    (ceil(rows/16) per shard by construction)."""
    out_schema = (
        "doc_id long, lang string, n_chars long, "
        "text_md5 string, n_batches int"
    )

    def parse_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for content in pdf[content_col]:
                table, n_batches = read_ipc_stream(content)
                tdf = table.to_pandas()
                tdf["text_md5"] = [
                    hashlib.md5(t.encode()).hexdigest() for t in tdf["text"]
                ]
                tdf["n_batches"] = n_batches
                frames.append(tdf.drop(columns=["text"]))
            out = pd.concat(frames, ignore_index=True)
            out["n_batches"] = out["n_batches"].astype("int32")
            yield out[
                ["doc_id", "lang", "n_chars", "text_md5", "n_batches"]
            ]

    return shards.mapInPandas(parse_batches, out_schema)
