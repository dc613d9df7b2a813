"""Canonical readers for the engine's parquet tables.

``read_table`` hides one storage wart: Parquet TIMESTAMP(NANOS)
columns (pandas default when writing ns-resolution timestamps) are
illegal to Spark's reader out of the box. The reader must work under
ANY caller-supplied SparkSession — including a vanilla
``SparkSession.builder.getOrCreate()`` with none of the engine's
session defaults — so the ns handling happens here, at call time:

1. ``spark.sql.legacy.parquet.nanosAsLong`` is a runtime SQLConf; we
   set it (plus a UTC session timezone, so timestamp rendering matches
   the naive-ns values other engines read) before every parquet read.
   Nanos columns then surface as LongType and are normalized back to
   proper TIMESTAMP columns below.
2. If the read still throws ``PARQUET_TYPE_ILLEGAL`` (a Spark build
   where the legacy conf is absent/static), fall back to a one-time
   pyarrow rewrite: cast ns -> us and cache the rewritten file under a
   temp dir keyed by source path + mtime, then scan that with Spark.
   The rewrite touches only small dimension-scale inputs in practice;
   at cluster scale the conf path is the one that runs, keeping scans
   fully distributed.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

# Known ns-timestamp columns per driver table (TESTDATA.md).
_NS_TS_COLS: dict[str, list[str]] = {"events": ["ts"]}


def _ensure_read_confs(spark: SparkSession) -> None:
    """Make any session able to read ns-timestamp parquet.

    Both are runtime SQLConfs (verified settable post-launch on Spark
    4.x); idempotent, so calling per-read is free.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # unknown conf on some build -> pyarrow fallback covers it
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass


def _pyarrow_rewrite(path: str) -> str:
    """Rewrite a ns-timestamp parquet file with us precision, cached."""
    import pyarrow.compute  # noqa: F401
    import pyarrow.parquet as pq
    import pyarrow as pa

    # Stable, collision-resistant cache key: builtin hash() of a str is
    # randomized per process (PYTHONHASHSEED), which would orphan one
    # cache file per run; st_mtime_ns + size also beats 1-second mtime
    # resolution for same-second overwrites.
    import hashlib

    st = os.stat(path)
    key = hashlib.sha256(
        f"{os.path.abspath(path)}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:32]
    out = os.path.join(
        tempfile.gettempdir(), "ndp_spark_ns_cache", f"{key}.parquet"
    )
    if not os.path.exists(out):
        os.makedirs(os.path.dirname(out), exist_ok=True)
        table = pq.read_table(path)
        fields = []
        for field in table.schema:
            if pa.types.is_timestamp(field.type) and field.type.unit == "ns":
                fields.append(pa.field(field.name, pa.timestamp("us")))
            else:
                fields.append(field)
        # safe=False: ns -> us truncates sub-microsecond digits, exactly
        # like the `div 1000` normalization on the conf path below.
        table = table.cast(pa.schema(fields), safe=False)
        tmp = out + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, out)
    return out


def read_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    min_partitions: int | None = None,
) -> DataFrame:
    """Read a driver table. ``min_partitions`` widens pathologically
    narrow inputs (a single-row-group parquet file arrives as ONE
    partition, serializing every downstream expression on one core —
    the driver's documents/embeddings tables are exactly that). The
    repartition is a no-op at real scale where the source is already
    wide, and a cheap shuffle of the small table when it isn't.

    SESSION SIDE EFFECT (deliberate, persistent): this call sets
    ``spark.sql.session.timeZone=UTC`` and
    ``spark.sql.legacy.parquet.nanosAsLong=true`` on the caller's
    session and does NOT restore them. Every engine query and oracle
    comparison is defined against UTC timestamp semantics, and results
    must stay UTC-stable for DataFrames *consumed after* read_table
    returns — a save/restore would silently re-render those lazily
    evaluated timestamps in the caller's original zone. Callers that
    need a different session timezone for unrelated work must set it
    back themselves."""
    _ensure_read_confs(spark)
    path = f"{sf_dir}/{name}.parquet"
    try:
        df = spark.read.parquet(path)
        # Force analysis so PARQUET_TYPE_ILLEGAL surfaces here, not at
        # first downstream action.
        _ = df.schema
    except AnalysisException as e:
        if "PARQUET_TYPE_ILLEGAL" not in str(e):
            raise
        df = spark.read.parquet(_pyarrow_rewrite(path))
    if min_partitions and df.rdd.getNumPartitions() < min_partitions:
        df = df.repartition(min_partitions)
    for c in _NS_TS_COLS.get(name, []):
        field = df.schema[c] if c in df.columns else None
        if field is not None and field.dataType.simpleString() == "bigint":
            # ns since epoch -> microseconds -> timestamp (UTC session tz).
            # Integer `div`, not `/`: double division of an ~1.7e18 ns
            # epoch loses low bits (ulp 256 ns) and can flip the
            # microsecond, breaking bit-exact oracle comparison.
            df = df.withColumn(
                c, F.timestamp_micros(F.expr(f"`{c}` div 1000"))
            )
    return df


def register_views(spark: SparkSession, sf_dir: str, names: list[str]) -> None:
    for n in names:
        read_table(spark, sf_dir, n).createOrReplaceTempView(n)
