"""Canonical readers for the engine's parquet tables.

``read_table`` hides one storage wart: event-time columns arrive from
upstream writers in whatever precision/annotation the writer chose —
TIMESTAMP(NANOS) (older pandas default, illegal to Spark's reader
without a legacy conf), TIMESTAMP(MICROS) with isAdjustedToUTC=false
(modern pyarrow default, surfaced by Spark 3.4+/4.x as TIMESTAMP_NTZ),
or UTC-adjusted TIMESTAMP. The reader must work under ANY
caller-supplied SparkSession — including a vanilla
``SparkSession.builder.getOrCreate()`` with none of the engine's
session defaults — and must pin ONE output type regardless of which
session or which writer produced the file, so downstream schemas are
stable. The contract: every known event-time column comes back as
plain ``timestamp`` (TimestampType) with UTC session semantics.

Normalization, at call time:

1. ``spark.sql.legacy.parquet.nanosAsLong`` + UTC session timezone are
   runtime SQLConfs set before every read (idempotent). A NANOS column
   then surfaces as LongType; the footer probe (``_parquet_ts_unit``)
   tells us the physical unit so the long -> timestamp conversion never
   guesses.
2. TIMESTAMP_NTZ columns are cast to ``timestamp``. Session timezone
   is UTC, so wall-clock-as-UTC semantics are preserved bit-for-bit —
   identical values to what the long-ns path produced in rounds 1-2.
3. If the read throws ``PARQUET_TYPE_ILLEGAL`` (a Spark build where
   the legacy conf is absent/static and the file really is NANOS),
   fall back to a one-time pyarrow rewrite: cast ns -> us and cache
   the rewritten file under a temp dir keyed by source path + mtime.
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

# Event-time columns pinned to TimestampType per driver table
# (TESTDATA.md) — whatever precision/annotation the writer used.
_PINNED_TS_COLS: dict[str, list[str]] = {"events": ["ts"]}

# Multipliers to microseconds per parquet footer unit.
_UNIT_TO_MICROS: dict[str, int] = {"s": 1_000_000, "ms": 1_000, "us": 1}


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


def _parquet_ts_unit(path: str, col: str) -> tuple[str, bool] | None:
    """Probe a parquet footer for ``col``'s timestamp unit.

    Returns ``(unit, is_adjusted_to_utc)`` with unit in
    {'ns','us','ms','s'}, or None if the column isn't a timestamp (or
    the probe fails). Driver-side metadata read of ONE footer — O(KB)
    regardless of data size, so safe at 100 TB. ``path`` may be a file
    or a directory of part files (first part is probed; a well-formed
    dataset has one schema)."""
    try:
        import pyarrow.parquet as pq

        probe = path
        if os.path.isdir(path):
            parts = sorted(
                f for f in os.listdir(path)
                if f.endswith(".parquet") and not f.startswith(("_", "."))
            )
            if not parts:
                return None
            probe = os.path.join(path, parts[0])
        pf = pq.ParquetFile(probe)
        field = pf.schema_arrow.field(col)
        import pyarrow as pa

        if not pa.types.is_timestamp(field.type):
            return None
        # Legacy INT96 (Spark's own default writer format): pyarrow
        # surfaces it as timestamp[ns], but it is NOT readable as long
        # — report it distinctly so stream schemas declare
        # ``timestamp`` (Spark reads INT96 natively) instead of the
        # NANOS-as-long shape (r13: a Spark-written landing dir fed
        # back into stream_parquet_dir hit exactly this).
        for i in range(len(pf.schema)):
            leaf = pf.schema.column(i)
            if leaf.name == col and leaf.physical_type == "INT96":
                return "int96", True
        return field.type.unit, field.type.tz is not None
    except Exception:
        return None


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


# "auto" width: one task per this many source bytes (compressed
# parquet). Chosen by same-session A/B at sf0.1 (see BENCH_DELTA.md
# r7): light-parse queries over the 594 KB documents table are
# fastest at single-digit widths — 32 tasks of ~150 rows each pay
# more scheduler+Arrow-batch overhead than the parse costs. At real
# scale the source is already wider than bytes//target and the floor
# is a no-op, so this constant only matters for small inputs.
_AUTO_TARGET_BYTES = 64 * 1024


def _source_bytes(path: str) -> int:
    """On-disk size of a parquet file or directory of part files.
    Driver-side os.stat walk of ONE directory listing — O(#files),
    no data read, safe at any scale."""
    try:
        if os.path.isdir(path):
            return sum(
                e.stat().st_size
                for e in os.scandir(path)
                if e.is_file() and not e.name.startswith(("_", "."))
            )
        return os.path.getsize(path)
    except OSError:
        return 0


def read_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    min_partitions: int | str | None = None,
) -> DataFrame:
    """Read a driver table. ``min_partitions`` widens pathologically
    narrow inputs (a single-row-group parquet file arrives as ONE
    partition, serializing every downstream expression on one core —
    the driver's documents/embeddings tables are exactly that). The
    repartition is a no-op at real scale where the source is already
    wide, and a cheap shuffle of the small table when it isn't.
    Two symbolic widths, chosen by the call site's per-row work:

    - ``min_partitions="cores"`` resolves to the session's
      defaultParallelism — the right floor for CPU-BOUND per-row work
      (codec decode, LSH hashing, OLS): a fixed literal either leaves
      cores idle locally (8 on a 32-thread pool ran the codec family
      ~2x slow) or over-shards a small cluster; the scheduler's own
      width does neither.
    - ``min_partitions="auto"`` resolves to
      ``clamp(source_bytes // 64 KiB, 1, defaultParallelism)`` — the
      right floor for LIGHT parse/scan work (metadata probes, jsonl
      shard listing, string ops), where the r6 uniform "cores" policy
      made ~8 sub-second queries 1.5-1.9x slower at sf0.1: 5000-row
      fixtures spread 32 ways pay task overhead per partition that the
      parse itself never amortizes (VERDICT r6 "What's wrong" #2).

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
    if min_partitions == "cores":
        min_partitions = spark.sparkContext.defaultParallelism
    elif min_partitions == "auto":
        min_partitions = min(
            spark.sparkContext.defaultParallelism,
            max(1, _source_bytes(path) // _AUTO_TARGET_BYTES),
        )
    if min_partitions and df.rdd.getNumPartitions() < min_partitions:
        df = df.repartition(min_partitions)
    for c in _PINNED_TS_COLS.get(name, []):
        df = pin_timestamp(df, c, source_path=path)
    return df


def pin_timestamp(df: DataFrame, c: str, source_path: str | None = None) -> DataFrame:
    """Normalize column ``c`` to plain ``timestamp`` (TimestampType),
    whatever the reader produced:

    - ``timestamp_ntz`` (modern MICROS/MILLIS isAdjustedToUTC=false
      files): cast — session tz is UTC, so wall-clock == instant.
    - ``bigint`` (NANOS files read under nanosAsLong, or a forced-long
      schema): the unit comes from the parquet footer via
      ``_parquet_ts_unit`` when ``source_path`` is given, NOT guessed.
      Fallback without a footer is ns (the only case Spark surfaces as
      long uninstructed). Integer ``div``, not ``/``: double division
      of an ~1.7e18 ns epoch loses low bits (ulp 256 ns) and can flip
      the microsecond, breaking bit-exact oracle comparison.
    - ``timestamp`` already: no-op.
    """
    field = df.schema[c] if c in df.columns else None
    if field is None:
        return df
    dtype = field.dataType.simpleString()
    if dtype == "timestamp_ntz":
        return df.withColumn(c, F.col(c).cast("timestamp"))
    if dtype == "bigint":
        unit = "ns"
        if source_path is not None:
            probed = _parquet_ts_unit(source_path, c)
            if probed is not None:
                unit = probed[0]
        if unit in ("ns", "int96"):
            # int96 can't actually surface as bigint (Spark maps it to
            # TimestampType and the no-op branch above wins); treat
            # like ns defensively rather than KeyError.
            expr = F.expr(f"`{c}` div 1000")
        else:
            expr = F.expr(f"`{c}` * {_UNIT_TO_MICROS[unit]}")
        return df.withColumn(c, F.timestamp_micros(expr))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: list[str]) -> None:
    for n in names:
        read_table(spark, sf_dir, n).createOrReplaceTempView(n)
