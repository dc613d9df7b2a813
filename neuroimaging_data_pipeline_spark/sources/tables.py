"""Canonical readers for the engine's parquet tables.

``read_table`` hides one storage wart: Parquet TIMESTAMP(NANOS)
columns (pandas default when writing ns-resolution timestamps) are
illegal to Spark's reader. With ``spark.sql.legacy.parquet.nanosAsLong``
(set in session defaults) they surface as LongType nanoseconds; this
reader converts them back to proper timestamps so downstream operators
see uniform TIMESTAMP semantics across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Known ns-timestamp columns per driver table (TESTDATA.md).
_NS_TS_COLS: dict[str, list[str]] = {"events": ["ts"]}


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
    wide, and a cheap shuffle of the small table when it isn't."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if min_partitions and df.rdd.getNumPartitions() < min_partitions:
        df = df.repartition(min_partitions)
    for c in _NS_TS_COLS.get(name, []):
        field = df.schema[c] if c in df.columns else None
        if field is not None and field.dataType.simpleString() == "bigint":
            # ns since epoch -> microseconds -> timestamp (UTC session tz)
            df = df.withColumn(
                c, F.timestamp_micros((F.col(c) / 1000).cast("long"))
            )
    return df


def register_views(spark: SparkSession, sf_dir: str, names: list[str]) -> None:
    for n in names:
        read_table(spark, sf_dir, n).createOrReplaceTempView(n)
