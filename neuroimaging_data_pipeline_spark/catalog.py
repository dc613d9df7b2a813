"""BIDS-style file catalog (SURVEY.md S2, S3, D6, F-6).

Reference: ``BIDSLayout(dir)`` + ``layout.get(subject=…, task=…,
suffix=…, extension=…, return_type='file')`` (ssm_loop.py:34,40,60,72)
— an entity-indexed file inventory where entities are encoded in paths
(``sub-004_task-MID_space-MIITRA_bold.nii.gz``).

Spark-first: one distributed file listing -> a ``catalog`` DataFrame
with entities regexp-extracted from the path; ``layout.get(**f)`` is a
plain ``.filter``. At 100 TB (millions of files on object storage) the
listing itself is the parallel step: ``binaryFile`` scan of paths-only
or an inventory table; everything downstream is a broadcastable dim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# entity -> path regex (public BIDS entity spec encoding)
ENTITY_PATTERNS: dict[str, str] = {
    "subject": r"sub-([a-zA-Z0-9]+)",
    "session": r"ses-([a-zA-Z0-9]+)",
    "task": r"task-([a-zA-Z0-9]+)",
    "run": r"run-([0-9]+)",
    "space": r"space-([a-zA-Z0-9]+)",
    "desc": r"desc-([a-zA-Z0-9]+)",
}
SUFFIX_PATTERN = r"_([a-zA-Z0-9]+)\.([a-z.]+)$"


def extract_entities(path: Column) -> list[Column]:
    cols = [
        F.nullif(F.regexp_extract(path, pat, 1), F.lit("")).alias(name)
        for name, pat in ENTITY_PATTERNS.items()
    ]
    cols.append(
        F.nullif(F.regexp_extract(path, SUFFIX_PATTERN, 1), F.lit("")).alias("suffix")
    )
    cols.append(
        F.nullif(
            F.concat(F.lit("."), F.regexp_extract(path, SUFFIX_PATTERN, 2)),
            F.lit("."),
        ).alias("extension")
    )
    cols.append(
        F.when(path.contains("/derivatives/"), "derivatives")
        .otherwise("raw")
        .alias("scope")
    )
    return cols


def build_catalog(spark: SparkSession, root_glob: str) -> DataFrame:
    """Distributed listing -> entity catalog. Uses the binaryFile source
    for path+size metadata without reading file bodies (dataFilter
    prunes content columns at scan)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*")
        .load(root_glob)
        .select(F.col("path"), F.col("length"))
    )
    return files.select(
        "path", "length", *extract_entities(F.col("path"))
    )


def catalog_from_paths(spark: SparkSession, paths: list[str]) -> DataFrame:
    df = spark.createDataFrame([(p,) for p in paths], "path string")
    return df.select("path", *extract_entities(F.col("path")))


def layout_get(catalog: DataFrame, **filters) -> DataFrame:
    """``layout.get(subject='004', suffix='bold', ...)`` analog."""
    out = catalog
    for k, v in filters.items():
        if isinstance(v, (list, tuple)):
            out = out.filter(F.col(k).isin(list(v)))
        else:
            out = out.filter(F.col(k) == v)
    return out
