"""ORC + XML source coverage tests (queries/ingest.py s16/s17).
The oracle seals values; these pin the SCALE behaviors the
docstrings claim — partition pruning and ORC predicate pushdown in
the physical plan — and XML roundtrip fidelity including nulls."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _formatted_plan(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_orc_scan_prunes_partitions_and_pushes_predicates(spark):
    from neuroimaging_data_pipeline_spark.queries.ingest import (
        s16_orc_roundtrip,
    )

    plan = _formatted_plan(s16_orc_roundtrip(spark, SF))
    assert "PartitionFilters: [lang" in plan
    assert "GreaterThanOrEqual(n_chars,200)" in plan
    # column pruning: text never read
    assert "text" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_xml_roundtrip_preserves_rows_and_nulls(spark):
    root = os.path.join(tempfile.gettempdir(), "ndp_test_xml_rt")
    shutil.rmtree(root, ignore_errors=True)
    src = spark.createDataFrame(
        [(1, "en", 10), (2, None, 20), (3, "de", None)],
        "doc_id long, lang string, n_chars long",
    )
    src.write.format("xml").option("rowTag", "doc").save(root)
    back = spark.read.format("xml").option("rowTag", "doc").load(root)
    got = {
        (r["doc_id"], r["lang"], r["n_chars"])
        for r in back.collect()
    }
    assert got == {(1, "en", 10), (2, None, 20), (3, "de", None)}


def test_orc_roundtrip_row_fidelity(spark):
    root = os.path.join(tempfile.gettempdir(), "ndp_test_orc_rt")
    shutil.rmtree(root, ignore_errors=True)
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet")).select(
        "doc_id", "lang", "n_chars"
    )
    docs.write.partitionBy("lang").orc(root)
    back = spark.read.orc(root)
    assert back.count() == docs.count()
    a = docs.agg(F.sum("doc_id"), F.sum("n_chars")).collect()[0]
    b = back.agg(F.sum("doc_id"), F.sum("n_chars")).collect()[0]
    assert tuple(a) == tuple(b)
