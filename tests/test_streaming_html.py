"""Streaming x text-ingest composition: the HTML extraction operators
(text/html.py) running inside a live Structured Streaming pipeline —
readStream over a landing directory of raw-page parquet shards, pure
JVM column expressions, results identical to the batch path.

This is the continuously-ingesting web-corpus shape: crawled page
shards land, the same narrow tag-strip plan picks them up, and the
extraction boundary is identical between batch and stream (no state,
no watermark needed — a stateless map stage)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.text.html import (
    is_boilerplate,
    link_density,
    strip_html,
)

PAGE_SCHEMA = "page_id long, html string"


def _extract(df):
    return df.select(
        "page_id",
        strip_html("html").alias("clean"),
        F.round(F.coalesce(link_density("html"), F.lit(0.0)), 6).alias("lf"),
        is_boilerplate("html").alias("boiler"),
    )


@pytest.fixture()
def page_landing(spark, tmp_path):
    rows = []
    for i in range(24):
        body = f"<p>Document {i} body &amp; prose text that is long enough.</p>"
        nav = (
            "<nav>" + " ".join(f'<a href="/s{j}">Sec {j}</a>' for j in range(10))
            + "</nav>"
            if i % 4 == 0
            else ""
        )
        rows.append(
            (i, f"<html><script>var x={i};</script>{nav}"
                f"<!-- c{i} -->{body}</html>")
        )
    df = spark.createDataFrame(rows, PAGE_SCHEMA)
    landing = tmp_path / "landing"
    df.filter("page_id < 12").coalesce(1).write.mode("append").parquet(
        str(landing)
    )
    df.filter("page_id >= 12").coalesce(1).write.mode("append").parquet(
        str(landing)
    )
    return landing, df


def test_stream_html_extract_matches_batch(spark, page_landing):
    landing, pages = page_landing
    stream = (
        spark.readStream.schema(PAGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # forces multi-microbatch
        .parquet(str(landing))
    )
    q = (
        _extract(stream)
        .writeStream.format("memory")
        .queryName("html_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    live = {
        r.page_id: (r.clean, r.lf, r.boiler)
        for r in spark.sql("select * from html_stream").collect()
    }
    batch = {
        r.page_id: (r.clean, r.lf, r.boiler)
        for r in _extract(spark.read.parquet(str(landing))).collect()
    }
    assert live == batch and len(live) == 24
    # the nav-heavy pages (page_id % 4 == 0) are flagged, prose is not
    assert all(live[i][2] == (i % 4 == 0) for i in live)
