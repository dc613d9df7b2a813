"""URL canonicalization rules (text/urls.py) pinned on literal
adversarial cases — each rule exercised in isolation and combined."""

from __future__ import annotations

import pytest

from neuroimaging_data_pipeline_spark.text.urls import canonical_url

CASES = [
    # case-folding of scheme and host, never of path
    ("HTTPS://WWW.Example.COM/Path", "https://www.example.com/Path"),
    # default ports dropped, non-default kept
    ("https://a.com:443/x", "https://a.com/x"),
    ("http://a.com:80/x", "http://a.com/x"),
    ("http://a.com:8080/x", "http://a.com:8080/x"),
    ("https://a.com:80/x", "https://a.com:80/x"),  # 80 is not https default
    # fragment dropped
    ("http://a.com/x#frag", "http://a.com/x"),
    # utm params dropped, others sorted; bare '?' dropped
    (
        "http://a.com/x?utm_source=tw&b=2&a=1&utm_campaign=c",
        "http://a.com/x?a=1&b=2",
    ),
    ("http://a.com/x?utm_source=tw", "http://a.com/x"),
    ("http://a.com/x?", "http://a.com/x"),
    # empty path -> '/', trailing slashes stripped except root
    ("http://a.com", "http://a.com/"),
    ("http://a.com/", "http://a.com/"),
    ("http://a.com/x/", "http://a.com/x"),
    ("http://a.com/x///", "http://a.com/x"),
    # query directly after host (no path)
    ("http://a.com?b=2&a=1", "http://a.com/?a=1&b=2"),
    # everything at once
    (
        "HtTpS://A.Com:443/p/q/?utm_x=1&z=9&a=0#sec",
        "https://a.com/p/q?a=0&z=9",
    ),
]


@pytest.mark.parametrize("raw,want", CASES)
def test_canonical_url_rules(spark, raw, want):
    row = (
        spark.createDataFrame([(raw,)], "url string")
        .select(canonical_url("url").alias("c"))
        .first()
    )
    assert row["c"] == want


def test_idempotent(spark):
    """Canonicalizing a canonical URL is a no-op."""
    canons = [want for _, want in CASES]
    df = spark.createDataFrame([(c,) for c in canons], "url string")
    got = [r["c"] for r in df.select(canonical_url("url").alias("c")).collect()]
    assert got == canons
