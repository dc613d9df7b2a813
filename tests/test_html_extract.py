"""HTML tag-strip + boilerplate extraction (text/html.py): exact
clean-text pinning on a real-page-shaped fixture, entity decode
ordering, link-density boilerplate verdicts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.text.html import (
    anchor_text_chars,
    decode_entities,
    is_boilerplate,
    link_density,
    markup_ratio,
    n_links,
    strip_html,
)

PAGE = """<!DOCTYPE html>
<html lang="en">
<head>
  <meta charset="utf-8">
  <title>Release notes &amp; changelog</title>
  <script type="text/javascript">
    // tracker: if (a < b && c > d) { track("<div>"); }
    var config = {"key": "value"};
  </script>
  <style>
    body { margin: 0; }
    .nav > a:hover { color: red; }
  </style>
</head>
<body>
  <!-- header boilerplate
       spans multiple lines -->
  <nav class="top"><a href="/">Home</a> <a href="/docs">Docs</a></nav>
  <div id="main">
    <h1>Version 2.0</h1>
    <p>Faster &quot;shuffles&quot; &nbsp; and&#39;s &lt;broadcast&gt; joins.</p>
    <p>See the <a href="/migration">migration guide</a> for details.</p>
  </div>
  <footer>&copy; example</footer>
</body>
</html>"""

EXPECT_CLEAN = (
    'Release notes & changelog Home Docs Version 2.0 Faster "shuffles" '
    "and's <broadcast> joins. See the migration guide for details. "
    "&copy; example"
)


@pytest.fixture(scope="module")
def page_df(spark):
    return spark.createDataFrame([(1, PAGE)], "id int, html string")


def test_strip_html_real_page_exact(page_df):
    """Scripts (with < > { } quotes inside), styles, multi-line
    comments, and tags all drop; entities decode; whitespace
    collapses — pinned to the exact expected string."""
    got = page_df.select(strip_html("html").alias("c")).first().c
    assert got == EXPECT_CLEAN


def test_link_features_real_page(page_df):
    r = page_df.select(
        n_links("html").alias("n"),
        anchor_text_chars("html").alias("chars"),
        F.round(link_density("html"), 6).alias("dens"),
        F.round(markup_ratio("html"), 6).alias("markup"),
        is_boilerplate("html").alias("boiler"),
    ).first()
    # Home(4) + Docs(4) + "migration guide"(15)
    assert r.n == 3 and r.chars == 23
    assert r.dens == round(23 / len(EXPECT_CLEAN), 6)
    assert 0.5 < r.markup < 1.0
    assert r.boiler is False


def test_boilerplate_verdict_link_farm(spark):
    farm = (
        "<body><nav>"
        + " ".join(f'<a href="/p{i}">Section {i}</a>' for i in range(12))
        + "</nav><p>ok</p></body>"
    )
    df = spark.createDataFrame(
        [(1, farm), (2, "<p>A long enough plain paragraph of prose with "
                        'one <a href="/x">tiny</a> link in it.</p>'),
         (3, None), (4, "")],
        "id int, html string",
    )
    got = {r.id: r.b for r in df.select(
        "id", is_boilerplate("html").alias("b")).collect()}
    assert got == {1: True, 2: False, 3: False, 4: False}


def test_entity_decode_single_pass(spark):
    """&amp; decodes LAST: double-escaped input loses exactly one
    escape level, it does not collapse two."""
    df = spark.createDataFrame([("&amp;lt;b&amp;gt; &amp;amp; x",)], "s string")
    assert df.select(decode_entities("s").alias("d")).first().d == "&lt;b&gt; &amp; x"


def test_strip_html_null_and_empty(spark):
    df = spark.createDataFrame([(1, None), (2, ""), (3, "   ")],
                               "id int, html string")
    rows = {r.id: (r.c, r.m) for r in df.select(
        "id", strip_html("html").alias("c"),
        markup_ratio("html").alias("m")).collect()}
    assert rows[1] == (None, None)
    assert rows[2] == ("", None)  # 0/0 -> NULL under try_divide
    assert rows[3][0] == ""
