"""HTML tag-stripping + boilerplate-density extraction — the web-corpus
ingest stage upstream of every text operator in this package (lang-ID,
quality scoring, dedup all assume clean text columns).

All pure Column expressions over built-in regexp/replace functions —
JVM-side, codegen-friendly, zero Python in the hot path; at 100 TB this
is one narrow pass over the raw-page scan, no shuffle. Patterns are
deliberately RE2-compatible (no backreferences, no lookarounds) so the
DuckDB oracle can express the identical semantics.

No reference analog (the reference ingests TSV/NIfTI, ssm_loop.py:41);
engine-addition scope per SURVEY.md §2 / VERDICT r5 missing #1.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: entity decode table, applied in order — ``&amp;`` LAST so that
#: double-escaped input (``&amp;lt;``) decodes one level per pass,
#: never two.
ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

_COMMENT = r"(?s)<!--.*?-->"
_SCRIPT = r"(?s)<script[^>]*>.*?</script\s*>"
_STYLE = r"(?s)<style[^>]*>.*?</style\s*>"
_TAG = r"<[^>]+>"
_ANCHOR_TEXT = r"(?s)<a[^>]*>(.*?)</a>"
_ANCHOR_OPEN = r"<a[\s>]"


def _c(text: str | Column) -> Column:
    return F.col(text) if isinstance(text, str) else text


def decode_entities(text: str | Column) -> Column:
    c = _c(text)
    for ent, ch in ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def strip_html(text: str | Column) -> Column:
    """Clean visible text from raw HTML: drop comments and
    script/style blocks (content included), replace every remaining
    tag with a space, decode the common entities, collapse
    whitespace. Block boundaries become single spaces, so words never
    fuse across tags."""
    c = _c(text)
    c = F.regexp_replace(c, _COMMENT, " ")
    c = F.regexp_replace(c, _SCRIPT, " ")
    c = F.regexp_replace(c, _STYLE, " ")
    c = F.regexp_replace(c, _TAG, " ")
    c = decode_entities(c)
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def anchor_text_chars(text: str | Column) -> Column:
    """Total characters of text inside ``<a>...</a>`` pairs (tags and
    entities inside the anchor count as written — the signal is
    relative, boilerplate nav bars dominate either way)."""
    frags = F.regexp_extract_all(_c(text), F.lit(_ANCHOR_TEXT), 1)
    return F.coalesce(
        F.aggregate(
            F.transform(frags, F.length),
            F.lit(0),
            lambda acc, n: acc + n,
        ),
        F.lit(0),
    )


def n_links(text: str | Column) -> Column:
    return F.size(F.regexp_extract_all(_c(text), F.lit(_ANCHOR_OPEN), 0))


def link_density(text: str | Column) -> Column:
    """Anchor-text chars / clean-text chars — the classic
    boilerplate-density signal (nav/footer link farms score near 1,
    article prose near 0). NULL when the page has no visible text."""
    return F.try_divide(anchor_text_chars(text), F.length(strip_html(text)))


def markup_ratio(text: str | Column) -> Column:
    """Fraction of raw bytes that stripping removed (tags + scripts +
    collapsed whitespace). NULL on empty input."""
    c = _c(text)
    return F.try_divide(
        F.length(c) - F.length(strip_html(c)), F.length(c)
    )


def is_boilerplate(text: str | Column, max_link_density: float = 0.25) -> Column:
    """Page-level keep/drop verdict: link-farm pages (link density
    above the threshold) are boilerplate."""
    return F.coalesce(
        link_density(text) > F.lit(max_link_density), F.lit(False)
    )
