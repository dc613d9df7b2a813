"""URL canonicalization — the key-normalization step of crawl dedup.

Web-crawl corpora (Common-Crawl-style) dedup first by URL, and raw
URLs hide the same resource behind case differences, default ports,
tracking parameters, parameter order, fragments, and trailing
slashes. ``canonical_url`` collapses those, with the standard rules:

- scheme and host lowercased;
- default port dropped (``:443`` for https, ``:80`` for http), other
  ports kept;
- fragment dropped;
- ``utm_*`` tracking parameters dropped; remaining query parameters
  sorted bytewise so parameter order cannot split a group;
- empty path -> ``/``; trailing slashes stripped (except the bare
  root).

Everything is pure built-in column expressions (regexp/split/filter/
array_sort) — JVM-side, map-only, zero shuffle; the canonical key
then feeds the same hash-groupBy dedup as content hashes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"


def canonical_url(url) -> Column:
    """Canonical form of a URL column (see module docstring)."""
    url = F.col(url) if isinstance(url, str) else url
    nofrag = F.regexp_replace(url, "#.*", "")
    scheme = F.lower(F.regexp_extract(nofrag, _SCHEME_RE, 1))
    rest = F.regexp_replace(nofrag, _SCHEME_RE, "")
    hostport = F.substring_index(F.substring_index(rest, "/", 1), "?", 1)
    pathq = F.substring(rest, F.length(hostport) + 1, F.lit(1 << 30))
    host = F.lower(F.substring_index(hostport, ":", 1))
    has_port = hostport.contains(":")
    port = F.when(has_port, F.substring_index(hostport, ":", -1)).otherwise(
        F.lit("")
    )
    default_port = (
        (port == "")
        | ((scheme == "https") & (port == "443"))
        | ((scheme == "http") & (port == "80"))
    )
    portpart = F.when(default_port, F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )
    path = F.substring_index(pathq, "?", 1)
    query = F.when(
        pathq.contains("?"),
        F.substring(
            pathq, F.length(path) + 2, F.lit(1 << 30)
        ),
    ).otherwise(F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & (~p.startswith("utm_")),
    )
    qcanon = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&")),
    ).otherwise(F.lit(""))
    stripped = F.regexp_replace(path, "/+$", "")
    pathn = F.when(stripped == "", F.lit("/")).otherwise(stripped)
    return F.concat(scheme, F.lit("://"), host, portpart, pathn, qcanon)
