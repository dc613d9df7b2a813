"""Explicit key-salting for skewed equi-joins.

AQE's skew-join handling (spark.sql.adaptive.skewJoin) splits
oversized partitions at runtime, but it only fires for sort-merge
joins after a shuffle is already materialized, and it cannot help a
streaming stateful join or a deliberately-bucketed layout. Salting is
the PLANNED fix: replicate the small-but-not-broadcastable side S
ways, spread the big side's hot-key rows across S sub-keys with a
deterministic hash of a per-row discriminator, and join on
(keys..., salt). Every hot key's rows now land in S tasks instead of
one; results are IDENTICAL to the plain join because each big-side
row still meets every copy of its key's match exactly once.

Deterministic discipline: salt = md5-slice of the discriminator
column mod S (the repo hash family) — the oracle doesn't need to see
the salt at all (results equal the plain join; the pytest pins both
that equality and the salted physical shape).

Cost model: replication multiplies the SMALL side by S (its rows
must be << big side / S for salting to pay); the big side gains one
cheap column. The right S is ceil(hot-key rows / target partition
rows) — 8 here is demonstration-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_equi_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    discriminator: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` (skewed on ``keys``) with ``small`` on ``keys``
    via ``n_salt``-way salting. ``discriminator`` is any big-side
    column whose values spread within a hot key (an event id, an
    offset — NOT the join key itself).

    Only ``how`` in {"inner", "left"} is supported: the small side is
    replicated ``n_salt`` ways, so right/full-outer would surface each
    unmatched small-side row once per replica — a silent contract
    break rather than a plain-join equivalent.

    NULL discriminators are salted to a sentinel bucket (coalesce
    before hashing) so those rows still meet their key's replica —
    without this, md5(NULL) is NULL and the rows silently drop under
    inner / null-extend under left.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_equi_join supports how='inner'/'left' only, got {how!r}: "
            "the exploded small side would duplicate unmatched rows "
            f"{n_salt}x under right/full outer joins"
        )
    disc = F.coalesce(F.col(discriminator).cast("string"), F.lit("\x00null\x00"))
    salt = (
        F.conv(F.substring(F.md5(F.concat(F.lit("salt:"), disc)), 1, 4), 16, 10)
        .cast("long")
        % F.lit(n_salt)
    ).cast("int")
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return b.join(s, keys + ["_salt"], how).drop("_salt")
