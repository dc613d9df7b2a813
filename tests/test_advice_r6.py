"""Round-6 ADVICE fixes pinned: null-safe salting + outer-join guard,
NULL-propagating incremental sum merge, short-palette GIF padding,
name-anchored streaming offsets in the custom DataSource."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.operators.salting import salted_equi_join


def test_salted_join_null_discriminator_rows_survive(spark):
    """A NULL discriminator must salt to a sentinel bucket, not to a
    NULL salt that silently drops the row (inner) or null-extends it
    despite a matching key (left)."""
    fact = spark.range(50).select(
        F.when(F.col("id") % 5 == 0, F.lit(None)).otherwise(F.col("id")).alias("fid"),
        (F.col("id") % 3).alias("k"),
    )
    dim = spark.range(3).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("p")
    )
    for how in ("inner", "left"):
        got = salted_equi_join(fact, dim, ["k"], "fid", n_salt=4, how=how)
        assert got.count() == 50
        # every row matched: no null-extended payloads anywhere
        assert got.filter(F.col("p").isNull()).count() == 0


def test_salted_join_rejects_outer_hows(spark):
    fact = spark.range(10).select(F.col("id").alias("fid"), F.lit(0).alias("k"))
    dim = spark.range(2).select(F.col("id").alias("k"), F.col("id").alias("p"))
    for how in ("right", "full", "full_outer"):
        with pytest.raises(ValueError, match="inner.*left"):
            salted_equi_join(fact, dim, ["k"], "fid", how=how)


def test_salted_join_degenerate_n_salt_1(spark):
    """n_salt=1 degrades to the plain join exactly (VERDICT r5 #8)."""
    fact = spark.range(200).select(
        F.col("id").alias("fid"), (F.col("id") % 7).alias("k")
    )
    dim = spark.range(5).select(F.col("id").alias("k"), (F.col("id") * 3).alias("p"))
    plain = {tuple(r) for r in fact.join(dim, "k").select("k", "fid", "p").collect()}
    salted = {
        tuple(r)
        for r in salted_equi_join(fact, dim, ["k"], "fid", n_salt=1)
        .select("k", "fid", "p")
        .collect()
    }
    assert plain == salted


def test_incremental_sum_all_null_group_stays_null(spark):
    """A group whose measure is NULL in every batch must refresh to a
    NULL sum (matching a full recompute), not to 0."""
    from neuroimaging_data_pipeline_spark.operators.incremental import (
        agg_state,
        refresh,
    )

    # key 0: always-NULL measure; key 1: NULL in history, value in
    # delta; key 2: value in history, NULL in delta; key 3: only in
    # delta, NULL there
    hist = spark.createDataFrame(
        [(0, None), (1, None), (2, 10)], "k int, x int"
    )
    delta = spark.createDataFrame(
        [(0, None), (1, 5), (2, None), (3, None)], "k int, x int"
    )
    measures = {"n": ("count", ""), "sx": ("sum", "x")}
    state = refresh(agg_state(hist, ["k"], measures), delta, ["k"], measures)
    want = {
        tuple(r)
        for r in agg_state(hist.union(delta), ["k"], measures).collect()
    }
    got = {tuple(r) for r in state.collect()}
    assert got == want
    by_key = {r.k: r.sx for r in state.collect()}
    assert by_key[0] is None and by_key[3] is None
    assert by_key[1] == 5 and by_key[2] == 10


def test_gif_two_entry_palettes_roundtrip():
    """A 2-entry palette sits under the bits>=2 floor: the descriptor
    declares a 4-entry table, so the writer must pad the written
    triples to match — global and LOCAL tables both."""
    from neuroimaging_data_pipeline_spark.multimodal.gif import (
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 2, (7, 11)).astype(np.uint8) for _ in range(2)]
    pal2 = [(0, 0, 0), (255, 255, 255)]
    g = decode_gif(encode_gif(frames, pal2))
    assert g["palette"][:2] == pal2
    for a, (_, b) in zip(frames, g["frames"]):
        assert (a == b).all()
    # 2-entry LOCAL table on the second frame
    lct = [(10, 20, 30), (200, 100, 50)]
    g2 = decode_gif(encode_gif(frames, pal2, local_palettes=[None, lct]))
    for a, (_, b) in zip(frames, g2["frames"]):
        assert (a == b).all()


def test_stream_offsets_name_anchored(tmp_path):
    """Offsets checkpoint the last-consumed FILENAME: a shard landing
    with a later-sorting name is picked up; replay of a (start, end]
    window is index-shift-proof even after more files land."""
    from neuroimaging_data_pipeline_spark.multimodal.tar import encode_shard
    from neuroimaging_data_pipeline_spark.sources.datasource import (
        TarShardStreamReader,
    )

    landing = tmp_path / "landing"
    landing.mkdir()

    def land(i):
        with open(landing / f"shard-{i:05d}.tar", "wb") as fh:
            fh.write(encode_shard(i))

    rdr = TarShardStreamReader({"path": str(landing)})
    for i in range(3):
        land(i)
    start = rdr.initialOffset()
    rows1, end1 = rdr.read(start)
    rows1 = list(rows1)
    assert end1 == {"last": "shard-00002.tar"}
    assert {r[0] for r in rows1} == {f"shard-{i:05d}.tar" for i in range(3)}

    land(5)
    rows2, end2 = rdr.read(end1)
    rows2 = list(rows2)
    assert end2 == {"last": "shard-00005.tar"}
    assert {r[0] for r in rows2} == {"shard-00005.tar"}

    # replay of the FIRST window after later files landed: identical
    replay = list(rdr.readBetweenOffsets(start, end1))
    assert replay == rows1

    # empty micro-batch keeps the high-water mark
    rows3, end3 = rdr.read(end2)
    assert list(rows3) == [] and end3 == end2

    # legacy positional offsets are rejected loudly
    with pytest.raises(ValueError, match="last"):
        rdr.read({"count": 2})
