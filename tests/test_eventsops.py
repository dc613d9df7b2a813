"""Event-analytics semantics (queries/eventsops.py): the funnel's
strict ordering requirement and retention's same-day dedup, pinned on
planted fixtures the synthetic events table may not exercise."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.queries.eventsops import (
    ev_funnel,
    ev_retention,
)


def _write_events(spark, tmp_path, rows):
    ev = spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, d, h), u, t, 1.0, "{}")
            for i, (u, t, d, h) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    ev.coalesce(1).write.mode("overwrite").parquet(
        str(sf / "events.parquet")
    )
    return str(sf)


def test_funnel_requires_strict_order(spark, tmp_path):
    rows = [
        # user 1: full ordered funnel
        (1, "view", 1, 1), (1, "click", 1, 2), (1, "purchase", 1, 3),
        # user 2: purchase BEFORE view -> no conversion past view
        (2, "purchase", 1, 1), (2, "view", 1, 2),
        # user 3: click before view, click after view too -> converts
        (3, "click", 1, 1), (3, "view", 1, 2), (3, "click", 1, 3),
        # user 4: never viewed -> not in funnel at all
        (4, "click", 1, 1), (4, "purchase", 1, 2),
        # user 5: view and click at the SAME instant -> strict '>' fails
        (5, "view", 2, 1), (5, "click", 2, 1),
    ]
    out = (
        ev_funnel(spark, _write_events(spark, tmp_path, rows))
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert list(out.index) == [1, 2, 3, 5]  # user 4 absent
    assert out.loc[1, "reached_purchase"]
    assert not out.loc[2, "reached_click"]
    assert not out.loc[2, "reached_purchase"]
    assert out.loc[3, "reached_click"] and not out.loc[3, "reached_purchase"]
    assert not out.loc[5, "reached_click"]


def test_asof_join_edges(spark, tmp_path):
    """As-of semantics pinned on planted rows: latest-not-any view
    wins, same-instant view matches (inclusive <=), no-prior-view
    yields NULL, later views never leak backwards."""
    from neuroimaging_data_pipeline_spark.queries.eventsops import (
        j7_asof_join,
    )

    rows = [
        # user 1: views at d1h1, d1h3; purchase d1h4 -> matches h3;
        # purchase d1h2 -> matches h1
        (1, "view", 1, 1), (1, "view", 1, 3),
        (1, "purchase", 1, 4), (1, "purchase", 1, 2),
        # user 2: view and purchase at the SAME instant -> inclusive
        (2, "view", 2, 5), (2, "purchase", 2, 5),
        # user 3: view only AFTER the purchase -> NULL match
        (3, "purchase", 3, 1), (3, "view", 3, 2),
    ]
    out = (
        j7_asof_join(spark, _write_events(spark, tmp_path, rows))
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    us = lambda d, h: int(
        dt.datetime(2024, 1, d, h, tzinfo=dt.timezone.utc).timestamp() * 1e6
    )
    assert len(out) == 4
    got = {
        (r.user_id, r.purchase_us): r.view_us for r in out.itertuples()
    }
    assert got[(1, us(1, 4))] == us(1, 3)
    assert got[(1, us(1, 2))] == us(1, 1)
    assert got[(2, us(2, 5))] == us(2, 5)
    import math

    assert math.isnan(got[(3, us(3, 1))]) or got[(3, us(3, 1))] is None


def test_sessionize_gap_semantics(spark, tmp_path):
    """30-min-gap sessionization: same-session under the threshold,
    new session over it, sessions numbered 1..k per user, ids unique
    across users."""
    from neuroimaging_data_pipeline_spark.queries.eventsops import (
        w10_sessionize,
    )

    rows = [
        # user 1: events at 10:00, 10:20, 11:30 -> sessions 1,1,2
        (1, "view", 1, 10), (1, "click", 1, 10), (1, "view", 1, 11),
        # user 2: single event -> session 1
        (2, "view", 1, 10),
    ]

    def _w(spark, tmp_path, rows):
        import datetime as dtm

        ev = spark.createDataFrame(
            [
                (i, dtm.datetime(2024, 1, d, h, m), u, t, 1.0, "{}")
                for i, (u, t, d, h, m) in enumerate(
                    [
                        (1, "view", 1, 10, 0),
                        (1, "click", 1, 10, 20),
                        (1, "view", 1, 11, 30),
                        (2, "view", 1, 10, 0),
                    ]
                )
            ],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        sf = tmp_path / "sfs"
        sf.mkdir(exist_ok=True)
        ev.coalesce(1).write.mode("overwrite").parquet(
            str(sf / "events.parquet")
        )
        return str(sf)

    out = (
        w10_sessionize(spark, _w(spark, tmp_path, rows))
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert list(out["session_idx"]) == [1, 1, 2, 1]
    assert out["session_id"].tolist() == ["1-1", "1-1", "1-2", "2-1"]


def test_retention_dedups_same_day_activity(spark, tmp_path):
    rows = [
        # user 1: 3 events on cohort day, 2 on day+1 -> counts once each
        (1, "view", 1, 1), (1, "click", 1, 2), (1, "error", 1, 3),
        (1, "view", 2, 1), (1, "view", 2, 5),
        # user 2: same cohort day, returns day+1 and day+9 (beyond window)
        (2, "view", 1, 4), (2, "view", 2, 9), (2, "view", 10, 1),
    ]
    out = ev_retention(spark, _write_events(spark, tmp_path, rows)).toPandas()
    got = {
        (r.cohort_day, r.day_offset): r.n_users for r in out.itertuples()
    }
    assert got == {("2024-01-01", 0): 2, ("2024-01-01", 1): 2}
