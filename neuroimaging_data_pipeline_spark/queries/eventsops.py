"""Event-analytics operators over the ``events`` table: ordered
funnel conversion and cohort retention — the two canonical
product-analytics shapes a general engine must express (and a
training-data pipeline reuses them verbatim for e.g. document
lifecycle tracking: crawled -> cleaned -> deduped stages are a
funnel; recrawl activity by first-seen week is retention).

Scale notes:
- the funnel is THREE filtered per-user min aggregates chained by
  strictly-later-than joins — each agg is a hash aggregate with
  map-side partials on user_id; the user-level intermediate tables
  are |users| rows (tiny next to |events|), so the chaining joins
  are cheap and AQE will broadcast them;
- retention distincts (user, cohort_day, offset) BEFORE counting, so
  the heavy dedup shuffle carries three small ints per row and the
  final count is a partial-aggregated groupBy;
- no windows over the whole event stream, no per-user sorting.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.sources.tables import read_table

FUNNEL_STAGES = ("view", "click", "purchase")


def ev_funnel(spark, sf_dir):
    """Ordered funnel per user: first 'view', first 'click' STRICTLY
    AFTER that view, first 'purchase' strictly after that click —
    the timestamps must be ordered, not merely present (a purchase
    before the first view does not convert). One row per user who
    entered the funnel: (user_id, reached_view, reached_click,
    reached_purchase)."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    v = (
        ev.filter(F.col("event_type") == FUNNEL_STAGES[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == FUNNEL_STAGES[1])
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == FUNNEL_STAGES[2])
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.lit(True).alias("reached_view"),
            F.col("t_click").isNotNull().alias("reached_click"),
            F.col("t_purchase").isNotNull().alias("reached_purchase"),
        )
    )


EV_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT v.user_id,
       TRUE AS reached_view,
       (c.t_click IS NOT NULL) AS reached_click,
       (p.t_purchase IS NOT NULL) AS reached_purchase
FROM v
LEFT JOIN c ON v.user_id = c.user_id
LEFT JOIN p ON v.user_id = p.user_id
"""


RETENTION_MAX_OFFSET = 7


def ev_retention(spark, sf_dir):
    """Cohort retention: users grouped by first-activity day; for day
    offsets 0..7, how many of each cohort were active again on
    cohort_day + offset. (cohort_day date, day_offset, n_users).
    The (user, cohort, offset) triple is distinct-ed before counting
    so multiple same-day events don't inflate retention."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .filter(F.col("day_offset") <= RETENTION_MAX_OFFSET)
        .distinct()
    )
    return (
        active.groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        # date emitted as a string for cross-engine hash stability
        # (same convention as f3_date_trunc)
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "day_offset",
            "n_users",
        )
    )


EV_RETENTION_SQL = f"""
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS day FROM events
), first AS (
  SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id
), active AS (
  SELECT DISTINCT ev.user_id, first.cohort_day,
         (ev.day - first.cohort_day) AS day_offset
  FROM ev JOIN first ON ev.user_id = first.user_id
  WHERE (ev.day - first.cohort_day) <= {RETENTION_MAX_OFFSET}
)
SELECT STRFTIME(cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(day_offset AS INT) AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM active GROUP BY cohort_day, day_offset
"""


def j7_asof_join(spark, sf_dir):
    """AS-OF JOIN: each 'purchase' matched to the user's most recent
    'view' at-or-before it — the canonical temporal join (trades
    backtesting, sensor alignment, attribution).

    Spark has no asof operator, and the naive inequality join is
    O(n*m) per user. The scale-correct form used here is
    union-then-window: tag both sides, union, ONE shuffle partitioned
    by user ordered by (time, tag, id) — views sort before purchases
    at the same instant, giving inclusive <= semantics — and a
    running last_value(ignorenulls) carries the latest view forward
    to every purchase row. Linear, one shuffle, no range explosion.

    The oracle is DuckDB's NATIVE ASOF LEFT JOIN — a completely
    independent implementation of the same semantics — so agreement
    here is a real cross-engine check, not a restatement."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("tus"),
    )
    v = ev.filter(F.col("event_type") == "view")
    p = ev.filter(F.col("event_type") == "purchase")
    from pyspark.sql import Window

    unioned = v.select(
        "user_id", "tus", F.lit(0).alias("tag"), F.col("event_id").alias("src_id")
    ).unionAll(
        p.select(
            "user_id", "tus", F.lit(1).alias("tag"),
            F.col("event_id").alias("src_id"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tus", "tag", "src_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    view_tus = F.last(
        F.when(F.col("tag") == 0, F.col("tus")), ignorenulls=True
    ).over(w)
    return (
        unioned.withColumn("view_us", view_tus)
        .filter(F.col("tag") == 1)
        .select(
            F.col("src_id").alias("event_id"),
            "user_id",
            F.col("tus").alias("purchase_us"),
            "view_us",
            (F.col("tus") - F.col("view_us")).alias("gap_us"),
        )
    )


J7_ASOF_SQL = """
SELECT p.event_id,
       p.user_id,
       epoch_us(p.ts) AS purchase_us,
       epoch_us(v.ts) AS view_us,
       epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND v.ts <= p.ts
"""


def w10_sessionize(spark, sf_dir):
    """Session-ID assignment: events of a user belong to the same
    session while gaps stay under 30 minutes; a longer gap starts a
    new session. Two window passes over ONE user-partitioned sort:
    lag() marks session starts, a running sum of the start flags
    numbers them. This is the per-EVENT labeling primitive that
    session_window's per-SESSION aggregates can't give you (you need
    it to join session ids back onto raw events). Output one row per
    event: (event_id, user_id, session_id, session_idx)."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("tus")
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    gap = F.col("tus") - F.lag("tus").over(w)
    new_sess = (
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    )
    return (
        ev.withColumn("_ns", new_sess)
        .withColumn(
            "session_idx",
            F.sum("_ns").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .select(
            "event_id",
            "user_id",
            F.concat_ws(
                "-", F.col("user_id"), F.col("session_idx")
            ).alias("session_id"),
            F.col("session_idx").cast("int").alias("session_idx"),
        )
    )


W10_SESSIONIZE_SQL = """
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS tus FROM events
), g AS (
  SELECT event_id, user_id, tus,
         CASE WHEN tus - LAG(tus) OVER w IS NULL
                OR tus - LAG(tus) OVER w > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS ns
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
), s AS (
  SELECT event_id, user_id,
         SUM(ns) OVER (PARTITION BY user_id ORDER BY tus, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM g
)
SELECT event_id, user_id,
       user_id || '-' || session_idx AS session_id,
       CAST(session_idx AS INT) AS session_idx
FROM s
"""


def w9_locf_resample(spark, sf_dir):
    """Gap-filling resample onto a regular grid with
    last-observation-carried-forward — the time-series alignment
    primitive (sensor fusion, metric dashboards, feature snapshots).
    Each user's 'value' is sampled at 6-hour grid points over the
    30-day span; the value at each grid point is the user's latest
    event at-or-before it (NULL before their first event).

    Scale shape: the grid is users x grid-points (tiny next to the
    event table) and the LOCF match is the SAME union-then-window
    as-of pattern as j7 — one shuffle on user, no inequality join.
    Oracle: DuckDB's native ASOF LEFT JOIN again (independent
    implementation)."""
    from pyspark.sql import Window

    # one observation per (user, instant): same-microsecond ties are
    # reduced with MAX before the as-of, in BOTH engines — otherwise
    # the carried value would depend on shuffle order (and on
    # DuckDB's own arbitrary ASOF tie choice)
    ev = (
        read_table(spark, sf_dir, "events")
        .select("user_id", F.unix_micros("ts").alias("tus"), "value")
        .groupBy("user_id", "tus")
        .agg(F.max("value").alias("value"))
    )
    bounds = ev.agg(
        F.min("tus").alias("lo"), F.max("tus").alias("hi")
    )
    step = 6 * 3600 * 1_000_000
    start = (F.ceil(F.col("lo") / step) * step).cast("long")
    grid_pts = bounds.select(
        F.explode(
            # a span with no aligned instant (start > hi) yields an
            # empty grid, not a sequence() boundary error
            F.when(
                start <= F.col("hi"),
                F.sequence(start, F.col("hi"), F.lit(step)),
            ).otherwise(F.array().cast("array<long>"))
        ).alias("gus")
    )
    users = ev.select("user_id").distinct()
    grid = users.crossJoin(F.broadcast(grid_pts))
    # union-then-window LOCF: observations (tag 0) before grid points
    # (tag 1) at equal instants -> inclusive at-or-before semantics
    obs = ev.select(
        "user_id", F.col("tus").alias("t"), F.lit(0).alias("tag"), "value"
    )
    probes = grid.select(
        "user_id",
        F.col("gus").alias("t"),
        F.lit(1).alias("tag"),
        F.lit(None).cast("double").alias("value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        obs.unionAll(probes)
        .withColumn(
            "locf",
            F.last(F.when(F.col("tag") == 0, F.col("value")), True).over(w),
        )
        .filter(F.col("tag") == 1)
    )
    return filled.select(
        "user_id",
        F.col("t").alias("grid_us"),
        (F.round("locf", 6) + F.lit(0.0)).alias("value_locf"),
    )


W9_LOCF_SQL = """
WITH b AS (
  SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events
), grid AS (
  SELECT u.user_id, g.gus
  FROM (SELECT DISTINCT user_id FROM events) u,
       b,
       UNNEST(range(CAST(ceil(b.lo / 21600000000.0) AS BIGINT) * 21600000000,
                    b.hi + 1, 21600000000)) AS g(gus)
), obs AS (
  SELECT user_id, epoch_us(ts) AS tus, MAX(value) AS value
  FROM events GROUP BY user_id, epoch_us(ts)
)
SELECT grid.user_id,
       grid.gus AS grid_us,
       (ROUND(o.value, 6) + 0.0) AS value_locf
FROM grid
ASOF LEFT JOIN obs o
  ON grid.user_id = o.user_id AND o.tus <= grid.gus
"""


def ev_ohlc(spark, sf_dir):
    """OHLC bars: per (event_type, hour) — open/close = value of the
    first/last event in the bar (total order: ts, then event_id, so
    no engine tie-break dependence), high/low = max/min, plus the
    event count. The time-series downsampling shape (market bars,
    metric rollups) as ONE hash aggregate: open/close are min_by/
    max_by over the (ts, event_id) struct — partial-aggregable, no
    per-bar sort, one shuffle on the bar key."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", "ts").alias("h"),
        "ts",
        "event_id",
        "value",
    )
    o = F.struct("ts", "event_id")
    return (
        ev.groupBy("event_type", "h")
        .agg(
            F.min_by("value", o).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", o).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH:00").alias("bar_hour"),
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )


EV_OHLC_SQL = """
WITH b AS (
  SELECT event_type, date_trunc('hour', ts) AS h, ts, event_id, value
  FROM events
), r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY event_type, h
                            ORDER BY ts ASC, event_id ASC) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY event_type, h
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM b
)
SELECT event_type,
       strftime(h, '%Y-%m-%d %H:00') AS bar_hour,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM r
GROUP BY event_type, h
"""


#: EWMA decay and lookback for w11 (windowed, adjust-style
#: normalization over the frame actually present).
EWMA_ALPHA = 0.25
EWMA_LOOKBACK = 16  # rows incl. current; (1-a)^16 ~ 1% tail truncated


def w11_ewma(spark, sf_dir):
    """Windowed EWMA per user: exponentially weighted moving average
    of event values over the trailing 16 events (total order: ts,
    event_id), pandas adjust=True style — weights (1-a)^j normalized
    over the frame actually present, so early rows are exact, not
    zero-padded. The streaming-metrics smoothing shape.

    Plan: ONE window (single shuffle on user_id, sort within) whose
    frame collects the trailing values in order; the weighted sum is
    a pure JVM fold (zip_with + aggregate) — no Python, no second
    pass. The bounded frame is the scale contract: state per row is
    16 doubles regardless of history length (an unbounded exact EWMA
    is inherently sequential — that shape belongs to the stateful
    streaming operator, not a batch window)."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(EWMA_LOOKBACK - 1), 0)
    )
    arr = F.collect_list("value").over(w)  # frame order: oldest..current
    decay = F.lit(1.0 - EWMA_ALPHA)
    # weight of element i in an n-frame: (1-a)^(n-1-i)
    exps = F.sequence(F.size("arr") - 1, F.lit(0), F.lit(-1))
    wsum = F.aggregate(
        F.zip_with(F.col("arr"), exps, lambda x, j: x * F.pow(decay, j)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.aggregate(
        F.transform(exps, lambda j: F.pow(decay, j)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        ev.withColumn("arr", arr)
        .select(
            "user_id",
            "event_id",
            "value",
            (F.round(wsum / norm, 6) + F.lit(0.0)).alias("ewma"),
        )
    )


EV_EWMA_SQL = f"""
WITH fr AS (
  SELECT user_id, event_id, value,
         list(value) OVER (
           PARTITION BY user_id ORDER BY ts ASC, event_id ASC
           ROWS BETWEEN {EWMA_LOOKBACK - 1} PRECEDING AND CURRENT ROW
         ) AS arr
  FROM events
)
SELECT user_id, event_id, value,
       (ROUND(
          list_sum(list_transform(
            list_zip(arr, list_reverse(range(0, len(arr)))),
            p -> p[1] * pow({1.0 - EWMA_ALPHA}, p[2])))
          / list_sum(list_transform(
            range(0, len(arr)), j -> pow({1.0 - EWMA_ALPHA}, j))),
        6) + 0.0) AS ewma
FROM fr
"""


def j8_interval_overlap(spark, sf_dir):
    """J8: generic interval-interval overlap join (the two-sided
    form of j2's interval->grid): per error event, how many click
    intervals of the SAME user overlap it (half-open [s, s+value)
    windows).

    NOT an inequality join (BNLJ, O(|A| x |B|) per user at scale):
    both sides explode to their covered 10-minute bins, the join is
    an EQUI-join on (user, bin), the exact overlap predicate is
    re-checked on the joined rows, and each qualifying pair counts
    exactly ONCE via the canonical-bin rule (only the bin containing
    the overlap start, floor(max(s_a, s_b)/step), keeps the pair —
    the standard dedup for bin-partitioned interval joins). The
    co-partitioned (user, bin) equi-join is the 100 TB shape; left
    join back preserves zero-overlap events."""
    step = 600.0
    ev = read_table(spark, sf_dir, "events", min_partitions="cores").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_timestamp("ts").cast("double").alias("s"),
        (F.unix_timestamp("ts") + F.col("value")).alias("e"),
    )

    def bins(df, prefix):
        lo = F.floor(F.col("s") / step).cast("long")
        hi = F.floor(F.col("e") / step).cast("long")
        return df.withColumn("bin", F.explode(F.sequence(lo, hi))).select(
            "user_id",
            F.col("event_id").alias(f"{prefix}_id"),
            F.col("s").alias(f"{prefix}_s"),
            F.col("e").alias(f"{prefix}_e"),
            "bin",
        )

    a = ev.filter(F.col("event_type") == "error")
    b = ev.filter(F.col("event_type") == "click")
    pairs = (
        bins(a, "a")
        .join(bins(b, "b"), ["user_id", "bin"])
        .filter(
            (F.col("a_s") < F.col("b_e"))
            & (F.col("b_s") < F.col("a_e"))
            & (
                F.floor(F.greatest("a_s", "b_s") / step).cast("long")
                == F.col("bin")
            )
        )
    )
    counts = pairs.groupBy("a_id").agg(F.count(F.lit(1)).alias("n_overlaps"))
    return (
        a.select(F.col("event_id").alias("a_id"))
        .join(counts, "a_id", "left")
        .select(
            F.col("a_id").alias("event_id"),
            F.coalesce("n_overlaps", F.lit(0)).alias("n_overlaps"),
        )
    )


J8_SQL = """
WITH ev AS (
  SELECT user_id, event_id, event_type,
         CAST(CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS DOUBLE) AS s,
         CAST(FLOOR(EPOCH(ts)) AS BIGINT) + value AS e
  FROM events
), a AS (
  SELECT * FROM ev WHERE event_type = 'error'
), b AS (
  SELECT * FROM ev WHERE event_type = 'click'
), o AS (
  SELECT a.event_id, CAST(COUNT(*) AS BIGINT) AS n
  FROM a JOIN b ON a.user_id = b.user_id
               AND a.s < b.e AND b.s < a.e
  GROUP BY a.event_id
)
SELECT a.event_id, COALESCE(o.n, 0) AS n_overlaps
FROM a LEFT JOIN o ON a.event_id = o.event_id
"""


def j12_salted_join(spark, sf_dir):
    """Explicitly SALTED skewed equi-join (operators/salting.py):
    every event row is enriched with its (user, event_type) activity
    total, but instead of joining on the raw key — where one hot user
    concentrates a partition — the per-key totals are replicated 8
    ways and each event spreads to a salt sub-key by an md5 hash of
    its event_id. Results are IDENTICAL to the plain join (the oracle
    IS the plain join), which is exactly the point: salting is a
    physical rewrite, not a semantic one. This is the planned-skew
    fix AQE's runtime skew-join cannot provide for streaming stateful
    joins or pre-bucketed layouts; the cost model (small side x S)
    and the S-sizing rule live in the operator docstring."""
    from neuroimaging_data_pipeline_spark.operators.salting import (
        salted_equi_join,
    )

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    dim = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_type_events")
    )
    return salted_equi_join(
        ev, dim, ["user_id", "event_type"], "event_id", n_salt=8
    )


J12_SALTED_SQL = """
WITH dim AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n_type_events
  FROM events GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, e.event_type, d.n_type_events
FROM events e JOIN dim d USING (user_id, event_type)
"""


def sv_incremental_agg(spark, sf_dir):
    """Incremental aggregate maintenance (operators/incremental.py) —
    the materialized-view refresh shape: the per-(user, event_type)
    aggregate table is built from the 'historical' 3/4 of events,
    then the remaining 1/4 arrives as a DELTA and is folded in by
    monoid merge (count/sum add, min least, max greatest) WITHOUT
    re-reading history. The oracle recomputes the aggregate over ALL
    events from scratch — incremental == full recompute is the
    refresh invariant, checked end-to-end. Delta pass is one
    partial-agg shuffle over the new data only; the merge is one
    key-join against the (distinct-keys-sized) state table."""
    from neuroimaging_data_pipeline_spark.operators.incremental import (
        agg_state,
        refresh,
    )

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    ).withColumn("_tlen", F.length("event_type"))
    measures = {
        "n_events": ("count", ""),
        "sum_tlen": ("sum", "_tlen"),
        "min_value": ("min", "value"),
        "max_value": ("max", "value"),
    }
    hist = ev.filter(F.col("event_id") % 4 != 0)
    delta = ev.filter(F.col("event_id") % 4 == 0)
    state = agg_state(hist, ["user_id", "event_type"], measures)
    out = refresh(state, delta, ["user_id", "event_type"], measures)
    return out.select(
        "user_id",
        "event_type",
        "n_events",
        "sum_tlen",
        (F.round("min_value", 6) + F.lit(0.0)).alias("min_value"),
        (F.round("max_value", 6) + F.lit(0.0)).alias("max_value"),
    )


SV_INCR_AGG_SQL = """
SELECT user_id, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(length(event_type)) AS BIGINT) AS sum_tlen,
       (ROUND(MIN(value), 6) + 0.0) AS min_value,
       (ROUND(MAX(value), 6) + 0.0) AS max_value
FROM events
GROUP BY user_id, event_type
"""


def w13_event_dedup(spark, sf_dir):
    """Event-time windowed dedup: keep the FIRST event per (user,
    event_type) in every 5-minute tumbling bucket — the idempotency
    filter in front of metering/alerting consumers that must not
    double-count client retries (the batch twin of the streaming
    dropDuplicates-within-watermark shape). One window shuffle on the
    (user, type, bucket) key; first = min by (ts, event_id) total
    order."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    bucket = (F.unix_micros("ts") / F.lit(300_000_000)).cast("long")
    from pyspark.sql import Window

    w = Window.partitionBy(
        "user_id", "event_type", "_bucket"
    ).orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        ev.withColumn("_bucket", bucket)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("event_id", "user_id", "event_type", "_bucket")
        .withColumnRenamed("_bucket", "bucket")
    )


W13_DEDUP_SQL = """
WITH b AS (
  SELECT event_id, user_id, event_type,
         CAST(epoch_us(ts) // 300000000 AS BIGINT) AS bucket,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, event_type,
                        epoch_us(ts) // 300000000
           ORDER BY ts ASC, event_id ASC
         ) AS rn
  FROM events
)
SELECT event_id, user_id, event_type, bucket FROM b WHERE rn = 1
"""


#: CIDR prefix table for j13 — overlapping/nested on purpose so the
#: LONGEST match is load-bearing, with a /0 default catching the rest.
CIDR_PREFIXES = [
    ("0.0.0.0/0", "default"),
    ("0.0.0.0/2", "low-quarter"),
    ("10.0.0.0/8", "corp"),
    ("10.16.0.0/12", "corp-east"),
    ("10.16.32.0/19", "corp-east-dc2"),
    ("64.0.0.0/2", "q2"),
    ("128.0.0.0/1", "high-half"),
    ("192.0.0.0/3", "q4-low"),
    ("192.168.0.0/16", "rfc1918-192"),
    ("203.0.113.0/24", "test-net-3"),
    ("240.0.0.0/4", "reserved"),
]


def j13_cidr_join(spark, sf_dir):
    """J13: longest-prefix-match CIDR join (operators/lpm.py) — the
    IP-to-network geo/ASN/bot-range tagging stage, re-expressed from
    the naive BNLJ range join into ONE broadcast equi-join: each of
    the distinct prefix LENGTHS (known at plan time) contributes one
    ip >> (32-len) candidate key per row, and a partial-aggregable
    struct-max picks the longest hit. Per distinct user a
    deterministic IP (Knuth multiplicative hash of user_id, oracle-
    expressible) lands in a deliberately NESTED prefix table, so
    longest-match is load-bearing. The oracle does the same LPM with
    shifted-equality + rank. Broadcast dim, one keyed agg, no BNLJ,
    no row-Python."""
    from neuroimaging_data_pipeline_spark.operators.lpm import lpm_join

    ev = read_table(spark, sf_dir, "events", min_partitions="cores")
    users = ev.select("user_id").distinct().withColumn(
        "ip", (F.col("user_id") * F.lit(2654435761)) % F.lit(4294967296)
    )
    return lpm_join(users, CIDR_PREFIXES, ip_col="ip").select(
        "user_id", "ip", "prefix_len", "cidr", "label"
    )


def _cidr_values_sql() -> str:
    from neuroimaging_data_pipeline_spark.operators.lpm import parse_cidr

    rows = []
    for cidr, label in CIDR_PREFIXES:
        net, plen = parse_cidr(cidr)
        shifted = net >> (32 - plen) if plen else 0
        rows.append(f"({plen}, {shifted}, '{cidr}', '{label}')")
    return ", ".join(rows)


J13_CIDR_SQL = f"""
WITH pfx(prefix_len, shifted, cidr, label) AS (VALUES {_cidr_values_sql()}),
u AS (SELECT DISTINCT user_id FROM events),
ips AS (
  SELECT user_id, (user_id * 2654435761) % 4294967296 AS ip FROM u
),
m AS (
  SELECT ips.user_id, ips.ip, pfx.prefix_len, pfx.cidr, pfx.label,
         ROW_NUMBER() OVER (
           PARTITION BY ips.user_id ORDER BY pfx.prefix_len DESC
         ) AS rn
  FROM ips JOIN pfx
    ON (CASE WHEN pfx.prefix_len = 0 THEN 0
             ELSE ips.ip // POWER(2, 32 - pfx.prefix_len)::BIGINT END)
       = pfx.shifted
)
SELECT user_id, CAST(ip AS BIGINT) AS ip, prefix_len, cidr, label
FROM m WHERE rn = 1
"""


QUERIES = {
    "ev_funnel": ev_funnel,
    "j12_salted_join": j12_salted_join,
    "j13_cidr_join": j13_cidr_join,
    "sv_incremental_agg": sv_incremental_agg,
    "w13_event_dedup": w13_event_dedup,
    "ev_ohlc": ev_ohlc,
    "w11_ewma": w11_ewma,
    "j8_interval_overlap": j8_interval_overlap,
    "ev_retention": ev_retention,
    "j7_asof_join": j7_asof_join,
    "w10_sessionize": w10_sessionize,
    "w9_locf_resample": w9_locf_resample,
}

ORACLE = {
    "ev_funnel": EV_FUNNEL_SQL,
    "j12_salted_join": J12_SALTED_SQL,
    "j13_cidr_join": J13_CIDR_SQL,
    "sv_incremental_agg": SV_INCR_AGG_SQL,
    "w13_event_dedup": W13_DEDUP_SQL,
    "ev_ohlc": EV_OHLC_SQL,
    "w11_ewma": EV_EWMA_SQL,
    "j8_interval_overlap": J8_SQL,
    "ev_retention": EV_RETENTION_SQL,
    "j7_asof_join": J7_ASOF_SQL,
    "w10_sessionize": W10_SESSIONIZE_SQL,
    "w9_locf_resample": W9_LOCF_SQL,
}
