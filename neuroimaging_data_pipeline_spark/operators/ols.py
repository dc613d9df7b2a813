"""Mass-univariate OLS — the reference's flagship operator (SURVEY.md A9).

Reference: ``smoothed.regress()`` (ssm_loop.py:91) fits
y_v = X b_v + e_v independently for every voxel v (1,342,211 of them),
with one shared design matrix X (296 x ~40), returning per voxel:
beta, t, p, df, sigma, residual (ssm_loop.py:94-102).

Spark-first physical strategy (SURVEY.md §4.3):
- X is tiny and shared -> collected once and *broadcast* to executors.
- Y is the long fact table (subject, run, t, voxel_id, value). A naive
  ``groupBy('voxel_id').applyInPandas`` would shuffle the full fact
  table; that is acceptable when upstream ops (smoothing) already
  changed partitioning, and is the general operator here. The scale
  path is to write voxel-bucketed Parquet at ingest so this groupBy
  becomes shuffle-free (bucketed scan); both run through the same
  function.
- Inside each Arrow batch we solve *all voxels of the batch at once*
  with one pinv(X) @ Y_block matmul — the per-voxel Python loop the
  naive implementation would do is hoisted into a single BLAS call.
  p-values use the Student-t survival function; scipy when present,
  else an incomplete-beta series fallback (float64).

An oracle-checkable *summation form* for small k is provided in
``ols_normal_equations_sql`` (SURVEY.md §5.2: A9's SQL special case).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _t_sf(tval: np.ndarray, df: float) -> np.ndarray:
    """Two-sided p-value helper: Student-t survival function.

    scipy is the fast path; the fallback uses the regularized
    incomplete beta via continued fractions (Numerical-Recipes-style,
    public domain algorithm) in pure numpy.
    """
    try:
        from scipy import stats as _st

        return _st.t.sf(tval, df)
    except Exception:
        x = df / (df + tval**2)
        return np.where(tval >= 0, 0.5 * _betainc_reg(df / 2.0, 0.5, x),
                        1.0 - 0.5 * _betainc_reg(df / 2.0, 0.5, x))


def _betacf(a: float, b: float, x: np.ndarray) -> np.ndarray:
    """Vectorized modified-Lentz continued fraction for the regularized
    incomplete beta (Numerical-Recipes betacf, array form). Runs the
    whole array through each iteration — one numpy pass per step
    instead of a Python loop per element."""
    tiny = 1e-30
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = np.ones_like(x)
    d = 1.0 - qab * x / qap
    d = np.where(np.abs(d) < tiny, tiny, d)
    d = 1.0 / d
    h = d.copy()
    for m in range(1, 200):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        d = np.where(np.abs(d) < tiny, tiny, d)
        d = 1.0 / d
        c = 1.0 + aa / c
        c = np.where(np.abs(c) < tiny, tiny, c)
        h = h * d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        d = np.where(np.abs(d) < tiny, tiny, d)
        d = 1.0 / d
        c = 1.0 + aa / c
        c = np.where(np.abs(c) < tiny, tiny, c)
        delta = d * c
        h = h * delta
        if np.all(np.abs(delta - 1.0) < 1e-12):
            break
    return h


def _betainc_reg(a: float, b: float, x: np.ndarray) -> np.ndarray:
    """Regularized incomplete beta I_x(a, b), vectorized.

    NR betai: for x < (a+1)/(a+b+2) evaluate the continued fraction
    directly; otherwise via the symmetry I_x(a,b) = 1 - I_{1-x}(b,a)
    (the swapped branch must re-derive BOTH the prefactor and the CF
    with (b, a, 1-x) — using the direct-branch prefactor there gives
    wrong values for small |t|)."""
    x = np.asarray(x, dtype=np.float64)
    out = np.empty_like(x)
    zero, one = x <= 0.0, x >= 1.0
    out[zero], out[one] = 0.0, 1.0
    mid = ~(zero | one)
    lbeta = math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)
    xm = x[mid]
    direct = xm < (a + 1.0) / (a + b + 2.0)
    res = np.empty_like(xm)
    if direct.any():
        xd = xm[direct]
        bt = np.exp(a * np.log(xd) + b * np.log1p(-xd) - lbeta) / a
        res[direct] = bt * _betacf(a, b, xd)
    if (~direct).any():
        xs = 1.0 - xm[~direct]
        bt = np.exp(b * np.log(xs) + a * np.log1p(-xs) - lbeta) / b
        res[~direct] = 1.0 - bt * _betacf(b, a, xs)
    out[mid] = res
    return out


def _stats_schema(values_schema, keys: list[str]) -> StructType:
    """Output carries every group key (found by driving two-run data:
    without ``run`` in the schema, per-run fits collapse together)."""
    fields = [StructField(k, values_schema[k].dataType) for k in keys]
    fields += [
        StructField("voxel_id", LongType()),
        StructField("regressor", StringType()),
        StructField("beta", DoubleType()),
        StructField("t", DoubleType()),
        StructField("p", DoubleType()),
        StructField("df", DoubleType()),
        StructField("sigma", DoubleType()),
    ]
    return StructType(fields)


def mass_ols(
    values: DataFrame,
    design: DataFrame,
    regressors: list[str],
    keys: list[str] | None = None,
    t_col: str = "t",
    voxels_per_block: int = 2048,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Fit y ~ X per (keys..., voxel_id); return the long stats bundle
    (subject, voxel_id, regressor, beta, t, p, df, sigma) — D8.

    Design shipping (VERDICT r8 #6, cohort-scale safe): a pandas
    design (the driver-generated convenience form) is keyed into
    (X, t) arrays ONCE and shipped as a Spark broadcast variable —
    one torrent copy per executor, O(1) task payload. A Spark
    DataFrame design takes the COGROUPED path: it is never
    materialized on the driver at all — each (keys..., voxel_block)
    group receives exactly its own design rows through the cogroup
    shuffle. Values are grouped per (keys..., voxel_block) and solved
    in vectorized batches either way.

    Scale note (SURVEY.md §4.3): grouping by subject alone would pull
    a whole subject (296 x 1.34 M floats ~ 3.2 GB) into ONE pandas
    batch. The voxel_block key caps each Arrow batch at
    ``voxels_per_block`` series (~5 MB at 296 TRs / 2048 voxels) and
    multiplies parallelism by n_blocks: 1000 executors all busy on one
    cohort. The block id is a pure projection (voxel_id / N), so with
    voxel-bucketed Parquet the shuffle disappears entirely.
    """
    keys = keys or ["subject", "run"]
    reg_names = list(regressors)
    key_cols = list(keys)
    schema = _stats_schema(values.schema, key_cols)
    blocked = values.withColumn(
        "_voxel_block", F.floor(F.col("voxel_id") / F.lit(int(voxels_per_block)))
    )
    if shuffle_partitions is not None:
        # Size THIS operator's shuffle to the data instead of the
        # session-wide spark.sql.shuffle.partitions: an explicit
        # repartition on the group keys satisfies the grouped-map's
        # ClusteredDistribution, so no second exchange is added — the
        # groupBy below reuses this partitioning. At cohort scale the
        # session default (tuned for small driver tables) makes tasks
        # too coarse: 16 subjects x 50k voxels over 32 partitions is
        # ~15M rows/task, and the straggler tail costs ~30% throughput
        # (measured r3: 5.3k -> 6.9k voxels/sec at 128 partitions).
        # AQE's initialPartitionNum cannot fix this one — the
        # coalescing rule does not apply to the Python grouped-map
        # exchange (verified empirically, r3).
        blocked = blocked.repartition(
            int(shuffle_partitions), *keys, "_voxel_block"
        )

    if not isinstance(design, pd.DataFrame):
        # Spark-DataFrame design: COGROUPED path (VERDICT r8 #6) — the
        # design is never materialized on the driver and never rides a
        # task closure, so task payload stays O(1) in cohort size.
        # Each (keys..., voxel_block) group receives exactly its own
        # design copy through the cogroup shuffle: the design side is
        # fanned out to the block ids that actually exist (one
        # distinct + one key-equi-join, both tiny next to the fact
        # shuffle — n_runs x n_blocks design copies total, ~2% of the
        # value bytes at the reference shapes).
        # the rename breaks attribute lineage with `blocked` so the
        # cogroup below isn't flagged as an ambiguous self-join
        blocks = blocked.select(
            *key_cols, F.col("_voxel_block").alias("_dsn_block")
        ).distinct()
        design_blocked = design.select(*key_cols, t_col, *reg_names).join(
            blocks, key_cols
        )

        def fit_cogrouped(vals: pd.DataFrame, dsn: pd.DataFrame) -> pd.DataFrame:
            if vals.empty:
                # design key with no values in this block: nothing to fit
                return pd.DataFrame(columns=[f.name for f in schema.fields])
            if dsn.empty:
                kt = tuple(vals.iloc[0][k] for k in key_cols)
                raise KeyError(f"mass_ols: no design rows for key {kt}")
            dsn = dsn.sort_values(t_col)
            return _fit_block(
                vals,
                dsn[reg_names].to_numpy(dtype=np.float64),
                dsn[t_col].to_numpy(),
                key_cols,
                reg_names,
                t_col,
            )

        return (
            blocked.groupBy(*key_cols, "_voxel_block")
            .cogroup(design_blocked.groupBy(*key_cols, "_dsn_block"))
            .applyInPandas(fit_cogrouped, schema)
        )

    # pandas design (generated driver-side — skips a whole Spark job; a
    # 7-row toPandas costs ~2 s of pure overhead): build key -> (X, t)
    # once and ship it as a Spark BROADCAST VARIABLE — torrent-
    # distributed once per executor instead of serialized into every
    # task closure (the closure grows linearly with cohort size;
    # broadcast keeps task payload O(1)).
    dpdf = design.sort_values([*keys, t_col])
    Xmap: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}
    for kvals, g in dpdf.groupby(keys):
        kt = kvals if isinstance(kvals, tuple) else (kvals,)
        Xmap[kt] = (
            g[regressors].to_numpy(dtype=np.float64),
            g[t_col].to_numpy(),
        )
    bc_xmap = values.sparkSession.sparkContext.broadcast(Xmap)

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        kt = tuple(pdf.iloc[0][k] for k in key_cols)
        X_full, t_axis = bc_xmap.value[kt]
        return _fit_block(pdf, X_full, t_axis, key_cols, reg_names, t_col)

    return blocked.groupBy(*key_cols, "_voxel_block").applyInPandas(fit, schema)


def _fit_block(
    pdf: pd.DataFrame,
    X_full: np.ndarray,
    t_axis: np.ndarray,
    key_cols: list[str],
    reg_names: list[str],
    t_col: str,
) -> pd.DataFrame:
    """Solve one (keys..., voxel_block) group: pivot the block's
    voxels into a (t x voxel) matrix, align rows to the design's
    time axis, and solve every complete voxel with ONE pinv @ Y.
    Voxels missing timepoints (never the case on a real fMRI
    grid, but legal input) fall to a per-voxel masked solve."""
    # (t, voxel) pairs are unique: scatter straight into a dense
    # (t x voxel) matrix with numpy indexing — pivot_table's
    # groupby machinery is ~20x slower on these block sizes.
    pos = {tv: i for i, tv in enumerate(t_axis)}
    t_vals = pdf[t_col].to_numpy()
    present_ts = np.unique(t_vals)
    t_index = np.fromiter(
        (pos[tv] for tv in present_ts), dtype=np.int64, count=len(present_ts)
    )
    t_rank = {tv: i for i, tv in enumerate(present_ts)}
    rows = np.fromiter(
        (t_rank[tv] for tv in t_vals), dtype=np.int64, count=len(t_vals)
    )
    vox_codes, vox_idx = pd.factorize(pdf["voxel_id"], sort=True)
    vox = np.asarray(vox_idx)
    X = X_full[t_index]
    n, k = X.shape
    nvox = len(vox)
    Y = np.full((n, nvox), np.nan)
    # The scatter keeps the LAST write on duplicate (t, voxel) pairs
    # (the old pivot_table averaged them) — enforce the uniqueness
    # precondition instead of silently depending on it.
    if len(np.unique(rows * np.int64(nvox) + vox_codes)) != len(pdf):
        raise ValueError(
            "mass_ols: duplicate (t, voxel_id) rows in input; "
            "aggregate to one value per (t, voxel_id) first"
        )
    Y[rows, vox_codes] = pdf["value"].to_numpy(dtype=np.float64)
    B = np.empty((k, nvox))
    SE = np.empty((k, nvox))
    DOF = np.empty(nvox)
    SIGMA = np.empty(nvox)
    nanmask = np.isnan(Y)
    complete = ~nanmask.any(axis=0)
    if complete.any():
        Yc = Y[:, complete]
        pinv = np.linalg.pinv(X)
        Bc = pinv @ Yc                  # (k, n_complete)
        resid = Yc - X @ Bc             # (n, n_complete)
        dof = float(n - np.linalg.matrix_rank(X))
        mse = (resid**2).sum(axis=0) / dof
        xtx_inv_diag = np.diag(pinv @ pinv.T)  # == diag((X'X)^-1)
        B[:, complete] = Bc
        SE[:, complete] = np.sqrt(np.outer(xtx_inv_diag, mse))
        DOF[complete] = dof
        SIGMA[complete] = np.sqrt(mse)
    for j in np.nonzero(~complete)[0]:
        m = ~nanmask[:, j]
        Xi, yi = X[m], Y[m, j]
        pinv_i = np.linalg.pinv(Xi)
        bi = pinv_i @ yi
        ri = yi - Xi @ bi
        dof_i = float(len(yi) - np.linalg.matrix_rank(Xi))
        mse_i = (ri**2).sum() / dof_i if dof_i > 0 else np.nan
        B[:, j] = bi
        SE[:, j] = np.sqrt(np.diag(pinv_i @ pinv_i.T) * mse_i)
        DOF[j] = dof_i
        SIGMA[j] = np.sqrt(mse_i)
    with np.errstate(divide="ignore", invalid="ignore"):
        T = np.where(SE > 0, B / SE, 0.0)
    P = np.empty_like(T)
    for dv in np.unique(DOF):
        mcol = DOF == dv
        P[:, mcol] = (
            2.0 * _t_sf(np.abs(T[:, mcol]), float(dv))
            if dv > 0
            else np.nan
        )
    out = {k_name: np.repeat(pdf.iloc[0][k_name], k * nvox) for k_name in key_cols}
    out.update(
        {
            "voxel_id": np.tile(vox, k),
            "regressor": np.repeat(reg_names, nvox),
            "beta": B.ravel(),
            "t": T.ravel(),
            "p": P.ravel(),
            "df": np.repeat(DOF[np.newaxis, :], k, axis=0).ravel(),
            "sigma": np.repeat(SIGMA[np.newaxis, :], k, axis=0).ravel(),
        }
    )
    return pd.DataFrame(out)


def contrast(
    stats: DataFrame,
    design: "pd.DataFrame | DataFrame",
    regressors: list[str],
    weights: dict[str, float],
    keys: list[str] | None = None,
    t_col: str = "t",
) -> DataFrame:
    """Linear contrast c'beta per voxel with its standard error — the
    reference study's actual inference (Big vs Small condition
    difference; the notebook fits Big_c0/Small_c0 precisely to compare
    them).

    est = sum_j c_j * beta_j;  se = sigma * sqrt(c' (X'X)^-1 c)

    The quadratic form c'(X'X)^-1 c depends only on the design — one
    scalar per (subject, run), computed driver-side from the same
    design the fit used and broadcast-joined. The per-voxel part is a
    grouped SUM over the stats bundle: map-side partial agg, one
    shuffled row per voxel.
    """
    keys = keys or ["subject", "run"]
    if isinstance(design, pd.DataFrame):
        dpdf = design.sort_values([*keys, t_col])
    else:
        dpdf = design.orderBy(*keys, t_col).toPandas()
    c = np.array([weights.get(r, 0.0) for r in regressors])
    qrows = []
    for kvals, g in dpdf.groupby(keys):
        kt = kvals if isinstance(kvals, tuple) else (kvals,)
        X = g[regressors].to_numpy(dtype=np.float64)
        pinv = np.linalg.pinv(X)
        quad = float(c @ (pinv @ pinv.T) @ c)  # c'(X'X)^-1 c
        qrows.append((*kt, quad))
    wmap = F.create_map(
        *[x for r, w in weights.items() for x in (F.lit(r), F.lit(float(w)))]
    )
    per_vox = (
        stats.filter(F.col("regressor").isin(list(weights)))
        .groupBy(*keys, "voxel_id")
        .agg(
            F.sum(
                F.col("beta") * wmap[F.col("regressor")]
            ).alias("contrast"),
            F.first("sigma").alias("_sigma"),
            F.first("df").alias("df"),
        )
    )
    if len(qrows) == 1:
        # One design group (the whole-cohort case): the quadratic form
        # is a single scalar — attach it as a literal instead of
        # building + broadcast-joining a one-row DataFrame (saves a
        # driver-side createDataFrame and a join stage per call).
        per_vox = per_vox.withColumn("_quad", F.lit(qrows[0][-1]))
    else:
        spark = stats.sparkSession
        quad_df = F.broadcast(
            spark.createDataFrame(
                pd.DataFrame(qrows, columns=[*keys, "_quad"])
            )
        )
        per_vox = per_vox.join(quad_df, on=keys)
    out = per_vox.select(
        *keys,
        "voxel_id",
        "contrast",
        (F.col("_sigma") * F.sqrt(F.col("_quad"))).alias("se"),
        F.try_divide(
            F.col("contrast"), F.col("_sigma") * F.sqrt(F.col("_quad"))
        ).alias("t"),
        "df",
    )
    return out


def ols_normal_equations_sql(
    values: DataFrame,
    design: DataFrame,
    x_col: str,
    keys: list[str] | None = None,
    t_col: str = "t",
) -> DataFrame:
    """Simple-regression special case via pure-SQL normal equations:
    beta1 = cov(x,y)/var(x), beta0 = mean(y) - beta1*mean(x), per voxel.
    Oracle-checkable in any ANSI engine (SURVEY.md §5.2)."""
    keys = keys or ["subject"]
    j = values.join(design.select(*keys, t_col, x_col), on=[*keys, t_col])
    x, y = F.col(x_col), F.col("value")
    agg = j.groupBy(*keys, "voxel_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(x).alias("mx"),
        F.avg(y).alias("my"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    beta1 = F.try_divide(
        F.col("sxy") - F.col("n") * F.col("mx") * F.col("my"),
        F.col("sxx") - F.col("n") * F.col("mx") * F.col("mx"),
    )
    return agg.select(
        *keys,
        "voxel_id",
        beta1.alias("beta1"),
        (F.col("my") - beta1 * F.col("mx")).alias("beta0"),
    )
