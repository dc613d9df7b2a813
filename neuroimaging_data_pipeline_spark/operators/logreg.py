"""Distributed logistic-regression training by batch gradient descent.

The model-based quality-classifier shape of a training-data pipeline
(fastText-style filters, contamination classifiers): fit a linear
model on corpus-derived features with full-batch GD, where each
iteration is ONE aggregate over the corpus — gradient components are
order-independent DECIMAL sums, the weight vector is KB driver state
between iterations (the k-means/PageRank/BPE iterative shape), and
nothing else leaves the executors.

Determinism: addends quantize through DECIMAL(28,10) before summing
(summation order can never move the result), weights re-inject as
exact repr literals, and every arithmetic expression is form-identical
to the DuckDB twin — so the whole optimization trajectory is
oracle-checkable iteration by iteration.

Scale shape: per iteration = one map pass + one partial-aggregable
sum per feature. Features here are k~O(10); at 1000 executors the
gradient aggregate is a k-double reduce, i.e. negligible against the
corpus scan it rides on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neuroimaging_data_pipeline_spark.functions.stats import dec_sum


def logreg_gd(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str,
    n_iters: int = 3,
    lr: float = 0.1,
) -> list[list[float]]:
    """Full-batch GD from w=0; returns the weight vector after each
    iteration (a list of n_iters vectors, one per completed pass).

    Update: w_j <- w_j + lr * (dec_sum((y - sigmoid(w.x)) * x_j) / N).
    """
    n = feats.count()
    w = [0.0] * len(feature_cols)
    traj: list[list[float]] = []
    for _ in range(n_iters):
        z = None
        for wj, c in zip(w, feature_cols):
            term = F.lit(float(wj)) * F.col(c)
            z = term if z is None else z + term
        sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        err = F.col(label_col) - sig
        grads = feats.agg(
            *[
                dec_sum(err * F.col(c)).alias(f"g{j}")
                for j, c in enumerate(feature_cols)
            ]
        ).first()
        w = [
            float(wj) + lr * (grads[f"g{j}"] / n)
            for j, wj in enumerate(w)
        ]
        traj.append(list(w))
    return traj


def logreg_gd_sql(
    feats_cte: str,
    feature_exprs: list[str],
    label_expr: str,
    n_iters: int = 3,
    lr: float = 0.1,
) -> str:
    """DuckDB twin: unrolls the same iterations as chained CTEs.
    ``feats_cte`` must define a relation ``feats`` exposing the
    feature/label expressions; weights live in single-row CTEs w0..wN
    with columns c0..ck."""
    k = len(feature_exprs)
    parts = [feats_cte, "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM feats)"]
    zero = ", ".join(f"0.0 AS c{j}" for j in range(k))
    parts.append(f"w0 AS (SELECT {zero})")
    for i in range(n_iters):
        z = " + ".join(f"w.c{j} * ({feature_exprs[j]})" for j in range(k))
        err = f"(({label_expr}) - 1.0 / (1.0 + exp(-({z}))))"
        gsums = ", ".join(
            f"CAST(SUM(CAST({err} * ({feature_exprs[j]}) AS DECIMAL(28,10))) AS DOUBLE) AS g{j}"
            for j in range(k)
        )
        wnew = ", ".join(
            f"w.c{j} + {lr} * (g.g{j} / nn.n) AS c{j}" for j in range(k)
        )
        parts.append(f"g{i} AS (SELECT {gsums} FROM feats, w{i} w)")
        parts.append(
            f"w{i + 1} AS (SELECT {wnew} FROM w{i} w, g{i} g, nn)"
        )
    union = "\nUNION ALL\n".join(
        "SELECT {i} AS iter, {cols} FROM w{n}".format(
            i=i + 1,
            n=i + 1,
            cols=", ".join(
                f"(ROUND(c{j}, 6) + 0.0) AS w{j}" for j in range(k)
            ),
        )
        for i in range(n_iters)
    )
    return "WITH " + ",\n".join(parts) + f"\n{union}"
