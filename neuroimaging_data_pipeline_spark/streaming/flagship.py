"""The E1 flagship as a Structured Streaming pipeline (SURVEY.md §2.9
— the reference's ``ssm_loop.py:37-102`` driven by arriving events).

Batch E1 is one pass: events -> boxcar design + response on the TR
grid -> HRF convolution -> per-regressor OLS betas. Here events
arrive incrementally: ``readStream`` over an events landing
directory, and each micro-batch folds its design/response
contribution into a versioned state table via ``foreachBatch``
(operators/flagship.py proves the per-cell state is a max/sum monoid,
so the fold is EXACT — final state is bit-identical to a batch pass,
pinned in tests/test_streaming_flagship.py).

Why foreachBatch and not a pure streaming aggregation: the pipeline
needs a range join of each batch against the static grid, a pivot,
and (for the betas) a windowed convolution — the last is not
expressible as an incremental streaming aggregate, but it IS a pure
function of the tiny per-cell state, which is exactly what the
monoid-state + foreachBatch split gives. The state commit uses the
versioned store's ``append_txn`` keyed by (query_id, batch_id), so
at-least-once micro-batch replays leave exactly-once state.

State size: O(subjects x runs x n_tr) rows — KBs per subject; at
100 TB of events this still holds, because the state is the DESIGN,
not the data: events fold in and are gone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from neuroimaging_data_pipeline_spark.operators.flagship import (
    N_TR,
    TR,
    flagship_betas,
    flagship_events,
    flagship_state,
    merge_state,
)
from neuroimaging_data_pipeline_spark.sources.versioned import (
    append_txn,
    read_version,
)


def flagship_stream(
    events_stream: DataFrame,
    anchor_sec: int,
    state_root: str,
    n_tr: int = N_TR,
    tr: float = TR,
    types: list[str] | None = None,
):
    """Build the foreachBatch writer: returns ``(foreach_fn)`` to pass
    to ``events_stream.writeStream.foreachBatch(...)``.

    ``events_stream``: a streaming DataFrame with the events-table
    schema (event_id, user_id, ts, event_type, value, ...).
    ``anchor_sec``: the experiment-start epoch second (a stream cannot
    wait for its own global minimum; batch parity tests pass the batch
    MIN). Each micro-batch: events -> per-cell contribution -> monoid
    merge with the latest committed state -> exactly-once commit.
    """

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        contrib = flagship_state(
            spark,
            flagship_events(batch_df, anchor_sec, n_tr, tr),
            n_tr,
            tr,
            types,
        )
        try:
            prev = read_version(spark, state_root)
        except FileNotFoundError:
            prev = None
        merged = merge_state(prev, contrib, types)
        append_txn(merged, state_root, txn_id=f"flagship-batch-{batch_id}")

    return _fold


def flagship_stream_betas(
    spark: SparkSession,
    state_root: str,
    n_tr: int = N_TR,
    tr: float = TR,
    types: list[str] | None = None,
) -> DataFrame:
    """Betas from the CURRENT committed state — callable after any
    micro-batch (the stream's incremental answer), identical code to
    the batch flagship's final stage."""
    return flagship_betas(
        read_version(spark, state_root), n_tr, tr, types
    )
