"""Near-duplicate CLUSTER formation: connected components over
candidate-pair edges (the step after pairwise dedup detection — a
training-data pipeline keeps one representative per duplicate
cluster, not per pair, or transitive chains A~B~C leak both A and C).

Algorithm: hash-min label propagation — every node starts labeled
with its own id; each round, every node takes the min label among
itself and its neighbors; converges when no label changes. Rounds
needed = graph diameter, which for near-dup clusters (dense blobs of
rewrites of the same source) is small. Each round is two shuffles of
the edge list — the standard iterative-DataFrame shape (same as the
IVF Lloyd passes in ``similarity/cosine.py``): a driver loop over
LAZY plans with a one-scalar convergence check per round, lineage
truncated per round so plans stay flat.

Scale: O(E) per round with map-side combine on the min-agg. For
pathological long-chain graphs (diameter >> 10) the published fix is
the large-star/small-star contraction of Kiveris et al., "Connected
Components in MapReduce and Beyond" (SOCC'14), which converges in
O(log^2 n) rounds; near-dup edge sets don't need it, so this module
implements plain hash-min and documents the upgrade path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
    n_salt: int = 0,
) -> DataFrame:
    """Label every node with the MIN node id reachable from it
    (undirected). Returns (id, cluster_id). Nodes absent from any
    edge keep their own id — singleton clusters are explicit, so the
    output is a total labeling of ``nodes``.

    ``n_salt > 1`` routes the per-round edge<->label join through
    ``operators.salting.salted_equi_join``: a HOT VERTEX (a hub whose
    degree dominates the edge list — boilerplate documents in dedup
    graphs produce exactly this) otherwise lands its entire edge
    fan-out in one shuffle task every round. Salting spreads each hot
    key across ``n_salt`` sub-keys at the cost of replicating the
    label side ``n_salt``x; results are identical (pinned in
    tests/test_skew.py). AQE's skew-join split cannot be relied on
    here because each round's join input is a freshly checkpointed
    small plan that AQE may plan as a broadcast join — planned
    salting is the deterministic fix at the 100 TB edge-list scale
    where the label side cannot broadcast.
    """
    sym = (
        edges.select(
            F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
        )
        .union(
            edges.select(
                F.col(dst_col).alias("_s"), F.col(src_col).alias("_d")
            )
        )
        .distinct()
    )
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("lbl")
    )
    # Edges are reused every round — keep them materialized once.
    sym = sym.localCheckpoint(eager=True)
    converged = False
    # max_iter + 1: a graph that needs exactly max_iter productive
    # rounds still gets the confirming changed==0 round — otherwise
    # effective capacity would silently be max_iter - 1
    for _ in range(max_iter + 1):
        if n_salt > 1:
            from neuroimaging_data_pipeline_spark.operators.salting import (
                salted_equi_join,
            )

            nbr = salted_equi_join(
                sym.select(F.col("_s").alias("id"), "_d"),
                labels,
                ["id"],
                discriminator="_d",
                n_salt=n_salt,
            ).select(F.col("_d").alias("id"), F.col("lbl"))
        else:
            nbr = sym.join(
                labels, sym["_s"] == labels["id"], "inner"
            ).select(F.col("_d").alias("id"), F.col("lbl"))
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=True)  # flat lineage per round
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.lbl") < F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        # Returning unconverged labels would silently split one true
        # cluster into several — the exact leak this operator exists
        # to prevent. Diameter > max_iter means the graph needs either
        # a higher max_iter or the star-contraction variant.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "rounds (graph diameter exceeds max_iter); raise max_iter "
            "or use a star-contraction algorithm for long-chain graphs"
        )
    return labels.select("id", F.col("lbl").alias("cluster_id"))


def pagerank(
    nodes: DataFrame,
    pairs: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    n_salt: int = 0,
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected pair graph — the
    importance score of the duplicate-cluster world: which document
    sits at the CENTER of a near-dup neighborhood (the natural
    keep-representative tiebreak beyond min-id).

    Deliberately FIXED iteration count (not convergence-tested): a
    fixed count unrolls into plain SQL, so the oracle can recompute
    it CTE-by-CTE — the same checkability trade the IVF k-means makes
    with its two fixed Lloyd passes. Dangling mass is not
    redistributed (simplified PR); both engines share that choice.

    Scale shape: per iteration one equi-join edge->rank (AQE-broadcast
    rank side at dup-graph sizes, shuffle join at web scale) and one
    map-side-combinable decimal-sum aggregate; the rank vector is one
    double per node. The symmetrized edge list is localCheckpoint-ed
    ONCE (same discipline as the CC operator above): it is referenced
    2 x n_iter times, and leaving it lazy would recompute the whole
    upstream pair pipeline (MinHash bands etc.) on every reference.

    ``n_salt > 1`` (VERDICT r12 #7, same opt-in as
    ``connected_components``): a HUB vertex — a boilerplate document
    near-duplicating a large corpus fraction — makes its out-edge key
    hot in the per-iteration edge<->rank shuffle join; the salted path
    pre-joins rank and degree into one per-vertex frame and routes the
    single edge join through ``operators.salting.salted_equi_join``
    (hot key spread over ``n_salt`` sub-keys, rank side replicated).
    Results identical (pinned in tests/test_skew.py); the hot IN-edge
    side needs no salting because the in-sum is a partial-aggregated
    (map-side combined) decimal sum, not a join."""
    from neuroimaging_data_pipeline_spark.functions.stats import dec_sum

    sym = pairs.select(
        F.col(src_col).alias("s"), F.col(dst_col).alias("d")
    ).unionAll(
        pairs.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d"))
    ).localCheckpoint(eager=True)
    deg = sym.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    n = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    base = nodes.select(F.col(id_col).alias("id")).crossJoin(F.broadcast(n))
    # r14: `base` is referenced n_iter + 1 times and `deg` once per
    # iteration; un-persisted, every reference re-ran the node scan +
    # count-broadcast (base) and the degree aggregate over the edge
    # list (deg). Both are node-scale frames (one row per vertex /
    # out-vertex), so persist them and pre-join the degree onto the
    # checkpointed edge list ONCE — each iteration is then a single
    # edge<->rank join plus the map-side-combined in-sum, the minimal
    # per-round shape. Values unchanged: the same c = pr/deg terms
    # feed the same decimal-exact sum.
    from pyspark import StorageLevel

    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    symd = (
        sym.join(deg, "s").persist(StorageLevel.MEMORY_AND_DISK)
        if n_salt <= 1
        else None
    )
    pr = base.select("id", "n_nodes", (1.0 / F.col("n_nodes")).alias("pr"))
    for _ in range(n_iter):
        if n_salt > 1:
            from neuroimaging_data_pipeline_spark.operators.salting import (
                salted_equi_join,
            )

            ranked = (
                pr.select("id", "pr")
                .join(deg, pr.id == deg.s)
                .select("s", "pr", "deg")
            )
            contrib = salted_equi_join(
                sym, ranked, ["s"], "d", n_salt=n_salt
            ).select(F.col("d"), (F.col("pr") / F.col("deg")).alias("c"))
        else:
            contrib = (
                symd.join(pr.select("id", "pr"), symd.s == F.col("id"))
                .select(F.col("d"), (F.col("pr") / F.col("deg")).alias("c"))
            )
        sums = contrib.groupBy("d").agg(dec_sum("c").alias("in_sum"))
        pr = (
            base.join(sums, base.id == sums.d, "left")
            .select(
                "id",
                "n_nodes",
                (
                    (1.0 - damping) / F.col("n_nodes")
                    + damping * F.coalesce(F.col("in_sum"), F.lit(0.0))
                ).alias("pr"),
            )
        )
    return pr.select("id", "pr")
