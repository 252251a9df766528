"""Iterative graph operators: connected components by min-label
propagation — the transitive-closure step LSH dedup needs (docs A~B and
B~C must dedup together even when A and C share no bucket).

The loop is driver-side but each iteration is fully distributed (join +
aggregate); convergence is checked with a bounded scalar count. Lineage
is cut with ``localCheckpoint`` every iteration — without it the plan
doubles per round and planning time, not compute, becomes the bottleneck.
Converges in O(graph diameter) rounds; LSH-bucket graphs are star-shaped
(docs → bucket representative), so diameters are small (≤ 2×bands hops).

At 100 TB this is the standard min-label-propagation CC (cf. the
large-star/small-star refinement); the star-edge construction below keeps
the edge set O(n·bands), never the O(n²) within-bucket clique.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    check_every: int = 2,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = min node
    id reachable. Undirected (edges are symmetrized).

    Convergence is probed only every ``check_every`` rounds: the changed-
    label count is a full join + count action, and paying it per round
    doubles the action count for graphs that need several rounds anyway.
    Between probes the propagation step (already an eager localCheckpoint
    job) runs back-to-back. Worst case this runs ``check_every - 1``
    extra no-op propagation rounds — each a cheap join on an already-
    converged label set — in exchange for halving (or better) the number
    of driver actions on deep graphs."""
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    check_every = max(1, check_every)
    last_checked = labels
    for i in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce("nbr_component", F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()
        )
        labels = new_labels
        if (i + 1) % check_every == 0 or i == max_iter - 1:
            changed = (
                labels.alias("n")
                .join(last_checked.alias("o"), "node")
                .filter(F.col("n.component") != F.col("o.component"))
                .count()
            )
            if changed == 0:
                break
            last_checked = labels
    return labels


def minhash_dedup_components(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 4,
    max_iter: int = 20,
) -> DataFrame:
    """Near-dup clustering with TRUE transitive closure: star edges
    (doc → per-bucket min doc) from the LSH bands, then connected
    components. Returns (doc_id, component, is_dup). Strictly merges the
    one-hop ``minhash_dedup_clusters`` output — chains A~B~C collapse to
    one component even when A and C never collide."""
    from big_data_streaming_spark.functions.dedup import _band_hashes

    bh = _band_hashes(df, id_col, text_col, num_hashes, bands)
    bucket_rep = bh.groupBy("band", "bh").agg(F.min(id_col).alias("rep"))
    star = (
        bh.join(bucket_rep, ["band", "bh"])
        .filter(F.col(id_col) != F.col("rep"))
        .select(F.col(id_col).alias("src"), F.col("rep").alias("dst"))
        .distinct()
    )
    cc = connected_components(star, max_iter=max_iter)
    all_docs = df.select(F.col(id_col))
    return (
        all_docs.join(cc, all_docs[id_col] == cc.node, "left")
        .select(
            F.col(id_col),
            F.coalesce("component", F.col(id_col)).alias("component"),
        )
        .withColumn("is_dup", F.col("component") < F.col(id_col))
    )
