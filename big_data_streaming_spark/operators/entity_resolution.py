"""Entity resolution (record linkage) as a reusable operator.

The three-stage shape the 100 TB data-cleaning pipeline needs (see
``workload/advanced.py:q_entity_resolution`` for the gate-checked
instantiation and SCALE.md for the cost analysis):

  1. BLOCK — candidate pairs only within caller-supplied blocking keys,
     so the self-join shuffles on the block key and pair count is
     Σ block² instead of n²;
  2. VERIFY — levenshtein distance on the match column, residual filter
     inside the blocked equi-join;
  3. MERGE — transitive closure over verified match edges via the
     min-label CC engine (functions/graph.py), so A~B and B~C unify
     even when A and C miss the distance threshold.

Returns every input record with its cluster id (min record id of the
component), cluster size (window over cluster_id — ONE exchange, no
self-join) and an ``is_canonical`` flag.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_streaming_spark.functions.graph import connected_components


def resolve_entities(
    df: DataFrame,
    id_col: str,
    match_col: str,
    block_cols: Sequence[str],
    max_distance: int = 1,
) -> DataFrame:
    """(id, match, cluster_id, cluster_size, is_canonical) per record."""
    recs = df.select(id_col, match_col, *block_cols)
    a, b = recs.alias("a"), recs.alias("b")
    cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    edges = (
        a.join(b, cond)
        .filter(
            F.levenshtein(F.col(f"a.{match_col}"), F.col(f"b.{match_col}"))
            <= max_distance
        )
        .select(
            F.col(f"a.{id_col}").alias("src"), F.col(f"b.{id_col}").alias("dst")
        )
    )
    comp = connected_components(edges, "src", "dst")
    # cluster_id keeps the id column's own type (string record ids are
    # common in record linkage; min-label CC orders any comparable type).
    # A hard bigint cast here would NULL non-numeric ids and silently
    # collapse every record into one NULL cluster.
    resolved = recs.join(comp, recs[id_col] == comp.node, "left").select(
        id_col,
        match_col,
        F.coalesce("component", F.col(id_col)).alias("cluster_id"),
    )
    w = Window.partitionBy("cluster_id")
    return resolved.select(
        id_col,
        match_col,
        "cluster_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("cluster_size"),
        (F.col(id_col) == F.col("cluster_id")).alias("is_canonical"),
    )
