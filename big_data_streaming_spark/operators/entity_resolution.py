"""Entity resolution (record linkage) as a reusable operator.

The three-stage shape the 100 TB data-cleaning pipeline needs (see
``workload/advanced.py:q_entity_resolution`` for the gate-checked
instantiation and SCALE.md for the cost analysis):

  1. BLOCK — candidate pairs only within caller-supplied blocking keys,
     so the self-join shuffles on the block key and pair count is
     Σ block² instead of n²;
  2. VERIFY — levenshtein distance on the match column, residual filter
     inside the blocked equi-join;
  3. MERGE — transitive closure over verified match edges, so A~B and
     B~C unify even when A and C miss the distance threshold. Every
     verified edge joins two records of the SAME block (block-key
     equality is part of the join condition), so each connected
     component lies entirely inside one block — closure is block-LOCAL.
     The merge is therefore one grouped union-find pass — each block's
     verified edges collected in-row (``collect_list``, ONE shuffle on
     the block key the verify join already partitioned by), then a
     VECTORIZED pandas UDF runs union-find per block over whole Arrow
     batches of blocks — instead of an iterative whole-graph CC loop:
     the round-11 profiler showed the min-label loop spending its wall
     clock on ~8 driver-scheduled rounds of join+aggregate for a
     closure the blocking key had already localized (round 12, guide §8
     "use what you know that the optimizer does not" + §4.2 batch the
     Python boundary; the per-group ``applyInPandas`` form was measured
     first and rejected — ~2 ms/group × thousands of tiny blocks).
     Per-block state is bounded by the same Σ block² pair budget
     blocking already guarantees for the VERIFY join, so the grouped
     pass holds at 100 TB exactly where blocking itself does. Labels
     are identical to whole-graph CC (min record id per component;
     union-by-label-order keeps the component root = min id regardless
     of edge arrival order) — pinned by tests/test_graph.py's property
     test against a pure-Python blocking + levenshtein + union-find
     pipeline and by the per-SF oracle replays.

Returns every input record with its cluster id (min record id of the
component), cluster size (window over cluster_id — ONE exchange, no
self-join) and an ``is_canonical`` flag.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructField, StructType
from pyspark.sql.window import Window


def _union_find_block(es: list) -> list:
    """Union-find over ONE block's verified match edges (a list of
    ``{"src", "dst"}`` structs): returns ``[{"node", "component"}]``
    with component = min id of the node's component. Union by label
    order (smaller id becomes the root), so the root is the component
    minimum whatever order edges arrive in — the result is
    deterministic even though ``collect_list`` order is not. Block size
    is bounded by the blocking design (the VERIFY join already pays
    O(block²) pairs)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for e in es:
        s, d = e["src"], e["dst"]
        if s not in parent:
            parent[s] = s
        if d not in parent:
            parent[d] = d
        rs, rd = find(s), find(d)
        if rs != rd:
            if rd < rs:
                rs, rd = rd, rs
            parent[rd] = rs
    return [{"node": n, "component": find(n)} for n in parent]


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
            *[F.col(f"a.{c}").alias(c) for c in block_cols],
            F.col(f"a.{id_col}").alias("src"),
            F.col(f"b.{id_col}").alias("dst"),
        )
    )
    # Block-local transitive closure (module docstring): each block's
    # edges collected in-row, union-find per block inside a vectorized
    # pandas UDF (whole Arrow batches of blocks per Python call — the
    # per-group applyInPandas form paid ~2 ms of Arrow framing per tiny
    # block), exploded back to (node, component). One shuffle, no
    # iterative driver loop.
    id_type = recs.schema[id_col].dataType
    out_type = ArrayType(
        StructType(
            [
                StructField("node", id_type),
                StructField("component", id_type),
            ]
        )
    )

    @F.pandas_udf(out_type)
    def _uf(blocks: pd.Series) -> pd.Series:
        return blocks.apply(_union_find_block)

    eb = edges.groupBy(*block_cols).agg(
        F.collect_list(F.struct("src", "dst")).alias("_es")
    )
    comp = eb.select(F.explode(_uf("_es")).alias("_nc")).select(
        F.col("_nc.node").alias("node"),
        F.col("_nc.component").alias("component"),
    )
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
