"""Fixture-assumption guard for q_basket_triples (VERDICT r6 task 5).

q_basket_triples expands each order basket into its C(|basket|, 3)
part-triples. That per-basket expansion is safe ONLY while baskets stay
small. On introduction this guard immediately earned its keep: the
source comment claimed "this schema caps baskets at 7" (TPC-H proper
does), but the synthetic fixture does NOT — max distinct parts per
order is 11 / 13 / 17 at sf0.001 / 0.01 / 0.1. C(17,3) = 680 candidates
per order is still per-basket bounded; a skewed 10^4-item basket would
yield 1.6e11 candidates in one join group. The budget below (64 →
C(64,3) ≈ 4.2e4 per order) trips loudly well before that regime.
Mirrors tests/test_shapley_guard.py.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

# Expansion budget: C(64,3) ~= 4.2e4 candidates per order is the most
# the per-basket self-join may fan out before the plan needs a size cap.
# Fixture reality: max 17 at sf0.1 (grows ~log with scale).
MAX_BASKET = 64


@pytest.mark.parametrize("sf_dir", [s for s in SFS if os.path.isdir(s)])
def test_basket_size_stays_within_triple_expansion_budget(sf_dir):
    con = duckdb.connect()
    try:
        path = os.path.join(sf_dir, "lineitem.parquet")
        max_basket = con.execute(
            f"""
            SELECT MAX(c) FROM (
                SELECT COUNT(DISTINCT l_partkey) AS c
                FROM read_parquet('{path}')
                GROUP BY l_orderkey
            )
            """
        ).fetchone()[0]
        assert max_basket <= MAX_BASKET, (
            f"{sf_dir}: max distinct parts per order = {max_basket} > "
            f"{MAX_BASKET} — q_basket_triples' per-basket C(n,3) expansion "
            "is no longer bounded; cap baskets (size filter before the "
            "self-join) in BOTH the Spark plan and the oracle"
        )
    finally:
        con.close()
