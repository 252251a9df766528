"""Fixture-assumption guard for q_shapley (ADVICE r5, low).

q_shapley's exact unanimity-game credit uses the integer weight
``12 / |P|`` with lcm(1..4) = 12 — correct ONLY while every user's
non-purchase channel pattern has |P| <= 4. The testdata currently has
exactly 4 non-purchase event types, so that holds by construction; but
if a 5th type is ever added, ``12 DIV 5 = 2`` silently floors the true
2.4 in BOTH engines, so the differential gate could never catch the
corruption. This guard makes a fixture change fail loudly instead.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


@pytest.mark.parametrize("sf_dir", [s for s in SFS if os.path.isdir(s)])
def test_shapley_pattern_size_stays_within_lcm_domain(sf_dir):
    con = duckdb.connect()
    try:
        path = os.path.join(sf_dir, "events.parquet")
        n_types, max_psize = con.execute(
            f"""
            WITH uc AS (
                SELECT DISTINCT user_id, event_type
                FROM read_parquet('{path}')
                WHERE event_type <> 'purchase'
            )
            SELECT (SELECT COUNT(DISTINCT event_type) FROM uc),
                   (SELECT MAX(c) FROM
                       (SELECT COUNT(*) AS c FROM uc GROUP BY user_id))
            """
        ).fetchone()
        assert n_types <= 4, (
            f"{sf_dir}: {n_types} non-purchase event types — q_shapley's "
            "lcm(1..4)=12 weight floors 12/|P| for |P|>4; bump the lcm "
            "constant (lcm(1..5)=60) in BOTH the Spark plan and the oracle"
        )
        assert max_psize <= 4, (sf_dir, max_psize)
    finally:
        con.close()
