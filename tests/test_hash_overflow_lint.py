"""Lint pin: no unreduced ``key * 2654435761`` on id columns.

VERDICT r8 task 3 / ADVICE r8: the Knuth multiplicative hash overflows
BIGINT once the key exceeds ~3.47e9 (2^63 / 2654435761). At driver
scales every fixture id is < 2^31 so nothing misbehaves — but at the
claimed 100 TB headroom ANSI engines raise on the overflow while
non-ANSI Spark wraps, breaking both the oracle match and the certified
ANSI invariance exactly where there is no fixture coverage. The proven
form mod-reduces the key BEFORE the multiply; with modulus 2^31-1 the
product is bounded by (2^31-2)*2654435761 < 2^63 AND the reduce is the
identity for keys below 2^31, so every historical result is
bit-unchanged.

This test sweeps the package source for ``* 2654435761`` and requires
each site to either (a) mod-reduce its operand first, or (b) be one of
the explicitly allowlisted bounded-index sites (where the multiplicand
is a small series index, not a row-scaling id).
"""

from __future__ import annotations

import pathlib
import re

import pytest

PKG = pathlib.Path(__file__).resolve().parents[1] / "big_data_streaming_spark"

# Multiplicands proven bounded (a per-row series index k, never an id):
# the product is <= bound * 2654435761 << 2^63 by construction.
_ALLOWED_BOUNDED = (
    # workload/text.py q_audio_clip_detect: g.k < n <= 500 (generate_series
    # capped at 100000 by the join predicate) — product <= 2.7e14.
    "(p.seed + g.k * 2654435761) % 65536",
    # functions/multimodal.py synth tone: k is a Python loop index over a
    # fixed small component count — product is a compile-time constant.
    "(seed + k * F.lit(2654435761)) % 65536",
    # ... and the docstring line describing the same bounded formula.
    "m_k = (seed + k * 2654435761) % 65536",
)

# A reduce that provably bounds the operand below 2^63 / 2654435761:
# 2^31-1 (id sites), the KMV ring modulus, or the 1e6+3 prime.
_REDUCE = re.compile(
    r"%\s*(?:F\.lit\()?\s*(?:2147483647|1000003|_KMV_M|\{_KMV_M\})\s*\)+\s*$"
)


def _sites() -> list[tuple[pathlib.Path, int, str]]:
    out: list[tuple[pathlib.Path, int, str]] = []
    for path in sorted(PKG.rglob("*.py")):
        text = path.read_text()
        for i, line in enumerate(text.splitlines(), start=1):
            stripped = line.split("#", 1)[0]
            if re.search(r"\*\s*(?:F\.lit\()?\s*2654435761", stripped):
                out.append((path, i, line))
    return out


def test_every_multiplicative_hash_site_is_reduce_first_or_bounded() -> None:
    sites = _sites()
    # The sweep must actually see the known sites (guards against the
    # regex silently matching nothing after a refactor).
    assert len(sites) >= 10, sites
    offenders: list[str] = []
    for path, lineno, line in sites:
        if any(allowed in line for allowed in _ALLOWED_BOUNDED):
            continue
        # The operand (everything on the line before the ``*``) must end
        # with a bounding reduce — `(x % 2147483647) * 2654435761`,
        # `% _KMV_M) * 2654435761 + 12345`, etc. Multi-line expressions
        # (KMV SQL wraps the reduce onto the previous line) are handled
        # by also accepting a reduce at the end of the preceding line.
        before = re.split(r"\*\s*(?:F\.lit\()?\s*2654435761", line)[0].rstrip()
        prev = path.read_text().splitlines()[lineno - 2].rstrip() if lineno > 1 else ""
        if _REDUCE.search(before) or (
            not before.strip() or before.strip().endswith("(")
        ) and _REDUCE.search(prev):
            continue
        if _REDUCE.search(before + ")"):  # `% _KMV_M) * 2654...` same line
            continue
        offenders.append(f"{path.relative_to(PKG.parent)}:{lineno}: {line.strip()}")
    assert not offenders, (
        "unreduced multiplicative hash on a potentially row-scaling key "
        "(mod-reduce before the multiply, or allowlist a bounded index):\n"
        + "\n".join(offenders)
    )


def test_reduced_form_is_identity_below_2_31_and_bounded_above() -> None:
    """Spec replica of the sweep's two safety claims, pure Python."""
    k_hash = 2654435761
    p = 2147483647
    for key in (0, 1, 12345, 99999, 149999, 2**31 - 2):
        assert ((key % p) * k_hash) % 4294967296 == (key * k_hash) % 4294967296
    # Past 2^63 / 2654435761 ~ 3.47e9 the unreduced product overflows
    # int64; the reduced one never does (checked with unbounded ints).
    for key in (3_480_000_000, 10**10, 10**15, 2**62):
        assert (key % p) * k_hash + 12345 < 2**63
        assert key * k_hash >= 2**63  # the bug the sweep removes
    # Between 2^31 and the overflow knee the unreduced form is still
    # in-range but the reduce is no longer the identity — acceptable:
    # the hash was never a published contract above driver id ranges.
    assert (2**31) * k_hash < 2**63


def test_spark_side_matches_duckdb_on_post_overflow_keys(spark) -> None:
    """The actual 100 TB regression test: ids past 2^31 must hash
    identically in Spark (non-ANSI wrap territory before the sweep) and
    DuckDB (ANSI raise territory) — possible only with the reduce-first
    form."""
    duckdb = pytest.importorskip("duckdb")

    expr = "((id % 2147483647) * 2654435761) % 4294967296"
    ids = [1, 2**31 - 1, 2**31, 3_470_000_000, 10**12, 2**62]
    sdf = spark.createDataFrame([(i,) for i in ids], "id long")
    got = {
        r["id"]: r["h"]
        for r in sdf.selectExpr("id", f"{expr} AS h").collect()
    }
    con = duckdb.connect()
    want = dict(
        con.execute(
            f"SELECT id, {expr} AS h FROM (SELECT UNNEST(?) AS id)", [ids]
        ).fetchall()
    )
    assert got == want
