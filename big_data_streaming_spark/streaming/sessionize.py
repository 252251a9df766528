"""Custom stateful streaming operator: per-key sessionization via
``applyInPandasWithState`` — the escape hatch for semantics the built-in
``session_window`` can't express (e.g. emitting per-session early updates,
capping session length, custom merge logic).

State per user: (session_start, last_ts, n_events, total_value). An event
extends the session if it lands within ``gap`` of ``last_ts``; otherwise
the closed session is emitted and a fresh one opens. Event-time timeout
(``GroupStateTimeout.EventTimeTimeout``) closes idle sessions when the
watermark passes last_ts + gap — state size stays O(active keys), which is
what makes this viable on an unbounded 100 TB/day stream.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("closed_by", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("session_start", LongType()),  # epoch µs
        StructField("last_ts", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_GAP_US = 30 * 60 * 1_000_000  # 30 minutes in µs


def _us(ts: pd.Timestamp) -> int:
    return int(ts.value // 1_000)


def sessionize_fn(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Stateful kernel. Receives all rows for one user in the micro-batch
    (Arrow-batched), folds them into session state, emits closed sessions."""
    user_id = key[0]
    out: list[dict] = []

    if state.hasTimedOut:
        if state.exists:
            s0, last, n, tot = state.get
            out.append(
                _emit(user_id, s0, last, n, tot, "timeout")
            )
            state.remove()
        # Yield nothing when nothing closed: this function runs once per
        # KEY per micro-batch, and the finalization batch visits every
        # live key — an empty per-key DataFrame build is pure overhead
        # at that volume (round 12, guide §4.2 keep per-call Python work
        # proportional to output).
        if out:
            yield pd.DataFrame(
                out, columns=[f.name for f in SESSION_OUTPUT_SCHEMA.fields]
            )
        return

    if state.exists:
        s0, last, n, tot = state.get
    else:
        s0 = last = n = 0
        tot = 0.0

    batches = list(pdfs)
    # one Arrow batch per key is the common case — skip the concat copy
    rows = (batches[0] if len(batches) == 1 else pd.concat(batches)).sort_values("ts")
    # Late-but-admitted rows (earlier ts, later batch — sort_values only
    # orders within one batch) fall into three cases against the standing
    # session [s0, last]: inside-or-bridging (backward distance < gap,
    # strict — mirroring the forward extend's strict `< gap`) → fold with
    # monotone bounds; more than a gap BEFORE s0 → a distinct earlier
    # session (an "orphan"), accumulated separately and gap-closed (the
    # standing session proves a later event exists); on-time rows keep
    # the original extend/close logic.
    o_s0 = o_last = o_n = 0
    o_tot = 0.0
    for ts, value in zip(rows["ts"], rows["value"]):
        t_us = _us(ts)
        if n == 0:
            s0, last, n, tot = t_us, t_us, 1, float(value)
        elif t_us > s0 - _GAP_US and t_us - last < _GAP_US:
            s0, last = min(s0, t_us), max(last, t_us)
            n, tot = n + 1, tot + float(value)
            # A fold that lowers s0 can pull the standing session to
            # within one gap of the orphan accumulator (the orphan was
            # classified against the PRE-fold s0): batch order 11:59
            # (orphan vs s0=12:30), then 12:05 (folds, s0→12:05) leaves
            # 11:59 six minutes from s0. Gaps-and-islands semantics make
            # that ONE session — merge instead of emitting two.
            if o_n and o_last > s0 - _GAP_US:
                s0, n, tot = min(s0, o_s0), n + o_n, tot + o_tot
                o_s0 = o_last = o_n = 0
                o_tot = 0.0
        elif t_us <= s0 - _GAP_US:  # late orphan, >= one gap before
            if o_n and t_us - o_last < _GAP_US:
                o_last, o_n, o_tot = max(o_last, t_us), o_n + 1, o_tot + float(value)
            else:
                if o_n:
                    out.append(_emit(user_id, o_s0, o_last, o_n, o_tot, "gap"))
                o_s0, o_last, o_n, o_tot = t_us, t_us, 1, float(value)
        else:
            out.append(_emit(user_id, s0, last, n, tot, "gap"))
            s0, last, n, tot = t_us, t_us, 1, float(value)
    if o_n:
        if n and o_last > s0 - _GAP_US:  # bridge formed by the last fold
            s0, n, tot = min(s0, o_s0), n + o_n, tot + o_tot
        else:
            out.append(_emit(user_id, o_s0, o_last, o_n, o_tot, "gap"))

    state.update((s0, last, n, tot))
    # Clamp the timeout above the current watermark: applyInPandasWithState
    # does not pre-filter late input, so a row can arrive with ts behind
    # the watermark and last+gap would then sit at/behind it — Spark
    # rejects such timeouts with IllegalArgumentException, killing the
    # query. The clamped timeout fires on the next watermark advance,
    # closing the session as soon as legally possible anyway.
    timeout_ms = (last + _GAP_US) // 1_000  # ms for the API
    wm_ms = state.getCurrentWatermarkMs()
    if timeout_ms <= wm_ms:
        timeout_ms = wm_ms + 1
    state.setTimeoutTimestamp(timeout_ms)
    if out:  # see the timed-out branch: no empty-frame builds per key
        yield pd.DataFrame(
            out, columns=[f.name for f in SESSION_OUTPUT_SCHEMA.fields]
        )


def _emit(user_id, s0_us: int, last_us: int, n: int, tot: float, why: str) -> dict:
    return {
        "user_id": user_id,
        "session_start": pd.Timestamp(s0_us * 1_000),
        "session_end": pd.Timestamp((last_us + _GAP_US) * 1_000),
        "n_events": n,
        "total_value": tot,
        "closed_by": why,
    }


def sessionize(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """events(ts, user_id, value, …) → closed sessions, streaming."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.col("user_id"))
        .applyInPandasWithState(
            sessionize_fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
