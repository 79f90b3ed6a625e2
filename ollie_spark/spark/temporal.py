"""Temporal / event-stream operators over the events table:
gap-based sessionization and as-of (most-recent-prior) attachment.

Both are per-user partitioned windows — the scalable spelling of
operator classes a naive implementation gets wrong at 100 TB: a
global ORDER BY ts is a SinglePartition window, and an as-of spelled
as a range self-join explodes O(events x events-per-user).  Here the
only shuffle is hashpartitioning(user_id); per-partition state is
bounded by one user's events.

Timestamps compare in integer MICROSECONDS (DuckDB `epoch_us`) so the
gap rule is bit-exact across engines — fractional-second doubles would
make boundary events engine-dependent.  Parquet timestamps arrive as
TIMESTAMP_NTZ, where `unix_micros` is a type error and a cast to LTZ
would silently inject the session timezone; `timestampdiff` against an
NTZ epoch literal is the timezone-independent micros spelling (equal
to DuckDB's epoch_us, which also treats the value as wall-clock).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MINUTES = 30  # the classic web-analytics session gap

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def epoch_us(col: str) -> Column:
    """Wall-clock epoch microseconds of a TIMESTAMP_NTZ column —
    session-timezone-independent, bit-equal to DuckDB ``epoch_us``.
    (LTZ inputs are first cast to NTZ, i.e. read as wall-clock.)"""
    return F.expr(
        f"timestampdiff(MICROSECOND, {_EPOCH_NTZ},"
        f" cast({col} as timestamp_ntz))")


def sessionize(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id",
               gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """Per-user session ids: a new session starts at a user's first
    event and whenever the gap from their previous event exceeds
    ``gap_minutes``; ``session_id`` is the 1-based running count of
    session starts in (ts, id) order.

    Two stacked windows share one partitioning+ordering (the lag flag,
    then its running sum), so Catalyst plans ONE exchange + one sort
    with two Window operators — no second shuffle."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    us = epoch_us(ts_col)
    prev = F.lag(us).over(w)
    flagged = events.select(
        id_col, user_col, ts_col,
        (prev.isNull()
         | ((us - prev) > gap_minutes * 60_000_000))
        .cast("long").alias("_new_session"))
    return flagged.select(
        id_col, user_col, ts_col,
        F.sum("_new_session").over(w).cast("bigint")
        .alias("session_id"))


def asof_attach(events: DataFrame, match_type: str = "purchase",
                user_col: str = "user_id", ts_col: str = "ts",
                id_col: str = "event_id", type_col: str = "event_type",
                value_col: str = "value") -> DataFrame:
    """As-of join expressed as a partitioned window: attach to every
    event the ``value_col`` of the user's most recent STRICTLY PRIOR
    ``match_type`` event (NULL when none).  ``last(..., ignorenulls)``
    over ROWS UNBOUNDED PRECEDING..1 PRECEDING is the shuffle-minimal
    spelling of the as-of semantics — a range self-join would be
    O(events x per-user-events) and a global sort a SinglePartition;
    this is one hashpartitioning(user) exchange."""
    w = (Window.partitionBy(user_col).orderBy(ts_col, id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    prior = F.last(
        F.when(F.col(type_col) == match_type, F.col(value_col)),
        ignorenulls=True).over(w)
    return events.select(
        id_col, user_col, type_col,
        prior.alias(f"last_{match_type}_value"))
