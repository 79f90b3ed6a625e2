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
TUMBLING_WINDOW_MINUTES = 60   # q41 default; oracles derive from these
HOPPING_SLIDE_MINUTES = 30     # q42 slide (window = 2 * slide)

def epoch_us(col: str | Column) -> Column:
    """Wall-clock epoch microseconds of a TIMESTAMP_NTZ column —
    session-timezone-independent, bit-equal to DuckDB ``epoch_us``.
    (LTZ inputs are first cast to NTZ, i.e. read as wall-clock.)"""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        c.cast("timestamp_ntz"))


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


def _dec_sum(value_col: str) -> Column:
    """Exact-decimal sum cast back to double — the repo's bit-parity
    convention for double sums compared against DuckDB."""
    return (F.sum(F.col(value_col).cast("decimal(18,4)")).cast("double")
            .alias("total_value"))


def session_stats(events: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts", value_col: str = "value",
                  gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """Per-user session aggregates via Spark's NATIVE
    ``session_window`` (the streaming-capable gap-merge operator, also
    the batch spelling here).  The engine's merge is end-INCLUSIVE: an
    event at exactly ``last_event + gap`` (the window end) still
    EXTENDS the session, so a new session starts only when the gap is
    strictly ``> gap`` — the same boundary rule as :func:`sessionize`
    (measured and pinned by
    tests/test_temporal.py::test_session_stats_boundary; the window
    struct's end itself remains ``last_event + gap``).

    One hashpartitioning(user, session_window) exchange after a
    map-side partial merge — no per-user global sort."""
    sw = F.session_window(ts_col, f"{gap_minutes} minutes")
    return (events.groupBy(user_col, sw.alias("w"))
            .agg(F.count("*").alias("n_events"), _dec_sum(value_col))
            .select(user_col,
                    epoch_us(F.col("w.start")).alias("session_start_us"),
                    epoch_us(F.col("w.end")).alias("session_end_us"),
                    "n_events", "total_value"))


def tumbling_rollup(events: DataFrame, ts_col: str = "ts",
                    key_col: str = "event_type",
                    value_col: str = "value",
                    window_minutes: int = TUMBLING_WINDOW_MINUTES
                    ) -> DataFrame:
    """Fixed (tumbling) event-time windows per key: Spark's native
    ``window()`` — epoch-aligned on the NTZ wall clock, so the bucket
    start is exactly ``floor(epoch_us / width) * width``; pure
    partial+final hash aggregation, one exchange."""
    w = F.window(ts_col, f"{window_minutes} minutes")
    return (events.groupBy(w.alias("w"), key_col)
            .agg(F.count("*").alias("n_events"), _dec_sum(value_col))
            .select(epoch_us(F.col("w.start")).alias("window_start_us"),
                    key_col, "n_events", "total_value"))


def hopping_rollup(events: DataFrame, ts_col: str = "ts",
                   key_col: str = "event_type",
                   value_col: str = "value",
                   window_minutes: int = 2 * HOPPING_SLIDE_MINUTES,
                   slide_minutes: int = HOPPING_SLIDE_MINUTES
                   ) -> DataFrame:
    """Hopping (sliding) event-time windows: each event lands in
    ``window/slide`` overlapping buckets — Spark expands them with an
    internal explode BEFORE the aggregation, so the shuffle carries
    the already-combined partials, not window/slide copies of the raw
    events."""
    w = F.window(ts_col, f"{window_minutes} minutes",
                 f"{slide_minutes} minutes")
    return (events.groupBy(w.alias("w"), key_col)
            .agg(F.count("*").alias("n_events"), _dec_sum(value_col))
            .select(epoch_us(F.col("w.start")).alias("window_start_us"),
                    key_col, "n_events", "total_value"))
