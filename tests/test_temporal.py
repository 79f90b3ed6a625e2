"""Temporal operators (ollie_spark.spark.temporal): semantics against
a hand-checkable crafted frame + an independent Python model on seeded
random data, and plan shape (one hashpartitioning(user) exchange, no
SinglePartition — the scalable spelling is the point of the module).

The DuckDB cross-engine check for the same operators runs in
tests/test_entry_oracle.py (q37/q38 entries over the driver's events
table); these tests pin the boundary semantics the oracle could only
falsify if the generated data happens to exercise them.
"""

import datetime as dt
import random

from ollie_spark.spark.temporal import (SESSION_GAP_MINUTES, asof_attach,
                                        epoch_us, hopping_rollup,
                                        session_stats, sessionize,
                                        tumbling_rollup)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
GAP = dt.timedelta(minutes=SESSION_GAP_MINUTES)
US = dt.timedelta(microseconds=1)


def _events(spark, rows):
    """rows: (event_id, user_id, ts, event_type, value)."""
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, "
              "event_type string, value double")


def test_sessionize_boundary_is_strict(spark):
    """A gap of EXACTLY gap_minutes stays in the session; one
    microsecond more starts a new one (the rule is `> gap`, and both
    engines compare integer micros, so the boundary is exact)."""
    rows = [
        (0, 1, T0, "view", 1.0),
        (1, 1, T0 + GAP, "view", 1.0),            # == gap: same session
        (2, 1, T0 + GAP + GAP + US, "view", 1.0),  # gap + 1us: new
        (3, 2, T0, "view", 1.0),                   # other user: own s1
    ]
    got = {r.event_id: r.session_id
           for r in sessionize(_events(spark, rows)).collect()}
    assert got == {0: 1, 1: 1, 2: 2, 3: 1}


def test_sessionize_ties_break_on_event_id(spark):
    """Equal timestamps order by event_id, so the running session count
    is deterministic under ties."""
    rows = [(i, 1, T0, "view", 1.0) for i in range(3)] + \
           [(3, 1, T0 + GAP + GAP, "view", 1.0)]
    got = {r.event_id: r.session_id
           for r in sessionize(_events(spark, rows)).collect()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 2}


def test_asof_is_strictly_prior(spark):
    """An event NEVER sees its own row (a purchase's attached value is
    the PREVIOUS purchase's), and events before any purchase get NULL."""
    rows = [
        (0, 1, T0, "view", 5.0),
        (1, 1, T0 + 1 * US, "purchase", 10.0),
        (2, 1, T0 + 2 * US, "purchase", 20.0),   # sees 10, not 20
        (3, 1, T0 + 3 * US, "view", 7.0),        # sees 20
        (4, 2, T0, "view", 1.0),                 # other user: NULL
    ]
    got = {r.event_id: r.last_purchase_value
           for r in asof_attach(_events(spark, rows)).collect()}
    assert got == {0: None, 1: None, 2: 10.0, 3: 20.0, 4: None}


def test_python_model_on_seeded_corpus(spark):
    """Independent driver-side model of both operators on a seeded
    random event stream with planted exact-boundary gaps and ts ties."""
    rng = random.Random(1736)
    rows, eid = [], 0
    for uid in range(8):
        t = T0 + dt.timedelta(seconds=rng.randrange(0, 3600))
        for _ in range(rng.randrange(5, 40)):
            step = rng.choice([
                dt.timedelta(0),                          # tie
                dt.timedelta(seconds=rng.randrange(1, 1800)),
                GAP,                                      # exact boundary
                GAP + US,                                 # just over
                dt.timedelta(minutes=rng.randrange(31, 120))])
            t = t + step
            rows.append((eid, uid, t,
                         rng.choice(["view", "view", "purchase", "error"]),
                         round(rng.uniform(0, 100), 2)))
            eid += 1
    rng.shuffle(rows)  # input order must not matter

    sess = {r.event_id: r.session_id
            for r in sessionize(_events(spark, rows)).collect()}
    asof = {r.event_id: r.last_purchase_value
            for r in asof_attach(_events(spark, rows)).collect()}

    gap_us = SESSION_GAP_MINUTES * 60_000_000
    by_user = {}
    for r in sorted(rows, key=lambda r: (r[1], r[2], r[0])):
        by_user.setdefault(r[1], []).append(r)
    for evs in by_user.values():
        sid, prev, last_purchase = 0, None, None
        for (e, _u, ts, typ, val) in evs:
            us = (ts - dt.datetime(1970, 1, 1)) // US  # exact int micros
            if prev is None or us - prev > gap_us:
                sid += 1
            prev = us
            assert sess[e] == sid, e
            assert asof[e] == last_purchase, e
            if typ == "purchase":
                last_purchase = val


def test_session_stats_boundary(spark):
    """Native session_window merges end-INCLUSIVELY: an event at
    exactly window-end (gap after the last event) EXTENDS the session;
    one microsecond more starts a new one.  Same `> gap` boundary as
    sessionize — this test is what measured that (the docs' [start,
    end) interval reads as if == gap would split; it does not), and it
    pins the q40 oracle's strict-> spelling."""
    rows = [
        (0, 1, T0, "view", 1.0),
        (1, 1, T0 + GAP, "view", 2.0),             # == gap: merges
        (2, 1, T0 + GAP + GAP + US, "view", 4.0),  # gap + 1us: new
    ]
    df = _events(spark, rows)
    got = sorted((r.session_start_us, r.session_end_us, r.n_events,
                  r.total_value)
                 for r in session_stats(df).collect())
    t0us = (T0 - dt.datetime(1970, 1, 1)) // US
    gapus = SESSION_GAP_MINUTES * 60_000_000
    assert got == [
        (t0us, t0us + 2 * gapus, 2, 3.0),
        (t0us + 2 * gapus + 1, t0us + 3 * gapus + 1, 1, 4.0),
    ]
    # sessionize agrees: two sessions, split at the same boundary
    assert [r.session_id for r in
            sessionize(df).orderBy("event_id").collect()] == [1, 1, 2]


def test_rollups_bucket_assignment(spark):
    """Tumbling: epoch-aligned floor buckets; hopping 1h/30m: every
    event in exactly two buckets, totals double the tumbling total."""
    rows = [
        (0, 1, T0, "view", 1.0),
        (1, 1, T0 + dt.timedelta(minutes=59, seconds=59), "view", 2.0),
        (2, 1, T0 + dt.timedelta(hours=1), "buy", 4.0),
    ]
    df = _events(spark, rows)
    t0us = (T0 - dt.datetime(1970, 1, 1)) // US
    hour = 3_600_000_000
    tumb = sorted((r.window_start_us, r.event_type, r.n_events)
                  for r in tumbling_rollup(df).collect())
    assert tumb == [(t0us, "view", 2), (t0us + hour, "buy", 1)]
    hop = hopping_rollup(df).collect()
    assert sum(r.n_events for r in hop) == 2 * len(rows)
    # the event at :59:59 is in buckets starting 23:30 and 00:00
    views = {r.window_start_us for r in hop if r.event_type == "view"}
    assert views == {t0us - hour // 2, t0us, t0us + hour // 2}


def test_plan_one_user_exchange_no_singlepartition(spark):
    """Both operators shuffle ONCE on hashpartitioning(user_id) and
    never plan a SinglePartition window — a global ORDER BY ts would;
    the stacked sessionize windows must share one exchange+sort."""
    df = _events(spark, [(0, 1, T0, "view", 1.0)])
    for frame in (sessionize(df), asof_attach(df), session_stats(df),
                  tumbling_rollup(df), hopping_rollup(df)):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan
        assert plan.count("Exchange hashpartitioning") == 1, plan
    # the windowed rollups must combine map-side (partial agg before
    # the exchange), so a hot window key never floods one reducer raw
    for frame in (tumbling_rollup(df), hopping_rollup(df)):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert plan.count("HashAggregate") >= 2, plan


def test_epoch_us_is_session_tz_independent(spark):
    """epoch_us reads NTZ wall-clock micros; flipping the session
    timezone must not move the value (unix_micros via an LTZ cast
    would shift it by the zone offset)."""
    df = _events(spark, [(0, 1, T0, "view", 1.0)])
    tz_conf = "spark.sql.session.timeZone"
    old = spark.conf.get(tz_conf)
    try:
        vals = []
        for tz in ("UTC", "America/New_York"):
            spark.conf.set(tz_conf, tz)
            vals.append(df.select(epoch_us("ts")).collect()[0][0])
    finally:
        spark.conf.set(tz_conf, old)
    assert vals[0] == vals[1] == 1704067200000000
