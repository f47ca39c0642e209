"""As-of join tests: both strategies (cogroup+merge_asof, range-join+rank)
must agree with each other and with hand-computed expectations."""

import datetime as dt

from storm_spark.functions.temporal import asof_join, asof_join_ranked


def _data(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", dt.datetime(2024, 1, 1, 10)),
            (2, "u1", dt.datetime(2024, 1, 1, 12)),
            (3, "u2", dt.datetime(2024, 1, 1, 9)),
            (4, "u3", dt.datetime(2024, 1, 1, 9)),  # no orders for u3
        ],
        "event_id bigint, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", dt.datetime(2024, 1, 1, 9), 100),
            ("u1", dt.datetime(2024, 1, 1, 11), 101),
            ("u1", dt.datetime(2024, 1, 1, 13), 102),  # after both events
            ("u2", dt.datetime(2024, 1, 1, 9), 200),  # exact-time match
        ],
        "user string, ots timestamp, order_id bigint",
    )
    return left, right


EXPECTED = {1: 100, 2: 101, 3: 200, 4: None}


def test_asof_cogroup(spark):
    left, right = _data(spark)
    out = asof_join(left, right, on="user", left_ts="ts", right_ts="ots")
    got = {r["event_id"]: r["order_id"] for r in out.collect()}
    assert got == EXPECTED


def test_asof_ranked(spark):
    left, right = _data(spark)
    out = asof_join_ranked(left, right, on="user", left_ts="ts", right_ts="ots")
    got = {r["event_id"]: r["order_id"] for r in out.collect()}
    assert got == EXPECTED


def test_strategies_agree_on_real_data(spark):
    from pyspark.sql import functions as F

    from storm_spark.queries import _events, _t

    sf = "/root/testdata/sf0.001"
    ev = _events(spark, sf).select("event_id", "user_id", "ts").limit(200)
    orders = (
        _t(spark, sf, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), F.col("o_orderdate").alias("ots"))
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    a = {
        r["event_id"]: r["o_orderkey"]
        for r in asof_join(ev, orders, "user_id", "ts", "ots").collect()
    }
    b = {
        r["event_id"]: r["o_orderkey"]
        for r in asof_join_ranked(ev, orders, "user_id", "ts", "ots").collect()
    }
    assert a == b and len(a) == 200


def test_stream_window_aggregate(spark):
    from pyspark.sql import functions as F

    from storm_spark.topology import Topology

    df = spark.createDataFrame(
        [("2024-01-01 10:05:00", "a", 2), ("2024-01-01 10:55:00", "a", 3),
         ("2024-01-01 11:05:00", "a", 5), ("2024-01-01 10:10:00", "b", 7)],
        "ts string, k string, v long",
    ).select(F.to_timestamp("ts").alias("ts"), "k", "v")
    topo = Topology(spark)
    out = (
        topo.new_stream("e", df)
        .window_aggregate("ts", "1 hour", ["k"], {"total": F.sum("v"), "n": F.count("*")})
        .df.collect()
    )
    got = sorted((str(r.window_start), r.k, r.total, r.n) for r in out)
    assert got == [
        ("2024-01-01 10:00:00", "a", 5, 2),
        ("2024-01-01 10:00:00", "b", 7, 1),
        ("2024-01-01 11:00:00", "a", 5, 1),
    ]


def test_stream_session_aggregate(spark):
    from pyspark.sql import functions as F

    from storm_spark.topology import Topology

    df = spark.createDataFrame(
        [("2024-01-01 10:00:00", "u"), ("2024-01-01 10:04:00", "u"),
         ("2024-01-01 12:00:00", "u")],
        "ts string, k string",
    ).select(F.to_timestamp("ts").alias("ts"), "k")
    topo = Topology(spark)
    out = (
        topo.new_stream("e", df)
        .session_aggregate("ts", "10 minutes", ["k"], {"n": F.count("*")})
        .df.collect()
    )
    assert sorted(r.n for r in out) == [1, 2]


def test_window_aggregate_validates_fields(spark):
    import pytest as _pytest

    from storm_spark.topology import Topology
    from pyspark.sql import functions as F

    df = spark.range(3).selectExpr("current_timestamp() as ts", "id as k")
    topo = Topology(spark)
    s = topo.new_stream("e", df)
    with _pytest.raises(ValueError):
        s.window_aggregate("nope", "1 hour", ["k"], {"n": F.count("*")})


def test_range_join_bucketed_matches_naive(spark):
    from pyspark.sql import functions as F

    from storm_spark.functions.temporal import range_join

    pts = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 250), (3, "b", 100), (4, "a", 900)],
        "id bigint, k string, ts bigint",
    )
    iv = spark.createDataFrame(
        # interval spanning multiple buckets + exclusive-end edge case
        [("a", 50, 300, "w1"), ("a", 300, 901, "w2"), ("b", 0, 100, "w3")],
        "k string, s bigint, e bigint, w string",
    )
    got = range_join(pts, iv, "ts", "s", "e", on=["k"], bucket_seconds=100)
    naive = pts.join(iv, ["k"]).filter((F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e")))
    assert sorted(map(tuple, got.select("id", "w").collect())) == sorted(
        map(tuple, naive.select("id", "w").collect())
    )
    # exclusive end: ts=100 not in w3 [0,100)
    assert ("3",) not in {tuple(map(str, r)) for r in got.select("id").collect()}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        range_join(pts, iv, "ts", "s", "e", how="left")


def test_rolling_distinct_count(spark):
    import datetime as dt

    from storm_spark.functions.temporal import rolling_distinct_count

    rows = [
        # u1 active day 1; u2 active days 1 and 3; u3 active day 10
        (dt.datetime(2024, 1, 1, 8), 1),
        (dt.datetime(2024, 1, 1, 9), 1),   # same user+day: dedups
        (dt.datetime(2024, 1, 1, 10), 2),
        (dt.datetime(2024, 1, 3, 12), 2),
        (dt.datetime(2024, 1, 10, 1), 3),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, user_id bigint")
    out = {
        r.window_day.isoformat(): r.active
        for r in rolling_distinct_count(df, "ts", "user_id", window_days=7,
                                        out_count="active").collect()
    }
    assert out["2024-01-01"] == 2          # u1, u2
    assert out["2024-01-03"] == 2          # u1, u2 still in trailing 7d
    assert out["2024-01-07"] == 2          # day-1 activity still visible
    assert out["2024-01-08"] == 1          # day 1 aged out; day-3 u2 remains
    assert out["2024-01-09"] == 1
    assert out["2024-01-10"] == 1          # only u3
    assert "2024-01-17" not in out         # windows end 6 days after last event
    assert out["2024-01-16"] == 1


def test_unigram_surprisal(spark):
    import math

    from storm_spark.functions.text import unigram_surprisal

    df = spark.createDataFrame(
        [(1, "the the the"), (2, "the rare")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: (r.n_tokens, r.surprisal) for r in unigram_surprisal(df).collect()}
    # corpus: the×4, rare×1, total 5
    s_the = -math.log(4 / 5)
    s_rare = -math.log(1 / 5)
    assert out[1] == (3, round(s_the, 6))
    assert out[2] == (2, round((s_the + s_rare) / 2, 6))


def test_funnel_order_matters(spark):
    """A user who clicks BEFORE their first view hasn't converted: funnel
    steps must happen strictly after the previous step's first touch."""
    from datetime import datetime

    from storm_spark.functions.temporal import funnel_counts

    T = datetime
    rows = [
        # u1: view -> click -> purchase (full conversion)
        (1, T(2024, 1, 1, 10), "view"), (1, T(2024, 1, 1, 11), "click"),
        (1, T(2024, 1, 1, 12), "purchase"),
        # u2: click before first view -> stops at step 1
        (2, T(2024, 1, 1, 9), "click"), (2, T(2024, 1, 1, 10), "view"),
        # u3: view then click, no purchase -> step 2
        (3, T(2024, 1, 2, 8), "view"), (3, T(2024, 1, 2, 9), "click"),
        # u4: never views -> not in funnel at all
        (4, T(2024, 1, 3, 8), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_type string")
    out = {r.step: r.n_users for r in
           funnel_counts(df, "user_id", "ts", "event_type", ["view", "click", "purchase"]).collect()}
    assert out == {1: 3, 2: 2, 3: 1}


def test_retention_triangle(spark):
    from datetime import datetime

    from storm_spark.functions.temporal import retention_cohorts

    T = datetime
    rows = [
        # u1 joins week of Jan 1 (Mon), active weeks 0, 1, 3
        (1, T(2024, 1, 2)), (1, T(2024, 1, 10)), (1, T(2024, 1, 24)),
        # u2 joins same week, active week 0 only
        (2, T(2024, 1, 5)),
        # u3 joins week of Jan 8, active weeks 0 and 1
        (3, T(2024, 1, 9)), (3, T(2024, 1, 16)),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    out = {(str(r.cohort_week), r.week_offset): r.n_active
           for r in retention_cohorts(df, "user_id", "ts").collect()}
    assert out == {
        ("2024-01-01", 0): 2, ("2024-01-01", 1): 1, ("2024-01-01", 3): 1,
        ("2024-01-08", 0): 1, ("2024-01-08", 1): 1,
    }


def test_funnel_matches_naive_model(spark):
    """Seeded-random sweep vs an in-Python first-touch funnel model."""
    import random
    from datetime import datetime, timedelta

    from storm_spark.functions.temporal import funnel_counts

    rng = random.Random(7)
    steps = ["A", "B", "C"]
    for case in range(6):
        rows = []
        for u in range(rng.randint(1, 8)):
            for _ in range(rng.randint(0, 12)):
                rows.append(
                    (
                        u,
                        datetime(2024, 1, 1) + timedelta(minutes=rng.randint(0, 500)),
                        rng.choice(steps + ["X"]),
                    )
                )
        if not rows:
            continue
        df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_type string")

        def model():
            by_user = {}
            for u, t, e in rows:
                by_user.setdefault(u, []).append((t, e))
            counts = [0] * len(steps)
            for evs in by_user.values():
                frontier = None
                for i, s in enumerate(steps):
                    cand = [t for t, e in evs if e == s and (frontier is None or t > frontier)]
                    if not cand:
                        break
                    frontier = min(cand)
                    counts[i] += 1
            return {i + 1: c for i, c in enumerate(counts) if c > 0}

        got = {
            r.step: r.n_users
            for r in funnel_counts(df, "user_id", "ts", "event_type", steps).collect()
            if r.n_users > 0
        }
        assert got == model(), (case, rows)


def test_retention_matches_naive_model(spark):
    """Seeded-random sweep vs an in-Python cohort model."""
    import random
    from datetime import date, datetime, timedelta

    from storm_spark.functions.temporal import retention_cohorts

    rng = random.Random(11)
    for case in range(6):
        rows = [
            (u, datetime(2024, 1, 1) + timedelta(days=rng.randint(0, 60)))
            for u in range(rng.randint(1, 6))
            for _ in range(rng.randint(1, 5))
        ]
        df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")

        def wk(d: datetime) -> date:
            dd = d.date()
            return dd - timedelta(days=dd.weekday())

        def model():
            weeks = {}
            for u, t in rows:
                weeks.setdefault(u, set()).add(wk(t))
            out = {}
            for u, ws in weeks.items():
                cw = min(ws)
                for w in ws:
                    off = (w - cw).days // 7
                    if off <= 12:
                        out[(cw, off)] = out.get((cw, off), 0) + 1
            return out

        got = {
            (r.cohort_week, r.week_offset): r.n_active
            for r in retention_cohorts(df, "user_id", "ts").collect()
        }
        assert got == model(), (case, rows)


def test_funnel_null_timestamps_never_qualify(spark):
    """A NULL-ts event must not advance a stage (nor poison the frontier so
    later events advance unconditionally) — matches the SQL twin where
    `ts > frontier` is never true for NULL."""
    from datetime import datetime

    from storm_spark.functions.temporal import funnel_counts

    T = datetime
    rows = [
        # u1: NULL-ts view, then click/purchase BEFORE any real view
        (1, None, "view"), (1, T(2024, 1, 1, 9), "click"), (1, T(2024, 1, 1, 10), "purchase"),
        (1, T(2024, 1, 1, 11), "view"),
        # u2: clean full conversion for contrast
        (2, T(2024, 1, 2, 1), "view"), (2, T(2024, 1, 2, 2), "click"),
        (2, T(2024, 1, 2, 3), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_type string")
    out = {r.step: r.n_users for r in
           funnel_counts(df, "user_id", "ts", "event_type", ["view", "click", "purchase"]).collect()}
    # u1 reaches only step 1 (the 11:00 view); u2 completes all three
    assert out == {1: 2, 2: 1, 3: 1}


def test_gap_fill_grid_and_forward_fill(spark):
    """Dense grid from first to last bucket per group; holes carry the last
    observed value with is_gap=true; bucket sums aggregate within-bucket."""
    from datetime import datetime

    from storm_spark.functions.temporal import gap_fill

    T = datetime
    rows = [
        # group g: events in hours 0, 0 (same bucket), 3 — holes at 1, 2
        ("g", T(2024, 1, 1, 0, 10), 5.0),
        ("g", T(2024, 1, 1, 0, 50), 7.0),
        ("g", T(2024, 1, 1, 3, 0), 11.0),
        # group h: single bucket -> single-row grid, no gaps
        ("h", T(2024, 1, 2, 6, 30), 2.0),
    ]
    df = spark.createDataFrame(rows, "grp string, ts timestamp, v double")
    out = {
        (r.grp, r.bucket): (r.value_c, r.is_gap)
        for r in gap_fill(df, "grp", "ts", "v", step_seconds=3600).collect()
    }
    h0 = int(T(2024, 1, 1, 0, 0).timestamp())  # conftest pins session TZ UTC
    assert out[("g", h0)] == (12.0, False)
    assert out[("g", h0 + 3600)] == (12.0, True)
    assert out[("g", h0 + 7200)] == (12.0, True)
    assert out[("g", h0 + 10800)] == (11.0, False)
    hh = int(T(2024, 1, 2, 6, 0).timestamp())
    assert out[("h", hh)] == (2.0, False)
    assert len(out) == 5


def test_gap_fill_never_leaks_across_groups(spark):
    """Forward fill is per-group: a hole in one group must not read another
    group's value even when buckets interleave."""
    from datetime import datetime

    from storm_spark.functions.temporal import gap_fill

    T = datetime
    rows = [
        ("a", T(2024, 1, 1, 0), 1.0),
        ("b", T(2024, 1, 1, 1), 100.0),
        ("a", T(2024, 1, 1, 2), 3.0),
    ]
    df = spark.createDataFrame(rows, "grp string, ts timestamp, v double")
    out = {
        (r.grp, r.bucket): (r.value_c, r.is_gap)
        for r in gap_fill(df, "grp", "ts", "v", step_seconds=3600).collect()
    }
    h0 = int(T(2024, 1, 1, 0).timestamp())
    assert out[("a", h0 + 3600)] == (1.0, True)  # filled from a's hour 0, not b's 100
    assert len([k for k in out if k[0] == "b"]) == 1


def test_event_transitions_counts_and_order(spark):
    from datetime import datetime

    from storm_spark.functions.temporal import event_transitions

    T = datetime
    rows = [
        # u1: a -> b -> a ; u2: b -> b ; u3 single event (no transition)
        (1, T(2024, 1, 1, 0), 1, "a"), (1, T(2024, 1, 1, 1), 2, "b"),
        (1, T(2024, 1, 1, 2), 3, "a"),
        (2, T(2024, 1, 2, 0), 4, "b"), (2, T(2024, 1, 2, 1), 5, "b"),
        (3, T(2024, 1, 3, 0), 6, "a"),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_id bigint, event_type string")
    got = {(r.from_type, r.to_type): r.n for r in
           event_transitions(df, "user_id", "event_type", ["ts", "event_id"]).collect()}
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("b", "b"): 1}
    # ties on ts break by event_id: same-ts pair still one deterministic order
    tied = spark.createDataFrame(
        [(9, T(2024, 1, 1), 1, "x"), (9, T(2024, 1, 1), 2, "y")],
        "user_id bigint, ts timestamp, event_id bigint, event_type string",
    )
    got2 = {(r.from_type, r.to_type): r.n for r in
            event_transitions(tied, "user_id", "event_type", ["ts", "event_id"]).collect()}
    assert got2 == {("x", "y"): 1}


def test_series_vectors_grid_and_centering(spark):
    from datetime import datetime

    from storm_spark.functions.temporal import series_vectors

    T = datetime
    rows = [
        ("a", T(2024, 1, 1, 0, 30), 6), ("a", T(2024, 1, 1, 0, 40), 6),
        ("a", T(2024, 1, 1, 2, 0), 3),
        ("b", T(2024, 1, 1, 1, 0), 9),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v bigint")
    got = {r.k: r.series for r in series_vectors(df, "k", "ts", "v", 3600).collect()}
    # global grid spans hours 0..2 for BOTH keys; a: [12,0,3] centered by 5;
    # b: [0,9,0] centered by 3
    assert got["a"] == [7.0, -5.0, -2.0]
    assert got["b"] == [-3.0, 6.0, -3.0]


def test_series_similarity_finds_shape_match(spark):
    """Centered cosine matches SHAPE, not magnitude: a 10x-scaled copy of
    the query's curve must outrank an equal-magnitude but differently-shaped
    series."""
    from datetime import datetime

    from storm_spark.functions.temporal import series_similarity_topk

    T = datetime
    base = [5, 1, 8, 2, 9, 3]
    rows = []
    for h, v in enumerate(base):
        rows.append((0, T(2024, 1, 1, h), v))          # query
        rows.append((1, T(2024, 1, 1, h), v * 10))     # scaled copy (same shape)
    for h, v in enumerate(reversed(base)):
        rows.append((2, T(2024, 1, 1, h), v))          # reversed shape
    df = spark.createDataFrame(rows, "k bigint, ts timestamp, v bigint")
    out = series_similarity_topk(df, "k", "ts", "v", query_keys=[0], step_seconds=3600, k=2)
    ranked = sorted([(r.rank, r.neighbor_key, r.sim) for r in out.collect()])
    assert ranked[0][1] == 1 and ranked[0][2] == 1.0  # scaled copy: perfect correlation
    assert ranked[1][1] == 2 and ranked[1][2] < 0.5   # reversed shape ranks below


def test_scd2_from_history_collapses_runs(spark):
    from datetime import datetime

    from storm_spark.functions.temporal import scd2_current, scd2_from_history

    T = datetime
    rows = [
        # u1: a a b a  -> intervals a[0,2) b[2,3) a[3,-)
        (1, T(2024, 1, 1, 0), 10, "a"),
        (1, T(2024, 1, 1, 1), 11, "a"),
        (1, T(2024, 1, 1, 2), 12, "b"),
        (1, T(2024, 1, 1, 3), 13, "a"),
        # u2: single state -> one open interval
        (2, T(2024, 1, 1, 0), 20, "x"),
        (2, T(2024, 1, 1, 5), 21, "x"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint, state string"
    )
    dim = scd2_from_history(df, "user_id", ["state"], ["ts", "event_id"])
    got = sorted(
        (r.user_id, r.state, r.valid_from.hour, r.valid_to.hour if r.valid_to else None)
        for r in dim.collect()
    )
    assert got == [
        (1, "a", 0, 2),
        (1, "a", 3, None),
        (1, "b", 2, 3),
        (2, "x", 0, None),
    ]
    cur = sorted((r.user_id, r.state) for r in scd2_current(dim).collect())
    assert cur == [(1, "a"), (2, "x")]


def test_scd2_null_safe_attribute_comparison(spark):
    """NULL→NULL is unchanged (one run); NULL→value is a new version."""
    from datetime import datetime

    from storm_spark.functions.temporal import scd2_from_history

    T = datetime
    rows = [
        (1, T(2024, 1, 1, 0), 1, None),
        (1, T(2024, 1, 1, 1), 2, None),   # still the NULL run
        (1, T(2024, 1, 1, 2), 3, "v"),    # new version
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint, state string"
    )
    dim = scd2_from_history(df, "user_id", ["state"], ["ts", "event_id"])
    got = sorted(
        ((r.state, r.valid_from.hour) for r in dim.collect()),
        key=lambda t: t[1],
    )
    assert got == [(None, 0), ("v", 2)]


def test_scd2_single_exchange_plan(spark):
    """Both windows (change-point lag, interval-closing lead) share one
    key-keyed Exchange — no second shuffle."""
    from datetime import datetime

    from storm_spark.functions.temporal import scd2_from_history

    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), 1, "a")],
        "user_id bigint, ts timestamp, event_id bigint, state string",
    )
    plan = (
        scd2_from_history(df, "user_id", ["state"], ["ts", "event_id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_event_paths_hand_computed(spark):
    from storm_spark.functions.temporal import event_paths

    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "b"),  # abc, bcb
        (2, 1, "a"), (2, 2, "b"), (2, 3, "c"),               # abc
        (3, 1, "x"), (3, 2, "y"),                            # too short for n=3
    ]
    df = spark.createDataFrame(rows, "u bigint, seq bigint, t string")
    got = {r.path: r.n_occurrences
           for r in event_paths(df, "u", "t", ["seq"], n=3).collect()}
    assert got == {"a>b>c": 2, "b>c>b": 1}


def test_event_paths_n2_equals_transitions(spark):
    """n=2 must reproduce event_transitions' pair counts exactly."""
    from storm_spark.functions.temporal import event_paths, event_transitions

    rows = [(u, s, t) for u in (1, 2) for s, t in enumerate("abcab")]
    df = spark.createDataFrame(rows, "u bigint, seq bigint, t string")
    paths = {r.path: r.n_occurrences
             for r in event_paths(df, "u", "t", ["seq"], n=2).collect()}
    trans = {f"{r.from_type}>{r.to_type}": r.n
             for r in event_transitions(df, "u", "t", ["seq"]).collect()}
    assert paths == trans


def test_event_paths_rejects_n1(spark):
    import pytest as _pytest

    from storm_spark.functions.temporal import event_paths

    df = spark.createDataFrame([(1, 1, "a")], "u bigint, seq bigint, t string")
    with _pytest.raises(ValueError):
        event_paths(df, "u", "t", ["seq"], n=1)


def test_merge_intervals_long_interval_swallows(spark):
    """An early LONG interval must swallow several short later ones —
    the case a lag(end)-based formulation (previous row only) gets wrong:
    [0,100] ∪ [10,20] ∪ [30,40] is ONE span even though [30,40] does not
    touch [10,20]. Touching intervals ([100,110]) merge; a strict gap
    ([150,160]) splits."""
    from storm_spark.functions.temporal import merge_intervals

    rows = [
        (1, 0, 100), (1, 10, 20), (1, 30, 40), (1, 100, 110), (1, 150, 160),
        (2, 5, 6),
    ]
    df = spark.createDataFrame(rows, "k long, s long, e long")
    got = {
        (r.key, r.span_start, r.span_end, r.n_intervals)
        for r in merge_intervals(df, "k", "s", "e").collect()
    }
    assert got == {(1, 0, 110, 4), (1, 150, 160, 1), (2, 5, 6, 1)}, got


def test_seasonal_baseline_integer_exact_boundary(spark):
    """The anomaly test is integer-exact: values 0,0,0,4 at one hour have
    mean 1 and population sd sqrt(3) = 1.732; the deviation of v=4 is 3,
    which exceeds 1*sd (anomaly at k=1) but not 2*sd (clean at k=2) —
    both decided by the integer inequality, no float comparison."""
    from datetime import datetime

    from storm_spark.functions.temporal import seasonal_baseline

    t = datetime(2024, 1, 1, 9, 30)
    rows = [(1, t, v) for v in (0, 0, 0, 4)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v long")
    r1 = seasonal_baseline(df, "k", "ts", "v", sigma_k=1).collect()[0]
    assert (r1.n, r1.hod, r1.n_anomalies) == (4, 9, 1), r1
    assert r1.mean_v == 1.0
    r2 = seasonal_baseline(df, "k", "ts", "v", sigma_k=2).collect()[0]
    assert r2.n_anomalies == 0, r2
