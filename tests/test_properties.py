"""Property-based checks (SURVEY.md §5.2): the batch stream operators
must agree with straightforward pure-Python models on arbitrary small
event sets, not just the fixtures."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from goeventstream_spark.operators import stream_ops as so

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("props", StringType()),
    ]
)

EPOCH = dt.datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user_id
        st.integers(min_value=0, max_value=600),  # seconds offset
    ),
    min_size=1,
    max_size=40,
)


def _mk_rows(pairs):
    return [
        (i, EPOCH + dt.timedelta(seconds=sec), u, "e", f'{{"i": {i}}}')
        for i, (u, sec) in enumerate(pairs)
    ]


@settings(max_examples=8, deadline=None)
@given(events_strategy)
def test_sessionize_matches_python_model(pairs):
    spark = _spark()
    rows = _mk_rows(pairs)
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        r.event_id: (r.user_id, r.session_id)
        for r in so.sessionize(df, gap_s=30).collect()
    }
    # python model: per user, sorted by (ts, event_id); new session when
    # gap > 30s
    by_user: dict = {}
    for i, ts, u, _t, _p in rows:
        by_user.setdefault(u, []).append((ts, i))
    want = {}
    for u, evs in by_user.items():
        evs.sort()
        sid = 0
        prev = None
        for ts, i in evs:
            if prev is None or (ts - prev).total_seconds() > 30:
                sid += 1
            want[i] = (u, sid)
            prev = ts
    assert got == want


@settings(max_examples=8, deadline=None)
@given(events_strategy)
def test_latest_state_matches_python_model(pairs):
    spark = _spark()
    rows = _mk_rows(pairs)
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.user_id: r.data for r in so.latest_state(df.withColumn("value", df.event_id * 1.0)).collect()}
    want: dict = {}
    best: dict = {}
    for i, ts, u, _t, p in rows:
        if u not in best or (ts, i) > best[u]:
            best[u] = (ts, i)
            want[u] = p
    assert got == want


_session = None


def _spark():
    global _session
    if _session is None:
        from goeventstream_spark import get_spark

        _session = get_spark(app_name="prop-tests", shuffle_partitions=4)
    return _session
