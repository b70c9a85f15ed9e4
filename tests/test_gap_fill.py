"""Time-series resample + forward fill (operators/windows.
resample_forward_fill). Oracle parity of the registered
events_gap_filled_hourly is covered by test_oracle_parity; here: the
operator contract on a hand-built series, in-bucket tie-break
determinism, and the one-shuffle plan claim."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nlp_with_pyspark_spark.operators.windows import resample_forward_fill
from nlp_with_pyspark_spark.plans.inspect import plan_string

W = 10  # bucket width (sec) for the hand-built series


def _df(spark, rows):
    # (user, sec, event_id, value) → the normalized events shape
    return spark.createDataFrame(
        [(u, s * 1_000_000_000, e, v) for u, s, e, v in rows],
        "user_id long, ts_ns long, event_id long, value double",
    )


def _got(df):
    return sorted(
        (r.user_id, r.bucket_start_epoch, r.value, r.is_gap) for r in df.collect()
    )


def test_gap_fill_matches_hand_computed(spark):
    rows = [
        # user 1: buckets 0, 30 observed — 10 and 20 are gaps carrying 1.5
        (1, 3, 100, 1.0),
        (1, 7, 101, 1.5),  # later in bucket 0: wins the bucket
        (1, 33, 102, 9.0),
        # user 2: single observation — one row, no gaps
        (2, 45, 200, 7.0),
    ]
    got = _got(resample_forward_fill(_df(spark, rows), width_sec=W))
    assert got == [
        (1, 0, 1.5, False),
        (1, 10, 1.5, True),
        (1, 20, 1.5, True),
        (1, 30, 9.0, False),
        (2, 40, 7.0, False),
    ]


def test_gap_fill_in_bucket_tiebreak_is_ts_then_id(spark):
    """Same bucket, same timestamp: the larger event_id wins — never
    partition-layout luck."""
    rows = [(1, 5, 7, 111.0), (1, 5, 9, 222.0), (1, 5, 8, 333.0)]
    for n_parts in (1, 7):
        df = _df(spark, rows).repartition(n_parts)
        got = _got(resample_forward_fill(df, width_sec=W))
        assert got == [(1, 0, 222.0, False)]


def test_gap_fill_single_shuffle_plan(spark):
    """The whole plan rides the ONE up-front repartition by key: the
    rank window, span agg, grid join and fill window all reuse
    hashpartitioning(user_id) via key-subset co-location."""
    rows = [(u, s, u * 100 + s, float(s)) for u in (1, 2, 3) for s in (0, 25, 60)]
    out = resample_forward_fill(_df(spark, rows), width_sec=W)
    plan = plan_string(out)
    n = sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line or "Exchange rangepartitioning" in line
    )
    assert n == 1, plan
    assert _got(out)  # and it still answers


def test_gap_fill_value_passes_through_exactly(spark):
    """No float arithmetic on the value path: every output value IS a
    stored input double (bit-identical membership check)."""
    rows = [(1, s, s, 0.1 + 0.2 * s) for s in range(0, 100, 7)]
    vals = {0.1 + 0.2 * s for s in range(0, 100, 7)}
    out = resample_forward_fill(_df(spark, rows), width_sec=W)
    assert {r.value for r in out.collect()} <= vals
