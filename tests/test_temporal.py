"""asof_join vs pandas merge_asof; interval_join vs brute-force filter."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from xarray_beam_spark.operators.temporal import asof_join, interval_join


def _rand_frames(seed, n_left=400, n_right=300, keys=7):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, keys, n_left),
            "t": rng.integers(0, 1000, n_left).astype("int64"),
            "lid": np.arange(n_left, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, keys, n_right),
            "rt": rng.integers(0, 1000, n_right).astype("int64"),
            "val": rng.normal(size=n_right),
        }
    )
    # merge_asof demands unique-ish ordering; dedupe right on (k, rt) so the
    # asof winner is well-defined in both engines
    right = right.drop_duplicates(["k", "rt"], keep="last").reset_index(drop=True)
    return left, right


def _pandas_asof(left, right, direction, allow_exact, tolerance=None):
    out = pd.merge_asof(
        left.sort_values(["t", "lid"], kind="mergesort"),
        right.sort_values("rt", kind="mergesort"),
        left_on="t",
        right_on="rt",
        by="k",
        direction=direction,
        allow_exact_matches=allow_exact,
        tolerance=tolerance,
    )
    return out.sort_values("lid").reset_index(drop=True)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("allow_exact", [True, False])
def test_asof_matches_pandas(spark, direction, allow_exact):
    left, right = _rand_frames(seed=42)
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on=["k"],
            left_time="t",
            right_time="rt",
            direction=direction,
            allow_exact_matches=allow_exact,
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    want = _pandas_asof(left, right, direction, allow_exact)
    pd.testing.assert_frame_equal(
        got[["lid", "rt", "val"]], want[["lid", "rt", "val"]], check_dtype=False
    )


def test_asof_tolerance_and_inner(spark):
    left, right = _rand_frames(seed=7)
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on=["k"],
            left_time="t",
            right_time="rt",
            tolerance=F.lit(50),
            how="inner",
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    want = _pandas_asof(left, right, "backward", True, tolerance=50)
    want = want[want["rt"].notna()].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["lid", "rt", "val"]], want[["lid", "rt", "val"]], check_dtype=False
    )


def test_asof_nearest_with_tolerance(spark):
    left, right = _rand_frames(seed=19)
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on=["k"],
            left_time="t",
            right_time="rt",
            direction="nearest",
            tolerance=F.lit(25),
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    want = _pandas_asof(left, right, "nearest", True, tolerance=25)
    pd.testing.assert_frame_equal(
        got[["lid", "rt", "val"]], want[["lid", "rt", "val"]], check_dtype=False
    )


def test_asof_shared_time_column_name(spark):
    # right_time defaults to left_time's name: the shared time column is
    # carried internally for matching/tolerance but not re-emitted, so no
    # column clash. Match results must equal the renamed-column run.
    left, right = _rand_frames(seed=11)
    right_t = right.rename(columns={"rt": "t"})
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right_t),
            on=["k"],
            left_time="t",
            tolerance=F.lit(50),
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    assert list(got.columns) == ["k", "t", "lid", "val"]
    want = _pandas_asof(left, right, "backward", True, tolerance=50)
    pd.testing.assert_frame_equal(
        got[["lid", "val"]], want[["lid", "val"]], check_dtype=False
    )
    # left's own time column must be untouched
    pd.testing.assert_series_equal(
        got.sort_values("lid")["t"].reset_index(drop=True),
        left.sort_values("lid")["t"].reset_index(drop=True),
        check_dtype=False,
    )


def test_interval_join_large_magnitude_keys(spark):
    # Bin assignment must use exact int64 floor division: near 2^53+ a
    # double divide can misround across a bin boundary and silently drop
    # qualifying pairs.
    base = 2**60
    w = 1_000_003  # not a power of two: exercises true division
    pts = pd.DataFrame(
        {"k": [1] * 4, "pt": [base - 1, base, base + w - 1, base + w], "pid": [0, 1, 2, 3]}
    )
    iv = pd.DataFrame({"k": [1], "lo": [base], "hi": [base + w], "iid": [7]})
    got = (
        interval_join(
            spark.createDataFrame(pts),
            spark.createDataFrame(iv),
            on=["k"],
            point_time="pt",
            lo="lo",
            hi="hi",
            bin_width=w,
        )
        .toPandas()
        .sort_values("pid")
        .reset_index(drop=True)
    )
    assert list(got["pid"]) == [1, 2]  # [lo, hi) exactly, no drops at 2^60


def test_asof_null_keys_never_match(spark):
    left = pd.DataFrame({"k": [1.0, None], "t": [10, 10], "lid": [0, 1]})
    right = pd.DataFrame({"k": [1.0, None], "rt": [5, 5], "val": [1.0, 2.0]})
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on=["k"],
            left_time="t",
            right_time="rt",
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    assert got.loc[0, "val"] == 1.0
    assert pd.isna(got.loc[1, "val"])  # NULL key row gets no match


def test_asof_no_nested_loop_in_plan(spark):
    left, right = _rand_frames(seed=3)
    df = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on=["k"],
        left_time="t",
        right_time="rt",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan


def _brute_interval(points, intervals, closed):
    rows = []
    for _, p in points.iterrows():
        for _, iv in intervals.iterrows():
            if p["k"] != iv["k"]:
                continue
            hi_ok = p["t"] < iv["hi"] if closed == "left" else p["t"] <= iv["hi"]
            if iv["lo"] <= p["t"] and hi_ok:
                rows.append((p["pid"], iv["iid"]))
    return sorted(rows)


@pytest.mark.parametrize("closed", ["left", "both"])
@pytest.mark.parametrize("bin_width", [None, 3, 1000])
def test_interval_join_matches_brute_force(spark, closed, bin_width):
    rng = np.random.default_rng(11)
    points = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 300),
            "t": rng.integers(0, 500, 300).astype("int64"),
            "pid": np.arange(300, dtype="int64"),
        }
    )
    lo = rng.integers(0, 480, 80).astype("int64")
    intervals = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 80),
            "lo": lo,
            "hi": lo + rng.integers(0, 40, 80),
            "iid": np.arange(80, dtype="int64"),
        }
    )
    got = interval_join(
        spark.createDataFrame(points),
        spark.createDataFrame(intervals),
        on=["k"],
        point_time="t",
        lo="lo",
        hi="hi",
        bin_width=bin_width,
        closed=closed,
    ).toPandas()
    assert sorted(zip(got["pid"], got["iid"])) == _brute_interval(
        points, intervals, closed
    )


def test_interval_join_no_nested_loop_in_plan(spark):
    points = pd.DataFrame({"k": [1], "t": [5], "pid": [0]})
    intervals = pd.DataFrame({"k": [1], "lo": [0], "hi": [10], "iid": [0]})
    df = interval_join(
        spark.createDataFrame(points),
        spark.createDataFrame(intervals),
        on=["k"],
        point_time="t",
        lo="lo",
        hi="hi",
        bin_width=10,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan


def test_asof_single_exchange(spark):
    """The union-scan asof shuffles exactly once (hash on the keys for the
    window); no join node appears at all."""
    left, right = _rand_frames(seed=19)
    df = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on=["k"],
        left_time="t",
        right_time="rt",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


class TestRound12Regressions:
    def test_interval_join_fractional_hi_keeps_boundary_bin(self, spark):
        """Double time columns: hi_u - 1 on a TRUNCATED hi dropped the
        bin holding points with trunc(t) == trunc(hi) — t=4.2 in
        [1.0, 4.9) silently vanished."""
        points = spark.createDataFrame(
            [(1, 4.2), (1, 4.95)], "k long, t double"
        )
        ivs = spark.createDataFrame(
            [(1, 1.0, 4.9)], "k long, lo double, hi double"
        )
        got = interval_join(
            points, ivs, on=["k"], point_time="t", lo="lo", hi="hi",
            bin_width=1.0, closed="left",
        ).collect()
        assert [r["t"] for r in got] == [4.2]  # 4.95 >= hi stays excluded

    def test_interval_join_integer_hi_still_exact(self, spark):
        points = spark.createDataFrame([(1, 4), (1, 5)], "k long, t long")
        ivs = spark.createDataFrame([(1, 1, 5)], "k long, lo long, hi long")
        got = interval_join(
            points, ivs, on=["k"], point_time="t", lo="lo", hi="hi",
            bin_width=1, closed="left",
        ).collect()
        assert [r["t"] for r in got] == [4]

    def test_asof_nearest_exact_above_2_53(self, spark):
        """int64 distances near 2^53: the double detour misrounded them
        and attached the wrong side."""
        base = 1 << 53
        left = spark.createDataFrame([(1, base + 3)], "k long, t long")
        right = spark.createDataFrame(
            [(1, base + 2, "back"), (1, base + 5, "fwd")],
            "k long, rt long, tag string",
        )
        got = asof_join(
            left, right, on=["k"], left_time="t", right_time="rt",
            direction="nearest",
        ).collect()
        assert got[0]["tag"] == "back"  # true dists: 1 vs 2
