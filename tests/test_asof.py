"""As-of join (operators/asof.py): the union+window implementation against
pandas.merge_asof (the reference semantics for backward/forward/tolerance),
plus null behavior for unmatched left rows."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from mbrngq_spark.operators.asof import asof_join


def _frames(seed=11, n_left=200, n_right=300, n_keys=10):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame({
        "key": rng.integers(0, n_keys, n_left),
        "ts": base + pd.to_timedelta(rng.integers(0, 86_400_000, n_left),
                                     unit="ms"),
        "lid": np.arange(n_left),
    })
    right = pd.DataFrame({
        # keys 8,9 never appear on the right → unmatched left rows
        "key": rng.integers(0, n_keys - 2, n_right),
        "ts": base + pd.to_timedelta(rng.integers(0, 86_400_000, n_right),
                                     unit="ms"),
        "rid": np.arange(n_right),
        "val": rng.standard_normal(n_right).round(6),
    })
    return left, right


def _expected(left, right, direction="backward", tolerance=None):
    return pd.merge_asof(
        left.sort_values(["ts", "lid"]), right.sort_values(["ts", "rid"]),
        on="ts", by="key", direction=direction,
        tolerance=tolerance).sort_values("lid").reset_index(drop=True)


def _got(spark, left, right, **kw):
    out = asof_join(spark.createDataFrame(left), spark.createDataFrame(right),
                    on="key", tiebreak="rid", **kw)
    return out.toPandas().sort_values("lid").reset_index(drop=True)


def _same_matches(got, exp):
    assert len(got) == len(exp)
    g, e = got["rid_r"], exp["rid"]
    assert (g.isna() == e.isna()).all()
    m = ~e.isna()
    assert (g[m].astype("int64") == e[m].astype("int64")).all()


def test_asof_backward_matches_pandas(spark):
    left, right = _frames()
    _same_matches(_got(spark, left, right), _expected(left, right))


def test_asof_forward_matches_pandas(spark):
    left, right = _frames(seed=12)
    _same_matches(_got(spark, left, right, direction="forward"),
                  _expected(left, right, direction="forward"))


def test_asof_tolerance_matches_pandas(spark):
    left, right = _frames(seed=13)
    got = _got(spark, left, right, tolerance_us=3_600_000_000)
    exp = _expected(left, right, tolerance=pd.Timedelta("1h"))
    _same_matches(got, exp)


def test_asof_unmatched_left_rows_keep_nulls(spark):
    left, right = _frames(seed=14)
    got = _got(spark, left, right)
    no_right = got[got["key"] >= 8]
    assert len(no_right) > 0
    assert no_right["rid_r"].isna().all() and no_right["ts_r"].isna().all()
    # left rows all survive exactly once (LEFT semantics)
    assert sorted(got["lid"]) == list(range(len(left)))


def test_asof_exact_timestamp_is_inclusive(spark):
    left = pd.DataFrame({"key": [1], "ts": [pd.Timestamp("2024-01-01")],
                         "lid": [0]})
    right = pd.DataFrame({"key": [1], "ts": [pd.Timestamp("2024-01-01")],
                          "rid": [7], "val": [1.0]})
    for direction in ("backward", "forward"):
        got = _got(spark, left, right, direction=direction)
        assert got["rid_r"].iloc[0] == 7


def test_asof_empty_right_side_yields_all_nulls(spark):
    left, right = _frames(seed=20, n_left=30)
    empty_right = right.iloc[0:0]
    got = asof_join(spark.createDataFrame(left),
                    spark.createDataFrame(empty_right,
                                          schema="key long, ts timestamp,"
                                          " rid long, val double"),
                    on="key", tiebreak="rid").toPandas()
    assert len(got) == 30
    assert got["rid_r"].isna().all()


def test_asof_duplicate_right_timestamps_pick_max_tiebreak(spark):
    left = pd.DataFrame({"key": [1], "ts": [pd.Timestamp("2024-01-02")],
                         "lid": [0]})
    right = pd.DataFrame({"key": [1, 1, 1],
                          "ts": [pd.Timestamp("2024-01-01")] * 3,
                          "rid": [5, 9, 2], "val": [0.1, 0.2, 0.3]})
    got = asof_join(spark.createDataFrame(left),
                    spark.createDataFrame(right),
                    on="key", tiebreak="rid").toPandas()
    assert got["rid_r"].iloc[0] == 9          # deterministic: max tiebreak


def test_asof_nullable_right_payload_is_atomic(spark):
    """A NULL in one right payload column must ride with ITS row — not be
    back-filled from an older right row (merge_asof semantics). Regression
    for the per-column last(ignorenulls) splice bug."""
    left = pd.DataFrame({
        "key": [1, 1],
        "ts": pd.to_datetime(["2024-01-01 00:10", "2024-01-01 00:30"]),
        "lid": [0, 1],
    })
    right = pd.DataFrame({
        "key": [1, 1],
        "ts": pd.to_datetime(["2024-01-01 00:05", "2024-01-01 00:20"]),
        "rid": [0, 1],
        "val": [7.0, None],   # newest right row has a NULL payload field
    })
    got = _got(spark, left, right)
    # lid=0 matches rid=0 (val 7.0); lid=1 matches rid=1 whose val is NULL
    assert got.loc[got.lid == 0, "val_r"].iloc[0] == 7.0
    assert got.loc[got.lid == 1, "rid_r"].iloc[0] == 1
    assert pd.isna(got.loc[got.lid == 1, "val_r"].iloc[0])
