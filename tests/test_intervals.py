"""Interval-overlap join — exactly-once bucket dedup, closed/strict
semantics, co-presence aggregate, OD matrix replay."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mbrngq_spark import harness as H
from mbrngq_spark.operators.intervals import (interval_overlap_join,
                                              session_copresence)
from tests.conftest import SF_DIR


def _rand_intervals(seed, n, span=1000000, maxlen=250000):
    rng = np.random.RandomState(seed)
    t0 = rng.randint(0, span, n)
    ln = rng.randint(0, maxlen, n)
    return [(int(i), int(a), int(a + b)) for i, (a, b) in
            enumerate(zip(t0, ln))]


def test_interval_overlap_matches_quadratic_exactly_once(spark):
    """Celled join == quadratic replay; pairs spanning MANY shared
    buckets (width 50k vs lengths up to 250k) appear exactly once."""
    a = _rand_intervals(1, 80)
    b = _rand_intervals(2, 90)
    adf = spark.createDataFrame(a, "id long, t0 long, t1 long")
    bdf = spark.createDataFrame(b, "id long, t0 long, t1 long")
    rows = interval_overlap_join(adf, bdf, width=50000).collect()
    got = {(int(r.a_id), int(r.b_id)): (int(r.ostart), int(r.oend),
                                        int(r.overlap_s)) for r in rows}
    assert len(got) == len(rows)  # exactly once
    exp = {}
    for ia, a0, a1 in a:
        for ib, b0, b1 in b:
            o0, o1 = max(a0, b0), min(a1, b1)
            if o0 <= o1:
                exp[(ia, ib)] = (o0, o1, o1 - o0)
    assert got == exp
    assert len(got) > 100


def test_interval_overlap_strict_vs_closed(spark):
    """closed=True keeps point-touching pairs (oend == ostart);
    closed=False drops them."""
    adf = spark.createDataFrame([(1, 0, 100)], "id long, t0 long, t1 long")
    bdf = spark.createDataFrame([(2, 100, 200), (3, 101, 200)],
                                "id long, t0 long, t1 long")
    closed = interval_overlap_join(adf, bdf, width=1000).collect()
    assert {(r.b_id, r.overlap_s) for r in closed} == {(2, 0)}
    strict = interval_overlap_join(adf, bdf, width=1000,
                                   closed=False).collect()
    assert strict == []


def test_session_copresence_matches_pandas(spark):
    """Co-presence aggregate == pandas replay of the quadratic overlap
    on sessions built from the sf fixture."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    from pyspark.sql import Window
    evt = ev.select("user_id", "event_id",
                    F.unix_timestamp("ts").alias("te"))
    w = Window.partitionBy("user_id").orderBy("te", "event_id")
    new_s = F.when((F.col("te") - F.lag("te").over(w) > H.CP_GAP)
                   | F.lag("te").over(w).isNull(), 1).otherwise(0)
    iv = (evt.withColumn("new_s", new_s)
          .withColumn("sidx", F.sum("new_s").over(
              w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "sidx")
          .agg(F.min("te").alias("t0"), F.max("te").alias("t1"))
          .select("user_id", F.col("sidx").alias("session_idx"),
                  "t0", "t1"))
    got = {(int(r.ua), int(r.ub)): (int(r.n_overlaps),
                                    int(r.total_overlap_s),
                                    int(r.first_te), int(r.last_te))
           for r in session_copresence(iv, width=H.CP_WIDTH).collect()}
    sp = iv.toPandas()
    exp = {}
    recs = list(sp.itertuples())
    for x in recs:
        for y in recs:
            if x.user_id >= y.user_id:
                continue
            o0, o1 = max(x.t0, y.t0), min(x.t1, y.t1)
            if o0 <= o1:
                k = (int(x.user_id), int(y.user_id))
                n, t, f, l = exp.get(k, (0, 0, 10**18, 0))
                exp[k] = (n + 1, t + int(o1 - o0), min(f, int(o0)),
                          max(l, int(o1)))
    assert got == exp
    assert len(got) > 50


def test_od_matrix_matches_pandas(spark):
    from mbrngq_spark.operators.trajectory import (od_matrix,
                                                   with_event_geometry)
    from mbrngq_spark import grid

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    eg = with_event_geometry(ev)
    got = {(int(r.cell_from), int(r.cell_to)): (int(r.n_trips),
                                                int(r.n_users))
           for r in od_matrix(eg, H.OD_RES).collect()}
    pdf = eg.toPandas().sort_values(["user_id", "te", "event_id"])
    cells = grid.np_cell_encode(pdf.x.to_numpy(), pdf.y.to_numpy(),
                                H.OD_RES)
    exp = {}
    prev_u = None
    prev_c = None
    flows = {}
    for u, c in zip(pdf.user_id.to_numpy(), cells):
        if prev_u == u:
            flows.setdefault((int(prev_c), int(c)), []).append(int(u))
        prev_u, prev_c = u, c
    exp = {k: (len(v), len(set(v))) for k, v in flows.items()}
    assert got == exp
    assert len(got) > 100
