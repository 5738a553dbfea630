"""Trajectory tier vs a pandas replay — exact int64 equality of the
micro-quantized sums (quantize-before-sum contract) and exact island
boundaries."""

from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pytest
from pyspark.sql import functions as F

from mbrngq_spark import harness as H
from mbrngq_spark.operators.trajectory import (stay_points, travel_stats,
                                               with_event_geometry)
from tests.conftest import SF_DIR


def _q(v: float) -> int:
    # Spark F.round is HALF_UP; Python round is banker's (CLAUDE.md)
    return int(Decimal(repr(v * 1e6)).quantize(Decimal(1),
                                               rounding=ROUND_HALF_UP))


@pytest.fixture(scope="module")
def eg_pdf(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    eg = with_event_geometry(ev)
    pdf = eg.toPandas().sort_values(["user_id", "te", "event_id"])
    return eg, pdf


def test_travel_stats_exact(spark, eg_pdf):
    eg, pdf = eg_pdf
    got = {int(r.user_id): (int(r.n_points), int(r.dist_q),
                            int(r.max_leg_q), int(r.disp_q))
           for r in travel_stats(eg).collect()}
    exp = {}
    for uid, grp in pdf.groupby("user_id"):
        x, y = grp.x.to_numpy(), grp.y.to_numpy()
        legs = np.sqrt((x[1:] - x[:-1]) * (x[1:] - x[:-1])
                       + (y[1:] - y[:-1]) * (y[1:] - y[:-1]))
        dist_q = sum(_q(v) for v in legs)
        max_q = _q(legs.max()) if len(legs) else 0
        disp = np.sqrt((x[0] - x[-1]) * (x[0] - x[-1])
                       + (y[0] - y[-1]) * (y[0] - y[-1]))
        exp[int(uid)] = (len(grp), dist_q, max_q, _q(float(disp)))
    assert got == exp


def test_stay_points_exact(spark, eg_pdf):
    eg, pdf = eg_pdf
    got = {(int(r.user_id), int(r.stay_idx)):
           (int(r.n_events), int(r.start_epoch), int(r.end_epoch),
            int(r.cx_q), int(r.cy_q))
           for r in stay_points(eg, H.STAY_EPS, H.STAY_DUR).collect()}
    exp = {}
    for uid, grp in pdf.groupby("user_id"):
        x, y, te = grp.x.to_numpy(), grp.y.to_numpy(), grp.te.to_numpy()
        island = 0
        rows = {}
        for i in range(len(grp)):
            leg = (np.sqrt((x[i] - x[i - 1]) * (x[i] - x[i - 1])
                           + (y[i] - y[i - 1]) * (y[i] - y[i - 1]))
                   if i else None)
            if leg is None or leg > H.STAY_EPS:
                island += 1
            rows.setdefault(island, []).append(i)
        for isl, idx in rows.items():
            ts = te[idx]
            if len(idx) >= 2 and ts.max() - ts.min() >= H.STAY_DUR:
                exp[(int(uid), isl)] = (
                    len(idx), int(ts.min()), int(ts.max()),
                    sum(_q(float(x[i])) for i in idx),
                    sum(_q(float(y[i])) for i in idx))
    assert got == exp
    assert len(got) > 0


def test_colocation_pairs_match_quadratic_replay(spark):
    """Space-time ε-join == quadratic NumPy replay on the sf fixture
    slice: same pair set, bit-exact distances, each pair exactly once."""
    import numpy as np

    from mbrngq_spark.operators.trajectory import (colocation_pairs,
                                                   with_event_geometry)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet") \
        .filter(F.col("event_id") < 2000)
    eg = with_event_geometry(ev)
    eps, tau = 16.0, 14400
    got = {(int(r.a_event), int(r.b_event)):
           (int(r.a_user), int(r.b_user), float(r.dist), int(r.dt))
           for r in colocation_pairs(eg, eps, tau).collect()}
    assert len(got) == len(colocation_pairs(eg, eps, tau).collect())

    pdf = eg.toPandas().sort_values("event_id").reset_index(drop=True)
    x = pdf.x.to_numpy(); y = pdf.y.to_numpy()
    te = pdf.te.to_numpy().astype(np.int64)
    uid = pdf.user_id.to_numpy().astype(np.int64)
    eid = pdf.event_id.to_numpy().astype(np.int64)
    exp = {}
    for i in range(len(pdf)):
        for j in range(i + 1, len(pdf)):
            if uid[i] == uid[j] or abs(int(te[i] - te[j])) > tau:
                continue
            d = np.sqrt((x[i] - x[j]) * (x[i] - x[j])
                        + (y[i] - y[j]) * (y[i] - y[j]))
            if d <= eps:
                a, b = (i, j) if eid[i] < eid[j] else (j, i)
                exp[(int(eid[a]), int(eid[b]))] = (
                    int(uid[a]), int(uid[b]), float(d),
                    abs(int(te[i] - te[j])))
    assert got == exp
    assert len(got) > 5  # the fixture produces real contacts


def test_colocation_contacts_aggregate(spark):
    """Contacts == pandas groupby of the pair table; min_dist_q is the
    min of the per-pair quantized distances."""
    from decimal import ROUND_HALF_UP, Decimal

    from mbrngq_spark.operators.trajectory import (colocation_contacts,
                                                   colocation_pairs,
                                                   with_event_geometry)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet") \
        .filter(F.col("event_id") < 2000)
    eg = with_event_geometry(ev)
    eps, tau = 16.0, 14400
    pr = colocation_pairs(eg, eps, tau).toPandas()
    got = {(int(r.ua), int(r.ub)): (int(r.n_contacts), int(r.first_te),
                                    int(r.last_te), int(r.min_dist_q))
           for r in colocation_contacts(eg, eps, tau).collect()}
    exp = {}
    for r in pr.itertuples():
        ua, ub = sorted((int(r.a_user), int(r.b_user)))
        dq = int(Decimal(repr(r.dist * 1e6)).quantize(
            Decimal(1), rounding=ROUND_HALF_UP))
        n, f, l, m = exp.get((ua, ub), (0, 10**18, 0, 10**18))
        exp[(ua, ub)] = (n + 1, min(f, min(r.a_te, r.b_te)),
                         max(l, max(r.a_te, r.b_te)), min(m, dq))
    assert got == exp
