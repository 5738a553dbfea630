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


def _lines_df(spark):
    import pandas as pd
    return spark.createDataFrame(
        pd.DataFrame({"line_id": [l[0] for l in H.POLYLINES],
                      "vx": [l[1] for l in H.POLYLINES],
                      "vy": [l[2] for l in H.POLYLINES]}),
        "line_id long, vx array<double>, vy array<double>")


def test_map_match_equals_python_viterbi(spark):
    """Full DP cost table AND backtraced path equal a pure-Python
    Viterbi over the same quantized emission table (the emissions are
    read back from the engine, so this isolates the DP/backtrace)."""
    from mbrngq_spark.operators.trajectory import (map_match,
                                                   route_emissions,
                                                   with_event_geometry)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet") \
        .filter(F.col("event_id") < 600)
    eg = with_event_geometry(ev)
    lines = _lines_df(spark)
    swq = int(round(H.MATCH_SWITCH * 1e6))
    em = route_emissions(eg, lines).toPandas()
    got = {(int(r.user_id), int(r.step), int(r.route_id)):
           (int(r.costq), bool(r.matched))
           for r in map_match(eg, lines, H.MATCH_SWITCH).collect()}

    exp = {}
    for uid, grp in em.groupby("user_id"):
        grp = grp.sort_values(["step", "line_id"])
        routes = sorted(grp.line_id.unique())
        steps = int(grp.step.max()) + 1
        e = {(int(r.step), int(r.line_id)): int(r.eq)
             for r in grp.itertuples()}
        dp = [[0] * len(routes) for _ in range(steps)]
        for i, r in enumerate(routes):
            dp[0][i] = e[(0, r)]
        for t in range(1, steps):
            for i, r in enumerate(routes):
                dp[t][i] = min(dp[t - 1][j] + (0 if j == i else swq)
                               for j in range(len(routes))) + e[(t, r)]
        path = [0] * steps
        path[-1] = min(range(len(routes)), key=lambda i: (dp[-1][i], i))
        for t in range(steps - 1, 0, -1):
            i = path[t]
            path[t - 1] = min(
                range(len(routes)),
                key=lambda j: (dp[t - 1][j] + (0 if j == i else swq), j))
        for t in range(steps):
            for i, r in enumerate(routes):
                exp[(int(uid), t, int(r))] = (dp[t][i], path[t] == i)
    assert got == exp
    assert len(got) > 100


def test_map_match_switch_semantics(spark):
    """A trajectory hugging route 0 then route 1 switches exactly once
    under a small penalty and never under a prohibitive one."""
    import pandas as pd
    from mbrngq_spark.operators.trajectory import map_match

    lines = spark.createDataFrame(
        pd.DataFrame({"line_id": [0, 1],
                      "vx": [[0.0, 100.0], [0.0, 100.0]],
                      "vy": [[10.0, 10.0], [90.0, 90.0]]}),
        "line_id long, vx array<double>, vy array<double>")
    # 4 points near y=10, then 4 near y=90, one user
    pts = [(7, i, 1000 + i, 10.0 * (i + 1),
            11.0 if i < 4 else 89.0) for i in range(8)]
    eg = spark.createDataFrame(
        pts, "user_id long, event_id long, te long, x double, y double")
    small = {int(r.step): int(r.route_id)
             for r in map_match(eg, lines, 5.0).collect() if r.matched}
    assert [small[t] for t in range(8)] == [0] * 4 + [1] * 4
    big = {int(r.step): int(r.route_id)
           for r in map_match(eg, lines, 1e6).collect() if r.matched}
    assert len(set(big.values())) == 1  # never switches


def test_colocation_geodetic_matches_quadratic_haversine(spark):
    """Spherical co-location == quadratic NumPy haversine replay (2dp
    rounded, the geodetic discipline), exactly once per pair."""
    import numpy as np
    from mbrngq_spark.operators.geodetic import np_haversine
    from mbrngq_spark.operators.trajectory import (
        colocation_pairs_geodetic, with_event_geometry)

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet") \
        .filter(F.col("event_id") < 2000)
    ell = with_event_geometry(ev).select(
        "user_id", "event_id", "te",
        (F.col("y") * 1.8 - 90.0).alias("lat"),
        (F.col("x") * 3.6 - 180.0).alias("lon"))
    eps_m, tau = 2_000_000.0, 14400
    rows = colocation_pairs_geodetic(spark, ell, eps_m, tau).collect()
    got = {(int(r.a_event), int(r.b_event)): (int(r.a_user),
                                              int(r.b_user),
                                              float(r.dist_m), int(r.dt))
           for r in rows}
    assert len(got) == len(rows)

    pdf = ell.toPandas().sort_values("event_id").reset_index(drop=True)
    lat = pdf.lat.to_numpy(); lon = pdf.lon.to_numpy()
    te = pdf.te.to_numpy().astype(np.int64)
    uid = pdf.user_id.to_numpy().astype(np.int64)
    eid = pdf.event_id.to_numpy().astype(np.int64)
    exp = {}
    for i in range(len(pdf)):
        d = np.round(np_haversine(lat[i], lon[i], lat, lon), 2)
        for j in range(i + 1, len(pdf)):
            if (uid[i] != uid[j] and abs(int(te[i] - te[j])) <= tau
                    and d[j] <= eps_m):
                exp[(int(eid[i]), int(eid[j]))] = (
                    int(uid[i]), int(uid[j]), float(d[j]),
                    abs(int(te[i] - te[j])))
    assert got == exp
    assert len(got) > 3


def test_frechet_join_matches_python_dp(spark):
    """Discrete Fréchet == pure-Python DP over the engine's own
    quantized distance matrix; metric sanity (self-distance 0,
    endpoint lower bound)."""
    from mbrngq_spark.functions import derive
    from mbrngq_spark.operators.trajectory import frechet_join

    V = 8
    sv = F.sequence(F.lit(0), F.lit(V - 1))
    tracks = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
              .filter(F.col("doc_id") < 25)
              .select(F.col("doc_id").alias("line_id"))
              .select("line_id",
                      F.transform(sv, lambda i: derive.x_col(
                          F.col("line_id") * 31 + i * 7 + 1)).alias("vx"),
                      F.transform(sv, lambda i: derive.y_col(
                          F.col("line_id") * 31 + i * 7 + 1)).alias("vy")))
    rows = frechet_join(tracks, tracks).collect()
    got = {(int(r.a_id), int(r.b_id)): int(r.dfq) for r in rows}
    for r in rows:
        assert float(r.frechet) == float(r.dfq) / 1e6

    pdf = tracks.toPandas()
    vs = {int(r.line_id): (list(r.vx), list(r.vy))
          for r in pdf.itertuples()}
    from decimal import ROUND_HALF_UP, Decimal

    def q6(v):
        return int(Decimal(repr(v * 1e6)).quantize(
            Decimal(1), rounding=ROUND_HALF_UP))

    import math
    exp = {}
    for a in vs:
        for b in vs:
            ax, ay = vs[a]
            bx, by = vs[b]
            d = [[q6(math.sqrt((ax[i] - bx[j]) * (ax[i] - bx[j])
                               + (ay[i] - by[j]) * (ay[i] - by[j])))
                  for j in range(V)] for i in range(V)]
            dp = [[0] * V for _ in range(V)]
            dp[0][0] = d[0][0]
            for j in range(1, V):
                dp[0][j] = max(d[0][j], dp[0][j - 1])
            for i in range(1, V):
                dp[i][0] = max(d[i][0], dp[i - 1][0])
                for j in range(1, V):
                    dp[i][j] = max(d[i][j], min(dp[i - 1][j],
                                                dp[i][j - 1],
                                                dp[i - 1][j - 1]))
            exp[(a, b)] = dp[V - 1][V - 1]
    assert got == exp
    for a in vs:
        assert got[(a, a)] == 0                   # self-distance
        for b in vs:
            assert got[(a, b)] == got[(b, a)]     # symmetry
            ax, ay = vs[a]
            bx, by = vs[b]
            lb = max(q6(math.hypot(ax[0] - bx[0], ay[0] - by[0])),
                     q6(math.hypot(ax[-1] - bx[-1], ay[-1] - by[-1])))
            assert got[(a, b)] >= lb              # endpoint lower bound


def test_hausdorff_and_dtw_match_python(spark):
    """Hausdorff (pure Column) and DTW (sum/min kernel) == Python
    replays over the same quantized matrix, with the metric chain
    dtw ≥ frechet ≥ hausdorff per pair."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from mbrngq_spark.functions import derive
    from mbrngq_spark.operators.trajectory import (dtw_join, frechet_join,
                                                   hausdorff_join)

    V = 8
    sv = F.sequence(F.lit(0), F.lit(V - 1))
    tracks = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
              .filter(F.col("doc_id") < 20)
              .select(F.col("doc_id").alias("line_id"))
              .select("line_id",
                      F.transform(sv, lambda i: derive.x_col(
                          F.col("line_id") * 31 + i * 7 + 1)).alias("vx"),
                      F.transform(sv, lambda i: derive.y_col(
                          F.col("line_id") * 31 + i * 7 + 1)).alias("vy")))
    hz = {(int(r.a_id), int(r.b_id)): int(r.dhq)
          for r in hausdorff_join(tracks, tracks).collect()}
    dt = {(int(r.a_id), int(r.b_id)): int(r.dtwq)
          for r in dtw_join(tracks, tracks).collect()}
    fr = {(int(r.a_id), int(r.b_id)): int(r.dfq)
          for r in frechet_join(tracks, tracks).collect()}

    def q6(v):
        return int(Decimal(repr(v * 1e6)).quantize(
            Decimal(1), rounding=ROUND_HALF_UP))

    vs = {int(r.line_id): (list(r.vx), list(r.vy))
          for r in tracks.toPandas().itertuples()}
    for a in vs:
        for b in vs:
            ax, ay = vs[a]
            bx, by = vs[b]
            d = [[q6(math.hypot(ax[i] - bx[j], ay[i] - by[j]))
                  for j in range(V)] for i in range(V)]
            h = max(max(min(row) for row in d),
                    max(min(d[i][j] for i in range(V))
                        for j in range(V)))
            assert hz[(a, b)] == h
            dp = [[0] * V for _ in range(V)]
            dp[0][0] = d[0][0]
            for j in range(1, V):
                dp[0][j] = d[0][j] + dp[0][j - 1]
            for i in range(1, V):
                dp[i][0] = d[i][0] + dp[i - 1][0]
                for j in range(1, V):
                    dp[i][j] = d[i][j] + min(dp[i - 1][j], dp[i][j - 1],
                                             dp[i - 1][j - 1])
            assert dt[(a, b)] == dp[V - 1][V - 1]
            assert dt[(a, b)] >= fr[(a, b)] >= hz[(a, b)]


def test_similarity_geodetic_matches_numpy(spark):
    """Geodetic variants: quantized haversine matrix replayed in NumPy,
    same DP/aggregation — exact; metric chain holds on the sphere."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np
    from mbrngq_spark.functions import derive
    from mbrngq_spark.operators.geodetic import np_haversine
    from mbrngq_spark.operators.trajectory import (dtw_join, frechet_join,
                                                   hausdorff_join)

    V = 8
    sv = F.sequence(F.lit(0), F.lit(V - 1))
    gtr = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
           .filter(F.col("doc_id") < 12)
           .select(F.col("doc_id").alias("line_id"))
           .select("line_id",
                   F.transform(sv, lambda i: derive.y_col(
                       F.col("line_id") * 31 + i * 7 + 1)
                       * 1.8 - 90.0).alias("vlat"),
                   F.transform(sv, lambda i: derive.x_col(
                       F.col("line_id") * 31 + i * 7 + 1)
                       * 3.6 - 180.0).alias("vlon")))
    fr = {(int(r.a_id), int(r.b_id)): int(r.dfq)
          for r in frechet_join(gtr, gtr, quant=100.0,
                                geodetic=True).collect()}
    dt = {(int(r.a_id), int(r.b_id)): int(r.dtwq)
          for r in dtw_join(gtr, gtr, quant=100.0,
                            geodetic=True).collect()}
    hz = {(int(r.a_id), int(r.b_id)): int(r.dhq)
          for r in hausdorff_join(gtr, gtr, quant=100.0,
                                  geodetic=True).collect()}

    def qc(v):
        return int(Decimal(repr(v * 100.0)).quantize(
            Decimal(1), rounding=ROUND_HALF_UP))

    vs = {int(r.line_id): (list(r.vlat), list(r.vlon))
          for r in gtr.toPandas().itertuples()}
    for a in vs:
        for b in vs:
            la, lo = vs[a]
            lb, lo2 = vs[b]
            d = [[qc(float(np_haversine(la[i], lo[i], lb[j], lo2[j])))
                  for j in range(V)] for i in range(V)]
            h = max(max(min(r_) for r_ in d),
                    max(min(d[i][j] for i in range(V)) for j in range(V)))
            assert hz[(a, b)] == h
            dpf = [[0] * V for _ in range(V)]
            dps = [[0] * V for _ in range(V)]
            dpf[0][0] = dps[0][0] = d[0][0]
            for j in range(1, V):
                dpf[0][j] = max(d[0][j], dpf[0][j - 1])
                dps[0][j] = d[0][j] + dps[0][j - 1]
            for i in range(1, V):
                dpf[i][0] = max(d[i][0], dpf[i - 1][0])
                dps[i][0] = d[i][0] + dps[i - 1][0]
                for j in range(1, V):
                    dpf[i][j] = max(d[i][j], min(dpf[i - 1][j],
                                                 dpf[i][j - 1],
                                                 dpf[i - 1][j - 1]))
                    dps[i][j] = d[i][j] + min(dps[i - 1][j],
                                              dps[i][j - 1],
                                              dps[i - 1][j - 1])
            assert fr[(a, b)] == dpf[V - 1][V - 1]
            assert dt[(a, b)] == dps[V - 1][V - 1]
            assert dt[(a, b)] >= fr[(a, b)] >= hz[(a, b)]
