"""The driver-contract rotation rule (VERDICT r5 item 2): the round
driver value-checks AT MOST 50 `queries()` entries — a 51st would
silently fall out of the hard correctness signal. Growth must rotate
(merge an old single-operator gate into a tagged union), never overflow.

Pure-Python contract checks — no Spark session, so they run in
milliseconds and fail the suite the moment the registry regresses."""
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402

GATE_CAP = 50


def test_gate_surface_within_driver_window():
    q = entry.queries()
    assert len(q) <= GATE_CAP, (
        f"{len(q)} queries() entries > driver cap {GATE_CAP}: merge an "
        "old single-operator gate into a tagged union instead of adding "
        "a 51st entry (see _q_text_guards / _q_spatial_joins)")


def test_every_gate_is_oracle_checked():
    q, o = entry.queries(), entry.oracle_sql()
    # every queries() key has an oracle twin and vice versa — a missing
    # key downgrades that gate to the weaker rows-only check
    assert set(q) == set(o)


def test_gate_callables_and_sql_are_wellformed():
    q, o = entry.queries(), entry.oracle_sql()
    for k, fn in q.items():
        assert callable(fn), k
    for k, sql in o.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), k
