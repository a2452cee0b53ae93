"""EXTRACT / DATE_TRUNC golden tests — expected values computed with
Python's datetime, covering pre-1970 dates, leap years, ISO week edges, and
NULLs. Runs through the full SQL path (parse -> plan -> compiled pipeline or
eager fallback)."""

import datetime

import pyarrow as pa
import pytest

from query_engine_tpu.columnar.batch import ColumnBatch
from query_engine_tpu.engine.session import Session

DATES = [
    datetime.date(2024, 1, 1),    # ISO week 1 of 2024
    datetime.date(2024, 2, 29),   # leap day
    datetime.date(2024, 12, 31),  # ISO week 1 of 2025
    datetime.date(2023, 1, 1),    # ISO week 52 of 2022 (Sunday)
    datetime.date(1969, 7, 20),   # pre-epoch
    datetime.date(1900, 3, 1),    # non-leap century year
    None,
]

TIMESTAMPS = [
    datetime.datetime(2024, 6, 15, 13, 45, 30, 250000),
    datetime.datetime(1969, 12, 31, 23, 59, 59, 999999),  # pre-epoch
    datetime.datetime(2000, 1, 1, 0, 0, 0),
    None,
]


@pytest.fixture()
def sess():
    s = Session()
    rb = pa.record_batch({
        "id": pa.array(range(len(DATES))),
        "d": pa.array(DATES),
    })
    s.register_table("dates", ColumnBatch.from_arrow(rb))
    rb2 = pa.record_batch({
        "id": pa.array(range(len(TIMESTAMPS))),
        "ts": pa.array(TIMESTAMPS, type=pa.timestamp("us")),
    })
    s.register_table("tss", ColumnBatch.from_arrow(rb2))
    return s


def col(batch, i=0):
    return [r[i] for r in batch.to_pylist()]


def test_extract_date_fields(sess):
    for field, fn in [
        ("year", lambda d: d.year),
        ("month", lambda d: d.month),
        ("day", lambda d: d.day),
        ("quarter", lambda d: (d.month - 1) // 3 + 1),
        ("dow", lambda d: (d.weekday() + 1) % 7),   # PG: 0=Sunday
        ("isodow", lambda d: d.isoweekday()),
        ("doy", lambda d: d.timetuple().tm_yday),
        ("week", lambda d: d.isocalendar()[1]),
    ]:
        got = col(sess.sql(f"SELECT EXTRACT({field} FROM d) FROM dates"))
        want = [fn(d) if d is not None else None for d in DATES]
        assert got == want, (field, got, want)


def test_extract_time_fields(sess):
    for field, fn in [
        ("year", lambda t: t.year),
        ("hour", lambda t: t.hour),
        ("minute", lambda t: t.minute),
        ("second", lambda t: t.second + t.microsecond / 1e6),
        ("epoch", lambda t: t.replace(
            tzinfo=datetime.timezone.utc).timestamp()),
    ]:
        got = col(sess.sql(f"SELECT EXTRACT({field} FROM ts) FROM tss"))
        want = [fn(t) if t is not None else None for t in TIMESTAMPS]
        assert got == pytest.approx(want, abs=1e-6), (field, got, want)


def test_date_trunc_dates(sess):
    for unit, fn in [
        ("year", lambda d: d.replace(month=1, day=1)),
        ("quarter", lambda d: d.replace(month=((d.month - 1) // 3) * 3 + 1, day=1)),
        ("month", lambda d: d.replace(day=1)),
        ("week", lambda d: d - datetime.timedelta(days=d.weekday())),
    ]:
        got = col(sess.sql(f"SELECT DATE_TRUNC('{unit}', d) FROM dates"))
        want = [fn(d) if d is not None else None for d in DATES]
        assert got == want, (unit, got, want)


def test_date_trunc_timestamps(sess):
    for unit, fn in [
        ("day", lambda t: t.replace(hour=0, minute=0, second=0, microsecond=0)),
        ("hour", lambda t: t.replace(minute=0, second=0, microsecond=0)),
        ("minute", lambda t: t.replace(second=0, microsecond=0)),
        ("second", lambda t: t.replace(microsecond=0)),
        ("month", lambda t: t.replace(day=1, hour=0, minute=0, second=0,
                                      microsecond=0)),
    ]:
        got = col(sess.sql(f"SELECT DATE_TRUNC('{unit}', ts) FROM tss"))
        want = [fn(t) if t is not None else None for t in TIMESTAMPS]
        assert got == want, (unit, got, want)


def test_extract_in_group_by(sess):
    out = sess.sql(
        "SELECT EXTRACT(year FROM d) AS y, COUNT(*) AS c FROM dates "
        "GROUP BY EXTRACT(year FROM d) ORDER BY y"
    ).to_pylist()
    assert out == [(1900, 1), (1969, 1), (2023, 1), (2024, 3), (None, 1)]


def test_extract_compiled_matches_eager(sess):
    q = ("SELECT id, EXTRACT(month FROM d), DATE_TRUNC('month', d) "
         "FROM dates WHERE d IS NOT NULL ORDER BY id")
    fast = sess.sql(q).to_pylist()
    sess.executor._compiled = False
    slow = sess.sql(q).to_pylist()
    assert fast == slow
