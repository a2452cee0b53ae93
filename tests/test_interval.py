"""INTERVAL literals and temporal arithmetic (beyond the reference, which
parses INTERVAL only as a type keyword). PG semantics: month arithmetic
clamps the day-of-month; date - date yields integer days."""

import datetime

import pyarrow as pa
import pytest

from query_engine_tpu.columnar.batch import ColumnBatch
from query_engine_tpu.engine.session import Session


@pytest.fixture()
def sess():
    s = Session()
    rb = pa.record_batch({
        "id": pa.array([1, 2, 3]),
        "d": pa.array([
            datetime.date(2024, 1, 31),
            datetime.date(2024, 2, 29),
            datetime.date(1969, 12, 15),
        ]),
        "ts": pa.array([
            datetime.datetime(2024, 1, 31, 23, 30),
            datetime.datetime(2024, 2, 29, 1, 0),
            datetime.datetime(1969, 12, 15, 12, 0),
        ], type=pa.timestamp("us")),
    })
    s.register_table("ev", ColumnBatch.from_arrow(rb))
    return s


def col(b, i=1):
    return [r[i] for r in b.to_pylist()]


def test_add_month_clamps(sess):
    out = col(sess.sql("SELECT id, d + INTERVAL '1 month' FROM ev ORDER BY id"))
    assert out == [
        datetime.date(2024, 2, 29),   # Jan 31 + 1mo clamps to leap Feb
        datetime.date(2024, 3, 29),
        datetime.date(1970, 1, 15),
    ]


def test_sub_year_clamps(sess):
    out = col(sess.sql("SELECT id, d - INTERVAL '1 year' FROM ev ORDER BY id"))
    assert out[1] == datetime.date(2023, 2, 28)  # leap day -> Feb 28


def test_day_and_week_arithmetic(sess):
    out = col(sess.sql("SELECT id, d + INTERVAL '10 days' FROM ev ORDER BY id"))
    assert out[0] == datetime.date(2024, 2, 10)
    out = col(sess.sql("SELECT id, d - INTERVAL '2 weeks' FROM ev ORDER BY id"))
    assert out[2] == datetime.date(1969, 12, 1)


def test_timestamp_arithmetic(sess):
    out = col(sess.sql(
        "SELECT id, ts + INTERVAL '90 minutes' FROM ev ORDER BY id"
    ))
    assert out[0] == datetime.datetime(2024, 2, 1, 1, 0)  # day rollover
    out = col(sess.sql(
        "SELECT id, ts - INTERVAL '1 day 01:30:00' FROM ev ORDER BY id"
    ))
    assert out[0] == datetime.datetime(2024, 1, 30, 22, 0)


def test_interval_commutes_and_filters(sess):
    out = col(sess.sql(
        "SELECT id, INTERVAL '1 day' + d FROM ev ORDER BY id"
    ))
    assert out[0] == datetime.date(2024, 2, 1)
    assert sess.sql(
        "SELECT id FROM ev WHERE d + INTERVAL '1 month' > '2024-03-01'"
    ).to_pylist() == [(2,)]


def test_date_minus_date_days(sess):
    out = sess.sql(
        "SELECT ev.id FROM ev WHERE ev.d - ev.d = 0 ORDER BY ev.id"
    ).to_pylist()
    assert out == [(1,), (2,), (3,)]


def test_date_plus_subday_interval_errors(sess):
    from query_engine_tpu.core.errors import ExecutionError

    with pytest.raises(ExecutionError):
        sess.sql("SELECT d + INTERVAL '01:30:00' FROM ev")


def test_compiled_matches_eager(sess):
    q = ("SELECT id, ts + INTERVAL '3 months 12 hours' AS t2 FROM ev "
         "WHERE id > 1 ORDER BY id")
    fast = sess.sql(q).to_pylist()
    sess.executor._compiled = False
    assert sess.sql(q).to_pylist() == fast
