"""Streaming + Flight subsystem tests."""

import threading
import time

import pytest

import query_engine_tpu  # noqa: F401
from query_engine_tpu.columnar.batch import ColumnBatch
from query_engine_tpu.streaming.source import ChannelStreamSource, MemoryStreamSource
from query_engine_tpu.streaming.stream import (
    StreamConfig, StreamingQuery, StreamStatus,
)
from query_engine_tpu.streaming.watermark import LateEventPolicy, Watermark
from query_engine_tpu.streaming.window import (
    SessionWindow, SlidingWindow, TumblingWindow, WindowSpec, WindowType,
)


# ---- watermarks (reference watermark.rs tests) -----------------------------
def test_watermark_monotonic():
    w = Watermark()
    assert w.advance(100)
    assert not w.advance(50)  # never goes backward
    assert w.current == 100
    assert w.is_late(99) and not w.is_late(100)


def test_late_event_policies():
    w = Watermark()
    w.advance(1000)
    assert not LateEventPolicy.drop().should_allow_late(900, w)
    assert LateEventPolicy.allow(200).should_allow_late(900, w)
    assert not LateEventPolicy.allow(50).should_allow_late(900, w)
    assert LateEventPolicy.drop().should_allow_late(1000, w)


# ---- windows with injected clock -------------------------------------------
class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_tumbling_window():
    clock = FakeClock()
    w = TumblingWindow(10.0, clock)
    assert not w.should_trigger()
    clock.t = 10.5
    assert w.should_trigger()
    w.reset()
    assert not w.should_trigger()


def test_sliding_window():
    clock = FakeClock()
    w = SlidingWindow(10.0, 5.0, clock)
    clock.t = 5.1
    assert w.should_trigger()
    assert w.keeps_rows_after_trigger()


def test_session_window():
    clock = FakeClock()
    w = SessionWindow(30.0, clock)
    assert not w.should_trigger()  # no events yet
    w.on_event()
    clock.t = 29.0
    assert not w.should_trigger()
    clock.t = 31.0
    assert w.should_trigger()


# ---- streaming query -------------------------------------------------------
def test_streaming_query_windowed_aggregation():
    clock = FakeClock()
    batches = [
        ColumnBatch.from_pydict({"k": [1, 1, 2], "v": [10, 20, 30]}),
        ColumnBatch.from_pydict({"k": [2, 2], "v": [40, 50]}),
    ]
    src = MemoryStreamSource(batches)
    q = StreamingQuery(
        src,
        StreamConfig(window=WindowSpec(WindowType.TUMBLING, size_secs=1e9)),
        query="SELECT k, SUM(v) FROM stream GROUP BY k ORDER BY k",
        clock=clock,
    )
    results = q.run()
    assert q.status is StreamStatus.COMPLETED
    # window never triggered by time -> flush-on-end emits one result
    assert len(results) == 1
    assert results[0].to_pylist() == [(1, 30), (2, 120)]
    assert q.stats.rows_processed == 5
    assert q.stats.windows_emitted == 1


def test_streaming_channel_source_and_late_drop():
    src = ChannelStreamSource()
    src.send(ColumnBatch.from_pydict({"ts": [100, 200], "v": [1, 2]}))
    src.send(ColumnBatch.from_pydict({"ts": [150, 300], "v": [3, 4]}))  # 150 late
    src.close()
    q = StreamingQuery(
        src,
        StreamConfig(event_time_column="ts"),
        query="SELECT COUNT(*) FROM stream",
    )
    results = q.run()
    assert q.stats.late_events_dropped == 1
    assert results[0].to_pylist() == [(3,)]


# ---- flight ---------------------------------------------------------------
@pytest.fixture(scope="module")
def flight_server():
    from query_engine_tpu.core.config import FlightConfig
    from query_engine_tpu.flight.server import FlightServiceImpl

    svc = FlightServiceImpl(FlightConfig(host="127.0.0.1", port=0))
    svc.session.register_table(
        "nums", ColumnBatch.from_pydict({"n": [1, 2, 3, 4], "s": ["a", "b", "c", "d"]})
    )
    t = threading.Thread(target=svc.serve, daemon=True)
    t.start()
    time.sleep(0.3)
    yield svc
    svc.shutdown()


def test_flight_execute_sql(flight_server):
    from query_engine_tpu.flight.client import FlightClient

    c = FlightClient(f"grpc://127.0.0.1:{flight_server.port}")
    out = c.execute_sql("SELECT n, s FROM nums WHERE n > 2 ORDER BY n")
    assert out.to_pylist() == [(3, "c"), (4, "d")]
    assert c.handshake()
    c.close()


def test_flight_upload_list_and_info(flight_server):
    from query_engine_tpu.flight.client import FlightClient

    c = FlightClient(f"grpc://127.0.0.1:{flight_server.port}")
    c.upload_table("uploaded", ColumnBatch.from_pydict({"x": [10, 20]}))
    assert "uploaded" in c.list_tables()
    out = c.execute_sql("SELECT SUM(x) FROM uploaded")
    assert out.to_pylist() == [(30,)]
    schema = c.get_table_schema("uploaded")
    assert schema.names == ["x"]
    flights = c.list_flights()
    assert any(f.descriptor.path == [b"uploaded"] for f in flights)
    c.close()


def test_flight_exchange_and_data_source(flight_server):
    from query_engine_tpu.flight.client import FlightClient
    from query_engine_tpu.flight.data_source import (
        FlightDataSource, FlightStreamSource,
    )

    url = f"grpc://127.0.0.1:{flight_server.port}"
    c = FlightClient(url)
    echoed = c.exchange(ColumnBatch.from_pydict({"e": [7, 8]}))
    assert echoed.to_pylist() == [(7,), (8,)]
    c.close()

    ds = FlightDataSource(url, "SELECT n FROM nums ORDER BY n")
    assert ds.scan().to_pylist() == [(1,), (2,), (3,), (4,)]
    ss = FlightStreamSource(url, "SELECT n FROM nums ORDER BY n", batch_rows=3)
    got = []
    while not ss.is_exhausted():
        b = ss.next_batch()
        got.extend(b.to_pylist())
    assert got == [(1,), (2,), (3,), (4,)]


def test_flight_poll_flight_info(flight_server):
    from query_engine_tpu.flight.client import FlightClient

    c = FlightClient(f"grpc://127.0.0.1:{flight_server.port}")
    # path-based poll (reference server.rs:283-321): always complete
    info = c.poll_flight_info(name="nums")
    assert info["progress"] == 1.0
    assert info["ticket"] == "nums"
    assert info["total_records"] == 4
    assert info["schema"].names == ["n", "s"]
    # command-based poll runs the query for schema/row count
    info = c.poll_flight_info(sql="SELECT n FROM nums WHERE n > 2")
    assert info["progress"] == 1.0
    assert info["total_records"] == 2
    assert info["schema"].names == ["n"]
    # unknown table -> error
    with pytest.raises(Exception):
        c.poll_flight_info(name="missing_table")
    c.close()


def test_flight_error_propagates(flight_server):
    from query_engine_tpu.core.errors import FlightError
    from query_engine_tpu.flight.client import FlightClient

    c = FlightClient(f"grpc://127.0.0.1:{flight_server.port}")
    with pytest.raises(FlightError):
        c.execute_sql("SELECT * FROM missing_table")
    c.close()


def test_streaming_checkpoint_restore():
    from query_engine_tpu.streaming.stream import StreamConfig, StreamingQuery
    from query_engine_tpu.streaming.source import MemoryStreamSource

    src = MemoryStreamSource([
        ColumnBatch.from_pydict({"ts": [100], "v": [1]}),
    ])
    q = StreamingQuery(
        src, StreamConfig(enable_checkpointing=True, event_time_column="ts"),
        query="SELECT COUNT(*) FROM stream",
    )
    q.run(max_batches=1)
    snap = q.checkpoint()
    assert snap is not None and snap["watermark_ms"] == 100

    q2 = StreamingQuery(
        MemoryStreamSource([ColumnBatch.from_pydict({"ts": [50], "v": [9]})]),
        StreamConfig(enable_checkpointing=True, event_time_column="ts"),
        query="SELECT COUNT(*) FROM stream",
    )
    q2.restore(snap)
    q2.run()
    # the 50ms event is late relative to the restored watermark -> dropped
    assert q2.stats.late_events_dropped == 1
