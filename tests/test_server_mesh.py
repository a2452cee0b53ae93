"""Servers ride the mesh: pgwire, Flight, and streaming sessions execute
SQL through the SPMD mesh pipeline (shard_map + lax.all_to_all) when their
Session carries a mesh — explicitly or via QE_MESH_DEVICES.

This certifies the full serving stack on the distributed path, which the
reference never connects (its pgwire backend runs the single-node executor
and its distributed executor simulates: crates/query-distributed/src/
executor.rs:242-251)."""

import asyncio
import threading

import pytest

import jax

from query_engine_tpu.columnar.batch import ColumnBatch
from query_engine_tpu.engine.session import Session
from query_engine_tpu.parallel.mesh import make_mesh

from tests.pg_client import PgTestClient


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest forces an 8-device CPU mesh"
    return make_mesh(devs[:8])


ORDERS = {
    "o_id": list(range(600)),
    "cust": [i * 7 % 40 for i in range(600)],
    "amount": [(i * 13) % 500 for i in range(600)],
}
CUSTOMERS = {
    "c_id": list(range(40)),
    "region": [i % 5 for i in range(40)],
}
SQL = (
    "SELECT region, COUNT(*), SUM(amount) FROM orders "
    "JOIN customers ON cust = c_id GROUP BY region ORDER BY region"
)


def _register(session):
    session.register_table("orders", ORDERS)
    session.register_table("customers", CUSTOMERS)
    return session


def _expected():
    return _register(Session()).sql(SQL).to_pylist()


def test_pgwire_serves_over_mesh(mesh):
    from query_engine_tpu.pgwire.server import PgServer

    session = _register(Session(mesh=mesh))
    server = PgServer(session, host="127.0.0.1", port=0)
    loop = asyncio.new_event_loop()
    started = threading.Event()
    port = {}

    def run():
        asyncio.set_event_loop(loop)

        async def boot():
            s = await server.start()
            port["p"] = s.sockets[0].getsockname()[1]
            started.set()

        loop.run_until_complete(boot())
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert started.wait(10)
    try:
        c = PgTestClient("127.0.0.1", port["p"])
        _, rows, _ = c.query(SQL)
        c.close()
    finally:
        loop.call_soon_threadsafe(loop.stop)
    # pgwire renders everything as text on the wire
    expect = [tuple(str(v) for v in r) for r in _expected()]
    assert rows == expect
    assert session.mesh_pipeline is not None
    assert session.mesh_pipeline.stats["queries"] >= 1
    assert session.mesh_pipeline.stats["compiles"] >= 1


def test_flight_serves_over_mesh(mesh):
    import time

    from query_engine_tpu.core.config import FlightConfig
    from query_engine_tpu.flight.client import FlightClient
    from query_engine_tpu.flight.server import FlightServiceImpl

    session = _register(Session(mesh=mesh))
    svc = FlightServiceImpl(FlightConfig(host="127.0.0.1", port=0), session=session)
    t = threading.Thread(target=svc.serve, daemon=True)
    t.start()
    time.sleep(0.3)
    try:
        c = FlightClient(f"grpc://127.0.0.1:{svc.port}")
        out = c.execute_sql(SQL)
        c.close()
    finally:
        svc.shutdown()
    assert out.to_pylist() == _expected()
    assert session.mesh_pipeline.stats["queries"] >= 1


def test_streaming_rides_env_mesh(monkeypatch):
    """QE_MESH_DEVICES turns the streaming engine's internal per-window
    Session into a mesh session with no code changes; window results stay
    identical to the host engine."""
    from query_engine_tpu.streaming.source import ChannelStreamSource
    from query_engine_tpu.streaming.stream import StreamConfig, StreamingQuery

    def run_stream():
        src = ChannelStreamSource()
        src.send(ColumnBatch.from_pydict(
            {"k": [1, 2, 1, 3], "v": [10, 20, 30, 40]}))
        src.send(ColumnBatch.from_pydict(
            {"k": [2, 2, 3, 1], "v": [5, 6, 7, 8]}))
        src.close()
        q = StreamingQuery(
            src,
            StreamConfig(),
            query="SELECT k, SUM(v) FROM stream GROUP BY k ORDER BY k",
        )
        return q, q.run()

    _, base = run_stream()
    monkeypatch.setenv("QE_MESH_DEVICES", "8")
    q, meshed = run_stream()
    assert [b.to_pylist() for b in meshed] == [b.to_pylist() for b in base]
    # device-buffer path keeps one persistent session — inspect it
    assert q._session is not None and q._session.mesh_pipeline is not None
    assert q._session.mesh_pipeline.stats["queries"] >= 1
