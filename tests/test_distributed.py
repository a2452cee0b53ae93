"""Distributed control-plane + executor tests (semantics ported from the
reference's in-process simulation strategy, SURVEY.md §4, but with REAL
execution instead of placeholder echoes)."""

import numpy as np
import pytest

import query_engine_tpu  # noqa: F401
from query_engine_tpu.columnar.batch import ColumnBatch
from query_engine_tpu.core.errors import DistributedError
from query_engine_tpu.parallel.coordinator import Coordinator, Worker
from query_engine_tpu.parallel.dexecutor import DistributedExecutor
from query_engine_tpu.parallel.dplanner import DistributedPlanner, ExchangeReason
from query_engine_tpu.parallel.exchange import Exchange, Merge, ResultCollector
from query_engine_tpu.parallel.fault import (
    FaultConfig, FaultManager, TaskRecoveryAction, WorkerRecoveryAction,
)
from query_engine_tpu.parallel.partition import Partitioner, RangeBoundary
from query_engine_tpu.parallel.scheduler import TaskScheduler
from query_engine_tpu.parallel.types import QueryTask, WorkerInfo
from query_engine_tpu.plan.planner import Planner
from query_engine_tpu.sql.parser import parse_sql
from query_engine_tpu.storage.memory import MemoryDataSource


def make_batch(n=100, keys=7):
    rng = np.random.default_rng(5)
    return ColumnBatch.from_pydict(
        {
            "k": rng.integers(0, keys, n).tolist(),
            "v": rng.integers(0, 1000, n).tolist(),
        }
    )


# ---- partitioner (reference partition.rs tests: row conservation) ----------
def test_hash_partition_row_conservation_and_colocation():
    b = make_batch(200)
    parts = Partitioner.hash(4, ["k"]).partition(b)
    assert sum(p.num_rows for p in parts) == 200
    # every key appears in exactly one partition
    seen = {}
    for i, p in enumerate(parts):
        for k in set(p.to_pydict()["k"]):
            assert seen.setdefault(k, i) == i


def test_round_robin_and_range_partition():
    b = make_batch(10)
    parts = Partitioner.round_robin(3).partition(b)
    assert [p.num_rows for p in parts] == [4, 3, 3]
    rp = Partitioner.range(
        2, ["v"], [RangeBoundary(500.0)]
    ).partition(b)
    assert sum(p.num_rows for p in rp) == 10
    assert all(v < 500 for v in rp[0].to_pydict()["v"])
    assert all(v >= 500 for v in rp[1].to_pydict()["v"])


def test_sorted_merge():
    b1 = ColumnBatch.from_pydict({"x": [5, 1, 9]})
    b2 = ColumnBatch.from_pydict({"x": [3, 7]})
    out = Merge.sorted([("x", True)]).execute([b1, b2])
    assert out.to_pydict()["x"] == [1, 3, 5, 7, 9]


def test_union_distinct_merge():
    b1 = ColumnBatch.from_pydict({"x": [1, 2, 2]})
    b2 = ColumnBatch.from_pydict({"x": [2, 3]})
    out = Merge.union_distinct().execute([b1, b2])
    assert sorted(out.to_pydict()["x"]) == [1, 2, 3]


def test_result_collector():
    rc = ResultCollector(expected_partitions=2)
    rc.add_partition_result(0, [ColumnBatch.from_pydict({"x": [1]})])
    assert not rc.is_complete
    with pytest.raises(DistributedError):
        rc.finalize()
    rc.add_partition_result(1, [ColumnBatch.from_pydict({"x": [2]})])
    assert rc.finalize().to_pydict()["x"] == [1, 2]


# ---- coordinator / scheduler / fault (reference test shapes) ---------------
def test_coordinator_registry_and_health():
    c = Coordinator()
    w1 = c.register_worker("host1:50051")
    c.register_worker("host2:50051")
    with pytest.raises(DistributedError):
        c.register_worker("host1:50051")  # duplicate address
    assert c.active_worker_count() == 2
    # staleness sweep
    c._workers[w1].last_heartbeat_ms -= 1e6
    newly = c.check_worker_health()
    assert newly == [w1]
    assert c.active_worker_count() == 1
    c.heartbeat(w1)  # heartbeat revives
    assert c.active_worker_count() == 2
    st = c.cluster_status()
    assert st.total_workers == 2 and st.utilization == 0.0


def test_scheduler_fifo_and_least_loaded():
    s = TaskScheduler()
    t1 = QueryTask.new("q", 0, 0)
    t2 = QueryTask.new("q", 0, 1)
    s.submit(t1)
    s.submit(t2)
    assert s.get_next_task().task_id == t1.task_id
    workers = [
        WorkerInfo("a", "a:1", active_tasks=3),
        WorkerInfo("b", "b:1", active_tasks=1),
    ]
    assert s.choose_worker(workers).worker_id == "b"
    got = s.reschedule_failed(t1.task_id)
    assert got.retry_count == 1
    assert s.pending_count == 2


def test_fault_manager_retry_then_fail():
    fm = FaultManager(FaultConfig(max_task_retries=2))
    a1, d1 = fm.handle_task_failure("t1")
    a2, _ = fm.handle_task_failure("t1")
    a3, _ = fm.handle_task_failure("t1")
    assert a1 is TaskRecoveryAction.RETRY and d1 == 1.0
    assert a2 is TaskRecoveryAction.RETRY
    assert a3 is TaskRecoveryAction.FAIL
    # success resets
    fm.handle_task_success("t1")
    a4, _ = fm.handle_task_failure("t1")
    assert a4 is TaskRecoveryAction.RETRY


def test_fault_manager_worker_threshold_and_checkpoint():
    fm = FaultManager(FaultConfig(worker_failure_threshold=2))
    assert fm.handle_worker_failure("w") is WorkerRecoveryAction.NONE
    assert fm.handle_worker_failure("w") is WorkerRecoveryAction.MARK_UNHEALTHY
    fm.checkpoint_stage("q1", 0)
    fm.checkpoint_stage("q1", 1)
    plan = fm.recover_from_checkpoint("q1")
    assert plan.resume_from_stage == 2
    fm.clear_checkpoint("q1")
    assert fm.recover_from_checkpoint("q1") is None


# ---- distributed planner ---------------------------------------------------
def _logical(sql, tables):
    p = Planner()
    for name, schema in tables.items():
        p.register_table(name, schema)
    return p.create_logical_plan(parse_sql(sql))


def test_distributed_planner_aggregate_stages():
    b = make_batch(10)
    plan = _logical("SELECT k, SUM(v) FROM t GROUP BY k", {"t": b.schema})
    dp = DistributedPlanner(4)
    dplan = dp.plan(plan)
    assert not dplan.is_local
    kinds = [s.kind for s in dplan.stages]
    assert "partial_agg" in kinds and "final_agg" in kinds
    ex = dp.identify_exchanges(dplan.stages)
    assert any(e.reason is ExchangeReason.AGGREGATION for e in ex)


# ---- end-to-end distributed execution --------------------------------------
@pytest.fixture()
def cluster():
    c = Coordinator()
    for i in range(3):
        c.register_worker(f"host{i}:5005{i}")
    return c


def test_distributed_aggregate_matches_local(cluster):
    b = make_batch(500, keys=13)
    sources = {"t": MemoryDataSource(batch=b, name="t")}
    plan = _logical(
        "SELECT k, COUNT(*), SUM(v), AVG(v), MIN(v), MAX(v) FROM t GROUP BY k",
        {"t": b.schema},
    )
    dex = DistributedExecutor(cluster)
    out = dex.execute(plan, sources)

    # local truth
    from query_engine_tpu.engine.session import Session

    s = Session()
    s.register_table("t", b)
    local = s.sql(
        "SELECT k, COUNT(*), SUM(v), AVG(v), MIN(v), MAX(v) FROM t GROUP BY k"
    )
    got = sorted(out.to_pylist())
    exp = sorted(local.to_pylist())
    assert got == exp
    assert dex.stats.tasks_executed > 0
    assert dex.stats.rows_shuffled > 0


def test_distributed_join_matches_local(cluster):
    rng = np.random.default_rng(9)
    lb = ColumnBatch.from_pydict(
        {"k": rng.integers(0, 20, 300).tolist(), "lv": list(range(300))}
    )
    rb = ColumnBatch.from_pydict(
        {"k": rng.integers(0, 20, 50).tolist(), "rv": list(range(50))}
    )
    sources = {
        "l": MemoryDataSource(batch=lb, name="l"),
        "r": MemoryDataSource(batch=rb, name="r"),
    }
    schemas = {"l": lb.schema, "r": rb.schema}
    sql = "SELECT l.lv, r.rv FROM l JOIN r ON l.k = r.k"
    plan = _logical(sql, schemas)
    dex = DistributedExecutor(cluster)
    out = dex.execute(plan, sources)

    from query_engine_tpu.engine.session import Session

    s = Session()
    s.register_table("l", lb)
    s.register_table("r", rb)
    local = s.sql(sql)
    assert sorted(out.to_pylist()) == sorted(local.to_pylist())


def test_distributed_filter_sort(cluster):
    b = make_batch(200)
    sources = {"t": MemoryDataSource(batch=b, name="t")}
    sql = "SELECT v FROM t WHERE v > 500 ORDER BY v DESC"
    plan = _logical(sql, {"t": b.schema})
    out = DistributedExecutor(cluster).execute(plan, sources)
    vals = [r[0] for r in out.to_pylist()]
    assert vals == sorted([v for v in b.to_pydict()["v"] if v > 500], reverse=True)


def test_serialized_batch_roundtrip():
    """Arrow IPC round trip (reference network.rs:215-256 test shape)."""
    from query_engine_tpu.parallel.network import NetworkConfig, SerializedBatch

    b = make_batch(50)
    sb = SerializedBatch.serialize(b)
    assert sb.num_rows == 50 and sb.size_bytes > 0
    back = sb.deserialize()
    assert back.to_pydict() == b.to_pydict()
    with pytest.raises(DistributedError):
        SerializedBatch.serialize(b, NetworkConfig(max_message_bytes=10))


def test_flight_transport_fanout():
    import threading
    import time as _time

    from query_engine_tpu.core.config import FlightConfig
    from query_engine_tpu.flight.server import FlightServiceImpl
    from query_engine_tpu.parallel.flight_transport import FlightTransport

    servers = []
    transport = FlightTransport()
    for i in range(2):
        svc = FlightServiceImpl(FlightConfig(host="127.0.0.1", port=0))
        svc.session.register_table(
            "t", ColumnBatch.from_pydict({"x": [i * 10, i * 10 + 1]})
        )
        threading.Thread(target=svc.serve, daemon=True).start()
        servers.append(svc)
        transport.add_worker(f"w{i}", f"grpc://127.0.0.1:{svc.port}")
    _time.sleep(0.3)
    try:
        one = transport.execute_on_worker("w0", "SELECT SUM(x) FROM t")
        assert one.to_pylist() == [(1,)]
        results = transport.execute_on_all("SELECT SUM(x) FROM t")
        assert sorted(r.to_pylist()[0][0] for r in results) == [1, 21]
        with pytest.raises(DistributedError):
            transport.execute_on_worker("nope", "SELECT 1")
    finally:
        for svc in servers:
            svc.shutdown()


def test_checkpoint_disk_spill(tmp_path):
    from query_engine_tpu.parallel.fault import FaultConfig, FaultManager

    fm = FaultManager(FaultConfig(checkpoint_dir=str(tmp_path)))
    b = make_batch(30)
    fm.checkpoint_stage("q9", 0, [b, b.slice(0, 5)])
    # stored as paths on disk
    cp = fm.get_checkpoint("q9")
    assert all(isinstance(p, str) for p in cp.intermediate[0])
    loaded = fm.load_checkpoint_data("q9", 0)
    assert loaded[0].to_pydict() == b.to_pydict()
    assert loaded[1].num_rows == 5
    assert fm.recover_from_checkpoint("q9").resume_from_stage == 1


def test_distributed_executor_mesh_route():
    """DistributedExecutor(mesh=...) executes eligible plans as ONE
    shard_map program (parallel/mesh_pipeline.py) instead of the
    host-side stage walk."""
    import jax
    import numpy as np

    from query_engine_tpu.engine.session import Session
    from query_engine_tpu.parallel.coordinator import Coordinator
    from query_engine_tpu.parallel.dexecutor import DistributedExecutor
    from query_engine_tpu.parallel.mesh import make_mesh
    from query_engine_tpu.sql.parser import parse_sql

    mesh = make_mesh(jax.devices()[:8])
    rng = np.random.default_rng(4)
    n = 2000
    data = {"k": rng.integers(0, 20, n).tolist(),
            "v": rng.integers(0, 100, n).tolist()}
    s = Session()
    s.register_table("t", data)
    plan = s.planner.create_logical_plan(parse_sql(
        "SELECT k, SUM(v) AS s, COUNT(*) AS c FROM t "
        "WHERE v > 10 GROUP BY k ORDER BY k"
    ))
    dx = DistributedExecutor(Coordinator(), mesh=mesh)
    out = dx.execute(plan, s.sources)
    expected = s.sql(
        "SELECT k, SUM(v) AS s, COUNT(*) AS c FROM t "
        "WHERE v > 10 GROUP BY k ORDER BY k"
    )
    assert out.to_pylist() == expected.to_pylist()
    assert dx._mesh_pipeline is not None
    assert dx._mesh_pipeline.stats["compiles"] >= 1


def test_distributed_non_decomposable_aggregates(cluster):
    """DISTINCT and VARIANCE/STDDEV aggregates have no per-partition
    partial — the planner emits a gather-then-aggregate-whole stage.
    Regression: partial COUNT(DISTINCT) summed across partitions
    over-counted values present in several partitions."""
    b = make_batch(500, keys=13)
    sources = {"t": MemoryDataSource(batch=b, name="t")}
    sql = ("SELECT k, COUNT(DISTINCT v), VAR_SAMP(v), STDDEV_POP(v) "
           "FROM t GROUP BY k")
    plan = _logical(sql, {"t": b.schema})
    out = sorted(DistributedExecutor(cluster).execute(plan, sources)
                 .to_pylist())

    from query_engine_tpu.engine.session import Session

    s = Session()
    s.register_table("t", b)
    exp = sorted(s.sql(sql).to_pylist())
    assert len(out) == len(exp)
    for got, want in zip(out, exp):
        assert got[0] == want[0] and got[1] == want[1]
        for g, w in zip(got[2:], want[2:]):
            assert (g is None) == (w is None)
            if g is not None:
                assert abs(g - w) < 1e-9
