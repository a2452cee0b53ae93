"""Device-resident streaming append (streaming/device_table.py):
per-window host->device transfer is O(incoming batch), the resident
planes grow by capacity doubling, dictionaries delta-merge with on-device
recode, and windowed SQL results match the host-buffered path."""

import numpy as np

from query_engine_tpu.columnar.batch import ColumnBatch
from query_engine_tpu.streaming.device_table import DeviceStreamTable
from query_engine_tpu.streaming.source import MemoryStreamSource
from query_engine_tpu.streaming.stream import StreamConfig, StreamingQuery
from query_engine_tpu.streaming.window import WindowSpec


def batches(n_batches=6, rows=100, seed=3):
    rng = np.random.default_rng(seed)
    out = []
    for b in range(n_batches):
        out.append(ColumnBatch.from_pydict({
            "k": rng.integers(0, 5, rows).tolist(),
            "v": rng.integers(1, 100, rows).tolist(),
            "tag": rng.choice(["x", "y", "z"], rows).tolist(),
        }))
    return out


def test_upload_is_per_batch_not_per_window():
    bs = batches()
    t = DeviceStreamTable(bs[0].schema, 128)
    total = 0
    for b in bs:
        before = t.upload_rows
        t.append(b)
        total += b.num_rows
        # instrumented transfer grows by exactly the incoming batch
        assert t.upload_rows - before == b.num_rows
    assert t.upload_rows == total
    assert t.num_rows == total
    snap = t.snapshot()
    assert snap.num_rows == total
    # appending after a snapshot never mutates the snapshot (immutability)
    pre = snap.column("v").to_pylist(snap.num_rows)
    t.append(bs[0])
    assert snap.column("v").to_pylist(snap.num_rows) == pre


def test_capacity_doubles_and_content_matches_concat():
    bs = batches(n_batches=10, rows=200)
    t = DeviceStreamTable(bs[0].schema, 128)
    for b in bs:
        t.append(b)
    ref = ColumnBatch.concat(bs)
    snap = t.snapshot()
    assert snap.to_pylist() == ref.to_pylist()
    assert t.capacity >= 2000 and t.capacity & (t.capacity - 1) == 0


def test_dictionary_delta_merge_recodes_resident_rows():
    b1 = ColumnBatch.from_pydict({"s": ["m", "z", "m"]})
    b2 = ColumnBatch.from_pydict({"s": ["a", "z", "q"]})  # 'a' resorts codes
    t = DeviceStreamTable(b1.schema, 128)
    t.append(b1)
    t.append(b2)
    assert t.dict_merges >= 1
    assert t.snapshot().column("s").to_pylist(6) == [
        "m", "z", "m", "a", "z", "q",
    ]


def test_clear_and_retain():
    bs = batches(3, 50)
    t = DeviceStreamTable(bs[0].schema, 128)
    for b in bs:
        t.append(b)
    t.retain_last(50)
    assert t.snapshot().to_pylist() == bs[-1].to_pylist()
    t.clear()
    assert t.num_rows == 0


class TickClock:
    """Advances 1s per call: a 2s tumbling window triggers every ~2
    batches pulled (each loop iteration reads the clock a few times, so
    windows stay deterministic per run mode)."""

    def __init__(self):
        self.t = 0.0

    def __call__(self):
        self.t += 1.0
        return self.t


def run_stream(device: bool, bs):
    from query_engine_tpu.streaming.window import WindowType

    src = MemoryStreamSource(list(bs))
    cfg = StreamConfig(
        window=WindowSpec(WindowType.TUMBLING, size_secs=6.0),
        device_buffer=device,
    )
    q = StreamingQuery(
        src, cfg,
        query="SELECT k, SUM(v) AS s, COUNT(*) AS c FROM stream "
              "GROUP BY k ORDER BY k",
        clock=TickClock(),
    )
    results = q.run()
    return [r.to_pylist() for r in results], q


def test_windowed_sql_matches_host_path():
    bs = batches(6, 80, seed=11)
    dev, qd = run_stream(True, bs)
    host, _ = run_stream(False, bs)
    assert dev == host
    assert qd._dev_table is not None
    # every ingested row uploaded exactly once
    assert qd._dev_table.upload_rows == sum(b.num_rows for b in bs)
