"""Streaming ingest without re-upload: the device-resident append buffer.

The reference's streaming loop buffers host batches and, on a window
trigger, emits buffer[0] ("simplified", stream.rs:163-180). This engine
runs real SQL per window — and with `StreamConfig(device_buffer=True)`
(the default) the window's rows already LIVE on the device:

- each incoming batch is written once into capacity-doubling device
  planes (`lax.dynamic_update_slice` at the append offset);
- string columns delta-merge their dictionaries; resident codes are
  recoded on-device when the sorted union reorders them;
- window emission snapshots the planes zero-copy and runs the SQL
  through ONE persistent Session, so the compiled program is reused
  across windows (same capacity bucket = no recompiles).

Per-window host->device traffic is O(incoming batch), not O(buffer).

Run: JAX_PLATFORMS=cpu python examples/streaming_device_append.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from query_engine_tpu.columnar.batch import ColumnBatch  # noqa: E402
from query_engine_tpu.streaming.source import MemoryStreamSource  # noqa: E402
from query_engine_tpu.streaming.stream import (  # noqa: E402
    StreamConfig, StreamingQuery,
)
from query_engine_tpu.streaming.window import (  # noqa: E402
    WindowSpec, WindowType,
)
from query_engine_tpu.cli.format import format_table  # noqa: E402

rng = np.random.default_rng(3)


def make_batch(i):
    n = 500
    return ColumnBatch.from_pydict({
        "sensor": rng.choice(["temp", "hum", "co2"], n).tolist(),
        "value": (rng.normal(50, 15, n).round(2) + i).tolist(),
        "ok": (rng.random(n) > 0.02).tolist(),
    })


batches = [make_batch(i) for i in range(12)]


class TickClock:
    t = 0.0

    def __call__(self):
        TickClock.t += 1.0
        return TickClock.t


stream = StreamingQuery(
    MemoryStreamSource(list(batches)),
    StreamConfig(
        window=WindowSpec(WindowType.TUMBLING, size_secs=9.0),
        device_buffer=True,  # the default
    ),
    query=(
        "SELECT sensor, COUNT(*) AS n, AVG(value) AS avg_v, "
        "MAX(value) AS max_v FROM stream WHERE ok "
        "GROUP BY sensor ORDER BY sensor"
    ),
    clock=TickClock(),
)

results = stream.run()
for i, r in enumerate(results):
    print(f"\n=== window {i} ===")
    print(format_table(r))

t = stream._dev_table
total_rows = sum(b.num_rows for b in batches)
print(f"\nwindows emitted: {stream.stats.windows_emitted}")
print(
    f"rows ingested {stream.stats.rows_processed}, uploaded to device "
    f"{t.upload_rows} (exactly once each), dictionary delta-merges: "
    f"{t.dict_merges}"
)
assert t.upload_rows == total_rows
print(
    f"resident capacity {t.capacity} rows "
    f"(doubling growth; cleared per tumbling window, planes reused)"
)
print("\nstreaming device-append walkthrough OK")
