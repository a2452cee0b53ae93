"""Streaming windows + watermarks (reference examples/streaming_query.rs)."""
from _common import show
from query_engine_tpu.columnar.batch import ColumnBatch
from query_engine_tpu.streaming.source import MemoryStreamSource
from query_engine_tpu.streaming.stream import StreamConfig, StreamingQuery
from query_engine_tpu.streaming.window import WindowSpec, WindowType

batches = [
    ColumnBatch.from_pydict({"sensor": ["a", "a", "b"], "temp": [20, 22, 30]}),
    ColumnBatch.from_pydict({"sensor": ["b", "a"], "temp": [31, 21]}),
]
q = StreamingQuery(
    MemoryStreamSource(batches),
    StreamConfig(window=WindowSpec(WindowType.TUMBLING, size_secs=1e9)),
    query="SELECT sensor, COUNT(*) AS n, AVG(temp) AS avg_temp "
          "FROM stream GROUP BY sensor ORDER BY sensor",
)
for i, result in enumerate(q.run()):
    show(f"Window {i}", result)
print("stats:", q.stats)
