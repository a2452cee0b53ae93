"""Cache semantics tests — ported shapes from reference cache.rs tests
(TTL, LRU eviction, memory tracking, concurrency; SURVEY §4)."""

import threading
import time

import pytest

import query_engine_tpu  # noqa: F401
from query_engine_tpu.cache.cache import CacheEntry, CacheKey, QueryCache
from query_engine_tpu.cache.config import CacheConfig
from query_engine_tpu.cache.flight_cache import flight_cache_key
from query_engine_tpu.cache.invalidation import (
    FullClearInvalidator, InvalidationEvent,
)
from query_engine_tpu.columnar.batch import ColumnBatch


def make_batch(n=10):
    return ColumnBatch.from_pydict({"x": list(range(n))})


def test_cache_key_normalization():
    a = CacheKey.from_sql("SELECT  *  FROM t;")
    b = CacheKey.from_sql("select * from T")
    c = CacheKey.from_sql("select * from u")
    assert a == b and a != c


def test_basic_get_put_and_stats():
    cache = QueryCache(CacheConfig())
    key = CacheKey.from_sql("select 1")
    assert cache.get(key) is None
    cache.put(key, make_batch())
    hit = cache.get(key)
    assert hit is not None and hit.num_rows == 10
    assert cache.stats.hits == 1 and cache.stats.misses == 1
    assert cache.stats.hit_rate == 0.5
    assert cache.memory_bytes > 0


def test_ttl_expiry_and_sweep():
    cache = QueryCache(CacheConfig(ttl_seconds=0.05))
    key = CacheKey.from_sql("q")
    cache.put(key, make_batch())
    assert cache.get(key) is not None
    time.sleep(0.08)
    assert cache.get(key) is None
    assert cache.stats.expirations == 1
    cache.put(CacheKey.from_sql("q2"), make_batch())
    time.sleep(0.08)
    assert cache.expire_stale() == 1
    assert len(cache) == 0


def test_lru_eviction_by_entry_count():
    cache = QueryCache(CacheConfig(max_entries=3))
    keys = [CacheKey.from_sql(f"q{i}") for i in range(4)]
    for k in keys[:3]:
        cache.put(k, make_batch())
    cache.get(keys[0])  # touch q0 -> q1 is now LRU
    cache.put(keys[3], make_batch())
    assert cache.get(keys[1]) is None  # evicted
    assert cache.get(keys[0]) is not None
    assert cache.stats.evictions == 1


def test_memory_cap_eviction():
    one = make_batch(1000)
    size = CacheEntry(one).size_bytes
    cache = QueryCache(CacheConfig(max_memory_bytes=int(size * 2.5)))
    for i in range(3):
        cache.put(CacheKey.from_sql(f"m{i}"), make_batch(1000))
    assert len(cache) == 2
    assert cache.memory_bytes <= int(size * 2.5)


def test_disabled_cache():
    cache = QueryCache(CacheConfig(enabled=False))
    key = CacheKey.from_sql("x")
    cache.put(key, make_batch())
    assert cache.get(key) is None


def test_concurrent_access():
    cache = QueryCache(CacheConfig())
    errors = []

    def worker(i):
        try:
            for j in range(50):
                k = CacheKey.from_sql(f"q{i}_{j % 5}")
                cache.put(k, make_batch(5))
                cache.get(k)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors


def test_invalidation_and_flight_key():
    cache = QueryCache(CacheConfig())
    cache.put(CacheKey.from_sql("a"), make_batch())
    inv = FullClearInvalidator(cache)
    inv.handle_event(InvalidationEvent.table_modified("t"))
    assert len(cache) == 0
    k1 = flight_cache_key("grpc://h:1", "select 1")
    k2 = flight_cache_key("grpc://h:2", "select 1")
    assert k1 != k2


def test_cached_executor_roundtrip():
    from query_engine_tpu.engine.cached_executor import CachedQueryExecutor
    from query_engine_tpu.engine.executor import _Materialized

    ex = CachedQueryExecutor()
    plan = _Materialized(make_batch(7))
    out1 = ex.execute_cached("SELECT * FROM t7", plan)
    out2 = ex.execute_cached("select * from T7", plan)
    assert out1.num_rows == out2.num_rows == 7
    assert ex.stats.hits == 1


def test_session_cache_invalidated_by_dml():
    from query_engine_tpu.engine.session import Session

    s = Session(enable_cache=True)
    s.sql("CREATE TABLE t (id INT)")
    s.sql("INSERT INTO t (id) VALUES (1)")
    assert s.sql("SELECT COUNT(*) FROM t").to_pylist() == [(1,)]
    s.sql("INSERT INTO t (id) VALUES (2)")
    # DML must invalidate the cached COUNT
    assert s.sql("SELECT COUNT(*) FROM t").to_pylist() == [(2,)]
