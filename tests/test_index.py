"""Index semantics tests (ported shapes from reference btree.rs/hash.rs/
manager.rs tests — range scans, unique constraints, multi-key, prefix match)
plus index-accelerated query execution."""

import numpy as np
import pytest

import query_engine_tpu  # noqa: F401
from query_engine_tpu.core.errors import IndexError_
from query_engine_tpu.index.btree import BTreeIndex
from query_engine_tpu.index.hash import HashIndex
from query_engine_tpu.index.manager import IndexManager
from query_engine_tpu.index.types import IndexMetadata, encode_key


def test_btree_insert_lookup_delete():
    idx = BTreeIndex()
    idx.insert((5,), 0)
    idx.insert((3,), 1)
    idx.insert((5,), 2)  # duplicate key, second row
    assert sorted(idx.lookup((5,))) == [0, 2]
    assert idx.lookup((99,)) == []
    assert len(idx) == 3
    idx.delete((5,), 0)
    assert idx.lookup((5,)) == [2]
    idx.clear()
    assert len(idx) == 0


def test_btree_range_scans_inclusive():
    idx = BTreeIndex()
    for i, v in enumerate([10, 20, 30, 40, 50]):
        idx.insert((v,), i)
    assert idx.range_scan((20,), (40,)) == [1, 2, 3]
    assert idx.range_scan((20,), (40,), include_low=False) == [2, 3]
    assert idx.range_scan((20,), (40,), include_high=False) == [1, 2]
    assert idx.range_scan(None, (25,)) == [0, 1]
    assert idx.range_scan((35,), None) == [3, 4]
    assert idx.supports_range()


def test_btree_unique_constraint():
    idx = BTreeIndex(unique=True)
    idx.insert((1,), 0)
    with pytest.raises(IndexError_):
        idx.insert((1,), 1)


def test_btree_mixed_type_ordering():
    # None < numbers < strings in the encoded order
    assert encode_key((None,)) < encode_key((5,)) < encode_key(("a",))
    assert encode_key((1.5,)) < encode_key((2,))  # int/float share an order


def test_hash_index():
    idx = HashIndex()
    idx.insert(("x", 1), 0)
    idx.insert(("x", 1), 1)
    assert sorted(idx.lookup(("x", 1))) == [0, 1]
    assert idx.range_scan((0,), (10,)) == []  # parity: no range support
    assert not idx.supports_range()
    idx.delete(("x", 1), 0)
    assert idx.lookup(("x", 1)) == [1]


def test_manager_create_drop_find():
    m = IndexManager()
    m.create_index("i1", "t", ["a"], "btree")
    m.create_index("i2", "t", ["a", "b"], "hash")
    with pytest.raises(IndexError_):
        m.create_index("i1", "t", ["c"])
    assert m.find_for_column("t", "a") == "i1"
    assert m.find_for_column("t", "z") is None
    # longest prefix match
    assert m.find_best_for_columns("t", ["a", "b"]) == "i2"
    assert m.find_best_for_columns("t", ["a"]) == "i1"
    m.drop_index("i1")
    assert not m.has_index("i1")
    with pytest.raises(IndexError_):
        m.drop_index("i1")


def test_metadata_prefix_cover():
    meta = IndexMetadata("i", "t", ["a", "b", "c"], "btree")
    assert meta.covers_columns(["a"])
    assert meta.covers_columns(["a", "b"])
    assert not meta.covers_columns(["b"])
    assert not meta.covers_columns(["a", "c"])
    assert meta.can_accelerate("a") and not meta.can_accelerate("b")


# ---- index-accelerated execution -------------------------------------------
def test_index_scan_equality_and_range():
    from query_engine_tpu.engine.session import Session
    from query_engine_tpu.plan.lowering import Lowering
    from query_engine_tpu.plan import physical as pp
    from query_engine_tpu.sql.parser import parse_sql

    s = Session()
    s.register_table("t", {
        "id": list(range(100)),
        "v": [i * 10 for i in range(100)],
    })
    s.sql("CREATE INDEX idx_id ON t (id)")

    # plan lowers to an IndexScan, not a full-scan filter
    plan = s.planner.create_logical_plan(parse_sql("SELECT v FROM t WHERE id = 42"))
    plan = s.optimizer.optimize(plan)
    pplan = Lowering(s.sources).lower(plan)
    labels = pplan.pretty()
    assert "IndexScan" in labels

    assert s.sql("SELECT v FROM t WHERE id = 42").to_pylist() == [(420,)]
    out = s.sql("SELECT id FROM t WHERE id > 95 ORDER BY id")
    assert out.to_pylist() == [(96,), (97,), (98,), (99,)]
    out2 = s.sql("SELECT id FROM t WHERE id >= 10 AND id < 13 ORDER BY id")
    assert out2.to_pylist() == [(10,), (11,), (12,)]
    # residual conjunct still applies
    out3 = s.sql("SELECT id FROM t WHERE id > 90 AND v > 960 ORDER BY id")
    assert out3.to_pylist() == [(97,), (98,), (99,)]


def test_index_kept_in_sync_by_dml():
    from query_engine_tpu.engine.session import Session

    s = Session()
    s.register_table("t", {"id": [1, 2], "v": ["a", "b"]})
    s.sql("CREATE INDEX ix ON t (id)")
    s.sql("INSERT INTO t (id, v) VALUES (3, 'c')")
    assert s.sql("SELECT v FROM t WHERE id = 3").to_pylist() == [("c",)]
    s.sql("DELETE FROM t WHERE id = 1")
    assert s.sql("SELECT v FROM t WHERE id = 1").to_pylist() == []
    s.sql("UPDATE t SET v = 'z' WHERE id = 2")
    assert s.sql("SELECT v FROM t WHERE id = 2").to_pylist() == [("z",)]


# ---- native C++ index backend ----------------------------------------------
def test_native_index_matches_python():
    from query_engine_tpu.index import native

    if not native.native_available():
        pytest.skip("no C++ toolchain")
    nb = native.NativeBTreeIndex()
    pb = BTreeIndex()
    import random

    rng = random.Random(7)
    keys = [(rng.randint(0, 50),) for _ in range(500)]
    for i, k in enumerate(keys):
        nb.insert(k, i)
        pb.insert(k, i)
    assert len(nb) == len(pb) == 500
    for probe in range(0, 55, 5):
        assert sorted(nb.lookup((probe,))) == sorted(pb.lookup((probe,)))
    assert sorted(nb.range_scan((10,), (20,))) == sorted(pb.range_scan((10,), (20,)))
    assert sorted(nb.range_scan((10,), (20,), False, False)) == sorted(
        pb.range_scan((10,), (20,), False, False))
    assert sorted(nb.range_scan(None, (5,))) == sorted(pb.range_scan(None, (5,)))
    assert sorted(nb.range_scan((45,), None)) == sorted(pb.range_scan((45,), None))
    nb.delete(keys[0], 0)
    pb.delete(keys[0], 0)
    assert sorted(nb.lookup(keys[0])) == sorted(pb.lookup(keys[0]))

    nh = native.NativeHashIndex()
    nh.insert(("x", 1.5), 3)
    nh.insert(("x", 1.5), 4)
    assert sorted(nh.lookup(("x", 1.5))) == [3, 4]
    assert nh.range_scan((0,), (9,)) == []


def test_native_unique_and_mixed_types():
    from query_engine_tpu.index import native

    if not native.native_available():
        pytest.skip("no C++ toolchain")
    nb = native.NativeBTreeIndex(unique=True)
    nb.insert((1,), 0)
    with pytest.raises(IndexError_):
        nb.insert((1,), 1)
    # int/float share numeric order; strings sort after numbers; None first
    nb2 = native.NativeBTreeIndex()
    nb2.insert((None,), 0)
    nb2.insert((2,), 1)
    nb2.insert((1.5,), 2)
    nb2.insert(("a",), 3)
    assert nb2.range_scan((1.0,), (3.0,)) == [2, 1]
    # int key looked up via equal float matches (widened encoding)
    nb2.insert((7,), 9)
    assert nb2.lookup((7.0,)) == [9]


def test_native_bulk_load():
    from query_engine_tpu.index import native

    if not native.native_available():
        pytest.skip("no C++ toolchain")
    nb = native.NativeBTreeIndex()
    nb.bulk_load([((i % 10,), i) for i in range(1000)])
    assert len(nb) == 1000
    assert len(nb.lookup((3,))) == 100
