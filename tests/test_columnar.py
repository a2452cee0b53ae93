"""Columnar layer tests: batch construction, dictionaries, concat, arrow IO."""

import numpy as np
import pyarrow as pa
import pytest

from query_engine_tpu.columnar.batch import ColumnBatch, padded_capacity
from query_engine_tpu.columnar.dictionary import Dictionary
from query_engine_tpu.core.schema import Field, Schema
from query_engine_tpu.core.types import DataType


def test_padded_capacity_buckets():
    assert padded_capacity(0) == 128
    assert padded_capacity(1) == 128
    assert padded_capacity(128) == 128
    assert padded_capacity(129) == 256
    assert padded_capacity(1000) == 1024


def test_from_pydict_infers_types_and_pads():
    b = ColumnBatch.from_pydict(
        {"id": [1, 2, 3], "name": ["a", "b", None], "score": [1.5, None, 2.5]}
    )
    assert b.num_rows == 3
    assert b.capacity == 128
    assert str(b.schema.field_with_name("id").data_type) == "Int64"
    assert str(b.schema.field_with_name("name").data_type) == "Utf8"
    assert str(b.schema.field_with_name("score").data_type) == "Float64"
    assert b.to_pydict() == {
        "id": [1, 2, 3],
        "name": ["a", "b", None],
        "score": [1.5, None, 2.5],
    }


def test_dictionary_is_sorted_and_order_preserving():
    d, codes = Dictionary.from_values(["banana", "apple", "cherry", "apple"])
    assert list(d.values) == ["apple", "banana", "cherry"]
    # code order == lexicographic order
    assert codes.tolist() == [1, 0, 2, 0]
    assert d.code_of("cherry") == 2
    assert d.code_of("zzz") == -1


def test_dictionary_merge_remaps():
    d1, c1 = Dictionary.from_values(["a", "c"])
    d2, c2 = Dictionary.from_values(["b", "c", "d"])
    merged, r1, r2 = d1.merge(d2)
    assert list(merged.values) == ["a", "b", "c", "d"]
    assert r1.tolist() == [0, 2]
    assert r2.tolist() == [1, 2, 3]


def test_concat_merges_dictionaries():
    b1 = ColumnBatch.from_pydict({"s": ["x", "a"]})
    b2 = ColumnBatch.from_pydict({"s": ["m", "a", None]})
    out = ColumnBatch.concat([b1, b2])
    assert out.num_rows == 5
    assert out.to_pydict() == {"s": ["x", "a", "m", "a", None]}


def test_arrow_roundtrip():
    rb = pa.record_batch(
        {
            "id": pa.array([1, 2, None], type=pa.int64()),
            "name": pa.array(["alice", None, "bob"]),
            "f": pa.array([0.5, 1.5, None], type=pa.float64()),
        }
    )
    b = ColumnBatch.from_arrow(rb)
    assert b.to_pydict() == {
        "id": [1, 2, None],
        "name": ["alice", None, "bob"],
        "f": [0.5, 1.5, None],
    }
    back = b.to_arrow()
    assert back.to_pydict() == rb.to_pydict()


def test_slice_and_take():
    b = ColumnBatch.from_pydict({"x": list(range(10))})
    s = b.slice(3, 4)
    assert s.to_pydict() == {"x": [3, 4, 5, 6]}
    t = b.take_host(np.asarray([9, 0, 4]))
    assert t.to_pydict() == {"x": [9, 0, 4]}


def test_schema_errors():
    s = Schema([Field("a", DataType.int64())])
    with pytest.raises(Exception):
        s.index_of("missing")
