"""JSON extraction: -> ->> #> #>> operators and JSON_EXTRACT_PATH[_TEXT]
scalar functions (PG semantics; reference declares a Json DataType at
query-core types.rs:5-43 but ships no extraction operators — this engine
implements the PG surface over dictionary-encoded string documents,
one json.loads per DISTINCT document, one device gather per row)."""

import pytest

from query_engine_tpu.engine.session import Session

DOCS = [
    '{"a": {"b": [10, 20, 30]}, "name": "x", "flag": true}',
    '{"a": {"b": []}, "name": "y", "flag": false}',
    '{"a": null, "name": null}',
    "not json at all",
    None,
]


@pytest.fixture()
def sess():
    s = Session()
    s.register_table("t", {"doc": DOCS, "id": [1, 2, 3, 4, 5]})
    return s


def test_arrow_field_json(sess):
    out = sess.sql("SELECT doc -> 'name' AS j FROM t").to_pydict()
    assert out["j"] == ['"x"', '"y"', "null", None, None]


def test_arrow_field_text(sess):
    out = sess.sql("SELECT doc ->> 'name' AS s FROM t").to_pydict()
    # ->> unquotes strings and maps json null -> SQL NULL
    assert out["s"] == ["x", "y", None, None, None]


def test_arrow_chain_and_index(sess):
    out = sess.sql(
        "SELECT doc -> 'a' -> 'b' ->> 1 AS v FROM t"
    ).to_pydict()
    assert out["v"] == ["20", None, None, None, None]


def test_negative_index_wraps(sess):
    out = sess.sql("SELECT doc -> 'a' -> 'b' ->> -1 AS v FROM t").to_pydict()
    assert out["v"] == ["30", None, None, None, None]


def test_path_operators(sess):
    out = sess.sql(
        "SELECT doc #> '{a,b,0}' AS j, doc #>> '{a,b,0}' AS s FROM t"
    ).to_pydict()
    assert out["j"] == ["10", None, None, None, None]
    assert out["s"] == ["10", None, None, None, None]


def test_bool_rendering(sess):
    out = sess.sql("SELECT doc ->> 'flag' AS f FROM t").to_pydict()
    assert out["f"] == ["true", "false", None, None, None]


def test_json_extract_path(sess):
    out = sess.sql(
        "SELECT JSON_EXTRACT_PATH(doc, 'a', 'b', 2) AS j FROM t"
    ).to_pydict()
    assert out["j"] == ["30", None, None, None, None]


def test_json_extract_path_text(sess):
    out = sess.sql(
        "SELECT JSON_EXTRACT_PATH_TEXT(doc, 'name') AS s, id FROM t "
        "ORDER BY id"
    ).to_pydict()
    assert out["s"] == ["x", "y", None, None, None]


def test_jsonb_alias(sess):
    out = sess.sql(
        "SELECT JSONB_EXTRACT_PATH_TEXT(doc, 'name') AS s FROM t"
    ).to_pydict()
    assert out["s"] == ["x", "y", None, None, None]


def test_json_in_where(sess):
    out = sess.sql(
        "SELECT id FROM t WHERE doc ->> 'name' = 'y'"
    ).to_pydict()
    assert out["id"] == [2]


def test_json_group_by(sess):
    out = sess.sql(
        "SELECT doc ->> 'flag' AS f, COUNT(*) AS n FROM t "
        "GROUP BY doc ->> 'flag' ORDER BY f"
    ).to_pylist()
    assert out == [("false", 1), ("true", 1), (None, 3)]


def test_json_array_length(sess):
    out = sess.sql(
        "SELECT JSON_ARRAY_LENGTH(doc -> 'a' -> 'b') AS n, id FROM t "
        "ORDER BY id"
    ).to_pydict()
    assert out["n"] == [3, 0, None, None, None]


def test_json_typeof(sess):
    out = sess.sql(
        "SELECT JSON_TYPEOF(doc -> 'a') AS ty, id FROM t ORDER BY id"
    ).to_pydict()
    assert out["ty"] == ["object", "object", "null", None, None]


def test_lateral_unnest(sess):
    s = Session()
    s.register_table("t2", {"csv": ["a,b", "c"]})
    out = s.sql(
        "SELECT u.e FROM t2 CROSS JOIN LATERAL "
        "UNNEST(STRING_TO_ARRAY(t2.csv, ',')) u(e) ORDER BY u.e"
    ).to_pylist()
    assert out == [("a",), ("b",), ("c",)]


def test_json_traces_in_compiled_pipeline(sess):
    """Literal-key JSON extraction must engage the compiled pipeline (the
    extraction table is built at trace time; only the code-remap gather is
    traced) — no fallback to the eager executor."""
    st0 = dict(sess.executor.pipeline.stats)
    out = sess.sql(
        "SELECT id, doc ->> 'name' AS s, JSON_TYPEOF(doc -> 'a') AS ty "
        "FROM t WHERE doc ->> 'name' = 'x'"
    ).to_pydict()
    assert out["s"] == ["x"] and out["ty"] == ["object"]
    st1 = sess.executor.pipeline.stats
    assert st1["fallbacks"] == st0["fallbacks"]
    assert (st1["compiles"] + st1["hits"]) > (st0["compiles"] + st0["hits"])


def test_non_literal_key_errors(sess):
    from query_engine_tpu.core.errors import QueryError

    with pytest.raises(QueryError):
        sess.sql("SELECT doc -> name FROM t")


def test_json_extract_path_empty_path_identity(sess):
    # PG: json_extract_path(doc) with no path elements returns the document
    # (normalized through a reparse; malformed docs go NULL here)
    out = sess.sql("SELECT JSON_EXTRACT_PATH(doc) AS j FROM t").to_pydict()
    assert out["j"][0] is not None and '"name": "x"' in out["j"][0]
    assert out["j"][3] is None  # malformed
    assert out["j"][4] is None  # NULL doc


def test_json_fns_null_literal_input(sess):
    # strict functions: NULL input -> NULL output (PG), not an error
    out = sess.sql(
        "SELECT JSON_TYPEOF(NULL) AS t, JSON_ARRAY_LENGTH(NULL) AS l, "
        "JSON_EXTRACT_PATH(NULL, 'a') AS p FROM t"
    ).to_pydict()
    assert out["t"] == [None] * 5
    assert out["l"] == [None] * 5
    assert out["p"] == [None] * 5
