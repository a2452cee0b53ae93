"""POSIX regex operators (~ ~* !~ !~*), SIMILAR TO, and the regexp_*
scalar-function batch.

The reference's string matching stops at LIKE-shaped patterns
(crates/query-executor/src/operators.rs LIKE lowering); this extends the
surface to the PG regex family. Execution model matches every other string
op here: the regex runs once per distinct dictionary value on the host, rows
get their answer through one device gather by code — so the same queries
also stay inside compiled pipelines (the match table is built at trace
time from the static dictionary).
"""

import pytest

from query_engine_tpu.core.errors import ExecutionError, ParseError
from query_engine_tpu.engine.session import Session
from query_engine_tpu.sql.parser import parse_sql

NAMES = ["alice", "Bob", "carol", "dave123", "eve", "Frank", None, "gHost"]
VALS = [10, 20, 30, 40, 50, 60, 70, 80]


def make_session(compiled: bool) -> Session:
    s = Session()
    s.register_table("t", {"name": NAMES, "v": VALS})
    s.executor._compiled = compiled
    return s


@pytest.fixture(scope="module")
def sess():
    return make_session(True)


# ---- parsing --------------------------------------------------------------

@pytest.mark.parametrize("q", [
    "SELECT * FROM t WHERE name ~ '^a'",
    "SELECT * FROM t WHERE name ~* '^a'",
    "SELECT * FROM t WHERE name !~ '^a'",
    "SELECT * FROM t WHERE name !~* '^a'",
    "SELECT * FROM t WHERE name SIMILAR TO 'a%'",
    "SELECT * FROM t WHERE name NOT SIMILAR TO 'a%'",
    "SELECT REGEXP_REPLACE(name, 'a', 'b', 'gi') FROM t",
    "SELECT REGEXP_LIKE(name, 'a'), REGEXP_COUNT(name, 'a') FROM t",
    "SELECT REGEXP_SUBSTR(name, '[0-9]+') FROM t",
])
def test_parses(q):
    parse_sql(q)


def test_similar_requires_to():
    with pytest.raises(ParseError):
        parse_sql("SELECT * FROM t WHERE name SIMILAR 'a%'")


# ---- POSIX operators ------------------------------------------------------

def test_regex_match_unanchored(sess):
    # PG `~` is a search, not a full match
    out = sess.sql("SELECT name FROM t WHERE name ~ 'ro'").to_pydict()
    assert out["name"] == ["carol"]


def test_regex_match_anchors(sess):
    out = sess.sql("SELECT name FROM t WHERE name ~ '^[a-z]+$'").to_pydict()
    assert out["name"] == ["alice", "carol", "eve"]


def test_regex_imatch(sess):
    out = sess.sql("SELECT name FROM t WHERE name ~* '^[ab]'").to_pydict()
    assert out["name"] == ["alice", "Bob"]


def test_not_regex_drops_nulls(sess):
    # NULL !~ pattern is NULL -> row filtered (not promoted to true)
    out = sess.sql("SELECT name FROM t WHERE name !~ '[0-9]'").to_pydict()
    assert out["name"] == ["alice", "Bob", "carol", "eve", "Frank", "gHost"]


def test_regex_as_projection_keeps_nulls(sess):
    out = sess.sql("SELECT name ~ 'a' AS m FROM t").to_pydict()
    assert out["m"] == [True, False, True, True, False, True, None, False]


# ---- SIMILAR TO -----------------------------------------------------------

def test_similar_to_is_anchored(sess):
    # 'a' alone matches only the exact string "a" (full-match semantics)
    out = sess.sql("SELECT name FROM t WHERE name SIMILAR TO 'a'").to_pydict()
    assert out["name"] == []


def test_similar_to_wildcards_and_alternation(sess):
    out = sess.sql(
        "SELECT name FROM t WHERE name SIMILAR TO '(a|c)%'"
    ).to_pydict()
    assert out["name"] == ["alice", "carol"]


def test_similar_to_dot_is_literal(sess):
    s = Session()
    s.register_table("u", {"x": ["a.b", "axb"]})
    out = s.sql("SELECT x FROM u WHERE x SIMILAR TO 'a.b'").to_pydict()
    assert out["x"] == ["a.b"]


def test_similar_to_underscore(sess):
    s = Session()
    s.register_table("u", {"x": ["cat", "cart", "ct"]})
    out = s.sql("SELECT x FROM u WHERE x SIMILAR TO 'c_t'").to_pydict()
    assert out["x"] == ["cat"]


def test_similar_to_bracket_class_keeps_percent_literal():
    s = Session()
    s.register_table("u", {"x": ["50%", "50x"]})
    out = s.sql("SELECT x FROM u WHERE x SIMILAR TO '50[%]'").to_pydict()
    assert out["x"] == ["50%"]


def test_not_similar_to(sess):
    out = sess.sql(
        "SELECT name FROM t WHERE name NOT SIMILAR TO '%e%'"
    ).to_pydict()
    assert out["name"] == ["Bob", "carol", "Frank", "gHost"]


# ---- regexp_* scalar functions -------------------------------------------

def test_regexp_replace_first_only_by_default(sess):
    out = sess.sql(
        "SELECT REGEXP_REPLACE(name, 'a', 'X') AS r FROM t"
    ).to_pydict()
    assert out["r"] == ["Xlice", "Bob", "cXrol", "dXve123", "eve",
                        "FrXnk", None, "gHost"]


def test_regexp_replace_global_flag(sess):
    s = Session()
    s.register_table("u", {"x": ["banana"]})
    first = s.sql("SELECT REGEXP_REPLACE(x, 'an', '.') AS r FROM u").to_pydict()
    assert first["r"] == ["b.ana"]
    every = s.sql(
        "SELECT REGEXP_REPLACE(x, 'an', '.', 'g') AS r FROM u"
    ).to_pydict()
    assert every["r"] == ["b..a"]


def test_regexp_replace_group_refs():
    s = Session()
    s.register_table("u", {"x": ["john smith"]})
    out = s.sql(
        r"SELECT REGEXP_REPLACE(x, '(\w+) (\w+)', '\2 \1') AS r FROM u"
    ).to_pydict()
    assert out["r"] == ["smith john"]


def test_regexp_replace_whole_match_ref():
    s = Session()
    s.register_table("u", {"x": ["ab12cd"]})
    out = s.sql(
        r"SELECT REGEXP_REPLACE(x, '[0-9]+', '<\&>') AS r FROM u"
    ).to_pydict()
    assert out["r"] == ["ab<12>cd"]


def test_regexp_replace_case_flag():
    s = Session()
    s.register_table("u", {"x": ["Apple and apple"]})
    out = s.sql(
        "SELECT REGEXP_REPLACE(x, 'apple', 'pear', 'gi') AS r FROM u"
    ).to_pydict()
    assert out["r"] == ["pear and pear"]


def test_regexp_like(sess):
    out = sess.sql(
        r"SELECT name FROM t WHERE REGEXP_LIKE(name, '\d')"
    ).to_pydict()
    assert out["name"] == ["dave123"]


def test_regexp_like_flags():
    s = Session()
    s.register_table("u", {"x": ["ABC", "abc", "xyz"]})
    out = s.sql("SELECT x FROM u WHERE REGEXP_LIKE(x, 'abc', 'i')").to_pydict()
    assert out["x"] == ["ABC", "abc"]


def test_regexp_substr_null_on_no_match(sess):
    out = sess.sql(
        "SELECT REGEXP_SUBSTR(name, '[0-9]+') AS r FROM t"
    ).to_pydict()
    assert out["r"] == [None, None, None, "123", None, None, None, None]


def test_regexp_count(sess):
    out = sess.sql("SELECT REGEXP_COUNT(name, 'a') AS c FROM t").to_pydict()
    assert out["c"] == [1, 0, 1, 1, 0, 1, None, 0]


def test_bad_flag_rejected(sess):
    with pytest.raises(ExecutionError):
        sess.sql("SELECT REGEXP_LIKE(name, 'a', 'q') FROM t")


def test_non_literal_pattern_rejected(sess):
    with pytest.raises(ExecutionError):
        sess.sql("SELECT name FROM t WHERE name ~ name")


# ---- compiled == eager ----------------------------------------------------

QUERIES = [
    "SELECT name FROM t WHERE name ~ '^[a-z]+$'",
    "SELECT name FROM t WHERE name ~* 'O'",
    "SELECT name FROM t WHERE name !~* '[aeiou]$' ORDER BY name",
    "SELECT name, v FROM t WHERE name SIMILAR TO '%(a|o)%' ORDER BY v",
    "SELECT REGEXP_REPLACE(name, '[aeiou]', '*', 'g') AS r FROM t",
    "SELECT SUM(v) AS s FROM t WHERE REGEXP_LIKE(name, '^[a-z]')",
    "SELECT name ~ 'a' AS m, COUNT(*) AS c FROM t GROUP BY name ~ 'a' "
    "ORDER BY c, m",
]


@pytest.mark.parametrize("q", QUERIES, ids=lambda q: q[:60])
def test_compiled_matches_eager(q):
    fast, slow = make_session(True), make_session(False)
    a, b = fast.sql(q), slow.sql(q)
    assert a.schema.names() == b.schema.names()
    assert a.to_pylist() == b.to_pylist()


def test_regex_filters_compile():
    s = make_session(True)
    s.sql("SELECT v FROM t WHERE name ~ '^[a-z]+$'")
    assert s.executor.pipeline.stats["compiles"] >= 1
