"""SQL frontend tests — grammar surface per reference query-parser (SURVEY §2.2)."""

import pytest

from query_engine_tpu.core.errors import ParseError
from query_engine_tpu.core.types import TypeKind
from query_engine_tpu.sql import ast
from query_engine_tpu.sql.parser import parse_sql, parse_many


def sel(sql):
    stmt = parse_sql(sql)
    assert isinstance(stmt, ast.Select)
    return stmt.select


def test_simple_select():
    s = sel("SELECT name, age FROM employees WHERE age > 25")
    assert len(s.projection) == 2
    assert isinstance(s.from_, ast.TableName) and s.from_.name == "employees"
    w = s.selection
    assert isinstance(w, ast.BinaryOp) and w.op is ast.BinaryOperator.GT
    assert w.left == ast.Column("age")
    assert w.right == ast.NumberLit("25")


def test_wildcard_and_qualified():
    s = sel("SELECT *, e.*, e.name AS n FROM employees e")
    assert isinstance(s.projection[0], ast.WildcardItem)
    assert isinstance(s.projection[1], ast.QualifiedWildcard)
    item = s.projection[2]
    assert item.alias == "n" and item.expr == ast.QualifiedColumn("e", "name")
    assert s.from_.alias == "e"


def test_joins_all_types():
    s = sel(
        "SELECT * FROM a INNER JOIN b ON a.x = b.x "
        "LEFT JOIN c ON a.x = c.x RIGHT OUTER JOIN d ON a.x = d.x "
        "FULL JOIN e ON a.x = e.x CROSS JOIN f"
    )
    types = [j.join_type for j in s.joins]
    assert types == [
        ast.JoinType.INNER, ast.JoinType.LEFT, ast.JoinType.RIGHT,
        ast.JoinType.FULL, ast.JoinType.CROSS,
    ]
    assert s.joins[-1].on is None
    assert all(j.on is not None for j in s.joins[:-1])


def test_group_by_having_order_limit_offset():
    s = sel(
        "SELECT dept_id, COUNT(*), SUM(salary) FROM employees "
        "GROUP BY dept_id HAVING COUNT(*) > 1 "
        "ORDER BY dept_id DESC, SUM(salary) ASC LIMIT 10 OFFSET 2"
    )
    assert s.group_by == [ast.Column("dept_id")]
    assert isinstance(s.having, ast.BinaryOp)
    assert s.order_by[0].asc is False and s.order_by[1].asc is True
    assert s.limit == 10 and s.offset == 2
    agg = s.projection[1].expr
    assert agg == ast.Aggregate(ast.AggregateFunction.COUNT, ast.Wildcard())


def test_aggregate_distinct():
    s = sel("SELECT COUNT(DISTINCT dept_id) FROM employees")
    assert s.projection[0].expr.distinct is True


def test_operator_precedence():
    s = sel("SELECT * FROM t WHERE a + b * 2 = c AND d OR NOT e")
    top = s.selection
    assert top.op is ast.BinaryOperator.OR
    assert isinstance(top.right, ast.UnaryOp)
    left = top.left
    assert left.op is ast.BinaryOperator.AND
    eq = left.left
    assert eq.op is ast.BinaryOperator.EQ
    assert eq.left.op is ast.BinaryOperator.PLUS
    assert eq.left.right.op is ast.BinaryOperator.MULTIPLY


def test_window_function_with_frame():
    s = sel(
        "SELECT ROW_NUMBER() OVER (PARTITION BY dept_id ORDER BY salary DESC), "
        "LAG(salary, 1) OVER (ORDER BY salary ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) "
        "FROM employees"
    )
    w0 = s.projection[0].expr
    assert w0.func is ast.WindowFunctionType.ROW_NUMBER
    assert w0.over.partition_by == (ast.Column("dept_id"),)
    assert w0.over.order_by[0].asc is False
    w1 = s.projection[1].expr
    assert w1.func is ast.WindowFunctionType.LAG
    assert w1.over.frame.mode is ast.WindowFrameMode.ROWS
    assert w1.over.frame.start == ast.WindowFrameBound("PRECEDING", 1)
    assert w1.over.frame.end == ast.WindowFrameBound("CURRENT")


def test_cte_and_recursive():
    stmt = parse_sql(
        "WITH RECURSIVE nums(n) AS (SELECT 1) SELECT n FROM nums"
    )
    assert isinstance(stmt, ast.WithSelect)
    assert stmt.recursive and stmt.ctes[0].name == "nums"
    assert stmt.ctes[0].columns == ("n",)


def test_subqueries():
    s = sel(
        "SELECT (SELECT MAX(age) FROM t2), a FROM t1 "
        "WHERE a IN (SELECT b FROM t2) AND EXISTS (SELECT 1 FROM t3) "
        "AND c NOT IN (1, 2, 3)"
    )
    assert isinstance(s.projection[0].expr, ast.ScalarSubquery)
    w = s.selection
    # chained ANDs: ((IN AND EXISTS) AND NOT IN)
    assert isinstance(w.right, ast.InList) and w.right.negated
    assert isinstance(w.left.right, ast.Exists)
    assert isinstance(w.left.left, ast.InSubquery)


def test_union_and_distinct_on():
    s = sel("SELECT a FROM t UNION ALL SELECT a FROM u")
    assert s.union_clause.set_op is ast.SetOperation.UNION_ALL
    s2 = sel("SELECT DISTINCT ON (a) a, b FROM t")
    assert s2.distinct_on == [ast.Column("a")]
    s3 = sel("SELECT DISTINCT a FROM t")
    assert s3.distinct is True


def test_cast_and_types():
    s = sel("SELECT CAST(a AS BIGINT), b::DECIMAL(10,2), c::INT[] FROM t")
    c0 = s.projection[0].expr
    assert c0.data_type.kind is TypeKind.INT64
    c1 = s.projection[1].expr
    assert c1.data_type.params == (10, 2)
    c2 = s.projection[2].expr
    assert c2.data_type.kind is TypeKind.LIST


def test_scalar_functions_and_tsmatch():
    s = sel(
        "SELECT UPPER(name), COALESCE(a, 0), POWER(x, 2) FROM t "
        "WHERE TO_TSVECTOR(body) @@ TO_TSQUERY('rust')"
    )
    assert s.projection[0].expr.func is ast.ScalarFunction.UPPER
    assert s.selection.op is ast.BinaryOperator.TS_MATCH


def test_ddl_dml():
    ci = parse_sql("CREATE UNIQUE INDEX idx ON t (a, b) USING HASH")
    assert isinstance(ci, ast.CreateIndex)
    assert ci.unique and ci.index_type is ast.IndexType.HASH

    di = parse_sql("DROP INDEX IF EXISTS idx")
    assert isinstance(di, ast.DropIndex) and di.if_exists

    ct = parse_sql("CREATE TABLE IF NOT EXISTS t (id INT NOT NULL, name TEXT)")
    assert isinstance(ct, ast.CreateTable) and ct.if_not_exists
    assert ct.columns[0].nullable is False
    assert ct.columns[0].data_type.kind is TypeKind.INT64  # INT -> Int64 parity

    ins = parse_sql(
        "INSERT INTO t (id, name) VALUES (1, 'x'), (2, 'y') "
        "ON CONFLICT (id) DO UPDATE SET name = 'z' RETURNING id"
    )
    assert isinstance(ins, ast.Insert)
    assert len(ins.values) == 2
    assert isinstance(ins.on_conflict.action, ast.DoUpdate)
    assert ins.returning is not None

    up = parse_sql("UPDATE t SET a = a + 1 WHERE id = 3")
    assert isinstance(up, ast.Update)

    de = parse_sql("DELETE FROM t WHERE id = 4 RETURNING *")
    assert isinstance(de, ast.Delete) and de.returning is not None


def test_like_between_isnull_case():
    s = sel(
        "SELECT CASE WHEN a > 1 THEN 'hi' ELSE 'lo' END FROM t "
        "WHERE name LIKE 'A%' AND x BETWEEN 1 AND 5 AND y IS NOT NULL"
    )
    assert isinstance(s.projection[0].expr, ast.Case)
    w = s.selection
    assert isinstance(w.right, ast.IsNull) and w.right.negated


def test_multi_statement_and_errors():
    stmts = parse_many("SELECT 1; SELECT 2;")
    assert len(stmts) == 2
    with pytest.raises(ParseError):
        parse_sql("SELECT FROM")
    with pytest.raises(ParseError):
        parse_sql("SELECT * FROM t WHERE")
    with pytest.raises(ParseError):
        parse_sql("FOO BAR")
