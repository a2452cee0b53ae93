"""CLI + REPL tests (driven through main(argv) and Repl.handle)."""

import json
import os

import pytest

import query_engine_tpu  # noqa: F401
from query_engine_tpu.cli.main import main
from query_engine_tpu.cli.repl import Repl

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
EMP = os.path.join(DATA, "employees.csv")


def test_query_executes(capsys):
    rc = main(["query", "-s", "SELECT name FROM e WHERE age > 30 ORDER BY name",
               "-t", f"e={EMP}"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Charlie" in out and "Eve" in out and "Alice" not in out


def test_query_formats(capsys):
    main(["query", "-s", "SELECT id, name FROM e ORDER BY id LIMIT 2",
          "-t", f"e={EMP}", "--format", "json"])
    out = capsys.readouterr().out
    rows = json.loads(out)
    assert rows == [{"id": 1, "name": "Alice"}, {"id": 2, "name": "Bob"}]
    main(["query", "-s", "SELECT id FROM e ORDER BY id LIMIT 1",
          "-t", f"e={EMP}", "--format", "csv"])
    out = capsys.readouterr().out
    assert out.strip().splitlines() == ["id", "1"]


def test_query_plan_only(capsys):
    main(["query", "-s", "SELECT name FROM e WHERE age > 25", "-t", f"e={EMP}",
          "--plan"])
    out = capsys.readouterr().out
    assert "Filter" in out and "TableScan" in out


def test_bench_executes(capsys):
    rc = main(["bench", "-s", "SELECT COUNT(*) FROM e", "-t", f"e={EMP}",
               "-n", "5"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Average" in out and "QPS" in out and "P99" in out


def test_export_roundtrip(tmp_path, capsys):
    out_path = str(tmp_path / "out.csv")
    main(["export", "-s", "SELECT name, age FROM e WHERE age > 30",
          "-t", f"e={EMP}", "-o", out_path])
    text = open(out_path).read().strip().splitlines()
    assert text[0] == "name,age"
    assert set(text[1:]) == {"Charlie,35", "Eve,32"}
    pq_path = str(tmp_path / "out.parquet")
    main(["export", "-s", "SELECT id FROM e", "-t", f"e={EMP}", "-o", pq_path])
    import pyarrow.parquet as pq

    assert pq.read_table(pq_path).num_rows == 6


def test_repl_flow():
    r = Repl()
    assert "Loaded 'emp'" in r.handle(f".load emp {EMP}")
    assert "emp" in r.handle(".tables")
    assert "salary" in r.handle(".describe emp")
    out = r.handle("SELECT name FROM emp WHERE age > 30 ORDER BY name")
    assert "Charlie" in out and "Eve" in out
    assert "Error" in r.handle("SELECT nope FROM emp")
    r.handle(".format json")
    out = r.handle("SELECT id FROM emp ORDER BY id LIMIT 1")
    assert json.loads(out) == [{"id": 1}]
    assert "timing on" == r.handle(".timing on")
    out = r.handle("SELECT 1")
    assert "Time:" in out
    r.handle("CREATE INDEX ix ON emp (id)")
    assert "ix" in r.handle(".indexes")
    stats = r.handle(".cache")
    assert "hit_rate" in stats
    with pytest.raises(EOFError):
        r.handle(".exit")
