"""Shared helpers for the examples (fixtures from data/)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import query_engine_tpu  # noqa: F401,E402
from query_engine_tpu.engine.session import Session  # noqa: E402
from query_engine_tpu.cli.format import format_table  # noqa: E402

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")


def demo_session() -> Session:
    s = Session()
    s.register_csv("employees", os.path.join(DATA, "employees.csv"))
    s.register_csv("departments", os.path.join(DATA, "departments.csv"))
    return s


def show(title: str, batch) -> None:
    print(f"\n=== {title} ===")
    print(format_table(batch))
