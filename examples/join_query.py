"""All five join types (reference examples/join_query.rs)."""
from _common import demo_session, show

s = demo_session()
for jt in ["INNER", "LEFT", "RIGHT", "FULL"]:
    show(f"{jt} JOIN", s.sql(
        f"SELECT e.name, d.dept_name FROM employees e {jt} JOIN departments d "
        "ON e.dept_id = d.dept_id ORDER BY e.id"))
show("CROSS JOIN count", s.sql(
    "SELECT COUNT(*) FROM employees CROSS JOIN departments"))
