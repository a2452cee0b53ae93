"""CSV ingestion with schema inference (reference examples/csv_query.rs)."""
from _common import demo_session, show

s = demo_session()
print("schema:", s.table_schema("employees"))
show("Full scan", s.sql("SELECT * FROM employees"))
