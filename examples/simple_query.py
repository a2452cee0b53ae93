"""Simple SELECT with WHERE (reference examples/simple_query.rs — which only
prints the plan; this executes)."""
from _common import demo_session, show

s = demo_session()
show("SELECT name, age FROM employees WHERE age > 25",
     s.sql("SELECT name, age FROM employees WHERE age > 25"))
print(s.explain("SELECT name, age FROM employees WHERE age > 25"))
