"""Start a PostgreSQL-protocol server (reference examples/pgwire_server.rs).
Connect with: psql -h 127.0.0.1 -p 5433 -U qe"""
import os

from _common import DATA
from query_engine_tpu.engine.session import Session
from query_engine_tpu.pgwire.server import PgServer

s = Session()
s.register_csv("employees", os.path.join(DATA, "employees.csv"))
s.register_csv("departments", os.path.join(DATA, "departments.csv"))
print("pgwire listening on 127.0.0.1:5433 (Ctrl-C to stop)")
PgServer(s, host="127.0.0.1", port=5433).run()
