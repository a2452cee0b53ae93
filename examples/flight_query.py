"""Arrow Flight server + client round trip (reference examples/flight_query.rs)."""
import threading
import time

from _common import DATA, show
from query_engine_tpu.core.config import FlightConfig
from query_engine_tpu.flight.client import FlightClient
from query_engine_tpu.flight.server import FlightServiceImpl
import os

svc = FlightServiceImpl(FlightConfig(host="127.0.0.1", port=0))
svc.session.register_csv("employees", os.path.join(DATA, "employees.csv"))
threading.Thread(target=svc.serve, daemon=True).start()
time.sleep(0.3)

c = FlightClient(f"grpc://127.0.0.1:{svc.port}")
print("tables:", c.list_tables())
show("Remote SQL over Flight", c.execute_sql(
    "SELECT name, salary FROM employees ORDER BY salary DESC LIMIT 3"))
c.close()
svc.shutdown()
