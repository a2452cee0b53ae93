"""pgwire server end-to-end tests over a real TCP socket."""

import asyncio
import os
import threading
import time

import pytest

import query_engine_tpu  # noqa: F401
from query_engine_tpu.engine.session import Session
from query_engine_tpu.pgwire.auth import AuthConfig
from query_engine_tpu.pgwire.server import PgServer, split_statements

from tests.pg_client import PgTestClient

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")


class ServerThread:
    def __init__(self, auth=None):
        self.session = Session()
        self.session.register_csv("employees", os.path.join(DATA, "employees.csv"))
        self.session.register_csv("departments", os.path.join(DATA, "departments.csv"))
        self.server = PgServer(self.session, host="127.0.0.1", port=0, auth=auth)
        self.port = None
        self._loop = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._started = threading.Event()

    def _run(self):
        self._loop = asyncio.new_event_loop()
        asyncio.set_event_loop(self._loop)

        async def boot():
            s = await self.server.start()
            self.port = s.sockets[0].getsockname()[1]
            self._started.set()

        self._loop.run_until_complete(boot())
        self._loop.run_forever()

    def start(self):
        self._thread.start()
        assert self._started.wait(10)
        return self

    def stop(self):
        self._loop.call_soon_threadsafe(self._loop.stop)


@pytest.fixture(scope="module")
def server():
    s = ServerThread().start()
    yield s
    s.stop()


@pytest.fixture()
def client(server):
    c = PgTestClient("127.0.0.1", server.port)
    yield c
    c.close()


def test_split_statements():
    assert split_statements("SELECT 1; SELECT ';'; SELECT 2") == [
        "SELECT 1", "SELECT ';'", "SELECT 2",
    ]


def test_simple_select(client):
    cols, rows, tags = client.query(
        "SELECT name, age FROM employees WHERE age > 25 ORDER BY id"
    )
    assert cols == ["name", "age"]
    assert rows == [
        ("Bob", "30"), ("Charlie", "35"), ("Diana", "28"),
        ("Eve", "32"), ("Frank", "29"),
    ]
    assert tags == ["SELECT 5"]


def test_join_and_null_encoding(client):
    cols, rows, _ = client.query(
        "SELECT e.name, d.dept_name FROM employees e "
        "LEFT JOIN departments d ON e.dept_id = d.dept_id ORDER BY e.id"
    )
    assert rows[-1] == ("Frank", None)


def test_multi_statement_and_tx_tags(client):
    _, _, tags = client.query("BEGIN; SELECT 1; COMMIT")
    assert tags == ["BEGIN", "SELECT 1", "COMMIT"]


def test_transaction_rollback_over_the_wire(client):
    client.query("CREATE TABLE txw (a INT)")
    try:
        client.query("BEGIN")
        assert client.last_txn_status == b"T"
        client.query("INSERT INTO txw VALUES (1)")
        _, rows, _ = client.query("SELECT COUNT(*) FROM txw")
        assert rows == [("1",)]
        # a failed statement flips ReadyForQuery to E until ROLLBACK
        with pytest.raises(RuntimeError):
            client.query("SELECT * FROM no_such_table")
        assert client.last_txn_status == b"E"
        client.query("ROLLBACK")
        assert client.last_txn_status == b"I"
        _, rows, _ = client.query("SELECT COUNT(*) FROM txw")
        assert rows == [("0",)]
    finally:
        client.query("DROP TABLE txw")


def test_show_tables_and_describe(client):
    _, rows, _ = client.query("SHOW TABLES")
    names = {r[0] for r in rows}
    assert {"employees", "departments"} <= names
    cols, rows, _ = client.query("DESCRIBE employees")
    assert cols == ["column_name", "data_type", "nullable"]
    assert ("name", "text", "YES") in rows


def test_catalog_queries(client):
    _, rows, _ = client.query("SELECT version()")
    assert "PostgreSQL" in rows[0][0]
    _, rows, _ = client.query(
        "SELECT * FROM information_schema.columns WHERE table_name = 'employees'"
    )
    assert any(r[2] == "salary" for r in rows)


def test_ddl_dml_roundtrip(client):
    _, _, tags = client.query("CREATE TABLE pets (id INT, name TEXT)")
    assert tags == ["CREATE TABLE"]
    _, _, tags = client.query(
        "INSERT INTO pets (id, name) VALUES (1, 'rex'), (2, 'milo')"
    )
    assert tags == ["INSERT 0 2"]
    _, rows, _ = client.query("SELECT name FROM pets ORDER BY id")
    assert rows == [("rex",), ("milo",)]
    _, _, tags = client.query("UPDATE pets SET name = 'max' WHERE id = 1")
    assert tags == ["UPDATE 1"]
    _, _, tags = client.query("DELETE FROM pets WHERE id = 2")
    assert tags == ["DELETE 1"]


def test_error_response(client):
    with pytest.raises(RuntimeError, match="not found"):
        client.query("SELECT * FROM no_such_table")
    # connection still usable after error
    _, rows, _ = client.query("SELECT 1")
    assert rows == [("1",)]


def test_cursors(client):
    client.query("DECLARE c1 CURSOR FOR SELECT id FROM employees ORDER BY id")
    _, rows, tags = client.query("FETCH 2 FROM c1")
    assert rows == [("1",), ("2",)] and tags == ["FETCH 2"]
    _, rows, _ = client.query("FETCH ALL FROM c1")
    assert [r[0] for r in rows] == ["3", "4", "5", "6"]
    _, _, tags = client.query("CLOSE c1")
    assert tags == ["CLOSE CURSOR"]


def test_copy_in_and_out(client):
    client.query("CREATE TABLE cp (id INT, label TEXT)")
    tag = client.copy_in("COPY cp FROM STDIN", ["1\talpha", "2\t\\N"])
    assert tag == "COPY 2"
    _, rows, _ = client.query("SELECT id, label FROM cp ORDER BY id")
    assert rows == [("1", "alpha"), ("2", None)]


def test_extended_protocol_params(client):
    cols, rows, tags = client.prepared(
        "SELECT name FROM employees WHERE age > $1 ORDER BY id", ["30"]
    )
    assert cols == ["name"]
    assert rows == [("Charlie",), ("Eve",)]
    assert tags[-1].startswith("SELECT")


def test_md5_auth():
    s = ServerThread(auth=AuthConfig.md5({"admin": "secret"})).start()
    try:
        c = PgTestClient("127.0.0.1", s.port, user="admin", password="secret")
        _, rows, _ = c.query("SELECT 1")
        assert rows == [("1",)]
        c.close()
        with pytest.raises(Exception):
            PgTestClient("127.0.0.1", s.port, user="admin", password="wrong")
    finally:
        s.stop()


def test_tls_connection(tmp_path):
    import shutil
    import ssl
    import subprocess

    if shutil.which("openssl") is None:
        pytest.skip("no openssl")
    cert = tmp_path / "cert.pem"
    key = tmp_path / "key.pem"
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", str(key), "-out", str(cert), "-days", "1",
         "-subj", "/CN=localhost"],
        check=True, capture_output=True,
    )
    from query_engine_tpu.pgwire.tls import TlsConfig

    s = ServerThread()
    s.server.tls = TlsConfig(str(cert), str(key))
    s.server._ssl_context = s.server.tls.ssl_context()
    s.start()
    try:
        # raw socket: send SSLRequest, expect 'S', upgrade, then run a query
        import socket
        import struct

        sock = socket.create_connection(("127.0.0.1", s.port), timeout=5)
        sock.sendall(struct.pack("!II", 8, 80877103))
        assert sock.recv(1) == b"S"
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
        tls_sock = ctx.wrap_socket(sock)
        # drive the startup + simple query over TLS via the test client's
        # parsing machinery
        c = PgTestClient.__new__(PgTestClient)
        c.sock = tls_sock
        c.user = "qe"
        c.password = ""
        c._startup("qe")
        _, rows, _ = c.query("SELECT COUNT(*) FROM employees")
        assert rows == [("6",)]
        c.close()
    finally:
        s.stop()


def test_scram_sha256_auth():
    from query_engine_tpu.pgwire.auth import AuthConfig, AuthMethod

    s = ServerThread(auth=AuthConfig(AuthMethod.SCRAM_SHA_256,
                                     {"alice": "s3cret"})).start()
    try:
        c = PgTestClient("127.0.0.1", s.port, user="alice", password="s3cret")
        _, rows, _ = c.query("SELECT 21 * 2")
        assert rows == [("42",)]
        c.close()
        with pytest.raises(Exception):
            PgTestClient("127.0.0.1", s.port, user="alice", password="nope")
        with pytest.raises(Exception):
            PgTestClient("127.0.0.1", s.port, user="mallory", password="x")
    finally:
        s.stop()


def test_concurrent_clients(server):
    import concurrent.futures

    def worker(i):
        c = PgTestClient("127.0.0.1", server.port)
        try:
            for _ in range(5):
                _, rows, _ = c.query(
                    "SELECT COUNT(*), SUM(salary) FROM employees WHERE age > 25"
                )
                assert rows == [("5", "428000")]
            return i
        finally:
            c.close()

    with concurrent.futures.ThreadPoolExecutor(max_workers=6) as pool:
        results = list(pool.map(worker, range(6)))
    assert results == list(range(6))


def test_pgwire_explain_analyze(client):
    """EXPLAIN [ANALYZE] through the wire protocol returns plan rows."""
    cols, rows, _ = client.query(
        "EXPLAIN SELECT name FROM employees WHERE age > 25"
    )
    assert cols == ["QUERY PLAN"]
    text = "\n".join(r[0] for r in rows)
    assert "Filter" in text and "TableScan" in text
    _, rows, _ = client.query(
        "EXPLAIN ANALYZE SELECT COUNT(*) FROM employees"
    )
    text = "\n".join(r[0] for r in rows)
    assert "rows: 1" in text and "timing:" in text
