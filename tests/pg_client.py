"""Minimal PostgreSQL v3 wire client for testing our pgwire server.

Deliberately independent of the server code (only shares nothing but the
spec) so tests exercise the real wire format.
"""

from __future__ import annotations

import hashlib
import socket
import struct
from typing import List, Optional, Tuple


class PgTestClient:
    def __init__(self, host: str, port: int, user: str = "qe",
                 password: str = "", database: str = "qe"):
        self.sock = socket.create_connection((host, port), timeout=10)
        self.user = user
        self.password = password
        self._startup(database)

    # ---- wire helpers ----------------------------------------------------
    def _send(self, data: bytes):
        self.sock.sendall(data)

    def _recv_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("server closed connection")
            buf += chunk
        return buf

    def _read_msg(self) -> Tuple[bytes, bytes]:
        tag = self._recv_exact(1)
        (length,) = struct.unpack("!I", self._recv_exact(4))
        return tag, self._recv_exact(length - 4)

    @staticmethod
    def _msg(tag: bytes, payload: bytes = b"") -> bytes:
        return tag + struct.pack("!I", len(payload) + 4) + payload

    # ---- startup -----------------------------------------------------------
    def _startup(self, database: str):
        params = (
            f"user\x00{self.user}\x00database\x00{database}\x00\x00"
        ).encode()
        payload = struct.pack("!I", 196608) + params
        self._send(struct.pack("!I", len(payload) + 4) + payload)
        while True:
            tag, body = self._read_msg()
            if tag == b"R":
                (code,) = struct.unpack_from("!I", body)
                if code == 0:
                    continue
                if code == 3:  # cleartext
                    self._send(self._msg(b"p", self.password.encode() + b"\x00"))
                elif code == 10:  # SASL / SCRAM-SHA-256
                    self._scram(body[4:])
                elif code == 5:  # md5
                    salt = body[4:8]
                    inner = hashlib.md5(
                        (self.password + self.user).encode()
                    ).hexdigest()
                    outer = "md5" + hashlib.md5(inner.encode() + salt).hexdigest()
                    self._send(self._msg(b"p", outer.encode() + b"\x00"))
                else:
                    raise RuntimeError(f"unsupported auth code {code}")
            elif tag == b"Z":
                return
            elif tag == b"E":
                raise RuntimeError(f"startup error: {body!r}")
            # ignore S / K

    def _scram(self, mech_blob: bytes):
        import base64
        import hmac as _hmac
        import secrets

        assert b"SCRAM-SHA-256" in mech_blob
        nonce = base64.b64encode(secrets.token_bytes(18)).decode()
        bare = f"n={self.user},r={nonce}"
        first = "n,," + bare
        payload = b"SCRAM-SHA-256\x00" + struct.pack("!i", len(first)) + first.encode()
        self._send(self._msg(b"p", payload))
        tag, body = self._read_msg()
        assert tag == b"R", body
        (code,) = struct.unpack_from("!I", body)
        assert code == 11, code
        server_first = body[4:].decode()
        attrs = dict(p.split("=", 1) for p in server_first.split(",") if "=" in p)
        full_nonce = attrs["r"]
        salt = base64.b64decode(attrs["s"])
        iters = int(attrs["i"])
        assert full_nonce.startswith(nonce)
        without_proof = f"c=biws,r={full_nonce}"
        auth_message = ",".join([bare, server_first, without_proof]).encode()
        salted = hashlib.pbkdf2_hmac("sha256", self.password.encode(), salt, iters)
        client_key = _hmac.new(salted, b"Client Key", hashlib.sha256).digest()
        stored_key = hashlib.sha256(client_key).digest()
        signature = _hmac.new(stored_key, auth_message, hashlib.sha256).digest()
        proof = bytes(a ^ b for a, b in zip(client_key, signature))
        final = without_proof + ",p=" + base64.b64encode(proof).decode()
        self._send(self._msg(b"p", final.encode()))
        # server sends SASLFinal (R code 12) then AuthOk in the outer loop;
        # verify the server signature
        tag, body = self._read_msg()
        if tag == b"E":
            raise RuntimeError(self._parse_error(body))
        (code,) = struct.unpack_from("!I", body)
        assert code == 12, code
        server_sig = dict(
            p.split("=", 1) for p in body[4:].decode().split(",")
        )["v"]
        server_key = _hmac.new(salted, b"Server Key", hashlib.sha256).digest()
        expect = _hmac.new(server_key, auth_message, hashlib.sha256).digest()
        assert base64.b64decode(server_sig) == expect, "server signature mismatch"

    # ---- simple query --------------------------------------------------
    def query(self, sql: str):
        """Returns (columns, rows, command_tags) or raises on ErrorResponse."""
        self._send(self._msg(b"Q", sql.encode() + b"\x00"))
        columns: List[str] = []
        rows: List[tuple] = []
        tags: List[str] = []
        error = None
        while True:
            tag, body = self._read_msg()
            if tag == b"T":
                columns = self._parse_row_desc(body)
            elif tag == b"D":
                rows.append(self._parse_data_row(body))
            elif tag == b"C":
                tags.append(body[:-1].decode())
            elif tag == b"E":
                error = self._parse_error(body)
            elif tag == b"Z":
                self.last_txn_status = body[:1]  # b"I" | b"T" | b"E"
                break
            elif tag in (b"N", b"S", b"I", b"G", b"H", b"d", b"c"):
                continue
        if error:
            raise RuntimeError(error)
        return columns, rows, tags

    def copy_in(self, sql: str, lines: List[str]) -> str:
        self._send(self._msg(b"Q", sql.encode() + b"\x00"))
        tag, body = self._read_msg()
        assert tag == b"G", f"expected CopyInResponse, got {tag}"
        data = ("\n".join(lines) + "\n").encode()
        self._send(self._msg(b"d", data))
        self._send(self._msg(b"c"))
        result_tag = None
        while True:
            tag, body = self._read_msg()
            if tag == b"C":
                result_tag = body[:-1].decode()
            elif tag == b"E":
                raise RuntimeError(self._parse_error(body))
            elif tag == b"Z":
                return result_tag

    # ---- extended protocol ----------------------------------------------
    def prepared(self, sql: str, params: List[Optional[str]],
                 param_oids: Optional[List[int]] = None):
        oids = param_oids or []
        parse = b"\x00" + sql.encode() + b"\x00" + struct.pack("!H", len(oids))
        for oid in oids:
            parse += struct.pack("!I", oid)
        self._send(self._msg(b"P", parse))
        bind = b"\x00" + b"\x00" + struct.pack("!H", 0)
        bind += struct.pack("!H", len(params))
        for v in params:
            if v is None:
                bind += struct.pack("!i", -1)
            else:
                b = v.encode()
                bind += struct.pack("!i", len(b)) + b
        bind += struct.pack("!H", 0)
        self._send(self._msg(b"B", bind))
        self._send(self._msg(b"D", b"P\x00"))
        self._send(self._msg(b"E", b"\x00" + struct.pack("!I", 0)))
        self._send(self._msg(b"S"))
        columns, rows, tags, error = [], [], [], None
        while True:
            tag, body = self._read_msg()
            if tag == b"T":
                columns = self._parse_row_desc(body)
            elif tag == b"D":
                rows.append(self._parse_data_row(body))
            elif tag == b"C":
                tags.append(body[:-1].decode())
            elif tag == b"E":
                error = self._parse_error(body)
            elif tag == b"Z":
                break
        if error:
            raise RuntimeError(error)
        return columns, rows, tags

    # ---- parsers ---------------------------------------------------------
    @staticmethod
    def _parse_row_desc(body: bytes) -> List[str]:
        (n,) = struct.unpack_from("!H", body)
        pos = 2
        names = []
        for _ in range(n):
            end = body.index(b"\x00", pos)
            names.append(body[pos:end].decode())
            pos = end + 1 + 18
        return names

    @staticmethod
    def _parse_data_row(body: bytes) -> tuple:
        (n,) = struct.unpack_from("!H", body)
        pos = 2
        vals = []
        for _ in range(n):
            (ln,) = struct.unpack_from("!i", body, pos)
            pos += 4
            if ln == -1:
                vals.append(None)
            else:
                vals.append(body[pos: pos + ln].decode())
                pos += ln
        return tuple(vals)

    @staticmethod
    def _parse_error(body: bytes) -> str:
        parts = {}
        pos = 0
        while pos < len(body) and body[pos] != 0:
            code = chr(body[pos])
            end = body.index(b"\x00", pos + 1)
            parts[code] = body[pos + 1: end].decode()
            pos = end + 1
        return parts.get("M", "unknown error")

    def close(self):
        try:
            self._send(self._msg(b"X"))
        finally:
            self.sock.close()
