"""Beeswax wire-protocol endpoint (entry point A as a NETWORK protocol).

The reference serves its shell over the legacy Beeswax Thrift service
(be/src/service/impala-beeswax-server.cc:171; IDL at
common/thrift/beeswax.thrift) in addition to HS2. The HS2/JDBC endpoint
here is hs2.py (Spark's HiveThriftServer2); this module closes the
Beeswax gap with a from-spec implementation:

- a minimal **TBinaryProtocol** codec (the public Apache Thrift binary
  encoding: strict message header 0x8001 | type, I16 field ids, I32
  length-prefixed strings, typed list/map headers) — no thrift runtime
  exists in this environment, so the ~dozen primitives are implemented
  directly and pinned byte-for-byte against spec-derived golden vectors
  in tests/test_beeswax.py;
- the **BeeswaxService** methods the reference shell exercised
  (beeswax.thrift:106): query / executeAndWait / explain / fetch /
  get_state / get_results_metadata / echo / get_log / close / clean /
  dump_config / get_default_configuration, over a threaded TCP server
  bound to a live Engine;
- result semantics matching the reference: rows are delimiter-joined
  strings (Results.data, delim in ResultsMetadata), fetch paginates
  with start_row/has_more, errors return BeeswaxException(message) as a
  Thrift REPLY exception field, unknown handles raise
  QueryNotFoundException.

Scale/deployment note: like the reference's beeswax server this fronts
the coordinator (driver) only — executors are reached through the
engine; one thread per connection matches the blocking-transport model
the protocol assumes. New clients should prefer HS2 (hs2.py); this
exists for wire-compat with legacy tooling.
"""

from __future__ import annotations

import io
import socket
import socketserver
import struct
import threading
import uuid
from typing import Any

# ---------------------------------------------------------------------------
# TBinaryProtocol subset (public Apache Thrift spec)

T_STOP = 0
T_BOOL = 2
T_BYTE = 3
T_DOUBLE = 4
T_I16 = 6
T_I32 = 8
T_I64 = 10
T_STRING = 11
T_STRUCT = 12
T_MAP = 13
T_SET = 14
T_LIST = 15

MSG_CALL = 1
MSG_REPLY = 2
MSG_EXCEPTION = 3

_VERSION_1 = 0x80010000


class TBinaryWriter:
    """Encode the TBinaryProtocol subset into a bytearray."""

    def __init__(self) -> None:
        self.buf = bytearray()

    # primitives ------------------------------------------------------
    def write_byte(self, v: int) -> None:
        self.buf += struct.pack("!b", v)

    def write_bool(self, v: bool) -> None:
        self.write_byte(1 if v else 0)

    def write_i16(self, v: int) -> None:
        self.buf += struct.pack("!h", v)

    def write_i32(self, v: int) -> None:
        self.buf += struct.pack("!i", v)

    def write_i64(self, v: int) -> None:
        self.buf += struct.pack("!q", v)

    def write_double(self, v: float) -> None:
        self.buf += struct.pack("!d", v)

    def write_string(self, v: str) -> None:
        b = v.encode("utf-8")
        self.write_i32(len(b))
        self.buf += b

    # containers / structure -----------------------------------------
    def write_message_begin(self, name: str, mtype: int, seqid: int) -> None:
        # the strict header's top bit is set — pack unsigned
        self.buf += struct.pack("!I", (_VERSION_1 | mtype) & 0xFFFFFFFF)
        self.write_string(name)
        self.write_i32(seqid)

    def write_field(self, ftype: int, fid: int) -> None:
        self.write_byte(ftype)
        self.write_i16(fid)

    def write_stop(self) -> None:
        self.write_byte(T_STOP)

    def write_list_begin(self, etype: int, size: int) -> None:
        self.write_byte(etype)
        self.write_i32(size)

    def write_map_begin(self, ktype: int, vtype: int, size: int) -> None:
        self.write_byte(ktype)
        self.write_byte(vtype)
        self.write_i32(size)


class TBinaryReader:
    """Decode the TBinaryProtocol subset from a file-like object."""

    def __init__(self, fh) -> None:
        self.fh = fh

    def _read(self, n: int) -> bytes:
        out = b""
        while len(out) < n:
            chunk = self.fh.read(n - len(out))
            if not chunk:
                raise EOFError("connection closed mid-message")
            out += chunk
        return out

    def read_byte(self) -> int:
        return struct.unpack("!b", self._read(1))[0]

    def read_bool(self) -> bool:
        return self.read_byte() != 0

    def read_i16(self) -> int:
        return struct.unpack("!h", self._read(2))[0]

    def read_i32(self) -> int:
        return struct.unpack("!i", self._read(4))[0]

    def read_i64(self) -> int:
        return struct.unpack("!q", self._read(8))[0]

    def read_double(self) -> float:
        return struct.unpack("!d", self._read(8))[0]

    def read_string(self) -> str:
        return self._read(self.read_i32()).decode("utf-8")

    def read_message_begin(self) -> tuple[str, int, int]:
        first = self.read_i32()
        if first < 0:  # strict header
            mtype = first & 0xFF
            name = self.read_string()
            seqid = self.read_i32()
        else:  # non-strict: i32 name-length already read
            name = self._read(first).decode("utf-8")
            mtype = self.read_byte()
            seqid = self.read_i32()
        return name, mtype, seqid

    def read_field(self) -> tuple[int, int]:
        ftype = self.read_byte()
        if ftype == T_STOP:
            return T_STOP, 0
        return ftype, self.read_i16()

    def skip(self, ftype: int) -> None:
        """Skip a value of any supported type (forward compatibility)."""
        if ftype == T_BOOL or ftype == T_BYTE:
            self._read(1)
        elif ftype == T_I16:
            self._read(2)
        elif ftype == T_I32:
            self._read(4)
        elif ftype in (T_I64, T_DOUBLE):
            self._read(8)
        elif ftype == T_STRING:
            self._read(self.read_i32())
        elif ftype == T_STRUCT:
            while True:
                ft, _ = self.read_field()
                if ft == T_STOP:
                    return
                self.skip(ft)
        elif ftype in (T_LIST, T_SET):
            et = self.read_byte()
            for _ in range(self.read_i32()):
                self.skip(et)
        elif ftype == T_MAP:
            kt, vt = self.read_byte(), self.read_byte()
            for _ in range(self.read_i32()):
                self.skip(kt)
                self.skip(vt)
        else:
            raise ValueError(f"cannot skip thrift type {ftype}")


# ---------------------------------------------------------------------------
# Beeswax struct encode/decode (beeswax.thrift field ids)


def _read_query(r: TBinaryReader) -> dict:
    """struct Query {1: string query; 3: list<string> configuration;
    4: string hadoop_user}"""
    out: dict[str, Any] = {"query": "", "configuration": [], "hadoop_user": ""}
    while True:
        ft, fid = r.read_field()
        if ft == T_STOP:
            return out
        if fid == 1 and ft == T_STRING:
            out["query"] = r.read_string()
        elif fid == 3 and ft == T_LIST:
            r.read_byte()
            out["configuration"] = [r.read_string() for _ in range(r.read_i32())]
        elif fid == 4 and ft == T_STRING:
            out["hadoop_user"] = r.read_string()
        else:
            r.skip(ft)


def _read_handle(r: TBinaryReader) -> dict:
    """struct QueryHandle {1: string id; 2: string log_context}"""
    out = {"id": "", "log_context": ""}
    while True:
        ft, fid = r.read_field()
        if ft == T_STOP:
            return out
        if fid == 1 and ft == T_STRING:
            out["id"] = r.read_string()
        elif fid == 2 and ft == T_STRING:
            out["log_context"] = r.read_string()
        else:
            r.skip(ft)


def _write_handle(w: TBinaryWriter, handle_id: str, log_context: str) -> None:
    w.write_field(T_STRING, 1)
    w.write_string(handle_id)
    w.write_field(T_STRING, 2)
    w.write_string(log_context)
    w.write_stop()


def _write_results(
    w: TBinaryWriter,
    ready: bool,
    columns: list[str],
    data: list[str],
    start_row: int,
    has_more: bool,
) -> None:
    """struct Results {1: bool; 2: list<string>; 3: list<string>;
    4: i64; 5: bool}"""
    w.write_field(T_BOOL, 1)
    w.write_bool(ready)
    w.write_field(T_LIST, 2)
    w.write_list_begin(T_STRING, len(columns))
    for c in columns:
        w.write_string(c)
    w.write_field(T_LIST, 3)
    w.write_list_begin(T_STRING, len(data))
    for d in data:
        w.write_string(d)
    w.write_field(T_I64, 4)
    w.write_i64(start_row)
    w.write_field(T_BOOL, 5)
    w.write_bool(has_more)
    w.write_stop()


def _write_metadata(w: TBinaryWriter, fields: list[tuple[str, str]], delim: str) -> None:
    """struct ResultsMetadata {1: Schema schema; 4: string delim} with
    hive_metastore.Schema {1: list<FieldSchema>; 2: map<string,string>},
    FieldSchema {1: name; 2: type; 3: comment} (public Apache Hive IDL)."""
    w.write_field(T_STRUCT, 1)  # schema
    w.write_field(T_LIST, 1)  # fieldSchemas
    w.write_list_begin(T_STRUCT, len(fields))
    for name, dtype in fields:
        w.write_field(T_STRING, 1)
        w.write_string(name)
        w.write_field(T_STRING, 2)
        w.write_string(dtype)
        w.write_stop()
    w.write_field(T_MAP, 2)  # properties (empty)
    w.write_map_begin(T_STRING, T_STRING, 0)
    w.write_stop()  # end Schema
    w.write_field(T_STRING, 4)
    w.write_string(delim)
    w.write_stop()


def _write_beeswax_exception(w: TBinaryWriter, message: str) -> None:
    """exception BeeswaxException {1: string message; ...} as REPLY
    exception field 1 (the IDL's `throws(1: BeeswaxException error)`)."""
    w.write_field(T_STRUCT, 1)
    w.write_field(T_STRING, 1)
    w.write_string(message)
    w.write_stop()
    w.write_stop()


QUERY_STATE_FINISHED = 4  # enum QueryState {CREATED..FINISHED=4, EXCEPTION=5}
QUERY_STATE_EXCEPTION = 5


class _QueryNotFound(Exception):
    pass


class BeeswaxServer:
    """Threaded Beeswax endpoint over a live Engine.

    Each query executes synchronously on submission (`query` and
    `executeAndWait` behave alike — the reference's shell polled
    get_state either way) and its rendered rows are kept per handle for
    paginated fetch. `delim`-joined row strings mirror the reference's
    Results.data encoding."""

    DELIM = "\t"

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 0) -> None:
        self.engine = engine
        self._queries: dict[str, dict] = {}
        self._lock = threading.Lock()
        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self) -> None:  # one connection, many messages
                fh = self.request.makefile("rb")
                try:
                    while True:
                        try:
                            outer._serve_one(fh, self.request)
                        except EOFError:
                            return
                finally:
                    fh.close()

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    # lifecycle -------------------------------------------------------
    def start(self) -> "BeeswaxServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    # request handling ------------------------------------------------
    def _serve_one(self, fh, sock) -> None:
        r = TBinaryReader(fh)
        name, mtype, seqid = r.read_message_begin()
        w = TBinaryWriter()
        try:
            self._dispatch(name, r, w)
            head = TBinaryWriter()
            head.write_message_begin(name, MSG_REPLY, seqid)
            sock.sendall(bytes(head.buf) + bytes(w.buf))
        except _QueryNotFound:
            body = TBinaryWriter()
            body.write_field(T_STRUCT, 1)
            body.write_stop()  # QueryNotFoundException {}
            body.write_stop()
            head = TBinaryWriter()
            head.write_message_begin(name, MSG_REPLY, seqid)
            sock.sendall(bytes(head.buf) + bytes(body.buf))
        except Exception as e:  # surface as BeeswaxException reply
            body = TBinaryWriter()
            _write_beeswax_exception(body, str(e))
            head = TBinaryWriter()
            head.write_message_begin(name, MSG_REPLY, seqid)
            sock.sendall(bytes(head.buf) + bytes(body.buf))

    def _get(self, handle_id: str) -> dict:
        with self._lock:
            q = self._queries.get(handle_id)
        if q is None:
            raise _QueryNotFound(handle_id)
        return q

    def _run_query(self, sql: str) -> str:
        df = self.engine.sql(sql)
        rows = df.collect()
        cols = list(df.columns)
        dtypes = dict(df.dtypes)
        rendered = [
            self.DELIM.join("NULL" if v is None else str(v) for v in row)
            for row in rows
        ]
        hid = uuid.uuid4().hex
        with self._lock:
            self._queries[hid] = {
                "columns": cols,
                "types": [dtypes[c] for c in cols],
                "rows": rendered,
                "cursor": 0,
                "log": f"query finished: {len(rendered)} row(s)",
            }
        return hid

    def _dispatch(self, name: str, r: TBinaryReader, w: TBinaryWriter) -> None:
        if name in ("query", "executeAndWait", "explain"):
            ft, fid = r.read_field()
            assert ft == T_STRUCT and fid == 1, (ft, fid)
            q = _read_query(r)
            if name == "executeAndWait":
                ft, _ = r.read_field()
                if ft == T_STRING:
                    r.read_string()  # LogContextId
                elif ft != T_STOP:
                    r.skip(ft)
                if ft != T_STOP:
                    assert r.read_field()[0] == T_STOP
            else:
                assert r.read_field()[0] == T_STOP
            if name == "explain":
                text = self.engine.explain(q["query"])
                w.write_field(T_STRUCT, 0)
                w.write_field(T_STRING, 1)  # QueryExplanation.textual
                w.write_string(text)
                w.write_stop()
                w.write_stop()
                return
            hid = self._run_query(q["query"])
            w.write_field(T_STRUCT, 0)
            _write_handle(w, hid, hid)
            w.write_stop()
            return

        if name == "fetch":
            ft, fid = r.read_field()
            assert ft == T_STRUCT and fid == 1
            h = _read_handle(r)
            start_over, fetch_size = False, -1
            while True:
                ft, fid = r.read_field()
                if ft == T_STOP:
                    break
                if fid == 2 and ft == T_BOOL:
                    start_over = r.read_bool()
                elif fid == 3 and ft == T_I32:
                    fetch_size = r.read_i32()
                else:
                    r.skip(ft)
            q = self._get(h["id"])
            with self._lock:
                if start_over:
                    q["cursor"] = 0
                start = q["cursor"]
                n = len(q["rows"]) - start if fetch_size < 0 else fetch_size
                chunk = q["rows"][start : start + n]
                q["cursor"] = start + len(chunk)
                has_more = q["cursor"] < len(q["rows"])
            w.write_field(T_STRUCT, 0)
            _write_results(w, True, q["columns"], chunk, start, has_more)
            w.write_stop()
            return

        if name == "get_state":
            ft, fid = r.read_field()
            assert ft == T_STRUCT and fid == 1
            h = _read_handle(r)
            assert r.read_field()[0] == T_STOP
            self._get(h["id"])
            w.write_field(T_I32, 0)
            w.write_i32(QUERY_STATE_FINISHED)
            w.write_stop()
            return

        if name == "get_results_metadata":
            ft, fid = r.read_field()
            assert ft == T_STRUCT and fid == 1
            h = _read_handle(r)
            assert r.read_field()[0] == T_STOP
            q = self._get(h["id"])
            w.write_field(T_STRUCT, 0)
            _write_metadata(
                w, list(zip(q["columns"], q["types"])), self.DELIM
            )
            w.write_stop()
            return

        if name == "echo":
            ft, fid = r.read_field()
            assert ft == T_STRING and fid == 1
            s = r.read_string()
            assert r.read_field()[0] == T_STOP
            w.write_field(T_STRING, 0)
            w.write_string(s)
            w.write_stop()
            return

        if name == "get_log":
            ft, fid = r.read_field()
            assert ft == T_STRING and fid == 1
            ctx = r.read_string()
            assert r.read_field()[0] == T_STOP
            q = self._get(ctx)
            w.write_field(T_STRING, 0)
            w.write_string(q["log"])
            w.write_stop()
            return

        if name == "dump_config":
            assert r.read_field()[0] == T_STOP
            w.write_field(T_STRING, 0)
            w.write_string("engine=minimised_impala_spark")
            w.write_stop()
            return

        if name == "get_default_configuration":
            while True:
                ft, _ = r.read_field()
                if ft == T_STOP:
                    break
                r.skip(ft)
            # ConfigVariable {1: key; 2: value; 3: description} — the
            # engine's session preset, the closest analogue of the
            # reference's default query options.
            from minimised_impala_spark.session import ENGINE_CONF

            items = sorted(ENGINE_CONF.items())
            w.write_field(T_LIST, 0)
            w.write_list_begin(T_STRUCT, len(items))
            for k, v in items:
                w.write_field(T_STRING, 1)
                w.write_string(k)
                w.write_field(T_STRING, 2)
                w.write_string(v)
                w.write_field(T_STRING, 3)
                w.write_string("engine session preset")
                w.write_stop()
            w.write_stop()
            return

        if name in ("close", "clean"):
            ft, fid = r.read_field()
            if name == "close":
                assert ft == T_STRUCT and fid == 1
                h = _read_handle(r)
                key = h["id"]
            else:
                assert ft == T_STRING
                key = r.read_string()
            assert r.read_field()[0] == T_STOP
            with self._lock:
                if name == "close" and key not in self._queries:
                    # beeswax.thrift declares close throws
                    # QueryNotFoundException; clean(log_context) is void
                    raise _QueryNotFound(key)
                self._queries.pop(key, None)
            w.write_stop()  # void result
            return

        raise ValueError(f"unknown Beeswax method {name!r}")


# ---------------------------------------------------------------------------
# Minimal client (used by tests and scripting; same codec, independent
# message path)


class BeeswaxClient:
    def __init__(self, host: str, port: int, timeout: float = 30.0) -> None:
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self._fh = self.sock.makefile("rb")
        self._seq = 0

    def close(self) -> None:
        self.sock.close()

    def _call(self, name: str, encode_args) -> TBinaryReader:
        self._seq += 1
        w = TBinaryWriter()
        w.write_message_begin(name, MSG_CALL, self._seq)
        encode_args(w)
        self.sock.sendall(bytes(w.buf))
        r = TBinaryReader(self._fh)
        rname, mtype, _ = r.read_message_begin()
        assert rname == name and mtype == MSG_REPLY, (rname, mtype)
        return r

    def _result_field(self, r: TBinaryReader) -> tuple[int, int]:
        ft, fid = r.read_field()
        if fid == 1 and ft == T_STRUCT:  # declared exception
            msg = "query not found"
            while True:
                ift, ifid = r.read_field()
                if ift == T_STOP:
                    break
                if ifid == 1 and ift == T_STRING:
                    msg = r.read_string()
                else:
                    r.skip(ift)
            r.read_field()  # trailing STOP of the result struct
            raise RuntimeError(msg)
        return ft, fid

    def echo(self, s: str) -> str:
        def enc(w: TBinaryWriter) -> None:
            w.write_field(T_STRING, 1)
            w.write_string(s)
            w.write_stop()

        r = self._call("echo", enc)
        ft, fid = self._result_field(r)
        assert ft == T_STRING and fid == 0
        out = r.read_string()
        assert r.read_field()[0] == T_STOP
        return out

    def _enc_query(self, sql: str):
        def enc(w: TBinaryWriter) -> None:
            w.write_field(T_STRUCT, 1)
            w.write_field(T_STRING, 1)
            w.write_string(sql)
            w.write_stop()
            w.write_stop()

        return enc

    def query(self, sql: str) -> dict:
        r = self._call("query", self._enc_query(sql))
        ft, fid = self._result_field(r)
        assert ft == T_STRUCT and fid == 0
        h = _read_handle(r)
        assert r.read_field()[0] == T_STOP
        return h

    def execute_and_wait(self, sql: str, log_context: str = "") -> dict:
        """The legacy shell's submit path (executeAndWait(Query,
        LogContextId)): unlike ``query`` it carries a caller-chosen log
        context id as a second argument. This server executes
        synchronously, so the returned handle is already FINISHED —
        the same observable behavior the blocking legacy call gives."""

        def enc(w: TBinaryWriter) -> None:
            w.write_field(T_STRUCT, 1)
            w.write_field(T_STRING, 1)
            w.write_string(sql)
            w.write_stop()
            w.write_field(T_STRING, 2)
            w.write_string(log_context)
            w.write_stop()

        r = self._call("executeAndWait", enc)
        ft, fid = self._result_field(r)
        assert ft == T_STRUCT and fid == 0
        h = _read_handle(r)
        assert r.read_field()[0] == T_STOP
        return h

    def get_log(self, log_context: str) -> str:
        def enc(w: TBinaryWriter) -> None:
            w.write_field(T_STRING, 1)
            w.write_string(log_context)
            w.write_stop()

        r = self._call("get_log", enc)
        ft, fid = self._result_field(r)
        assert ft == T_STRING and fid == 0
        out = r.read_string()
        assert r.read_field()[0] == T_STOP
        return out

    def explain(self, sql: str) -> str:
        r = self._call("explain", self._enc_query(sql))
        ft, fid = self._result_field(r)
        assert ft == T_STRUCT and fid == 0
        text = ""
        while True:
            ift, ifid = r.read_field()
            if ift == T_STOP:
                break
            if ifid == 1 and ift == T_STRING:
                text = r.read_string()
            else:
                r.skip(ift)
        assert r.read_field()[0] == T_STOP
        return text

    def get_state(self, handle: dict) -> int:
        def enc(w: TBinaryWriter) -> None:
            w.write_field(T_STRUCT, 1)
            _write_handle(w, handle["id"], handle["log_context"])
            w.write_stop()

        r = self._call("get_state", enc)
        ft, fid = self._result_field(r)
        assert ft == T_I32 and fid == 0
        state = r.read_i32()
        assert r.read_field()[0] == T_STOP
        return state

    def fetch(self, handle: dict, start_over: bool = False, fetch_size: int = -1) -> dict:
        def enc(w: TBinaryWriter) -> None:
            w.write_field(T_STRUCT, 1)
            _write_handle(w, handle["id"], handle["log_context"])
            w.write_field(T_BOOL, 2)
            w.write_bool(start_over)
            w.write_field(T_I32, 3)
            w.write_i32(fetch_size)
            w.write_stop()

        r = self._call("fetch", enc)
        ft, fid = self._result_field(r)
        assert ft == T_STRUCT and fid == 0
        out: dict[str, Any] = {
            "ready": False,
            "columns": [],
            "data": [],
            "start_row": 0,
            "has_more": False,
        }
        while True:
            ift, ifid = r.read_field()
            if ift == T_STOP:
                break
            if ifid == 1 and ift == T_BOOL:
                out["ready"] = r.read_bool()
            elif ifid == 2 and ift == T_LIST:
                r.read_byte()
                out["columns"] = [r.read_string() for _ in range(r.read_i32())]
            elif ifid == 3 and ift == T_LIST:
                r.read_byte()
                out["data"] = [r.read_string() for _ in range(r.read_i32())]
            elif ifid == 4 and ift == T_I64:
                out["start_row"] = r.read_i64()
            elif ifid == 5 and ift == T_BOOL:
                out["has_more"] = r.read_bool()
            else:
                r.skip(ift)
        assert r.read_field()[0] == T_STOP
        return out

    def get_results_metadata(self, handle: dict) -> dict:
        def enc(w: TBinaryWriter) -> None:
            w.write_field(T_STRUCT, 1)
            _write_handle(w, handle["id"], handle["log_context"])
            w.write_stop()

        r = self._call("get_results_metadata", enc)
        ft, fid = self._result_field(r)
        assert ft == T_STRUCT and fid == 0
        fields: list[tuple[str, str]] = []
        delim = "\t"
        while True:
            ift, ifid = r.read_field()
            if ift == T_STOP:
                break
            if ifid == 1 and ift == T_STRUCT:  # Schema
                while True:
                    sft, sfid = r.read_field()
                    if sft == T_STOP:
                        break
                    if sfid == 1 and sft == T_LIST:
                        r.read_byte()
                        for _ in range(r.read_i32()):
                            name = dtype = ""
                            while True:
                                fft, ffid = r.read_field()
                                if fft == T_STOP:
                                    break
                                if ffid == 1 and fft == T_STRING:
                                    name = r.read_string()
                                elif ffid == 2 and fft == T_STRING:
                                    dtype = r.read_string()
                                else:
                                    r.skip(fft)
                            fields.append((name, dtype))
                    else:
                        r.skip(sft)
            elif ifid == 4 and ift == T_STRING:
                delim = r.read_string()
            else:
                r.skip(ift)
        assert r.read_field()[0] == T_STOP
        return {"fields": fields, "delim": delim}

    def close_query(self, handle: dict) -> None:
        def enc(w: TBinaryWriter) -> None:
            w.write_field(T_STRUCT, 1)
            _write_handle(w, handle["id"], handle["log_context"])
            w.write_stop()

        r = self._call("close", enc)
        ft, _ = self._result_field(r)
        assert ft == T_STOP

    def get_default_configuration(self) -> list[tuple[str, str]]:
        def enc(w: TBinaryWriter) -> None:
            w.write_field(T_BOOL, 1)
            w.write_bool(False)
            w.write_stop()

        r = self._call("get_default_configuration", enc)
        ft, fid = self._result_field(r)
        assert ft == T_LIST and fid == 0
        r.read_byte()  # element type
        out = []
        for _ in range(r.read_i32()):
            key = val = ""
            while True:
                ift, ifid = r.read_field()
                if ift == T_STOP:
                    break
                if ifid == 1 and ift == T_STRING:
                    key = r.read_string()
                elif ifid == 2 and ift == T_STRING:
                    val = r.read_string()
                else:
                    r.skip(ift)
            out.append((key, val))
        assert r.read_field()[0] == T_STOP
        return out
