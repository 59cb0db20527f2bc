"""HTTP extension tests against a local in-process http.server —
capability gating, host allowlist, GET/POST, basic auth, limits."""

from __future__ import annotations

import http.server
import threading

import pytest

from warp10_platform_spark.warpscript.functions import REGISTRY


class _Handler(http.server.BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_GET(self):
        if self.path == "/auth":
            auth = self.headers.get("Authorization", "")
            if auth != "Basic dXNlcjpwdw==":  # user:pw
                self.send_response(401)
                self.end_headers()
                self.wfile.write(b"denied")
                return
        body = b"hello from server"
        self.send_response(200)
        self.send_header("X-Test", "yes")
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        data = self.rfile.read(n)
        self.send_response(200)
        self.end_headers()
        self.wfile.write(b"echo:" + data)


@pytest.fixture(scope="module")
def server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


class _Stack:
    def __init__(self, caps=None):
        self.stack = []
        self.attributes = {"capabilities": caps or {}}

    def push(self, v):
        self.stack.append(v)

    def pop(self):
        return self.stack.pop()

    def exec_macro(self, m):
        m(self)


def test_http_requires_capability(server):
    st = _Stack(caps={})
    st.push({"url": server + "/"})
    with pytest.raises(PermissionError, match="capability"):
        REGISTRY["HTTP"](st)


def test_http_denies_unlisted_host(server):
    st = _Stack(caps={"http": "!.*"})
    st.push({"url": server + "/"})
    with pytest.raises(PermissionError, match="not allowed"):
        REGISTRY["HTTP"](st)


def test_http_get_and_response_map(server):
    st = _Stack(caps={"http": r"127\.0\.0\.1.*"})
    st.push({"url": server + "/"})
    REGISTRY["HTTP"](st)
    resp = st.pop()
    assert resp["status.code"] == 200
    assert resp["content"] == b"hello from server"
    assert resp["headers"]["X-Test"] == "yes"


def test_http_post_body_and_default_method(server):
    st = _Stack(caps={"http": r"127\.0\.0\.1.*", "http.requests": 5})
    st.push({"url": server + "/", "body": "payload"})
    REGISTRY["HTTP"](st)
    assert st.pop()["content"] == b"echo:payload"


def test_http_basic_auth(server):
    st = _Stack(caps={"http": r"127\.0\.0\.1.*", "http.requests": 5})
    st.push({"url": server + "/auth", "username": "user", "password": "pw"})
    REGISTRY["HTTP"](st)
    assert st.pop()["status.code"] == 200
    st.push({"url": server + "/auth"})
    REGISTRY["HTTP"](st)
    assert st.pop()["status.code"] == 401  # error responses still map


def test_http_request_budget(server):
    st = _Stack(caps={"http": r"127\.0\.0\.1.*"})  # default budget: 1
    st.push({"url": server + "/"})
    REGISTRY["HTTP"](st)
    st.pop()
    st.push({"url": server + "/"})
    with pytest.raises(RuntimeError, match="budget"):
        REGISTRY["HTTP"](st)


def test_http_size_bound(server):
    st = _Stack(caps={"http": r"127\.0\.0\.1.*", "http.size": 4, "http.requests": 5})
    st.push({"url": server + "/"})
    with pytest.raises(RuntimeError, match="byte capability bound"):
        REGISTRY["HTTP"](st)


def test_http_chunk_macro(server):
    chunks = []

    def macro(st):
        chunks.append(st.pop())

    st = _Stack(caps={"http": r"127\.0\.0\.1.*", "http.requests": 5})
    st.push({"url": server + "/", "chunk.size": 5, "chunk.macro": macro})
    REGISTRY["HTTP"](st)
    resp = st.pop()
    assert resp["content"] == b""  # content delivered via chunks
    got = b"".join(c["content"] for c in chunks)
    assert got == b"hello from server"
    assert chunks[0]["chunk.number"] == 0 and chunks[0]["status.code"] == 200


# ---------------------------------------------------------------------
# sensision metrics extension
# ---------------------------------------------------------------------

def _sens_stack():
    return _Stack(caps={"sensision.read": "", "sensision.write": ""})


def test_sensision_update_get_dump():
    st = _sens_stack()
    st.push(["warp.requests", {"app": "x"}, 3])
    REGISTRY["SENSISION.UPDATE"](st)
    st.push(["warp.requests", {"app": "x"}, 2])
    REGISTRY["SENSISION.UPDATE"](st)
    st.push([ "warp.requests", {"app": "x"} ])
    REGISTRY["SENSISION.GET"](st)
    enc = st.pop()
    assert enc.name == "warp.requests" and len(enc.points) == 1
    assert enc.points[0][1] == 5
    st.push(True)
    REGISTRY["SENSISION.DUMP"](st)
    dump = st.pop()
    assert "warp.requests{app=x} 5" in dump
    # SET overrides; SET None clears
    st.push(["warp.requests", {"app": "x"}, 42])
    REGISTRY["SENSISION.SET"](st)
    st.push(["warp.requests", {"app": "x"}])
    REGISTRY["SENSISION.GET"](st)
    assert st.pop().points[0][1] == 42
    st.push(["warp.requests", {"app": "x"}, None])
    REGISTRY["SENSISION.SET"](st)
    st.push(["warp.requests", {"app": "x"}])
    REGISTRY["SENSISION.GET"](st)
    assert len(st.pop().points) == 0


def test_sensision_events_drain():
    st = _sens_stack()
    st.push(["warp.event", {"k": "v"}, "boom"])
    REGISTRY["SENSISION.EVENT"](st)
    st.push([1234, "warp.event", {"k": "v"}, 7])
    REGISTRY["SENSISION.EVENT"](st)
    REGISTRY["SENSISION.DUMPEVENTS"](st)
    events = st.pop().split("\n")
    assert len(events) == 2
    assert events[0].endswith("warp.event{k=v} 'boom'")
    assert events[1] == "1234// warp.event{k=v} 7"
    REGISTRY["SENSISION.DUMPEVENTS"](st)
    assert st.pop() == ""  # drained


def test_sensision_requires_capabilities():
    st = _Stack(caps={})
    st.push(["c", {}, 1])
    with pytest.raises(PermissionError):
        REGISTRY["SENSISION.UPDATE"](st)
    st = _Stack(caps={"sensision.write": ""})
    st.push(True)
    with pytest.raises(PermissionError):
        REGISTRY["SENSISION.DUMP"](st)


# ---------------------------------------------------------------------
# warprun file surface
# ---------------------------------------------------------------------

def test_warprun_fload_fstore_fread(tmp_path):
    st = _Stack(caps={"warprun": ""})
    p = str(tmp_path / "f.txt")
    st.push("line1\nline2\nline3")
    st.push(p)
    REGISTRY["FSTORE"](st)
    st.push(p)
    REGISTRY["FLOAD"](st)
    assert st.pop() == b"line1\nline2\nline3"
    # overwrite refused without the flag, allowed with it
    st.push(b"x")
    st.push(p)
    with pytest.raises(FileExistsError):
        REGISTRY["FSTORE"](st)
    st = _Stack(caps={"warprun": ""})
    st.push(b"new content")
    st.push(p)
    st.push(True)
    REGISTRY["FSTORE"](st)
    # FREAD: macro per line
    st = _Stack(caps={"warprun": ""})
    seen = []
    st.push(lambda s: seen.append(s.pop()))
    st.push(p)

    def exec_macro(m):
        m(st)

    st.exec_macro = exec_macro  # FOREACH calls exec_macro
    REGISTRY["FREAD"](st)
    assert seen == ["new content"]


def test_warprun_requires_capability(tmp_path):
    st = _Stack(caps={})
    st.push(str(tmp_path / "nope"))
    with pytest.raises(PermissionError):
        REGISTRY["FLOAD"](st)


def test_cap_introspection():
    st = _Stack(caps={"http": "x", "sensision.read": ""})
    st.push("http")
    REGISTRY["CAPCHECK"](st)
    assert st.pop() is True
    st.push("nope")
    REGISTRY["CAPCHECK"](st)
    assert st.pop() is False
    st.push("http")
    REGISTRY["CAPGET"](st)
    assert st.pop() == "x"
    st.push(["http", "missing"])
    REGISTRY["CAPGET"](st)
    assert st.pop() == {"http": "x", "missing": None}
    st.push(None)
    REGISTRY["CAPGET"](st)
    assert st.pop() == {"http": "x", "sensision.read": ""}
    st.push("http")
    REGISTRY["CAPDEL"](st)
    st.push("http")
    REGISTRY["CAPCHECK"](st)
    assert st.pop() is False
    st.push(None)
    REGISTRY["CAPDEL"](st)
    st.push(None)
    REGISTRY["CAPGET"](st)
    assert st.pop() == {}
    st.push(["a", "b"])
    REGISTRY["CAPEXPORT"](st)
    assert st.attributes["capabilities.exported"] == {"a", "b"}
