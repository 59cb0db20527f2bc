"""HTTP extension: the `HTTP` script function (ext/http/HTTP.java).

Reference contract: pops a params MAP {url, method?, headers?, body?,
username?/password?, timeout?, chunk.size?, chunk.macro?} and pushes a
response MAP {status.code LONG, status.message STRING, headers MAP,
content BYTES}.  Requires the `http` capability, whose VALUE is the
host-pattern allowlist (comma-separated regexes, `!`-prefixed entries
deny; the deny-all pattern `!.*` is the default posture, matching the
reference's DEFAULT_HTTP_HOST_PATTERN).  Per-stack request count and
download size are bounded by the http.requests / http.size /
http.chunksize capabilities (defaults 1 / 65536 / 65536,
HttpWarpScriptExtension.java:90-92).

Capabilities live in the stack attribute ``capabilities`` (a dict) —
the reference sources them from the auth token, which is out of scope
here, so the session owner sets them directly.

Scale note: this is a driver-side scalar fetch (the reference executes
it on the egress node the same way); bulk ingestion goes through the
DataFrame sources, never through per-row HTTP.
"""

from __future__ import annotations

import base64
import re
import urllib.request
from urllib.parse import urlparse

from warp10_platform_spark.warpscript.functions import register

DEFAULT_MAX_REQUESTS = 1
DEFAULT_MAX_SIZE = 65536
DEFAULT_CHUNK_SIZE = 65536


def _capabilities(st) -> dict:
    return getattr(st, "attributes", {}).get("capabilities", {}) or {}


def _host_allowed(patterns: str, url: str) -> bool:
    """WebAccessController semantics: comma-separated regex list matched
    against host (or host:port); `!`-prefixed entries deny. First match
    wins; no match denies."""
    host = urlparse(url).netloc
    bare = host.rsplit(":", 1)[0]
    for raw in patterns.split(","):
        raw = raw.strip()
        if not raw:
            continue
        neg = raw.startswith("!")
        pat = raw[1:] if neg else raw
        if re.fullmatch(pat, host) or re.fullmatch(pat, bare):
            return not neg
    return False


@register("HTTP")
def _http(st):
    params = st.pop()
    if not isinstance(params, dict):
        raise TypeError("HTTP expects a MAP as input.")
    caps = _capabilities(st)
    if "http" not in caps:
        raise PermissionError("HTTP requires capability 'http'.")
    patterns = str(caps["http"]) or "!.*"
    url = params.get("url")
    if not isinstance(url, str) or not url.startswith(("http://", "https://")):
        raise ValueError("HTTP expects a url beginning with http:// or https://")
    if not _host_allowed(patterns, url):
        raise PermissionError(f"HTTP host not allowed by capability pattern: {url}")
    maxreq = int(caps.get("http.requests", DEFAULT_MAX_REQUESTS))
    maxsize = int(caps.get("http.size", DEFAULT_MAX_SIZE))
    maxchunk = int(caps.get("http.chunksize", DEFAULT_CHUNK_SIZE))
    done = getattr(st, "_http_requests", 0)
    if done >= maxreq:
        raise RuntimeError(f"HTTP request budget exhausted ({maxreq}).")
    st._http_requests = done + 1

    body = params.get("body")
    if isinstance(body, str):
        body = body.encode("utf-8")
    method = params.get("method")
    if method is None:
        method = "GET" if body is None else "POST"
    headers = dict(params.get("headers") or {})
    if params.get("username") is not None and params.get("password") is not None:
        cred = f"{params['username']}:{params['password']}".encode("utf-8")
        headers["Authorization"] = "Basic " + base64.b64encode(cred).decode("ascii")
    timeout = float(params.get("timeout", 60_000)) / 1000.0

    req = urllib.request.Request(url, data=body, method=str(method))
    for k, v in headers.items():
        req.add_header(str(k), str(v))

    chunk_macro = params.get("chunk.macro")
    chunk_size = int(params.get("chunk.size", 0) or 0)
    if chunk_size > maxchunk:
        raise RuntimeError(f"HTTP chunk.size above the {maxchunk} capability bound.")

    try:
        resp = urllib.request.urlopen(req, timeout=timeout)
        status, msg = resp.status, resp.reason
        rheaders = {k: v for k, v in resp.getheaders()}
        if chunk_macro is not None and chunk_size > 0:
            n = 0
            total = 0
            while True:
                chunk = resp.read(chunk_size)
                total += len(chunk)
                if total > maxsize:
                    raise RuntimeError(f"HTTP download exceeds the {maxsize} byte capability bound.")
                st.push({
                    "chunk.number": n,
                    "status.code": status,
                    "status.message": msg,
                    "headers": rheaders,
                    "content": chunk,
                })
                st.exec_macro(chunk_macro)
                if not chunk:
                    break
                n += 1
            content = b""
        else:
            content = resp.read(maxsize + 1)
            if len(content) > maxsize:
                raise RuntimeError(f"HTTP download exceeds the {maxsize} byte capability bound.")
    except urllib.error.HTTPError as e:  # non-2xx still yields a response map
        status, msg = e.code, e.reason
        rheaders = {k: v for k, v in (e.headers.items() if e.headers else [])}
        content = e.read(maxsize) if hasattr(e, "read") else b""
    st.push({
        "status.code": status,
        "status.message": msg,
        "headers": rheaders,
        "content": content,
    })


# ---------------------------------------------------------------------------
# warprun extension (ext/warprun): FLOAD / FREAD / FSTORE / STDIN — the
# CLI runner's file surface (FLOAD.java, FREAD.java:60-85, FSTORE.java,
# STDIN.java:79). The reference runs these in a local CLI with full fs
# access; embedded in a session they are gated behind the ``warprun``
# capability, consistent with the HTTP gate.
# ---------------------------------------------------------------------------

@register("FLOAD")
def _fload(st):
    """path FLOAD → file bytes."""
    if "warprun" not in _capabilities(st):
        raise PermissionError("FLOAD requires capability 'warprun'.")
    path = st.pop()
    if not isinstance(path, str):
        raise TypeError("FLOAD expects a file path.")
    with open(path, "rb") as f:
        st.push(f.read())


@register("FSTORE")
def _fstore(st):
    """data path (overwrite?) FSTORE: write bytes/string to a file,
    refusing to clobber unless the optional boolean is true."""
    import os as _os

    if "warprun" not in _capabilities(st):
        raise PermissionError("FSTORE requires capability 'warprun'.")
    top = st.pop()
    overwrite = False
    if isinstance(top, bool):
        overwrite = top
        top = st.pop()
    if not isinstance(top, str):
        raise TypeError("FSTORE expects a target file path.")
    path = top
    data = st.pop()
    if isinstance(data, str):
        data = data.encode("utf-8")
    if not isinstance(data, (bytes, bytearray)):
        raise TypeError("FSTORE operates on a STRING or BYTES.")
    if _os.path.exists(path) and not overwrite:
        raise FileExistsError(f"FSTORE refusing to overwrite '{path}'.")
    with open(path, "wb") as f:
        f.write(bytes(data))


@register("FREAD")
def _fread(st):
    """macro path FREAD: run the macro once per line of the file
    (line-iterator + FOREACH, like the reference)."""
    if "warprun" not in _capabilities(st):
        raise PermissionError("FREAD requires capability 'warprun'.")
    path = st.pop()
    if not isinstance(path, str):
        raise TypeError("FREAD expects a file path.")
    macro = st.pop()

    def lines():
        with open(path, "r", encoding="utf-8") as f:
            for ln in f:
                yield ln.rstrip("\n")

    st.push(lines())
    st.push(macro)
    from warp10_platform_spark.warpscript.functions import REGISTRY as _R

    _R["FOREACH"](st)


@register("STDIN")
def _stdin(st):
    """STDIN → line iterator over standard input (STDIN.java:79)."""
    import sys as _sys

    if "warprun" not in _capabilities(st):
        raise PermissionError("STDIN requires capability 'warprun'.")
    st.push((ln.rstrip("\n") for ln in _sys.stdin))


# ---------------------------------------------------------------------------
# Capability introspection (CAPGET.java, CAPCHECK.java, CAPDEL.java,
# CAPEXPORT.java) over the stack's capabilities map — the mechanism the
# HTTP/sensision/warprun gates consume.  CAPADD stays unimplemented:
# it decodes capabilities from an auth TOKEN, which is out of scope.
# ---------------------------------------------------------------------------

@register("CAPGET")
def _capget(st):
    """name|list|NULL CAPGET → value | map of values | full map copy."""
    caps = _capabilities(st)
    top = st.pop()
    if isinstance(top, str):
        st.push(caps.get(top))
    elif isinstance(top, list):
        st.push({n: caps.get(n) for n in top})
    elif top is None:
        st.push(dict(caps))
    else:
        raise TypeError("CAPGET expects a capability name (STRING) or a LIST thereof.")


@register("CAPCHECK")
def _capcheck(st):
    """name CAPCHECK → boolean."""
    top = st.pop()
    if not isinstance(top, str):
        raise TypeError("CAPCHECK expects a STRING capability name.")
    st.push(top in _capabilities(st))


@register("CAPDEL")
def _capdel(st):
    """name|list|NULL CAPDEL: drop capabilities (NULL clears all)."""
    if not hasattr(st, "attributes"):
        st.attributes = {}
    caps = st.attributes.setdefault("capabilities", {})
    top = st.pop()
    if isinstance(top, str):
        caps.pop(top, None)
    elif isinstance(top, list):
        for n in top:
            if isinstance(n, str):
                caps.pop(n, None)
    elif top is None:
        caps.clear()
    else:
        raise TypeError("CAPDEL expects a capability name (STRING), a LIST thereof or NULL.")


@register("CAPEXPORT")
def _capexport(st):
    """name|list|NULL CAPEXPORT: mark capabilities to survive the end of
    the enclosing secure context (NULL exports all) — recorded in the
    ``capabilities.exported`` attribute set like the reference's
    exported-set (CAPEXPORT.java)."""
    if not hasattr(st, "attributes"):
        st.attributes = {}
    exported = st.attributes.setdefault("capabilities.exported", set())
    top = st.pop()
    if isinstance(top, str) or top is None:
        exported.add(top)
    elif isinstance(top, list):
        for n in top:
            if isinstance(n, str) or n is None:
                exported.add(n)
            else:
                raise TypeError("CAPEXPORT expects NULL, a capability name (STRING) or a LIST thereof.")
    else:
        raise TypeError("CAPEXPORT expects NULL, a capability name (STRING) or a LIST thereof.")
