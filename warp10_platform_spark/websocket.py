"""Minimal RFC 6455 WebSocket codec — stdlib only.

Gives the HTTP server (server.py) the two WS endpoints the reference
exposes as wire protocol (r6 verdict ask #3):

- ``/api/v0/plasma``        — Plasma pub-sub push
  (standalone/StandalonePlasmaHandler.java, continuum/plasma/
  PlasmaFrontEnd.java)
- ``/api/v0/streamupdate``  — GTS text ingest over a persistent socket
  (standalone/StandaloneStreamUpdateHandler.java)

Scope: server side of RFC 6455 — handshake accept key (§4.2.2), frame
parse/emit with client masking (§5.2-5.3), fragmentation reassembly
(§5.4), ping/pong/close control frames (§5.5). No extensions, no
subprotocol negotiation (the reference negotiates none either).
"""

from __future__ import annotations

import base64
import hashlib
import struct
import threading

_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"  # RFC 6455 §1.3

OP_CONT, OP_TEXT, OP_BINARY = 0x0, 0x1, 0x2
OP_CLOSE, OP_PING, OP_PONG = 0x8, 0x9, 0xA

# Per-frame and per-message size caps (the reference's Jetty policy has
# maxText/BinaryMessageSize the same way): a client declaring a huge
# 64-bit length or streaming endless non-FIN fragments must not be able
# to allocate unbounded driver memory.
MAX_FRAME = 64 * 1024 * 1024
MAX_MESSAGE = 128 * 1024 * 1024


class ProtocolError(ConnectionError):
    """RFC 6455 protocol violation — the connection must be failed
    (close code 1002, §7.1.7). Subclasses ConnectionError so callers
    that only guard against peer loss still unwind safely."""


def _xor_mask(payload: bytes, mask: bytes) -> bytes:
    """Unmask/mask a payload — one big-int XOR instead of a per-byte
    Python loop (multi-MB ingest frames would otherwise be CPU-bound
    in bytecode)."""
    n = len(payload)
    if n == 0:
        return payload
    key = (mask * ((n // 4) + 1))[:n]
    return (int.from_bytes(payload, "big") ^ int.from_bytes(key, "big")).to_bytes(n, "big")


def accept_key(sec_websocket_key: str) -> str:
    """Sec-WebSocket-Accept for a client key (RFC 6455 §4.2.2 step 5.4)."""
    digest = hashlib.sha1((sec_websocket_key.strip() + _GUID).encode()).digest()
    return base64.b64encode(digest).decode()


def _read_exact(rf, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = rf.read(n - len(buf))
        if not chunk:
            raise ConnectionError("websocket peer closed mid-frame")
        buf += chunk
    return buf


def read_frame(rf, require_mask: bool = False) -> tuple[bool, int, bytes]:
    """One frame off the wire → (fin, opcode, unmasked payload).
    ``require_mask=True`` is the server side of §5.1: a client MUST mask
    every frame, and the server MUST fail the connection on an unmasked
    one (close 1002) — raised here as ProtocolError."""
    b1, b2 = _read_exact(rf, 2)
    fin = bool(b1 & 0x80)
    opcode = b1 & 0x0F
    masked = bool(b2 & 0x80)
    if require_mask and not masked:
        raise ProtocolError("unmasked client frame (RFC 6455 §5.1)")
    ln = b2 & 0x7F
    if ln == 126:
        (ln,) = struct.unpack(">H", _read_exact(rf, 2))
    elif ln == 127:
        (ln,) = struct.unpack(">Q", _read_exact(rf, 8))
    if ln > MAX_FRAME:
        raise ConnectionError(f"websocket frame of {ln} bytes exceeds MAX_FRAME")
    mask = _read_exact(rf, 4) if masked else None
    payload = _read_exact(rf, ln)
    if mask:
        payload = _xor_mask(payload, mask)
    return fin, opcode, payload


def write_frame(wf, payload: bytes, opcode: int = OP_TEXT, mask: bool = False) -> None:
    """Emit one unfragmented frame. Servers MUST NOT mask (§5.1);
    ``mask=True`` is for the test client side."""
    header = bytes([0x80 | opcode])
    ln = len(payload)
    if ln < 126:
        header += bytes([(0x80 if mask else 0) | ln])
    elif ln < 1 << 16:
        header += bytes([(0x80 if mask else 0) | 126]) + struct.pack(">H", ln)
    else:
        header += bytes([(0x80 if mask else 0) | 127]) + struct.pack(">Q", ln)
    if mask:
        import os as _os

        key = _os.urandom(4)
        payload = _xor_mask(payload, key)
        header += key
    wf.write(header + payload)
    wf.flush()


class WSConnection:
    """Server side of one upgraded connection: fragment reassembly,
    automatic pong, write lock (the Plasma hub's push thread and the
    reader thread both send)."""

    def __init__(self, rfile, wfile, sock=None, server: bool = True):
        self.rfile = rfile
        self.wfile = wfile
        self.sock = sock  # raw socket, for lock-free aborts
        self.server = server  # server side ⇒ client frames MUST be masked (§5.1)
        self._wlock = threading.Lock()
        self.open = True

    def send_text(self, text: str) -> None:
        with self._wlock:
            write_frame(self.wfile, text.encode(), OP_TEXT)

    def close(self, code: int = 1000, reason: str = "") -> None:
        if not self.open:
            return
        self.open = False
        try:
            with self._wlock:
                write_frame(self.wfile, struct.pack(">H", code) + reason.encode()[:100], OP_CLOSE)
        except Exception:  # noqa: BLE001 — peer may already be gone
            pass

    def abort(self) -> None:
        """Hard close WITHOUT touching the write lock: a stalled writer
        may hold it indefinitely (TCP backpressure from a peer that
        stopped reading), so eviction must go around it. Shutting the
        socket makes any blocked send raise, which unwinds the writer."""
        self.open = False
        if self.sock is not None:
            import socket as _socket

            try:
                self.sock.shutdown(_socket.SHUT_RDWR)
            except OSError:
                pass

    def recv_message(self) -> str | None:
        """Next complete TEXT/BINARY message as str, handling control
        frames inline; None once the connection closes."""
        parts: list[bytes] = []
        while True:
            try:
                fin, opcode, payload = read_frame(self.rfile, require_mask=self.server)
            except ProtocolError as e:
                self.close(1002, str(e))
                return None
            except (ConnectionError, OSError):
                self.open = False
                return None
            # §5.5: control frames MUST NOT be fragmented and MUST carry
            # ≤ 125 payload bytes — fail the connection like the other
            # protocol violations rather than silently processing them.
            if opcode >= OP_CLOSE and (not fin or len(payload) > 125):
                self.close(1002, "fragmented or oversized control frame (RFC 6455 §5.5)")
                return None
            if opcode == OP_CLOSE:
                self.close()
                return None
            if opcode == OP_PING:
                with self._wlock:
                    write_frame(self.wfile, payload, OP_PONG)
                continue
            if opcode == OP_PONG:
                continue
            # §5.4 sequencing: a fragmented message is TEXT/BINARY then
            # CONT frames only; a new data opcode mid-fragment (or a CONT
            # with no message in progress, or a reserved opcode) fails
            # the connection — silent concatenation would splice two
            # messages into one.
            if opcode in (OP_TEXT, OP_BINARY):
                if parts:
                    self.close(1002, "data frame during fragmented message (RFC 6455 §5.4)")
                    return None
            elif opcode == OP_CONT:
                if not parts:
                    self.close(1002, "continuation frame with no message in progress")
                    return None
            else:
                self.close(1002, f"reserved opcode 0x{opcode:x}")
                return None
            parts.append(payload)
            if sum(len(p) for p in parts) > MAX_MESSAGE:
                self.close(1009, "message too big")  # RFC 6455 §7.4.1
                return None
            if fin:
                return b"".join(parts).decode("utf-8", "replace")
