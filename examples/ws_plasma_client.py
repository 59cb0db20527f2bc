"""Plasma WebSocket client example — stdlib only.

Demonstrates the r7 wire-protocol surface end-to-end against a local
server: one connection subscribes to a selector on /api/v0/plasma
(StandalonePlasmaHandler.java grammar), a second pushes GTS text lines
over /api/v0/streamupdate (StandaloneStreamUpdateHandler.java verbs),
and the subscriber prints the selector-matched points as they arrive.

Run the server first:
    python -m warp10_platform_spark.server --port 8080
Then:
    python examples/ws_plasma_client.py 8080
"""

from __future__ import annotations

import base64
import os
import socket
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warp10_platform_spark import websocket as ws  # noqa: E402


class Client:
    def __init__(self, port: int, path: str):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=30)
        self.rf = self.sock.makefile("rb")
        self.wf = self.sock.makefile("wb")
        key = base64.b64encode(os.urandom(16)).decode()
        self.wf.write(
            (
                f"GET {path} HTTP/1.1\r\nHost: 127.0.0.1:{port}\r\n"
                "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
            ).encode()
        )
        self.wf.flush()
        status = self.rf.readline().decode()
        assert " 101 " in status, f"upgrade refused: {status!r}"
        while self.rf.readline().strip():
            pass  # drain response headers

    def send(self, text: str) -> None:
        ws.write_frame(self.wf, text.encode(), ws.OP_TEXT, mask=True)

    def recv(self) -> str | None:
        parts: list[bytes] = []
        while True:
            fin, op, payload = ws.read_frame(self.rf)
            if op == ws.OP_CLOSE:
                return None
            if op in (ws.OP_PING, ws.OP_PONG):
                continue
            parts.append(payload)
            if fin:
                return b"".join(parts).decode()


def main() -> int:
    port = int(sys.argv[1]) if len(sys.argv) > 1 else 8080

    sub = Client(port, "/api/v0/plasma")
    # [UN]SUBSCRIBE <TOKEN> <SELECTOR> — tokens accepted, not enforced
    sub.send("SUBSCRIBE demo-token demo.cpu{dc=eu}")

    got: list[str] = []

    def listen():
        while True:
            msg = sub.recv()
            if msg is None:
                return
            for line in msg.splitlines():
                got.append(line)
                print(f"[plasma] {line}")

    threading.Thread(target=listen, daemon=True).start()

    pub = Client(port, "/api/v0/streamupdate")
    pub.send("NOOP")
    print("[streamupdate]", pub.recv())  # OK 0 NOOP
    pub.send(
        "1700000000000000// demo.cpu{dc=eu} 0.42\n"
        "1700000000000001// demo.cpu{dc=us} 0.17\n"   # filtered out
        "1700000001000000// demo.cpu{dc=eu} 0.58"
    )
    print("[streamupdate]", pub.recv())  # OK 1 UPDATE 3 <nano>
    # The ingest commits through a Spark job before publishing — wait
    # for the matched points (2 of the 3 lines select dc=eu).
    import time

    deadline = time.time() + 90
    while len(got) < 2 and time.time() < deadline:
        time.sleep(0.25)
    print(f"received {len(got)} matched point(s)")
    return 0 if len(got) >= 2 else 1


if __name__ == "__main__":
    raise SystemExit(main())
