"""One-shot sampling client (parity:
/root/reference/src/tcn/hws/client.py:7-22)."""
from __future__ import annotations

import json
import socket

from . import constants as C


def client_main(order: str, socket_dir: str | None = None) -> dict:
    assert order in C.ORDERS, f"unknown order {order}"
    path = C.socket_path(socket_dir)
    s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    s.connect(path)
    s.sendall(json.dumps({"order": order}).encode())
    s.shutdown(socket.SHUT_WR)
    raw = s.recv(65536)
    s.close()
    return json.loads(raw.decode()) if raw else {}
