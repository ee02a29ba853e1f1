"""Real datagram transport between robot processes.

The deployment-mode counterpart of the reference's UDP backend
(``/root/reference/src/mrslam/graph_comm.cpp``): each robot process binds
one UDP socket whose address is a function of its id (``baseAddr +
(robotId+1)``, port 42001 — ``graph_comm.cpp:41-51``) and exchanges
fire-and-forget datagrams carrying the ``mr.wire`` float32 codec.  The
hot path is the native C++ runtime (``native/udp_comm.cpp``: bound
socket + receiver thread + mutex-guarded queue, the reference's
``receiveFromThrd``/``processQueueThrd`` architecture); a pure-Python
non-blocking socket fallback keeps the framework usable where the
toolchain is absent.

Two addressing schemes:

* **lan** (the reference's): every robot on its own machine at
  ``base_addr + (id+1)`` (e.g. ``192.168.0.2``…), all on ``base_port``.
* **localhost** (testing / single machine): all robots on ``127.0.0.1``,
  robot ``i`` on ``base_port + i + 1``.
"""

from __future__ import annotations

import ctypes
import socket
from typing import List, Optional, Tuple

MAX_DATAGRAM = 100_000   # msg_factory.h:115
DEFAULT_PORT = 42001     # graph_comm.cpp:41


def peer_addresses(n_robots: int, base_addr: str = "127.0.0.1",
                   base_port: int = DEFAULT_PORT
                   ) -> List[Tuple[str, int]]:
    """Address of each robot id under the two schemes."""
    if base_addr.endswith("."):
        # reference scheme: IP = baseAddr + (robotId + 1), shared port
        # (graph_comm.cpp:41-51, default baseAddr "192.168.0.")
        return [(f"{base_addr}{i + 1}", base_port) for i in range(n_robots)]
    # single-host scheme: shared IP, port = base_port + robotId + 1
    return [(base_addr, base_port + i + 1) for i in range(n_robots)]


class UdpTransport:
    """One robot's endpoint: bind my address, send/recv raw datagrams."""

    def __init__(self, robot_id: int, n_robots: int,
                 base_addr: str = "127.0.0.1",
                 base_port: int = DEFAULT_PORT):
        self.robot_id = robot_id
        self.addrs = peer_addresses(n_robots, base_addr, base_port)
        self.my_addr = self.addrs[robot_id]
        self._native_h: Optional[int] = None
        self._sock: Optional[socket.socket] = None
        self._lib = None

        from cg_mrslam_tpu import native
        L = native.udp_lib()
        if L is not None:
            h = L.udp_create(self.my_addr[1])
            if h >= 0:
                self._lib, self._native_h = L, h
        if self._lib is None:
            s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            s.bind(("0.0.0.0", self.my_addr[1]))
            s.setblocking(False)
            self._sock = s

    @property
    def native(self) -> bool:
        return self._lib is not None

    def send(self, peer: int, data: bytes) -> bool:
        """Fire-and-forget to robot ``peer`` (graph_comm.cpp:103-122)."""
        if len(data) > MAX_DATAGRAM:
            raise ValueError(f"datagram {len(data)} B > {MAX_DATAGRAM}")
        ip, port = self.addrs[peer]
        if self._lib is not None:
            buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
            return self._lib.udp_send(self._native_h, ip.encode(), port,
                                      buf, len(data)) == len(data)
        try:
            return self._sock.sendto(data, (ip, port)) == len(data)
        except OSError:
            return False

    def recv(self) -> Optional[bytes]:
        """Pop one queued datagram; None when empty."""
        if self._lib is not None:
            buf = (ctypes.c_uint8 * MAX_DATAGRAM)()
            n = self._lib.udp_recv(self._native_h, buf, MAX_DATAGRAM,
                                   None, None)
            if n <= 0:
                return None
            return bytes(buf[:n])
        try:
            data, _ = self._sock.recvfrom(MAX_DATAGRAM)
            return data
        except (BlockingIOError, OSError):
            return None

    def drain(self, limit: int = 256) -> List[bytes]:
        """All queued datagrams (bounded), oldest first."""
        out = []
        for _ in range(limit):
            d = self.recv()
            if d is None:
                break
            out.append(d)
        return out

    def close(self) -> None:
        if self._lib is not None and self._native_h is not None:
            self._lib.udp_close(self._native_h)
            self._native_h = None
            self._lib = None
        if self._sock is not None:
            self._sock.close()
            self._sock = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
