"""Native (C++) components, loaded via ctypes.

The reference is C++ end to end; this package holds the framework's
native runtime pieces. Currently: the bulk ``.g2o`` data loader
(``g2o_parser.cpp``). Libraries are built on demand with ``g++ -O3`` and
cached next to the sources; loading failures degrade gracefully to the
pure-Python fallbacks (callers check ``available()``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build(src: str, out: str, *extra: str) -> bool:
    try:
        r = subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", *extra,
             src, "-o", out],
            capture_output=True, timeout=120)
        return r.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False


def _load(stem: str, *extra: str) -> Optional[ctypes.CDLL]:
    """Build (if stale) and dlopen native/<stem>.cpp → lib<stem>.so."""
    src = os.path.join(_DIR, f"{stem}.cpp")
    so = os.path.join(_DIR, f"lib{stem}.so")
    if not os.path.exists(so) or (
            os.path.getmtime(so) < os.path.getmtime(src)):
        if not _build(src, so, *extra):
            return None
    try:
        return ctypes.CDLL(so)
    except OSError:
        return None


def lib() -> Optional[ctypes.CDLL]:
    """The native library, building it on first use; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(_DIR, "g2o_parser.cpp")
    so = os.path.join(_DIR, "libg2o_parser.so")
    if not os.path.exists(so) or (
            os.path.getmtime(so) < os.path.getmtime(src)):
        if not _build(src, so):
            return None
    try:
        L = ctypes.CDLL(so)
    except OSError:
        return None
    LL = ctypes.c_longlong
    LLP = ctypes.POINTER(LL)
    DP = ctypes.POINTER(ctypes.c_double)
    U8P = ctypes.POINTER(ctypes.c_uint8)
    L.g2o_count.argtypes = [ctypes.c_char_p, LLP, LLP, LLP, LLP]
    L.g2o_count.restype = ctypes.c_int
    L.g2o_parse.argtypes = [ctypes.c_char_p, LL, LLP, DP, U8P,
                            LLP, DP, DP, LLP, DP, DP]
    L.g2o_parse.restype = ctypes.c_int
    _LIB = L
    return _LIB


def available() -> bool:
    return lib() is not None


_UDP: Optional[ctypes.CDLL] = None
_UDP_TRIED = False


def udp_lib() -> Optional[ctypes.CDLL]:
    """The native UDP transport (udp_comm.cpp), built on first use;
    None if unavailable (callers fall back to Python sockets)."""
    global _UDP, _UDP_TRIED
    if _UDP is not None or _UDP_TRIED:
        return _UDP
    _UDP_TRIED = True
    L = _load("udp_comm", "-pthread")
    if L is None:
        return None
    U8P = ctypes.POINTER(ctypes.c_uint8)
    L.udp_create.argtypes = [ctypes.c_int]
    L.udp_create.restype = ctypes.c_int
    L.udp_send.argtypes = [ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
                           U8P, ctypes.c_int]
    L.udp_send.restype = ctypes.c_int
    L.udp_recv.argtypes = [ctypes.c_int, U8P, ctypes.c_int,
                           ctypes.POINTER(ctypes.c_uint32),
                           ctypes.POINTER(ctypes.c_uint16)]
    L.udp_recv.restype = ctypes.c_int
    L.udp_pending.argtypes = [ctypes.c_int]
    L.udp_pending.restype = ctypes.c_int
    L.udp_dropped.argtypes = [ctypes.c_int]
    L.udp_dropped.restype = ctypes.c_long
    L.udp_close.argtypes = [ctypes.c_int]
    L.udp_close.restype = None
    _UDP = L
    return _UDP


def parse_g2o(path: str):
    """Parse a .g2o file natively. Returns a dict of numpy arrays or None
    when the native library is unavailable / the file unreadable."""
    import numpy as np

    L = lib()
    if L is None:
        return None
    LL = ctypes.c_longlong
    nv, ne, nl, mb = LL(), LL(), LL(), LL()
    if L.g2o_count(path.encode(), ctypes.byref(nv), ctypes.byref(ne),
                   ctypes.byref(nl), ctypes.byref(mb)) != 0:
        return None
    nv, ne, nl, mb = nv.value, ne.value, nl.value, max(mb.value, 1)
    v_ids = np.zeros(max(nv, 1), np.int64)
    v_pose = np.zeros((max(nv, 1), 3), np.float64)
    v_fixed = np.zeros(max(nv, 1), np.uint8)
    e_ids = np.zeros((max(ne, 1), 2), np.int64)
    e_z = np.zeros((max(ne, 1), 3), np.float64)
    e_info = np.zeros((max(ne, 1), 6), np.float64)
    l_vertex = np.zeros(max(nl, 1), np.int64)
    l_meta = np.zeros((max(nl, 1), 10), np.float64)
    l_ranges = np.zeros((max(nl, 1), mb), np.float64)

    def p(a, t):
        return a.ctypes.data_as(t)

    LLP = ctypes.POINTER(ctypes.c_longlong)
    DP = ctypes.POINTER(ctypes.c_double)
    U8P = ctypes.POINTER(ctypes.c_uint8)
    rc = L.g2o_parse(path.encode(), mb, p(v_ids, LLP), p(v_pose, DP),
                     p(v_fixed, U8P), p(e_ids, LLP), p(e_z, DP),
                     p(e_info, DP), p(l_vertex, LLP), p(l_meta, DP),
                     p(l_ranges, DP))
    if rc != 0:
        return None
    return {
        "v_ids": v_ids[:nv], "v_pose": v_pose[:nv], "v_fixed": v_fixed[:nv],
        "e_ids": e_ids[:ne], "e_z": e_z[:ne], "e_info": e_info[:ne],
        "l_vertex": l_vertex[:nl], "l_meta": l_meta[:nl],
        "l_ranges": l_ranges[:nl],
    }
