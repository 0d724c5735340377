"""ctypes bindings for the native host kernels (native/psi_host.cpp).

Auto-builds libpsi_host.so with g++ on first use; every entry point has a
pure-NumPy fallback so the engine works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libpsi_host.so")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("PSI_NO_NATIVE"):
            return None
        if not os.path.exists(_SO_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "-s"],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.psi_sais.argtypes = [u8p, ctypes.c_int64, i64p]
        lib.psi_sais.restype = None
        lib.psi_bwt_from_sa.argtypes = [u8p, i64p, ctypes.c_int64, u8p]
        lib.psi_bwt_from_sa.restype = None
        lib.psi_fastq_scan.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64,
            i64p, i64p, i64p, i64p,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.psi_fastq_scan.restype = ctypes.c_int64
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def sais(text_codes: np.ndarray) -> Optional[np.ndarray]:
    """Native SA-IS; returns None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    text = np.ascontiguousarray(text_codes, dtype=np.uint8)
    n = len(text)
    sa = np.empty(n, dtype=np.int64)
    lib.psi_sais(text, n, sa)
    return sa


def bwt_from_sa(text_codes: np.ndarray, sa: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    text = np.ascontiguousarray(text_codes, dtype=np.uint8)
    sa = np.ascontiguousarray(sa, dtype=np.int64)
    bwt = np.empty(len(text), dtype=np.uint8)
    lib.psi_bwt_from_sa(text, sa, len(text), bwt)
    return bwt


def fastq_scan(buf: bytes, max_records: int):
    """Scan FASTQ records in a buffer; returns
    (names, seqs, consumed_bytes) or None without the library."""
    lib = _load()
    if lib is None:
        return None
    data = np.frombuffer(buf, dtype=np.uint8)
    ns = np.empty(max_records, dtype=np.int64)
    nl = np.empty(max_records, dtype=np.int64)
    ss = np.empty(max_records, dtype=np.int64)
    sl = np.empty(max_records, dtype=np.int64)
    consumed = ctypes.c_int64(0)
    nrec = lib.psi_fastq_scan(
        data, len(data), max_records, ns, nl, ss, sl, ctypes.byref(consumed)
    )
    names = [buf[ns[i]: ns[i] + nl[i]].decode("ascii") for i in range(nrec)]
    seqs = [buf[ss[i]: ss[i] + sl[i]].decode("ascii") for i in range(nrec)]
    return names, seqs, consumed.value
