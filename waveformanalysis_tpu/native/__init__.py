"""Native (C++) helpers for host-side hot paths.

The TPU compute path is JAX/Pallas; the host runtime around it (DAQ decode,
IO) uses small C++ components where Python-side conversion dominated
profiles. Components are built on demand with the system g++ into the
package directory and loaded via ctypes (no pybind11 in this toolchain);
every caller must degrade gracefully when the toolchain is unavailable.

Currently: ``csv_decode`` — one-pass delimited-numeric decoder used by the
VX2730 reader (see csv_decode.cpp for the rationale and the C ABI).
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_DIR = Path(__file__).parent
_SRC = _DIR / "csv_decode.cpp"
_LIB = _DIR / "libwfa_native.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    """Compile the shared library if missing or stale. Returns success."""
    try:
        if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
            return True
        tmp = _LIB.with_suffix(".so.tmp")
        cmd = ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(tmp)]
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if proc.returncode != 0:
            logger.warning("native build failed: %s", proc.stderr[-500:])
            return False
        tmp.replace(_LIB)  # atomic: concurrent processes race benignly
        return True
    except Exception as err:  # toolchain missing, read-only dir, ...
        logger.warning("native build unavailable: %s", err)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on first use; None if the
    toolchain or build is unavailable (callers fall back to Python paths)."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not _build():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(_LIB))
            lib.wfa_csv_shape.restype = ctypes.c_longlong
            lib.wfa_csv_shape.argtypes = [
                ctypes.c_char_p, ctypes.c_longlong, ctypes.c_int,
                ctypes.c_char, ctypes.POINTER(ctypes.c_longlong),
            ]
            lib.wfa_csv_decode.restype = ctypes.c_longlong
            lib.wfa_csv_decode.argtypes = [
                ctypes.c_char_p, ctypes.c_longlong, ctypes.c_int,
                ctypes.c_char, ctypes.c_longlong, ctypes.c_longlong,
                ctypes.POINTER(ctypes.c_double),
            ]
            _lib = lib
        except Exception as err:
            logger.warning("native load failed: %s", err)
            _load_failed = True
    return _lib


def decode_csv_bytes(data: bytes, skip_rows: int = 0,
                     delimiter: str = ";") -> Optional[np.ndarray]:
    """Decode delimited numeric text to a row-major float64 matrix.

    Rows whose field count differs from the first data row are skipped; a
    trailing delimiter does not open a field. Returns None when the native
    library is unavailable (caller falls back) or the file has no data.
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(data)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float64)
    ncols = ctypes.c_longlong(0)
    delim = delimiter.encode()[:1]
    rows = lib.wfa_csv_shape(data, n, skip_rows, delim,
                             ctypes.byref(ncols))
    if rows <= 0 or ncols.value <= 0:
        return np.zeros((0, 0), dtype=np.float64)
    out = np.empty((rows, ncols.value), dtype=np.float64)
    got = lib.wfa_csv_decode(
        data, n, skip_rows, delim, ncols.value, rows,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out[:got]
