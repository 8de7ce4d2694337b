"""ctypes bindings for the native (C++) components.

``load_csv`` parses a dataset CSV into (x int32 [N, n_onehot+n_seq*maxlen],
y int8 [N], split float64 [N]) in one multi-threaded pass — the native
replacement for the reference's pandas read + per-cell ``ast.literal_eval``
+ keras ``pad_sequences`` pipeline (reference run.py:237-265).

The shared library is built lazily with the bundled Makefile; when no
C++ toolchain is available every entry point degrades gracefully
(``available()`` returns False) and the data layer falls back to pandas.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libaread_native.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


class _CsvResult(ctypes.Structure):
    _fields_ = [
        ("n_rows", ctypes.c_int64),
        ("n_x_cols", ctypes.c_int64),
        ("x", ctypes.POINTER(ctypes.c_int32)),
        ("y", ctypes.POINTER(ctypes.c_int8)),
        ("split", ctypes.POINTER(ctypes.c_double)),
    ]


def _build() -> bool:
    try:
        subprocess.run(["make", "-s", "-C", _DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.aread_csv_load.restype = ctypes.POINTER(_CsvResult)
        lib.aread_csv_load.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_int64, ctypes.c_int,
        ]
        lib.aread_csv_free.argtypes = [ctypes.POINTER(_CsvResult)]
        lib.aread_csv_last_error.restype = ctypes.c_char_p
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native library is importable (building it if needed)."""
    if os.environ.get("AREAD_TPU_NO_NATIVE"):
        return False
    return _load() is not None


def load_csv(path: str, onehot_cols: Sequence[str], seq_cols: Sequence[str],
             label_col: str, split_col: str, seq_maxlen: int,
             pad_value: int, n_threads: int = 0
             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parse ``path`` natively. Raises RuntimeError on parse failure."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    res = lib.aread_csv_load(
        path.encode(), ",".join(onehot_cols).encode(),
        ",".join(seq_cols).encode(), label_col.encode(), split_col.encode(),
        int(seq_maxlen), int(pad_value), int(n_threads))
    if not res:
        raise RuntimeError("native csv load failed: "
                           + lib.aread_csv_last_error().decode())
    try:
        r = res.contents
        n, c = r.n_rows, r.n_x_cols
        x = np.ctypeslib.as_array(r.x, shape=(n, c)).copy()
        y = np.ctypeslib.as_array(r.y, shape=(n,)).copy()
        split = np.ctypeslib.as_array(r.split, shape=(n,)).copy()
    finally:
        lib.aread_csv_free(res)
    return x, y, split


if __name__ == "__main__":
    print("native library:", "ok" if available() else "UNAVAILABLE", _LIB_PATH)
