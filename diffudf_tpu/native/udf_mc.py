"""ctypes binding for the native sign-voting module (builds on demand).

The C++ source lives in ``native/udf_mc/udf_mc.cpp``; first import compiles
it with g++ into ``libudf_mc.so`` next to the source (cached thereafter).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "udf_mc")
_SRC = os.path.join(_DIR, "udf_mc.cpp")
_LIB = os.path.join(_DIR, "libudf_mc.so")


def _build():
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", _LIB, _SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    if (not os.path.exists(_LIB)) or (
        os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
    ):
        _build()
    lib = ctypes.CDLL(_LIB)
    lib.sign_voting.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int8),
    ]
    lib.sign_voting.restype = None
    return lib


_lib = _load()


def sign_voting(udf: np.ndarray, dirs: np.ndarray, participate: np.ndarray):
    """-> int8 (N0, N1, N2) array of +1/-1 pseudo-signs."""
    udf = np.ascontiguousarray(udf, np.float32)
    dirs = np.ascontiguousarray(dirs, np.float32)
    part = np.ascontiguousarray(participate, np.uint8)
    n0, n1, n2 = udf.shape
    assert dirs.shape == (n0, n1, n2, 3)
    assert part.shape == (n0, n1, n2)
    out = np.empty((n0, n1, n2), np.int8)
    _lib.sign_voting(
        udf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dirs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        part.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n0, n1, n2,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
    )
    return out
