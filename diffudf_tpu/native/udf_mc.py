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
    fp = ctypes.POINTER(ctypes.c_float)
    lib.sign_voting.argtypes = [
        fp,
        ctypes.POINTER(ctypes.c_uint8),
        fp, fp, fp,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int8),
    ]
    lib.sign_voting.restype = None
    return lib


_lib = _load()


def sign_voting(udf: np.ndarray, participate: np.ndarray,
                wx: np.ndarray, wy: np.ndarray, wz: np.ndarray):
    """Spanning-forest sign propagation over precomputed edge weights.

    wx/wy/wz: signed per-edge weights for the +x/+y/+z edge families
    (sign = relation, magnitude = confidence), shapes (N0-1,N1,N2) /
    (N0,N1-1,N2) / (N0,N1,N2-1).
    -> int8 (N0, N1, N2) array of +1/-1 pseudo-signs.
    """
    udf = np.ascontiguousarray(udf, np.float32)
    part = np.ascontiguousarray(participate, np.uint8)
    wx = np.ascontiguousarray(wx, np.float32)
    wy = np.ascontiguousarray(wy, np.float32)
    wz = np.ascontiguousarray(wz, np.float32)
    n0, n1, n2 = udf.shape
    assert wx.shape == (n0 - 1, n1, n2)
    assert wy.shape == (n0, n1 - 1, n2)
    assert wz.shape == (n0, n1, n2 - 1)
    out = np.empty((n0, n1, n2), np.int8)
    fp = ctypes.POINTER(ctypes.c_float)
    _lib.sign_voting(
        udf.ctypes.data_as(fp),
        part.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        wx.ctypes.data_as(fp), wy.ctypes.data_as(fp), wz.ctypes.data_as(fp),
        n0, n1, n2,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
    )
    return out
