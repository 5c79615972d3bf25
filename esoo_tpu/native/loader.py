"""Build + load the native integral engine via ctypes.

Compiled lazily on first use with g++ (cached next to the source); if no
compiler is available the caller falls back to the pure-Python engine, so
the framework works everywhere and is merely faster where it can be.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "mcmurchie.cpp")
_SO = os.path.join(_HERE, "_mcmurchie.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-fopenmp",
           "-std=c++17", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired):
        # retry without -march=native / openmp for maximum portability
        try:
            subprocess.run(["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
                            _SRC, "-o", _SO],
                           check=True, capture_output=True, timeout=300)
            return True
        except Exception:
            return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.esoo_eri_cart.restype = ctypes.c_int
        lib.esoo_eri_cart.argtypes = [
            ctypes.c_int,                     # nshell
            ctypes.POINTER(ctypes.c_int),     # l
            ctypes.POINTER(ctypes.c_double),  # centers
            ctypes.POINTER(ctypes.c_int),     # nprim
            ctypes.POINTER(ctypes.c_int),     # prim_off
            ctypes.POINTER(ctypes.c_double),  # exps
            ctypes.POINTER(ctypes.c_double),  # coefs
            ctypes.POINTER(ctypes.c_double),  # out
            ctypes.c_int,                     # nbf
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def get_native_eri():
    """Returns eri_cart(shells) -> ndarray or None if unavailable.

    `shells` are esoo_tpu.chem.basis.Shell objects; the result is the full
    contracted CARTESIAN ERI tensor (chemist ordering) — spherical
    transformation stays in Python (cheap 4x tensordot).
    """
    import numpy as np

    lib = _load()
    if lib is None:
        return None

    def eri_cart(shells):
        nshell = len(shells)
        l = np.array([sh.l for sh in shells], dtype=np.int32)
        centers = np.ascontiguousarray(
            np.array([sh.center for sh in shells], dtype=np.float64))
        nprim = np.array([len(sh.exps) for sh in shells], dtype=np.int32)
        prim_off = np.zeros(nshell, dtype=np.int32)
        np.cumsum(nprim[:-1], out=prim_off[1:])
        exps = np.ascontiguousarray(
            np.concatenate([sh.exps for sh in shells]).astype(np.float64))
        coefs = np.ascontiguousarray(
            np.concatenate([sh.cnorm for sh in shells]).astype(np.float64))
        nbf = int(sum(sh.ncart for sh in shells))
        out = np.zeros((nbf, nbf, nbf, nbf), dtype=np.float64)

        rc = lib.esoo_eri_cart(
            nshell,
            l.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            centers.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            nprim.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            prim_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            exps.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            coefs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            nbf,
        )
        if rc != 0:
            raise RuntimeError(f"native ERI engine failed (rc={rc})")
        return out

    return eri_cart
