"""ctypes bindings for the C++ RIR engine (eabnet_tpu/native/rir.cpp).

The native engine accelerates the dominant host-side cost of online data
synthesis (image-source enumeration + fractional-delay scatter). Falls back
cleanly when the shared library hasn't been built; build with:

    make -C eabnet_tpu/native
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "native",
                         "librir.so")
_lib = None


_ABI_VERSION = 2  # must match rir_abi_version() in native/rir.cpp


def _abi_ok(path: str) -> bool:
    """A stale pre-built .so with an older C signature would load and run
    'successfully' with misread arguments (the SysV calling convention
    just ignores extra float args) — refuse anything whose exported ABI
    version doesn't match, so it gets rebuilt instead."""
    try:
        lib = ctypes.CDLL(path)
        ver = ctypes.CFUNCTYPE(ctypes.c_longlong)(
            ("rir_abi_version", lib))()
        return int(ver) == _ABI_VERSION
    except (OSError, AttributeError):
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) or not _abi_ok(_LIB_PATH):
        # try a one-shot (re)build (opt out with
        # EABNET_TPU_NO_NATIVE_BUILD=1)
        if os.environ.get("EABNET_TPU_NO_NATIVE_BUILD"):
            return None
        import subprocess

        try:
            if os.path.exists(_LIB_PATH):
                os.remove(_LIB_PATH)  # force make to relink
            subprocess.run(
                ["make", "-C", os.path.dirname(_LIB_PATH)],
                capture_output=True, timeout=120, check=True,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH) or not _abi_ok(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.shoebox_rir.restype = ctypes.c_longlong
    lib.shoebox_rir.argtypes = [
        ctypes.POINTER(ctypes.c_double),  # room[3]
        ctypes.POINTER(ctypes.c_double),  # src[3]
        ctypes.POINTER(ctypes.c_double),  # mics (M*3)
        ctypes.c_int,                     # M
        ctypes.c_double,                  # e_absorption
        ctypes.c_int,                     # max_order
        ctypes.c_int,                     # fs
        ctypes.c_double,                  # c
        ctypes.c_double,                  # air absorption (energy, 1/m)
        ctypes.POINTER(ctypes.c_float),   # out (M * max_len)
        ctypes.c_longlong,                # max_len
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def shoebox_rir_native(
    room_dim: Sequence[float],
    src: Sequence[float],
    mics: np.ndarray,
    e_absorption: float,
    max_order: int,
    fs: int,
    method: str = "ism",
    rt60: Optional[float] = None,
    rng: Optional[np.random.Generator] = None,
    c: float = 343.0,
    air_absorption: Optional[float] = None,
) -> np.ndarray:
    """Drop-in replacement for :func:`eabnet_tpu.data.rir.shoebox_rir`.

    The image-source part runs in C++; the hybrid-mode late tail
    (exact-histogram for 'hybrid', Polack noise for 'hybrid-sabine') is
    applied in numpy on top (identical semantics to the numpy path).
    """
    from eabnet_tpu.data.rir import resolve_rir_method

    lib = _load()
    assert lib is not None, "native RIR library not built"

    room = np.ascontiguousarray(np.asarray(room_dim, np.float64))
    src_a = np.ascontiguousarray(np.asarray(src, np.float64))
    mics = np.atleast_2d(np.asarray(mics, np.float64))
    if mics.shape[0] == 3 and mics.shape[1] != 3:
        mics = mics.T
    mics_a = np.ascontiguousarray(mics)
    m = mics_a.shape[0]

    ism_order, air_absorption, hybrid_hist = resolve_rir_method(
        method, max_order, rt60, air_absorption)

    # upper bound on rir length: farthest image + filter length
    diag = float(np.linalg.norm(room))
    max_dist = diag * (ism_order + 1) + float(
        np.linalg.norm(src_a) + np.abs(mics_a).sum()
    )
    max_len = int(max_dist * fs / c) + 81 + 8

    out = np.zeros((m, max_len), np.float32)
    used = lib.shoebox_rir(
        room.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        src_a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        mics_a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        m,
        float(e_absorption),
        int(ism_order),
        int(fs),
        float(c),
        float(air_absorption),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_len,
    )
    assert used > 0, "native RIR engine failed"
    out = out[:, :used]

    if hybrid_hist:
        from eabnet_tpu.data.rir import add_histogram_tail

        out = add_histogram_tail(
            out, np.asarray(room_dim, np.float64), src_a, mics_a,
            e_absorption, ism_order, rt60, fs, rng, c, air_absorption,
        )
    elif method == "hybrid-sabine" and rt60 is not None and max_order > 3:
        from eabnet_tpu.data.rir import apply_diffuse_tail

        # used = max(floor(delay)) + FDL//2 + 1 -> recover the farthest
        # image distance for the tail switch point
        max_dist = (used - 81 // 2 - 1) * c / fs
        out = apply_diffuse_tail(
            out, max_dist, rt60, fs, rng, c,
            volume=float(np.prod(np.asarray(room_dim, np.float64))),
        )
    return out
