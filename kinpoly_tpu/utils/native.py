"""ctypes bindings for the native host library (native/kinpoly_native.cpp).

Compiled on first use with g++ (cached next to the source); every function
has a pure-numpy fallback so the framework runs without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parents[2] / "native" / "kinpoly_native.cpp"
_LIB = _SRC.parent / "libkinpoly_native.so"
_lib = None
_tried = False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB), str(_SRC)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_LIB))
        lib.kp_parse_stl.restype = ctypes.c_int
        lib.kp_mesh_mass_properties.restype = ctypes.c_int
        lib.kp_farthest_point_select.restype = ctypes.c_int
        lib.kp_gather_windows.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def parse_stl(data: bytes):
    """Binary STL buffer -> (verts (V, 3) f64, faces (F, 3) i32), or None if
    the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    ntri_guess = max((len(data) - 84) // 50, 0)
    verts = np.empty((ntri_guess * 3, 3), np.float64)
    faces = np.empty((ntri_guess, 3), np.int32)
    nv = ctypes.c_int32()
    nt = ctypes.c_int32()
    rc = lib.kp_parse_stl(
        data, ctypes.c_int64(len(data)),
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(nv), ctypes.byref(nt))
    if rc != 0:
        return None
    return verts[: nv.value].copy(), faces[: nt.value].copy()


def mesh_mass_properties(verts: np.ndarray, faces: np.ndarray,
                         density: float = 1000.0):
    lib = get_lib()
    if lib is None:
        return None
    verts = np.ascontiguousarray(verts, np.float64)
    faces = np.ascontiguousarray(faces, np.int32)
    mass = ctypes.c_double()
    com = np.empty(3, np.float64)
    inertia = np.empty(9, np.float64)
    lib.kp_mesh_mass_properties(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int32(faces.shape[0]), ctypes.c_double(density),
        ctypes.byref(mass),
        com.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        inertia.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return float(mass.value), com, inertia.reshape(3, 3)


def gather_windows(clip: np.ndarray, starts: np.ndarray, win_len: int):
    """clip (T, D) f32, starts (B,) i32 -> (B, win_len, D) with last-frame
    padding; numpy fallback when the library is missing."""
    lib = get_lib()
    clip = np.ascontiguousarray(clip, np.float32)
    starts = np.ascontiguousarray(starts, np.int32)
    B = starts.shape[0]
    T, D = clip.shape
    if lib is None:
        idx = np.minimum(starts[:, None] + np.arange(win_len)[None], T - 1)
        return clip[idx]
    out = np.empty((B, win_len, D), np.float32)
    lib.kp_gather_windows(
        clip.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int32(T), ctypes.c_int32(D),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int32(B), ctypes.c_int32(win_len),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
