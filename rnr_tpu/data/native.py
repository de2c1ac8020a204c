"""ctypes bindings for the native host runtime (native/rnr_native.cpp).

Provides a fast mmap'd OBJ parser and a multithreaded PNG/JPEG decoder.
The library builds on demand (`make -C native`); every caller has a pure
Python/NumPy fallback, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_PKG_DIR = os.path.join(os.path.dirname(__file__), "..")


def _find_lib() -> str | None:
    """Search order: env override, repo-checkout native/ build (wins in a
    source tree so an edited rnr_native.cpp is never shadowed by a stale
    copy that `pip install .` dropped into the package dir), then the
    installed-package copy (the only one present in a site-packages
    install)."""
    candidates = [
        os.environ.get("RNR_NATIVE_LIB"),
        os.path.abspath(os.path.join(_NATIVE_DIR, "librnr_native.so")),
        os.path.abspath(os.path.join(_PKG_DIR, "librnr_native.so")),
    ]
    for c in candidates:
        if c and os.path.isfile(c):
            return c
    return None


_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "librnr_native.so"))

_lib = None


class _ObjCounts(ctypes.Structure):
    _fields_ = [
        ("nv", ctypes.c_int64),
        ("nvt", ctypes.c_int64),
        ("nvn", ctypes.c_int64),
        ("nf", ctypes.c_int64),
    ]


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.isfile(_LIB_PATH)
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib
    if _lib is not None:
        return _lib
    path = _find_lib()
    if path is None:
        if not _build():
            return None
        path = _LIB_PATH
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.rnr_obj_count.argtypes = [ctypes.c_char_p, ctypes.POINTER(_ObjCounts)]
    lib.rnr_obj_count.restype = ctypes.c_int
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    lib.rnr_obj_parse.argtypes = [ctypes.c_char_p, fp, fp, fp, ip, ip, ip]
    lib.rnr_obj_parse.restype = ctypes.c_int
    lib.rnr_image_info.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.rnr_image_info.restype = ctypes.c_int
    lib.rnr_image_decode.argtypes = [
        ctypes.c_char_p, fp, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.rnr_image_decode.restype = ctypes.c_int
    lib.rnr_image_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(fp),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.rnr_image_decode_batch.restype = ctypes.c_int
    _lib = lib
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def parse_obj_native(path: str):
    """Parse an OBJ with the native runtime.

    Returns the same tuple of arrays as the Python parser:
    (v, vt, vn, f_v_idx, f_vt_idx, f_vn_idx) or None if unavailable.
    Missing vt/vn corner indices come back as -1.
    """
    lib = get_lib()
    if lib is None:
        return None
    counts = _ObjCounts()
    if lib.rnr_obj_count(path.encode(), ctypes.byref(counts)) != 0:
        return None
    v = np.empty((counts.nv, 3), np.float32)
    vt = np.empty((max(counts.nvt, 1), 2), np.float32)
    vn = np.empty((max(counts.nvn, 1), 3), np.float32)
    fv = np.empty((counts.nf, 3), np.int32)
    fvt = np.empty((counts.nf, 3), np.int32)
    fvn = np.empty((counts.nf, 3), np.int32)

    def ptr(a, ty):
        return a.ctypes.data_as(ctypes.POINTER(ty))

    rc = lib.rnr_obj_parse(
        path.encode(),
        ptr(v, ctypes.c_float), ptr(vt, ctypes.c_float), ptr(vn, ctypes.c_float),
        ptr(fv, ctypes.c_int32), ptr(fvt, ctypes.c_int32),
        ptr(fvn, ctypes.c_int32),
    )
    if rc != 0:
        return None
    if counts.nvt == 0:
        vt = np.empty((0, 2), np.float32)
    if counts.nvn == 0:
        vn = np.empty((0, 3), np.float32)
    return v, vt, vn, fv, fvt, fvn


def decode_images_native(paths: list[str], n_threads: int = 0):
    """Decode a batch of PNG/JPEG files to float32 RGB [0,1] arrays.

    Returns list of [H, W, 3] arrays, or None if the native runtime (or
    any image) is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    hs = (ctypes.c_int * n)()
    ws = (ctypes.c_int * n)()
    cs = ctypes.c_int()
    outs = []
    for i, p in enumerate(paths):
        h = ctypes.c_int()
        w = ctypes.c_int()
        if lib.rnr_image_info(p.encode(), ctypes.byref(h), ctypes.byref(w),
                              ctypes.byref(cs)) != 0:
            return None
        hs[i] = h.value
        ws[i] = w.value
        outs.append(np.empty((h.value, w.value, 3), np.float32))

    path_arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    fp = ctypes.POINTER(ctypes.c_float)
    out_arr = (fp * n)(
        *[o.ctypes.data_as(fp) for o in outs]
    )
    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 1, 8)
    fails = lib.rnr_image_decode_batch(path_arr, out_arr, hs, ws, n, 3,
                                       n_threads)
    if fails:
        return None
    return outs
