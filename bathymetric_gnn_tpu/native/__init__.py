"""ctypes bindings for the native host-side graph kit (C++).

Loads libgraphkit.so (built by native/build.sh; auto-built on first import
when a compiler is available). Every entry point has a NumPy fallback so
the framework stays functional without the native library.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = Path(__file__).parent / "libgraphkit.so"
    if not so.exists():
        src_dir = Path(__file__).resolve().parents[2] / "native"
        build = src_dir / "build.sh"
        if build.exists():
            try:
                subprocess.run(["bash", str(build)], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                logger.info("native graphkit build failed; using NumPy "
                            "fallbacks")
                return None
    if not so.exists():
        return None
    try:
        lib = ctypes.CDLL(str(so))
        lib.knn2d.restype = ctypes.c_int
        lib.knn2d.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        lib.ell_pack.restype = ctypes.c_int32
        lib.ell_pack.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
    except OSError:
        logger.info("could not load libgraphkit.so; using NumPy fallbacks")
    return _LIB


def native_available() -> bool:
    return _load() is not None


def knn2d(pos: np.ndarray, k: int, n_threads: int = 0) -> np.ndarray:
    """Exact 2-D k-NN indices [n, k] (self excluded; -1 pads).

    Spatial-hash C++ when available; otherwise blocked NumPy O(N^2).
    """
    pos = np.ascontiguousarray(pos, np.float32)
    n = pos.shape[0]
    k_eff = min(k, max(n - 1, 0))
    lib = _load()
    if lib is not None and n > 0 and k_eff > 0:
        out = np.empty((n, k), np.int32)
        ret = lib.knn2d(
            pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(n), ctypes.c_int32(k),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int32(n_threads),
        )
        if ret == 0:
            return out
    # NumPy fallback
    out = np.full((n, k), -1, np.int32)
    if k_eff <= 0:
        return out
    block = 2048
    for s in range(0, n, block):
        e = min(s + block, n)
        d2 = ((pos[s:e, None, :] - pos[None, :, :]) ** 2).sum(-1)
        d2[np.arange(e - s), np.arange(s, e)] = np.inf
        part = np.argpartition(d2, k_eff - 1, axis=1)[:, :k_eff]
        rows = np.arange(e - s)[:, None]
        ordered = part[rows, np.argsort(d2[rows, part], axis=1)]
        out[s:e, :k_eff] = ordered
    return out


def ell_pack(src: np.ndarray, dst: np.ndarray, n: int, k: int
             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Pack dst-sorted COO into ELL: (nbr_src [n,k], nbr_mask [n,k] bool,
    slot_of_edge [e], max_degree)."""
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    e = len(src)
    lib = _load()
    if lib is not None:
        nbr_src = np.empty((n, k), np.int32)
        nbr_mask = np.empty((n, k), np.uint8)
        slot = np.empty(e, np.int32)
        maxdeg = lib.ell_pack(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int64(e), ctypes.c_int64(n), ctypes.c_int32(k),
            nbr_src.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            nbr_mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            slot.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return nbr_src, nbr_mask.astype(bool), slot, int(maxdeg)
    # NumPy fallback (requires dst sorted)
    deg = np.bincount(dst, minlength=n)
    starts = np.concatenate([[0], np.cumsum(deg)])
    slot = np.arange(e) - starts[dst]
    nbr_src = np.zeros((n, k), np.int32)
    nbr_mask = np.zeros((n, k), bool)
    ok = slot < k
    nbr_src[dst[ok], slot[ok]] = src[ok]
    nbr_mask[dst[ok], slot[ok]] = True
    slot = np.where(ok, slot, -1).astype(np.int32)
    return nbr_src, nbr_mask, slot, int(deg.max()) if e else 0
