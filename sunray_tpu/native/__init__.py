"""Native (C++) runtime components, bound via ctypes.

Compiled on first use with g++ (no pybind11 in this image); a build failure
degrades gracefully to the pure-JAX paths. Currently:

  - sunray_build_sah_bvh: binned-SAH BVH builder (the quality/SLOW_BUILD
    path of the AsState heuristic; the in-jit LBVH is the FAST_BUILD path).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "_sunray_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build_library() -> bool:
    src = os.path.join(_HERE, "sah_builder.cpp")
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", _LIB_PATH, src,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # pragma: no cover - toolchain-dependent
        log.warning("native build failed (%s); using pure-JAX fallback", e)
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            src = os.path.join(_HERE, "sah_builder.cpp")
            if not os.path.exists(src) or not _build_library():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:  # pragma: no cover
            log.warning("native load failed: %s", e)
            return None
        lib.sunray_build_sah_bvh.restype = ctypes.c_int
        lib.sunray_build_sah_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # v0
            ctypes.POINTER(ctypes.c_float),  # v1
            ctypes.POINTER(ctypes.c_float),  # v2
            ctypes.c_int,                    # num_tris
            ctypes.c_int,                    # leaf_size
            ctypes.POINTER(ctypes.c_int),    # child_l
            ctypes.POINTER(ctypes.c_int),    # child_r
            ctypes.POINTER(ctypes.c_int),    # range_first
            ctypes.POINTER(ctypes.c_int),    # range_last
            ctypes.POINTER(ctypes.c_float),  # node_min
            ctypes.POINTER(ctypes.c_float),  # node_max
            ctypes.POINTER(ctypes.c_int),    # leaf_tri
        ]
        _lib = lib
        return _lib


def build_sah_bvh(v0, v1, v2, leaf_size: int = 4):
    """Host-side binned-SAH build -> ops.bvh.Bvh, or None if native
    unavailable. v0/v1/v2: (T, 3) float32 numpy arrays."""
    lib = get_lib()
    if lib is None:
        return None
    import jax.numpy as jnp
    from sunray_tpu.ops.bvh import Bvh

    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    t = v0.shape[0]
    nl_max = max(t, 1)
    child_l = np.zeros(nl_max, np.int32)
    child_r = np.zeros(nl_max, np.int32)
    range_first = np.zeros(nl_max, np.int32)
    range_last = np.zeros(nl_max, np.int32)
    node_min = np.zeros((2 * nl_max, 3), np.float32)
    node_max = np.zeros((2 * nl_max, 3), np.float32)
    leaf_tri = np.full((nl_max, leaf_size), -1, np.int32)

    fptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    iptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
    nl = lib.sunray_build_sah_bvh(
        fptr(v0), fptr(v1), fptr(v2), t, leaf_size,
        iptr(child_l), iptr(child_r), iptr(range_first), iptr(range_last),
        fptr(node_min), fptr(node_max), iptr(leaf_tri),
    )
    if nl <= 0:
        return None
    ni = nl - 1
    return Bvh(
        child_l=jnp.asarray(child_l[:ni]),
        child_r=jnp.asarray(child_r[:ni]),
        node_min=jnp.asarray(node_min[: ni + nl]),
        node_max=jnp.asarray(node_max[: ni + nl]),
        leaf_tri=jnp.asarray(leaf_tri[:nl]),
        range_first=jnp.asarray(range_first[:ni]),
        range_last=jnp.asarray(range_last[:ni]),
        num_leaves=int(nl),
    )
