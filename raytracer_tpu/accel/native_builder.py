"""ctypes binding for the native C++ BVH builder (native/bvh_builder.cpp).

The reference delegates BVH construction to the Vulkan driver's
fixed-function builder (vkCmdBuildAccelerationStructuresKHR,
acceleration_structure.odin:145-199). Our equivalent "native runtime
component" is a C++ binned-SAH builder compiled to a shared library; it
exists because the numpy builder's per-node Python overhead dominates scene
bake time for ~300k-triangle scenes (conference.glb).

Falls back gracefully: `available()` is False until native/build.sh has
produced libbvh.so, and accel.bvh.build_bvh then uses the numpy path.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "libbvh.so"),
    os.path.join(os.path.dirname(__file__), "libbvh.so"),
]

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    for path in _LIB_PATHS:
        path = os.path.abspath(path)
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                continue
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
            i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            lib.bvh_build.argtypes = [
                ctypes.c_int64,  # num_tris
                f32p, f32p, f32p,  # v0, e1, e2 [T,3]
                ctypes.c_int32,  # leaf_size
                f32p, f32p,  # out nodes_min/max [2T,3]
                i32p, i32p, i32p, i32p, i32p,  # skip, first, count, order, parent
            ]
            lib.bvh_build.restype = ctypes.c_int64  # node count (<0 = error)
            _lib = lib
            break
    return _lib


def available() -> bool:
    return _load() is not None


def build_bvh_native(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray,
                     leaf_size: int = 8):
    from raytracer_tpu.accel.bvh import BVH, build_bvh_numpy

    lib = _load()
    if lib is None:
        return build_bvh_numpy(v0, e1, e2, leaf_size)

    t = len(v0)
    cap = max(2 * t, 2)
    nodes_min = np.empty((cap, 3), np.float32)
    nodes_max = np.empty((cap, 3), np.float32)
    skip = np.empty(cap, np.int32)
    first = np.empty(cap, np.int32)
    count = np.empty(cap, np.int32)
    order = np.empty(t, np.int32)
    parent = np.empty(cap, np.int32)
    nn = lib.bvh_build(
        t,
        np.ascontiguousarray(v0, np.float32),
        np.ascontiguousarray(e1, np.float32),
        np.ascontiguousarray(e2, np.float32),
        leaf_size,
        nodes_min, nodes_max, skip, first, count, order, parent,
    )
    if nn < 0:
        return build_bvh_numpy(v0, e1, e2, leaf_size)
    return BVH(
        nodes_min=nodes_min[:nn].copy(),
        nodes_max=nodes_max[:nn].copy(),
        nodes_skip=skip[:nn].copy(),
        nodes_first=first[:nn].copy(),
        nodes_count=count[:nn].copy(),
        tri_order=order,
        parent=parent[:nn].copy(),
    )
