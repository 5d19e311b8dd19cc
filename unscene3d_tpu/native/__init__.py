"""Native (C++) host-side runtime components, loaded via ctypes.

Replaces the reference's pybind11/CPU extensions (utils/cpp_utils) and the
host-side part of MinkowskiEngine's coordinate manager. The shared library is
built on first use with g++ (pip/pybind11 are unavailable in this image) and
cached next to the sources; every function has a pure-numpy fallback so the
framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_DIR, "_native.so")
_SOURCES = ["segmentator.cpp", "kernel_maps.cpp", "point_ops.cpp"]
_LOCK = threading.Lock()
_LIB = None
_BUILD_FAILED = False


def _build() -> bool:
    srcs = [os.path.join(_DIR, s) for s in _SOURCES if os.path.exists(os.path.join(_DIR, s))]
    # build to a per-pid temp then atomically rename: concurrent processes
    # (multi-host launches, prefetch workers) must never dlopen a
    # half-written .so
    tmp = f"{_SO_PATH}.{os.getpid()}.tmp"
    # -ffp-contract=off: FMA contraction would change f32 rounding in
    # point_ops.cpp's FPS vs the numpy/device loops it must seed bit-
    # identically (the hash/table code has no float math to slow down)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-fopenmp", "-ffp-contract=off", "-o", tmp] + srcs
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        os.replace(tmp, _SO_PATH)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def load_native():
    """Returns the ctypes lib or None if unavailable."""
    global _LIB, _BUILD_FAILED
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if _BUILD_FAILED:
            return None
        newest_src = max(
            (os.path.getmtime(os.path.join(_DIR, s)) for s in _SOURCES
             if os.path.exists(os.path.join(_DIR, s))), default=0.0,
        )
        if not os.path.exists(_SO_PATH) or os.path.getmtime(_SO_PATH) < newest_src:
            if not _build():
                _BUILD_FAILED = True
                return None
        try:
            _LIB = ctypes.CDLL(_SO_PATH)
        except OSError:
            _BUILD_FAILED = True
            return None
        _LIB.segment_mesh.restype = ctypes.c_int
        _LIB.segment_mesh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_float, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
        if hasattr(_LIB, "build_neighbor_map"):
            _LIB.build_neighbor_map.restype = ctypes.c_int
            _LIB.build_neighbor_map.argtypes = [
                ctypes.POINTER(ctypes.c_int), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_uint8),
            ]
        if hasattr(_LIB, "build_neighbor_map_padded"):
            _LIB.build_neighbor_map_padded.restype = ctypes.c_int
            _LIB.build_neighbor_map_padded.argtypes = [
                ctypes.POINTER(ctypes.c_int), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int),
            ]
        if hasattr(_LIB, "furthest_point_sample"):
            _LIB.furthest_point_sample.restype = ctypes.c_int
            _LIB.furthest_point_sample.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ]
        if hasattr(_LIB, "win_lo_reg"):
            _LIB.win_lo_reg.restype = ctypes.c_int
            _LIB.win_lo_reg.argtypes = [
                ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int),
            ]
            _LIB.win_fill_lidx.restype = ctypes.c_int
            _LIB.win_fill_lidx.argtypes = [
                ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int16),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ]
        return _LIB


def _cptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def segment_mesh(vertices: np.ndarray, faces: np.ndarray, colors: np.ndarray,
                 kthr: float = 0.005, seg_min_verts: int = 20
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Felzenszwalb mesh oversegmentation.

    Returns (segment ids (V,) consecutive ints, connectivity (E,2) directed
    segment adjacency pairs). API-compatible with the reference's
    felzenszwalb_cpp.segment_mesh (utils/cpp_utils/segmentator.cpp:253-255).
    """
    vertices = np.ascontiguousarray(vertices, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    colors = np.ascontiguousarray(colors, np.float32)
    nv, nf = len(vertices), len(faces)
    lib = load_native()
    if lib is None:
        return _segment_mesh_numpy(vertices, faces, colors, kthr, seg_min_verts)
    comps = np.zeros(nv, np.int32)
    max_pairs = max(3 * nf, 1024)
    conn = np.zeros((max_pairs, 2), np.int32)
    n = lib.segment_mesh(
        _cptr(vertices, ctypes.c_float), nv,
        _cptr(faces, ctypes.c_int), nf,
        _cptr(colors, ctypes.c_float),
        ctypes.c_float(kthr), seg_min_verts,
        _cptr(comps, ctypes.c_int),
        _cptr(conn, ctypes.c_int), max_pairs,
    )
    if n < 0:
        conn = np.zeros((-n, 2), np.int32)
        n = lib.segment_mesh(
            _cptr(vertices, ctypes.c_float), nv,
            _cptr(faces, ctypes.c_int), nf,
            _cptr(colors, ctypes.c_float),
            ctypes.c_float(kthr), seg_min_verts,
            _cptr(comps, ctypes.c_int),
            _cptr(conn, ctypes.c_int), -n,
        )
    return comps, conn[:n].copy()


def build_neighbor_map_native(coords: np.ndarray, offsets: np.ndarray):
    """C++ flat-hash neighbor map; returns (idx (K,N), valid (K,N)) or None
    when the native lib is unavailable."""
    lib = load_native()
    if lib is None or not hasattr(lib, "build_neighbor_map"):
        return None
    coords = np.ascontiguousarray(coords, np.int32)
    offsets = np.ascontiguousarray(offsets, np.int32)
    n, k = len(coords), len(offsets)
    out_idx = np.zeros((k, n), np.int32)
    out_valid = np.zeros((k, n), np.uint8)
    rc = lib.build_neighbor_map(
        _cptr(coords, ctypes.c_int), n,
        _cptr(offsets, ctypes.c_int), k,
        _cptr(out_idx, ctypes.c_int), _cptr(out_valid, ctypes.c_uint8),
    )
    if rc != 0:
        return None
    return out_idx, out_valid.astype(bool)


def build_neighbor_map_padded_native(coords: np.ndarray, offsets: np.ndarray,
                                     n_pad: int, fill: int):
    """C++ neighbor map written straight into its padded (K, n_pad) layout
    with `fill` at misses and in the padding tail; returns int32 array or
    None when the native lib is unavailable."""
    lib = load_native()
    if lib is None or not hasattr(lib, "build_neighbor_map_padded"):
        return None
    coords = np.ascontiguousarray(coords, np.int32)
    offsets = np.ascontiguousarray(offsets, np.int32)
    n, k = len(coords), len(offsets)
    out_idx = np.empty((k, n_pad), np.int32)
    rc = lib.build_neighbor_map_padded(
        _cptr(coords, ctypes.c_int), n,
        _cptr(offsets, ctypes.c_int), k,
        int(n_pad), int(fill), _cptr(out_idx, ctypes.c_int),
    )
    return out_idx if rc == 0 else None


def furthest_point_sample_native(xyz: np.ndarray, valid: np.ndarray,
                                 k: int):
    """C++ FPS, bit-identical to data/collate.py::fps_numpy; returns (k,)
    int32 indices or None when the native lib is unavailable."""
    lib = load_native()
    if lib is None or not hasattr(lib, "furthest_point_sample"):
        return None
    xyz = np.ascontiguousarray(xyz, np.float32)
    valid = np.ascontiguousarray(valid, np.uint8)
    n = len(xyz)
    out = np.zeros(max(k, 1), np.int32)
    dist = np.empty(n, np.float32)
    rc = lib.furthest_point_sample(
        _cptr(xyz, ctypes.c_float), n, _cptr(valid, ctypes.c_uint8),
        int(k), _cptr(dist, ctypes.c_float), _cptr(out, ctypes.c_int))
    return out[:k] if rc == 0 else None


_LO_SENTINEL = np.int32(2**31 - 1)


def win_tables_native(nbr: np.ndarray, n_pad: int, tile: int):
    """Pass-1 of the win-k3 table builder: per-(region, tile) 32-aligned min
    of valid neighbor rows. Returns (3, n_tiles) int64 with BIG=1<<40 at
    empty entries (matching build_win_graph's numpy formulation) or None."""
    lib = load_native()
    if lib is None or not hasattr(lib, "win_lo_reg"):
        return None
    nbr = np.ascontiguousarray(nbr, np.int32)
    n_tiles = n_pad // tile
    lo = np.empty((3, n_tiles), np.int32)
    rc = lib.win_lo_reg(_cptr(nbr, ctypes.c_int), int(n_pad), int(tile),
                        _cptr(lo, ctypes.c_int))
    if rc != 0:
        return None
    out = lo.astype(np.int64)
    out[lo == _LO_SENTINEL] = np.int64(1 << 40)
    return out


def win_fill_lidx_native(nbr: np.ndarray, n_pad: int, tile: int,
                         lo_of: np.ndarray, w_reg):
    """Pass-2: window-local ids (n_pad, 26) int16 plus spill triples in the
    numpy (offset, row) order. Returns (lidx, sp_out, sp_in, sp_k) or None."""
    lib = load_native()
    if lib is None or not hasattr(lib, "win_fill_lidx"):
        return None
    nbr = np.ascontiguousarray(nbr, np.int32)
    lo_of = np.ascontiguousarray(lo_of, np.int32)
    w_arr = np.ascontiguousarray(np.asarray(w_reg), np.int32)
    lidx = np.empty((n_pad, 26), np.int16)
    cap = 4096
    while True:
        sp_out = np.empty(cap, np.int32)
        sp_in = np.empty(cap, np.int32)
        sp_k = np.empty(cap, np.int32)
        n = lib.win_fill_lidx(
            _cptr(nbr, ctypes.c_int), int(n_pad), int(tile),
            _cptr(lo_of, ctypes.c_int), _cptr(w_arr, ctypes.c_int),
            lidx.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            _cptr(sp_out, ctypes.c_int), _cptr(sp_in, ctypes.c_int),
            _cptr(sp_k, ctypes.c_int), cap)
        if n >= 0:
            return lidx, sp_out[:n], sp_in[:n], sp_k[:n]
        cap = -n


def _segment_mesh_numpy(vertices, faces, colors, kthr, seg_min_verts):
    """Pure-numpy fallback (sequential union-find in python; slow but exact)."""
    nv = len(vertices)
    i1, i2, i3 = faces[:, 0], faces[:, 1], faces[:, 2]
    fn = np.cross(vertices[i2] - vertices[i1], vertices[i3] - vertices[i1])
    normals = np.zeros((nv, 3), np.float64)
    counts = np.zeros(nv, np.int64)
    order = np.concatenate([i1, i2, i3])
    fns = np.concatenate([fn, fn, fn])
    # running mean equals arithmetic mean of incident face normals
    np.add.at(normals, order, fns)
    np.add.at(counts, order, 1)
    normals /= np.maximum(counts, 1)[:, None]

    ea = np.concatenate([i1, i1, i3])
    eb = np.concatenate([i2, i3, i2])
    d = vertices[eb] - vertices[ea]
    d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-12)
    dot = (normals[ea] * normals[eb]).sum(1)
    color_dist = np.abs(colors[ea] - colors[eb]).sum(1)
    dist = (1.0 - dot) * color_dist
    dot2 = (normals[eb] * d).sum(1)
    convex = (dot2 > 0) & (color_dist < 0.05)
    dist = np.where(convex, dist * dist, dist)

    order = np.argsort(dist, kind="stable")
    parent = np.arange(nv)
    size = np.ones(nv, np.int64)
    thr = np.full(nv, kthr, np.float64)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for e in order:
        a, b = find(ea[e]), find(eb[e])
        if a != b and dist[e] <= thr[a] and dist[e] <= thr[b]:
            parent[b] = a
            size[a] += size[b]
            thr[a] = dist[e] + kthr / size[a]
    for e in order:
        a, b = find(ea[e]), find(eb[e])
        if a != b and (size[a] < seg_min_verts or size[b] < seg_min_verts):
            parent[b] = a
            size[a] += size[b]
    roots = np.array([find(v) for v in range(nv)])
    uniq, comps = np.unique(roots, return_inverse=True)
    s1, s2 = comps[ea], comps[eb]
    keep = s1 != s2
    pairs = np.unique(np.column_stack([s1[keep], s2[keep]]), axis=0)
    return comps.astype(np.int32), pairs.astype(np.int32)
