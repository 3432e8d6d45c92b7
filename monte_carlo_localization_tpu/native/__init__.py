"""Native (C++/OpenMP) host kernels, lazily compiled and loaded via ctypes.

Provides:
  * :func:`native_edt` — exact Euclidean distance transform (map preprocess),
  * :func:`native_cast_rays` — reference-exact OpenMP DDA ray caster (host
    oracle / trace synthesis).

The library builds on first use with g++ (cached next to this file, keyed by
a source hash) and every entry point degrades gracefully to None when no
toolchain is available — callers fall back to numpy/scipy paths.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "mcl_native.cpp"
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_LIB_FAILED = False


def _build_and_load() -> ctypes.CDLL | None:
    global _LIB, _LIB_FAILED
    if _LIB is not None:
        return _LIB
    if _LIB_FAILED:
        return None
    with _LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        try:
            src = _SRC.read_bytes()
            tag = hashlib.sha256(src).hexdigest()[:16]
            cache_dir = Path(
                os.environ.get("MCL_NATIVE_CACHE", _HERE / "_build")
            )
            cache_dir.mkdir(parents=True, exist_ok=True)
            so_path = cache_dir / f"mcl_native_{tag}.so"
            if not so_path.exists():
                # per-process tmp: concurrent first-use compiles (e.g.
                # jax.distributed processes) must not share a tmp name —
                # the winner's os.replace would delete the loser's output
                tmp = so_path.with_suffix(f".{os.getpid()}.so.tmp")
                cmd = [
                    "g++", "-O3", "-march=native", "-shared", "-fPIC",
                    "-fopenmp", "-std=c++17", str(_SRC), "-o", str(tmp),
                ]
                try:
                    subprocess.run(
                        cmd, check=True, capture_output=True, timeout=120
                    )
                    os.replace(tmp, so_path)
                finally:
                    tmp.unlink(missing_ok=True)
            lib = ctypes.CDLL(str(so_path))
            lib.mcl_edt.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.mcl_cast_rays.argtypes = [
                ctypes.POINTER(ctypes.c_int8),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_double,
                ctypes.c_double,
                ctypes.c_double,
                ctypes.c_int,
                ctypes.c_double,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_long,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
            ]
            lib.mcl_build_range_lut.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.mcl_build_range_lut_u16.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint16),
            ]
            for name, outptr in (
                ("mcl_build_compact_range_lut", ctypes.c_uint8),
                ("mcl_build_compact_range_lut_u16", ctypes.c_uint16),
            ):
                getattr(lib, name).argtypes = [
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_int,
                    ctypes.c_int,
                    ctypes.c_int,
                    ctypes.c_int,
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.c_int,
                    ctypes.POINTER(outptr),
                ]
            lib.mcl_native_version.restype = ctypes.c_int
            assert lib.mcl_native_version() == 4
            _LIB = lib
        except Exception:
            _LIB_FAILED = True
            return None
    return _LIB


def available() -> bool:
    return _build_and_load() is not None


def native_edt(obstacle: np.ndarray) -> np.ndarray | None:
    """Exact EDT (cells) of a bool mask, or None if the native lib is absent."""
    lib = _build_and_load()
    if lib is None:
        return None
    obstacle = np.ascontiguousarray(obstacle, dtype=np.uint8)
    h, w = obstacle.shape
    out = np.empty((h, w), dtype=np.float32)
    lib.mcl_edt(
        obstacle.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def native_build_range_lut(
    occupied: np.ndarray, t_bins: int, max_range_px: int,
    dtype=np.uint8,
) -> np.ndarray | None:
    """(H, W, T) u8/u16 range LUT via the C++ shear-scan DP, or None."""
    lib = _build_and_load()
    if lib is None:
        return None
    occupied = np.ascontiguousarray(occupied, dtype=np.uint8)
    h, w = occupied.shape
    out = np.empty((h, w, t_bins), dtype=dtype)
    if np.dtype(dtype) == np.uint16:
        lib.mcl_build_range_lut_u16(
            occupied.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            h,
            w,
            int(t_bins),
            int(max_range_px),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        )
        return out
    lib.mcl_build_range_lut(
        occupied.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
        int(t_bins),
        int(max_range_px),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out


def native_build_compact_range_lut(
    occupied: np.ndarray,
    t_bins: int,
    max_range_px: int,
    row_map: np.ndarray,
    row_stride: int,
    dtype=np.uint8,
) -> np.ndarray | None:
    """Row-compacted PADDED range LUT: (num_rows, row_stride) u8/u16, row 0
    the shared far row (cells with clearance >= max_range), or None.
    ``row_map`` is the (H*W,) int32 cell->row map from
    :func:`mapping.range_lut_device.compact_row_map`."""
    lib = _build_and_load()
    if lib is None:
        return None
    occupied = np.ascontiguousarray(occupied, dtype=np.uint8)
    row_map = np.ascontiguousarray(row_map, dtype=np.int32)
    h, w = occupied.shape
    num_rows = int(row_map.max()) + 1
    out = np.full((num_rows, row_stride), max_range_px, dtype=dtype)
    fn = (
        lib.mcl_build_compact_range_lut_u16
        if np.dtype(dtype) == np.uint16
        else lib.mcl_build_compact_range_lut
    )
    cptr = (
        ctypes.POINTER(ctypes.c_uint16)
        if np.dtype(dtype) == np.uint16
        else ctypes.POINTER(ctypes.c_uint8)
    )
    fn(
        occupied.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
        int(t_bins),
        int(max_range_px),
        row_map.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        int(row_stride),
        out.ctypes.data_as(cptr),
    )
    return out


def native_cast_rays(
    occupancy: np.ndarray,
    origin_x: float,
    origin_y: float,
    resolution: float,
    max_range_px: int,
    max_range_meters: float,
    queries: np.ndarray,
    num_threads: int = 0,
) -> np.ndarray | None:
    """Batch DDA ranges (reference-exact), or None if the lib is absent."""
    lib = _build_and_load()
    if lib is None:
        return None
    occupancy = np.ascontiguousarray(occupancy, dtype=np.int8)
    queries = np.ascontiguousarray(queries, dtype=np.float32)
    h, w = occupancy.shape
    nq = queries.shape[0]
    out = np.empty((nq,), dtype=np.float32)
    lib.mcl_cast_rays(
        occupancy.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        h,
        w,
        float(origin_x),
        float(origin_y),
        float(resolution),
        int(max_range_px),
        float(max_range_meters),
        queries.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nq,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(num_threads),
    )
    return out
